#!/usr/bin/env python
"""OMR precision-ladder probe on the real chip (SURVEY §2 component 16).

Measures the U-Net sliding-window + Hamming-blend segmentation
(omr/inference.py, the UMC ingest hot path — reference sheet_utils/omr.py:
243-303) on the vendored tutorial page across the precision ladder
(f32-highest parity default / f32-high / true-bf16 pipeline — the same
methodology the retrieval encoders got, models/configs.py conv_precision).

Two timings per arm:
  * device compute+dispatch — tiles pre-staged on device, only a 1-element
    download forces completion (the number a locally-attached chip sees);
  * end-to-end predict_proba — includes the page upload (rANS-coded u16
    byte planes since late round 4, ~0.2 MB/page) + the device-cropped
    u16 map download (tunnel-wire-dependent on this host).

Gates (VERDICT r3 #3): f32-high must produce BIT-IDENTICAL systems, bars
and noteheads vs f32-highest on the real page AND on contrast/scale
variants of it (real-page variants, not synthetic glyphs — the trained
U-Net does not fire on blocky synthetic engraving, a measured negative).
bf16 is NOT gated identical: its measured deviation is bounded and
reported (±1 px system corners, notehead count within 1%).

Usage: python scripts/omr_probe.py [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARMS = [("f32-highest", "float32", "highest"),
        ("f32-high", "float32", "high"),
        ("bf16", "bfloat16", "default")]


def page_variants(img: np.ndarray):
    """Gate pages: the real page + rescale/contrast/brightness variants.
    (Synthetic staff-line pages detect 0 systems — the checkpoint was
    trained on real engraving textures; measured round 4.)"""
    import cv2

    h, w = img.shape
    out = [img]
    for scale in (0.9, 1.1):
        out.append(cv2.resize(img, (int(w * scale), int(h * scale))))
    out.append(np.clip(img.astype(np.float32) * 0.85 + 20, 0,
                       255).astype(img.dtype))
    return out


def stage_tiles(prep: np.ndarray, input_shape):
    """Host-side tile geometry + pre-staged RAW u16 page for the
    device-compute timing path (mirrors SegmentationNetwork._sliding
    with page_wire='raw' — the number a local-attached chip sees, no
    wire decode; the e2e timing below uses the default rANS wire)."""
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.omr import inference

    h, w = prep.shape
    sh, sw = input_shape
    mh = int(sh * np.ceil(h / sh) - h)
    mw = int(sw * np.ceil(w / sw) - w)
    pad_top, pad_left = mh // 2, mw // 2
    padded = np.pad(prep, ((pad_top, mh - pad_top), (pad_left, mw - pad_left)))
    step = sh // 2
    row0 = np.arange(0, padded.shape[0] - sh + 1, step, np.int32)
    col0 = np.arange(0, padded.shape[1] - sw + 1, step, np.int32)
    rr, cc = np.meshgrid(row0, col0, indexing="ij")
    ham = np.sqrt(np.outer(np.hamming(sh), np.hamming(sw))).astype(np.float32)
    args = (jnp.asarray(inference._quantize_page(padded)),
            jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel()),
            jnp.asarray(ham))
    return args, padded.shape, (pad_top, pad_left, h, w), rr.size


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args(argv)

    import cv2

    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.omr import detectors, inference
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    img = cv2.imread(assets.tutorial_sheet_path(), 0)
    img = cv2.resize(img, (835, int(835 / img.shape[1] * img.shape[0])))
    prep = inference.prepare_image(img)
    print(f"page: {prep.shape}", file=sys.stderr)
    pages = [inference.prepare_image(v) for v in page_variants(img)]

    sysp = inference.SegmentationNetwork.load(
        assets.omr_weights_path("system")).params
    barp = inference.SegmentationNetwork.load(
        assets.omr_weights_path("bar")).params
    notep = inference.SegmentationNetwork.load(
        assets.omr_weights_path("note")).params

    staged, padded_shape, crop, n_tiles = stage_tiles(prep, (512, 512))

    out = {}
    ref = None
    for name, dtype, prec in ARMS:
        sysnet = inference.SegmentationNetwork(
            sysp, compute_dtype=dtype, conv_precision=prec)

        # --- device compute+dispatch (tiny download forces completion) ---
        def run():
            return inference._tiled_predict(
                sysp, *staged, 512, 512,
                int(padded_shape[0]), int(padded_shape[1]), crop,
                compute_dtype=dtype, conv_precision=prec)

        r = run()
        np.asarray(r[0, 0])  # warm: compile + first execution
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = run()
        np.asarray(r[0, 0])
        dev_ms = (time.perf_counter() - t0) / args.reps * 1000

        # --- end-to-end (u16 page up + u16 map down) ---
        sysnet.predict_proba(prep)
        t0 = time.perf_counter()
        for _ in range(max(5, args.reps // 4)):
            sysnet.predict_proba(prep)
        e2e_ms = (time.perf_counter() - t0) / max(5, args.reps // 4) * 1000

        # --- detection gate: systems on all pages, bars+notes on page 0 ---
        barnet = inference.SegmentationNetwork(
            barp, compute_dtype=dtype, conv_precision=prec)
        notenet = inference.SegmentationNetwork(
            notep, input_shape=(256, 512), compute_dtype=dtype,
            conv_precision=prec)
        omr = detectors.OpticalMusicRecognizer(
            system_detector=sysnet, bar_detector=barnet,
            note_detector=notenet)
        systems = [omr.detect_systems(pg) for pg in pages]
        bars = omr.detect_bars(pages[0], systems=systems[0])
        notes = omr.detect_notes(pages[0])
        if ref is None:
            ref = (systems, bars, notes)
            gate = "reference"
        else:
            rs, rb, rn = ref
            sys_delta = max(
                (np.abs(s.astype(int) - r.astype(int)).max() if len(s) else 0)
                if s.shape == r.shape else 10**6
                for s, r in zip(systems, rs))
            bars_eq = (np.shape(bars) == np.shape(rb) and
                       np.array_equal(np.asarray(bars), np.asarray(rb)))
            note_dn = abs(len(notes) - len(rn))
            if sys_delta == 0 and bars_eq and note_dn == 0:
                gate = "identical"
            else:
                gate = (f"sys<=±{sys_delta}px, bars"
                        f"{'=' if bars_eq else '!='}, notes ±{note_dn}")
        print(f"{name:12s}: {dev_ms:6.1f} ms/page device compute "
              f"({1000.0 / dev_ms:5.1f} pages/s) | {e2e_ms:6.1f} ms e2e "
              f"over the wire | detections vs f32-highest: {gate} "
              f"({[len(s) for s in systems]} systems/page, "
              f"{len(bars)} bars, {len(notes)} notes)", file=sys.stderr)
        out[name] = {"device_compute_ms": round(dev_ms, 1),
                     "pages_per_s_device": round(1000.0 / dev_ms, 2),
                     "e2e_wire_ms": round(e2e_ms, 1),
                     "detections": gate,
                     "n_systems": [int(len(s)) for s in systems],
                     "n_bars": int(len(bars)),
                     "n_notes": int(len(notes))}
    out["n_tiles"] = int(n_tiles)

    # map DOWNLOAD wire A/B (VERDICT r4 next #6): static-table device rANS
    # vs raw fetch, f32-high arm, both map_bits. Reports the coded buffer
    # size so the wire saving is auditable independent of link weather.
    if inference._map_wire_tables("system") is not None:
        ab = {}
        h, w = prep.shape
        for bits in (16, 8):
            nets = {
                wire: inference.SegmentationNetwork(
                    sysp, conv_precision="high", map_bits=bits,
                    map_wire=wire, map_kind="system")
                for wire in ("raw", "rans")}
            sizes = {"raw": h * w * (bits // 8)}
            recipe = nets["rans"]._map_recipe
            wb = max(1024, int(h * w * recipe[1] / 2))
            from audio_sheet_retrieval_tpu.ops import rans as rans_mod
            sizes["rans"] = 2 * (2 + 2 * rans_mod.auto_streams(h * w) + wb
                                 + ((h * w + 1) // 2 if bits == 16 else 0))
            for wire, net_w in nets.items():
                net_w.predict_proba(prep)  # warm
                reps = max(5, args.reps // 4)
                t0 = time.perf_counter()
                for _ in range(reps):
                    net_w.predict_proba(prep)
                ms = (time.perf_counter() - t0) / reps * 1000
                ab[f"u{bits}_{wire}"] = {
                    "e2e_ms": round(ms, 1),
                    "map_down_bytes": int(sizes[wire])}
                print(f"map wire u{bits} {wire:4s}: {ms:6.1f} ms e2e, "
                      f"map download {sizes[wire] / 1e6:.2f} MB",
                      file=sys.stderr)
            a, b = ab[f"u{bits}_raw"], ab[f"u{bits}_rans"]
            np.testing.assert_array_equal(
                nets["raw"].predict_proba(prep),
                nets["rans"].predict_proba(prep))  # lossless gate
        out["map_wire_ab"] = ab

    # end-to-end detect_systems at the parity arm (incl. host post-proc)
    net = inference.SegmentationNetwork(sysp)
    omr = detectors.OpticalMusicRecognizer(system_detector=net)
    omr.detect_systems(prep)  # warm
    reps = max(5, args.reps // 4)
    t0 = time.perf_counter()
    for _ in range(reps):
        omr.detect_systems(prep)
    out["detect_systems_ms_f32_highest"] = round(
        (time.perf_counter() - t0) / reps * 1000, 1)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
