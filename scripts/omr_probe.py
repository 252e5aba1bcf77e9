#!/usr/bin/env python
"""OMR precision-ladder probe on the real chip (SURVEY §2 component 16).

Measures the U-Net sliding-window + Hamming-blend segmentation
(omr/inference.py, the UMC ingest hot path — reference sheet_utils/omr.py:
243-303) on the vendored tutorial page across the precision ladder
(f32-highest parity default / f32-high / bfloat16 — the same methodology
the retrieval encoders got, models/configs.py conv_precision), and GATES
each fast arm on detection equality: detect_systems corner arrays must be
IDENTICAL to the f32-highest arm on the real page and on synthetic pages
(VERDICT r3 #3).

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


def synth_pages(n: int = 3, w: int = 835, h: int = 1181):
    """Synthetic engraving-like pages: staff-line systems + note blobs
    (content the system detector was trained to fire on)."""
    rng = np.random.default_rng(11)
    pages = []
    for _ in range(n):
        img = np.full((h, w), 255, np.uint8)
        n_sys = int(rng.integers(4, 7))
        tops = np.linspace(90, h - 180, n_sys).astype(int)
        for top in tops:
            for li in range(5):
                img[top + li * 9:top + li * 9 + 2, 60:w - 60] = 0
            for x in rng.integers(70, w - 70, 40):
                cy = top + int(rng.integers(-6, 42))
                img[cy:cy + 7, x:x + 9] = 0
        pages.append(img)
    return pages


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
    img = inference.prepare_image(img)  # the library ingest contract
    print(f"page: {img.shape}", file=sys.stderr)
    pages = [img] + [inference.prepare_image(s) for s in synth_pages()]

    params = inference.SegmentationNetwork.load(
        assets.omr_weights_path("system")).params

    out = {}
    ref_systems = None
    for name, dtype, prec in ARMS:
        net = inference.SegmentationNetwork(
            params, compute_dtype=dtype, conv_precision=prec)
        prob = net.predict_proba(img)  # warm (compile + first blend)
        assert prob.shape == img.shape

        t0 = time.perf_counter()
        for _ in range(args.reps):
            net.predict_proba(img)
        dt = (time.perf_counter() - t0) / args.reps

        omr = detectors.OpticalMusicRecognizer(system_detector=net)
        systems = [omr.detect_systems(pg) for pg in pages]
        if ref_systems is None:
            ref_systems = systems
            gate = "reference"
        else:
            eq = all(
                s.shape == r.shape and np.array_equal(s, r)
                for s, r in zip(systems, ref_systems))
            gate = "identical" if eq else "DIVERGED"
        print(f"{name:12s}: {dt * 1000:6.1f} ms/page "
              f"({1.0 / dt:5.1f} pages/s)  detections vs f32-highest: "
              f"{gate} ({[len(s) for s in systems]} systems/page)",
              file=sys.stderr)
        out[name] = {"predict_proba_ms": round(dt * 1000, 1),
                     "pages_per_s": round(1.0 / dt, 2),
                     "detections": gate,
                     "n_systems": [int(len(s)) for s in systems]}

    # end-to-end detect_systems at the parity arm (incl. host post-proc)
    net = inference.SegmentationNetwork(params)
    omr = detectors.OpticalMusicRecognizer(system_detector=net)
    omr.detect_systems(img)  # warm
    reps = max(5, args.reps // 4)
    t0 = time.perf_counter()
    for _ in range(reps):
        systems = omr.detect_systems(img)
    out["detect_systems_ms_f32_highest"] = round(
        (time.perf_counter() - t0) / reps * 1000, 1)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
