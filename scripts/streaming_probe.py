#!/usr/bin/env python
"""Streaming retrieval at round-3 serving scale (VERDICT r3 #7).

Round 1 measured 127 fps against a 100k-row gallery; this probe re-runs
the streaming loop (retrieval/streaming.py — reference loop:
audio_sheet_server.py:83-211) at the scale the Pallas top-k targets:

  * 1M-row gallery,
  * u16-quantized frame ingest (the serving-gated spec wire coding),
  * XLA dot+top_k vs the Pallas streaming-top-k kernel
    (ops/topk_gallery.py),
  * per-frame dispatch (p50 latency) AND chunked dispatch (fps at chunk 8,
    the live-display cadence) — both against the 20 fps realtime
    requirement of the 20 fps spectrogram stream.

Usage: python scripts/streaming_probe.py [--n_gallery 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_gallery", type=int, default=1_000_000)
    p.add_argument("--n_frames", type=int, default=400)
    p.add_argument("--chunk", type=int, default=8)
    args = p.parse_args(argv)

    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.data import synthetic
    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import windows as win
    from audio_sheet_retrieval_tpu.retrieval.streaming import (
        StreamingRetriever,
    )
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(
        assets.tutorial_checkpoint_path(), cfg)

    rng = np.random.default_rng(0)
    gal = rng.standard_normal((args.n_gallery, cfg.dim_latent)).astype(
        np.float32)
    ids = rng.integers(0, 1000, args.n_gallery).astype(np.int32)

    # a real synthetic performance as the stream (columns = 20 fps frames)
    _, specs, _ = synthetic.make_piece_list(3, 1, n_onsets=120)
    spec = specs[0][0]
    frames = np.tile(spec.T, (args.n_frames // spec.shape[1] + 1, 1))
    frames = frames[:args.n_frames]                       # [T, bins]
    codes, scale = win.spec_quantize(frames.T, bits=16)   # [bins, T] u16
    codes_t = np.ascontiguousarray(codes.T)               # [T, bins]

    out = {"n_gallery": args.n_gallery, "n_frames": args.n_frames}
    for arm, pallas in (("xla", False), ("pallas", True)):
        sr = StreamingRetriever(params, cfg, gal, ids,
                                spec_max=float(spec.max()),
                                use_pallas_topk=pallas)
        # per-frame path (f32 ingest), warmed
        sr.push_frame(frames[0])
        lat = []
        for t in range(1, min(80, args.n_frames)):
            t0 = time.perf_counter()
            sr.push_frame(frames[t])
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50) * 1000)

        # chunked path with u16 ingest (one dispatch per chunk)
        sr.reset(spec_max=float(spec.max()))
        sr.push_frames_quantized(codes_t[:args.chunk], scale)  # warm
        t0 = time.perf_counter()
        n_done = 0
        for lo in range(args.chunk, args.n_frames, args.chunk):
            _, cands = sr.push_frames_quantized(
                codes_t[lo:lo + args.chunk], scale)
            n_done += len(cands)
        fps = n_done / (time.perf_counter() - t0)
        out[arm] = {"per_frame_p50_ms": round(p50, 2),
                    "chunked_u16_fps": round(fps, 1),
                    "realtime_margin_x": round(fps / 20.0, 1)}
        print(f"{arm:7s}: per-frame p50 {p50:6.2f} ms | chunk-{args.chunk} "
              f"u16 ingest {fps:7.1f} fps ({fps / 20.0:.1f}x the 20 fps "
              f"stream)", file=sys.stderr)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
