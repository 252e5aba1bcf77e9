#!/usr/bin/env python
"""OMR inference throughput on the real chip (SURVEY §2 component 16).

Measures the U-Net sliding-window + Hamming-blend segmentation
(omr/inference.py, the UMC ingest hot path — reference sheet_utils/omr.py:
243-303) on the vendored tutorial page: probability-map pages/s for the
system detector, plus the end-to-end detect_systems (device inference +
host regionprops) latency.

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

    net = inference.SegmentationNetwork.load(
        assets.omr_weights_path("system"))
    # warm (compile + first blend)
    prob = net.predict_proba(img)
    assert prob.shape == img.shape

    t0 = time.perf_counter()
    for _ in range(args.reps):
        net.predict_proba(img)
    dt = (time.perf_counter() - t0) / args.reps
    pages_s = 1.0 / dt
    print(f"predict_proba: {dt * 1000:.1f} ms/page ({pages_s:.1f} pages/s)",
          file=sys.stderr)

    omr = detectors.OpticalMusicRecognizer(system_detector=net)
    omr.detect_systems(img)  # warm
    t0 = time.perf_counter()
    for _ in range(max(5, args.reps // 4)):
        systems = omr.detect_systems(img)
    dt_full = (time.perf_counter() - t0) / max(5, args.reps // 4)
    print(f"detect_systems (incl. host post-proc): {dt_full * 1000:.1f} "
          f"ms/page, {len(systems)} systems", file=sys.stderr)

    out = {"predict_proba_ms": round(dt * 1000, 1),
           "pages_per_s": round(pages_s, 2),
           "detect_systems_ms": round(dt_full * 1000, 1),
           "n_systems": int(len(systems))}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
