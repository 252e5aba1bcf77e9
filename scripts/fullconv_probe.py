#!/usr/bin/env python
"""Measure the fullconv (strip-level block-1) serving ceiling variants.

Quick iteration harness for _strip_embed_core_fullconv: standard bf16
half-gather path vs fullconv, on the bench's exact ceiling workload
(20000-px real-engraving strip, 396 windows, 50-rep fused scan).

Usage: python scripts/fullconv_probe.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import windows as win
    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    width = 20000
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(
        assets.tutorial_checkpoint_path(), cfg)
    band = bench_mod._real_staff_band()
    reps = int(np.ceil(width / band.shape[1]))
    strip = np.full((200, width), 255, np.uint8)
    strip[20:180] = np.tile(band, (1, reps))[:, :width]
    starts = jnp.asarray(win.stride_starts(width, 200, 50))
    strip_dev = jax.device_put(strip)
    params_dev = jax.device_put(params)
    n_reps = 50

    def measure(name, ccfg, **kw):
        @jax.jit
        def scan(p, s, st):
            def body(c, i):
                r = win._strip_embed_core(p, s, st + i % 8, ccfg, False,
                                          160, **kw)
                return c + r.astype(jnp.float32).sum(), 0
            return jax.lax.scan(body, 0.0, jnp.arange(n_reps))[0]

        float(scan(params_dev, strip_dev, starts))
        t0 = time.perf_counter()
        float(scan(params_dev, strip_dev, starts))
        eps = n_reps * len(starts) / (time.perf_counter() - t0)
        print(f"  {name:28} {eps:10,.0f} emb/s", file=sys.stderr)
        return round(eps, 1)

    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out = {
        "bf16_gather_half": measure("bf16 gather_half", cfg16,
                                    gather_half=True),
        "bf16_fullconv": measure("bf16 fullconv", cfg16, fullconv=True),
        "bf16_fullconv_pallas": measure("bf16 fullconv pallas", cfg16,
                                        fullconv="pallas"),
        "f32_fullconv": measure("f32 fullconv", cfg, fullconv=True),
        "f32_fullconv_pallas": measure("f32 fullconv pallas", cfg,
                                       fullconv="pallas"),
        "f32_standard": measure("f32 standard", cfg),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
