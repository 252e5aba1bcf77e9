#!/usr/bin/env python
"""f32 conv-precision study: HIGHEST (bf16x6) vs HIGH (bf16x3) vs bf16.

The serving wire (rle2 + spec-u16, 899 emb/MB) out-runs the f32-HIGHEST
compute ceiling (~33k emb/s) at reference link rates, so the remaining
f32 lever is the conv precision itself. Measures, on the bench's exact
ceiling workload (real-engraving strip, 396 windows, 50-rep fused scan)
with the REFERENCE checkpoint:

  * device-resident ceiling per precision,
  * embedding deviation vs HIGHEST (max abs diff + min pairwise cosine)
    on real content — the accuracy evidence for the PARITY entry.

Usage: python scripts/precision_probe.py
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
    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.models import lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import windows as win
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    width = 20000
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(
        assets.tutorial_checkpoint_path(), cfg)
    band = bench_mod._real_staff_band()
    reps = int(np.ceil(width / band.shape[1]))
    strip = np.tile(band, (1, reps))[:, :width]
    starts = jnp.asarray(win.stride_starts(width, 200, 50))
    strip_dev = jax.device_put(strip)
    params_dev = jax.device_put(params)
    n_reps = 50

    def measure(ccfg):
        @jax.jit
        def scan(p, s, st):
            def body(c, i):
                r = win._strip_embed_core(p, s, st + i % 8, ccfg, False, 160)
                return c + r.astype(jnp.float32).sum(), 0
            return jax.lax.scan(body, 0.0, jnp.arange(n_reps))[0]

        float(scan(params_dev, strip_dev, starts))
        t0 = time.perf_counter()
        float(scan(params_dev, strip_dev, starts))
        return n_reps * len(starts) / (time.perf_counter() - t0)

    def embeds(ccfg):
        emb = win.make_strip_embedder(params, ccfg, center_crop=160)
        return np.asarray(emb(strip_dev, starts))

    out = {}
    ref = embeds(cfg)  # HIGHEST
    for prec in ("highest", "high", "default"):
        ccfg = dataclasses.replace(cfg, conv_precision=prec)
        eps = measure(ccfg)
        e = embeds(ccfg)
        cos = np.sum(e * ref, axis=1)
        out[prec] = {
            "emb_per_s": round(eps, 1),
            "max_abs_diff": float(np.abs(e - ref).max()),
            "min_cosine": float(cos.min()),
        }
        print(f"  f32-{prec:8} {eps:9,.0f} emb/s  max|d|="
              f"{out[prec]['max_abs_diff']:.2e}  min cos="
              f"{out[prec]['min_cosine']:.8f}", file=sys.stderr)
    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out["bfloat16"] = {"emb_per_s": round(measure(cfg16), 1)}
    print(f"  bf16     {out['bfloat16']['emb_per_s']:11,.0f} emb/s",
          file=sys.stderr)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
