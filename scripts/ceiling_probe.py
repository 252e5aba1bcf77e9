#!/usr/bin/env python
"""Device-resident sheet-embedding ceiling decomposition (VERDICT r1 #8).

Measures, on the real chip with everything already in HBM (one fused scan
per config, scalar download only):

  1. f32 baseline (the bench ceiling): gather 160x200 windows -> 'prepare'
     (x/255 + half bilinear resize) -> encoder.
  2. bf16 compute variant of (1).
  3. half-res gather: the strip is 2x2 mean-pooled ONCE per piece, windows
     are gathered directly at 80x100 (equivalent to 'prepare' for even
     starts — jax.image half-scale bilinear IS 2x2 mean) -> encoder.
  4. (3) with bf16 compute.
  5. gather+prepare only (no encoder): isolates the window-ingress cost so
     the conv/gather split is measured, not guessed.

Usage: python scripts/ceiling_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import windows as win
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import dataclasses

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    width = 20000
    from audio_sheet_retrieval_tpu import assets

    cfg32 = get_model_config("mutopia_ccal_cont_rsz")
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = lasagne_import.load_retrieval_checkpoint(
        assets.tutorial_checkpoint_path(), cfg32)
    params_dev = jax.device_put(params)

    import bench

    band = bench._real_staff_band()
    tiled = np.tile(band, (1, int(np.ceil(width / band.shape[1]))))[:, :width]
    strip = np.full((200, width), 255, np.uint8)
    strip[20:180] = tiled
    strip_dev = jax.device_put(strip)
    # half-res plane built once per piece on device (amortized)
    half = jax.jit(lambda s: s.astype(jnp.float32).reshape(
        s.shape[0] // 2, 2, s.shape[1] // 2, 2).mean((1, 3)) * (1. / 255.))
    strip_half_dev = jax.jit(lambda s: half(s))(strip_dev)

    sheet_w = cfg32.input_shape_1[2]
    starts = win.stride_starts(width, sheet_w, sheet_w // 4)
    starts_d = jnp.asarray(starts)
    n_win = len(starts)
    print(f"windows/dispatch: {n_win}, reps: {reps}", file=sys.stderr)

    def timed(name, fn, *args):
        out = fn(*args)          # compile + warm
        float(out)               # sync
        t0 = time.perf_counter()
        float(fn(*args))
        dt = time.perf_counter() - t0
        eps = reps * n_win / dt
        print(f"{name}: {eps:,.0f} emb/s  ({dt:.3f}s)", flush=True)
        return eps

    def make_full(cfg):
        @jax.jit
        def run(p, strip, starts):
            def body(c, i):
                r = win._strip_embed_core(p, strip, starts + i % 8, cfg,
                                          False, 160)
                return c + r.astype(jnp.float32).sum(), 0
            return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]
        return run

    def make_half(cfg):
        from audio_sheet_retrieval_tpu.models import cca_model as cm

        @jax.jit
        def run(p, strip_half, starts):
            def body(c, i):
                st = (starts + i % 8) // 2
                wins = win.gather_windows(strip_half, st, sheet_w // 2)
                # vertical center crop 80 of the 100-tall half plane
                r0 = strip_half.shape[0] // 2 - 40
                wins = jax.lax.dynamic_slice_in_dim(wins, r0, 80, axis=1)
                r = cm.embed_view1(p, wins[..., None], cfg)
                return c + r.astype(jnp.float32).sum(), 0
            return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]
        return run

    @jax.jit
    def gather_only(strip, starts):
        from audio_sheet_retrieval_tpu.train.engine import prepare_view1_device

        def body(c, i):
            wins = win.gather_windows(strip.astype(jnp.float32),
                                      starts + i % 8, sheet_w)
            r0 = strip.shape[0] // 2 - 80
            wins = jax.lax.dynamic_slice_in_dim(wins, r0, 160, axis=1)
            x = prepare_view1_device(wins[:, None], cfg32)
            return c + x.sum(), 0
        return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]

    e1 = timed("f32 full (bench ceiling)", make_full(cfg32), params_dev,
               strip_dev, starts_d)
    e2 = timed("bf16 full", make_full(cfg16), params_dev, strip_dev, starts_d)
    e3 = timed("f32 half-res gather", make_half(cfg32), params_dev,
               strip_half_dev, starts_d)
    e4 = timed("bf16 half-res gather", make_half(cfg16), params_dev,
               strip_half_dev, starts_d)
    e5 = timed("gather+prepare only (no encoder)", gather_only, strip_dev,
               starts_d)
    print(f"ingress share of f32 full: {e1 / e5 * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
