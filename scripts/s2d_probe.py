#!/usr/bin/env python
"""Space-to-depth probe for the early convs (VERDICT r2 #3).

The serving ceiling is conv-bound and the first encoder convs run at
C_in=1 (view1 sheet plane) / C_in=24 — the MXU contraction dimension is
kh*kw*C_in = 9 resp. 216 lanes, far under the 128-lane tile for conv1.
Space-to-depth folds f x f pixels into f^2 channels, turning conv 3x3xC
into an ALGEBRAICALLY EXACT conv 2x2x(f^2 C) on a f-times-smaller grid:
contraction grows to 4 f^2 C lanes at 4 f^2/9 x the (zero-padded) FLOPs —
whether that wins depends on how XLA tiles both forms onto the MXU, so
this measures rather than guesses.

Measured per variant (bf16 and f32, B=504 snippets x 100 reps in one
scanned dispatch): conv1 as-is, conv1 s2d f=2, f=4, conv2 as-is, and the
first two convs chained vs their s2d-chained equivalent.

Usage: python scripts/s2d_probe.py [--batch 504] [--reps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def s2d(x, f):
    """[B, H, W, C] -> [B, H/f, W/f, C*f*f] (blocks raster-ordered)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                 f * f * c)


def fold_kernel(w3, f):
    """Fold a [3, 3, C, O] stride-1 SAME conv kernel into the exact
    [3, 3, C*f*f, O*f*f] space-to-depth equivalent (a centered 3x3 tap at
    output subpixel (oi, oj) reads absolute offsets oi-1+u in [-1, f+1],
    i.e. up to one block on either side -> a 3x3 BLOCK kernel; the folded
    weights are 9/(9 f^2) sparse, so the MXU does f^2 x the FLOPs — the
    probe measures whether the fatter contraction dim still wins)."""
    kh, kw, c, o = w3.shape
    assert (kh, kw) == (3, 3)
    # [block_i, block_j, in_sub_i, in_sub_j, c, o, out_sub_i, out_sub_j]
    wf = np.zeros((3, 3, f, f, c, o, f, f), w3.dtype)
    for oi in range(f):
        for oj in range(f):
            for u in range(3):
                for v in range(3):
                    ai, aj = oi - 1 + u, oj - 1 + v
                    wf[ai // f + 1, aj // f + 1, ai % f, aj % f,
                       :, :, oi, oj] += w3[u, v]
    # input channel layout matches s2d(): (ii * f + ij) * c + cc
    return wf.reshape(3, 3, f * f * c, o * f * f)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=504)
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--check", action="store_true",
                   help="numerically verify the folded kernels (CPU ok)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    H, W = 80, 100
    C1 = 24

    def conv(x, w, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w1 = rng.standard_normal((3, 3, 1, C1)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((3, 3, C1, C1)).astype(np.float32) * 0.1

    if args.check:
        x = rng.standard_normal((2, H, W, 1)).astype(np.float32)
        y = np.asarray(conv(jnp.asarray(x), jnp.asarray(w1)))
        for f in (2, 4):
            wf = fold_kernel(w1, f)
            yf = np.asarray(conv(jnp.asarray(s2d(x, f)), jnp.asarray(wf),
                                 pad="SAME"))
            # un-fold: [B, H/f, W/f, C1*f*f] -> [B, H, W, C1]
            b, hf, wfd, _ = yf.shape
            yr = yf.reshape(b, hf, wfd, C1, f, f).transpose(
                0, 1, 4, 2, 5, 3).reshape(b, H, W, C1)
            # SAME padding on the folded grid pads f pixels worth of
            # context; interior must match exactly
            err = np.abs(yr[:, f:-f, f:-f] - y[:, f:-f, f:-f]).max()
            print(f"fold f={f}: interior max err {err:.2e}", file=sys.stderr)
            assert err < 1e-4
        print("fold correctness OK", file=sys.stderr)
        return {}

    out = {}
    for dtype in ("bfloat16", "float32"):
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        x1 = jnp.asarray(rng.standard_normal((args.batch, H, W, 1)), dt)
        xa = jnp.asarray(rng.standard_normal((args.batch, H, W, C1)), dt)
        variants = {
            "conv1_3x3x1": (x1, jnp.asarray(w1, dt)),
            "conv1_s2d2": (jnp.asarray(s2d(np.asarray(x1, np.float32), 2),
                                       dt),
                           jnp.asarray(fold_kernel(w1, 2), dt)),
            "conv1_s2d4": (jnp.asarray(s2d(np.asarray(x1, np.float32), 4),
                                       dt),
                           jnp.asarray(fold_kernel(w1, 4), dt)),
            "conv2_3x3x24": (xa, jnp.asarray(w2, dt)),
        }
        res = {}
        for name, (x, w) in variants.items():
            @jax.jit
            def scan_fn(x, w):
                def body(c, i):
                    # shift input per-iter so the loop body can't hoist
                    xi = jnp.roll(x, i, axis=1)
                    return c + conv(xi, w).astype(jnp.float32).sum(), 0
                return jax.lax.scan(body, 0.0, jnp.arange(args.reps))[0]

            float(scan_fn(x, w))
            t0 = time.perf_counter()
            float(scan_fn(x, w))
            dt_s = (time.perf_counter() - t0) / args.reps
            # real (unpadded) conv work per rep
            flops = 2 * args.batch * H * W * 9 * x.shape[-1] * w.shape[-1] \
                if "s2d" not in name else 2 * args.batch * H * W * 9 * C1
            res[name] = {"ms": round(dt_s * 1000, 3),
                         "eff_tflops": round(flops / dt_s / 1e12, 2)}
            print(f"  [{dtype}] {name:14} {res[name]['ms']:8.3f} ms  "
                  f"({res[name]['eff_tflops']} useful TF/s)",
                  file=sys.stderr)
        out[dtype] = res
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
