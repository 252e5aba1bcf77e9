#!/usr/bin/env python
"""Backward-pass structure probe (follow-up to train_probe: backward is
62-72% of the update and the whitening chain is measured negligible).

Hypothesis under test: max-pool backward (XLA SelectAndScatter — scatter
lowers pathologically on TPU, cf. the RLE-decode design notes) dominates
the conv-stack backward. Measures value_and_grad wall time per variant of
the view-1 encoder stack (batch 100, bf16 and f32), all as 50-rep fused
scans:

  fwd_only       forward encoder stack
  grad_full      value_and_grad of the standard stack (max pools)
  grad_avgpool   same stack with AVG pools (reduce_window add — cheap
                 adjoint) — isolates the SelectAndScatter cost
  grad_stride2   pools replaced by stride-2 convs (same channel plan)

Usage: python scripts/bwd_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import encoder as enc
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    B, H, W = 100, 80, 100
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    n_reps = 50

    def stack(params, x, dt, pool):
        h = x
        for i, blk in enumerate(params["blocks"]):
            stride = (2, 2) if pool == "stride2" and i % 2 == 1 \
                and i < enc.N_CONV_BLOCKS - 1 else (1, 1)
            f32 = dt == jnp.float32
            h = jax.lax.conv_general_dilated(
                h.astype(dt), blk["w"].astype(dt), stride,
                "SAME" if blk["w"].shape[0] == 3 else "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32 if f32 else None,
                precision=(jax.lax.Precision.HIGHEST if f32
                           else jax.lax.Precision.DEFAULT))
            h = h.astype(jnp.float32)
            h = (h - blk["mean"]) * (blk["inv_std"] * blk["gamma"]) \
                + blk["beta"]
            if i < enc.N_CONV_BLOCKS - 1:
                h = jax.nn.elu(h)
                if i % 2 == 1 and pool != "stride2":
                    red = (jax.lax.max if pool == "max" else jax.lax.add)
                    init = -jnp.inf if pool == "max" else 0.0
                    h = jax.lax.reduce_window(
                        h, init, red, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                    if pool == "avg":
                        h = h * 0.25
        return jnp.mean(h, axis=(1, 2))

    import jax.random as jr

    params = enc.init_encoder(jr.PRNGKey(0), 1, 24, 32)

    out = {}
    for dname, dt in (("bfloat16", jnp.bfloat16), ("float32", jnp.float32)):
        res = {}

        def run(name, fn):
            @jax.jit
            def scan_fn(p, x):
                def body(c, i):
                    xi = jnp.roll(x, i, axis=2)
                    return c + fn(p, xi), 0
                return jax.lax.scan(body, 0.0, jnp.arange(n_reps))[0]

            float(scan_fn(params, x))
            t0 = time.perf_counter()
            float(scan_fn(params, x))
            ms = (time.perf_counter() - t0) / n_reps * 1000
            res[name] = round(ms, 3)
            print(f"  [{dname}] {name:14} {ms:7.3f} ms", file=sys.stderr)

        run("fwd_only", lambda p, xi: stack(p, xi, dt, "max").sum())
        for pool in ("max", "avg", "stride2"):
            def g(p, xi, pool=pool):
                def loss(p_):
                    return stack(p_, xi, dt, pool).sum()
                val, grads = jax.value_and_grad(loss)(p)
                return val + sum(a.astype(jnp.float32).sum()
                                 for a in jax.tree.leaves(grads))
            run(f"grad_{pool}", g)
        out[dname] = res
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
