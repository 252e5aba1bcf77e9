#!/usr/bin/env python
"""Train-step time decomposition (VERDICT r2 #4) — where does an update go?

Mirrors the serving ceiling decomposition (scripts/ceiling_probe.py) for the
training hot loop (reference:utils/train_dcca_pool.py:198-232): the fused
scanned epoch (assemble + forward + CCA + ranking loss + backward + Adam,
data/device_pool.make_epoch_runner) is ablated into nested prefixes, each
run as ONE scanned dispatch over the same batch indices:

  A      assembly only (entity gather + on-device augmentation)
  B1/B2  A + view1 / view2 encoder forward (pre-CCA latents)
  Bcca   A + full forward incl. CCA whitening + L2 norm
  Bloss  Bcca + ranking objective (the full loss, value only)
  C      value_and_grad of the full loss (adds the backward pass)
  D      the real train step (C + Adam update + BN state swap)

Derived per-component costs: assembly=A, fwd_v1=B1-A, fwd_v2=B2-A,
cca=Bcca-B1-B2+A, loss=Bloss-Bcca, backward=C-Bloss, adam=D-C. XLA fuses
across stage boundaries, so the differences are an ablation decomposition,
not exact kernel times — same caveat as the ceiling probe.

Usage: python scripts/train_probe.py [--dtype float32|bfloat16|both]
                                     [--batches N] [--repeats R]
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
    p.add_argument("--dtype", default="both",
                   choices=["float32", "bfloat16", "both"])
    p.add_argument("--batches", type=int, default=100)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=None,
                   help="override the model batch size (schedule parity is "
                        "100; larger batches amortize the fixed per-step "
                        "costs -> report samples/s scaling)")
    p.add_argument("--only_step", action="store_true",
                   help="measure only the full D_step variant (cheap for "
                        "batch-size sweeps)")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from audio_sheet_retrieval_tpu.data import device_pool as dpool
    from audio_sheet_retrieval_tpu.data import pools, synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import losses
    from audio_sheet_retrieval_tpu.train import state as ts
    from audio_sheet_retrieval_tpu.train.engine import (
        prepare_view1_device,
        prepare_view2_device,
    )
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    base_cfg = get_model_config("mutopia_ccal_cont_rsz")
    if args.batch_size:
        base_cfg = dataclasses.replace(base_cfg, batch_size=args.batch_size)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    tr = synthetic.make_piece_list(7, 8, n_onsets=120)
    pool = dpool.DevicePool(*tr, data_augmentation=pools.FULL_AUGMENT,
                            rng=np.random.default_rng(0))
    n_b = args.batches

    def probe(cfg):
        assemble = pool._assemble[True]
        params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
        optimizer = ts.make_optimizer(cfg.ini_learning_rate)
        state = ts.init_train_state(params, cfg, optimizer)
        loss_weight = 1.0 - cfg.weight_tno

        def prep(strip, spec, coords, onsets, key):
            x1, x2 = assemble(strip, spec, coords, onsets, key)
            return prepare_view1_device(x1, cfg), prepare_view2_device(x2)

        def full_loss(trainable, non_trainable, x1p, x2p):
            params_ = ts.merge_params(trainable, non_trainable, cfg)
            lv1, lv2, new_params, corr = cca_model.forward_train(
                params_, x1p, x2p, cfg)
            obj = losses.contrastive_cos_loss(
                lv1, lv2, weight=loss_weight, gamma=cfg.gamma)
            obj = obj - jnp.mean(corr) * cfg.weight_tno
            if cfg.l2:
                obj = obj + cfg.l2 * ts.l2_penalty(trainable)
            return obj, new_params

        # each variant: carry (state, key), consume one batch, emit a scalar
        def v_assemble(st, x1p, x2p):
            return st, x1p.astype(jnp.float32).sum() + \
                x2p.astype(jnp.float32).sum()

        def v_fwd1(st, x1p, x2p):
            p_ = ts.merge_params(st.trainable, st.non_trainable, cfg)
            return st, cca_model.pre_cca_latent_v1(
                p_, x1p, cfg).astype(jnp.float32).sum()

        def v_fwd2(st, x1p, x2p):
            p_ = ts.merge_params(st.trainable, st.non_trainable, cfg)
            return st, cca_model.pre_cca_latent_v2(
                p_, x2p, cfg).astype(jnp.float32).sum()

        def v_cca(st, x1p, x2p):
            p_ = ts.merge_params(st.trainable, st.non_trainable, cfg)
            lv1, lv2, _, corr = cca_model.forward_train(p_, x1p, x2p, cfg)
            return st, (lv1.astype(jnp.float32).sum()
                        + lv2.astype(jnp.float32).sum() + corr.sum())

        def v_loss(st, x1p, x2p):
            obj, _ = full_loss(st.trainable, st.non_trainable, x1p, x2p)
            return st, obj

        def v_grad(st, x1p, x2p):
            (obj, _), grads = jax.value_and_grad(
                full_loss, has_aux=True)(st.trainable, st.non_trainable,
                                         x1p, x2p)
            leaves = jax.tree.leaves(grads)
            return st, obj + sum(g.astype(jnp.float32).sum()
                                 for g in leaves)

        def v_grad_sg(st, x1p, x2p):
            """value_and_grad with the whitening chain CUT from backward:
            project with the stop_gradient'ed state the layer emits (the
            forward whitening still runs; dU/dH, dV/dH do not)."""
            from audio_sheet_retrieval_tpu.models import encoder as enc_mod
            from audio_sheet_retrieval_tpu.ops import cca as cca_ops

            dtj = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
                else jnp.float32

            def loss_sg(trainable):
                params_ = ts.merge_params(trainable, st.non_trainable, cfg)
                h1, _ = enc_mod.encoder_apply(
                    params_.view1, x1p, train=True, compute_dtype=dtj,
                    bn_epsilon=cfg.bn_epsilon, bn_alpha=cfg.bn_alpha)
                h2, _ = enc_mod.encoder_apply(
                    params_.view2, x2p, train=True, compute_dtype=dtj,
                    bn_epsilon=cfg.bn_epsilon, bn_alpha=cfg.bn_alpha)
                whit = cfg.whitening if cfg.weight_tno == 0.0 else "eigh"
                _, _, ncca, _ = cca_ops.cca_layer_train(
                    h1, h2, params_.cca, r1=cfg.r1, r2=cfg.r2, rT=cfg.rT,
                    alpha=cfg.alpha, whitening=whit)
                lv1 = cca_model.length_norm((h1 - ncca.mean1).dot(ncca.U))
                lv2 = cca_model.length_norm((h2 - ncca.mean2).dot(ncca.V))
                obj = losses.contrastive_cos_loss(
                    lv1, lv2, weight=loss_weight, gamma=cfg.gamma)
                if cfg.l2:
                    obj = obj + cfg.l2 * ts.l2_penalty(trainable)
                return obj

            obj, grads = jax.value_and_grad(loss_sg)(st.trainable)
            return st, obj + sum(g.astype(jnp.float32).sum()
                                 for g in jax.tree.leaves(grads))

        def v_step(st, x1p, x2p):
            (obj, new_params), grads = jax.value_and_grad(
                full_loss, has_aux=True)(st.trainable, st.non_trainable,
                                         x1p, x2p)
            updates, opt_state = optimizer.update(grads, st.opt_state,
                                                  st.trainable)
            new_trainable = optax.apply_updates(st.trainable, updates)
            _, new_nt = ts.split_params(new_params, cfg)
            return ts.TrainState(new_trainable, new_nt, opt_state,
                                 st.step + 1), obj

        variants = {"A_assemble": v_assemble, "B1_fwd_v1": v_fwd1,
                    "B2_fwd_v2": v_fwd2, "Bcca_forward": v_cca,
                    "Bloss_loss": v_loss, "C_grad": v_grad,
                    "C2_grad_stopUV": v_grad_sg, "D_step": v_step}
        if args.only_step:
            variants = {"D_step": v_step}

        idx = (np.arange(n_b * cfg.batch_size) % pool.shape[0]).reshape(
            n_b, cfg.batch_size)
        coords = pool._put(pool.entity_coords[idx], matrix=True)
        onsets = pool._put(pool.entity_onsets[idx], matrix=True)

        times = {}
        for name, fn in variants.items():
            @jax.jit
            def scan_fn(st, strip, spec, cmat, omat, key, fn=fn):
                def body(carry, inputs):
                    s_, k = carry
                    k, sub = jax.random.split(k)
                    x1p, x2p = prep(strip, spec, inputs[0], inputs[1], sub)
                    s_, out = fn(s_, x1p, x2p)
                    return (s_, k), out
                (s_, _), outs = jax.lax.scan(body, (st, key), (cmat, omat))
                return outs.sum()

            a = (state, pool.strip, pool.spec, coords, onsets,
                 jax.random.PRNGKey(1))
            float(scan_fn(*a))  # compile + warm
            best = np.inf
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(scan_fn(*a))
                best = min(best, time.perf_counter() - t0)
            times[name] = best / n_b * 1000  # ms per update
            print(f"  {name:14} {times[name]:7.3f} ms/update",
                  file=sys.stderr)

        t = times
        if args.only_step:
            total = t["D_step"]
            sps = cfg.batch_size * 1000.0 / total
            print(f"  batch {cfg.batch_size}: {total:.2f} ms/update, "
                  f"{1000.0 / total:.1f} ups, {sps:,.0f} samples/s",
                  file=sys.stderr)
            return {"raw_ms": {k: round(v, 4) for k, v in t.items()},
                    "batch_size": cfg.batch_size,
                    "samples_per_s": round(sps, 1),
                    "updates_per_s": round(1000.0 / total, 1)}
        comp = {
            "assembly": t["A_assemble"],
            "fwd_v1": t["B1_fwd_v1"] - t["A_assemble"],
            "fwd_v2": t["B2_fwd_v2"] - t["A_assemble"],
            "cca_whiten_norm": (t["Bcca_forward"] - t["B1_fwd_v1"]
                                - t["B2_fwd_v2"] + t["A_assemble"]),
            "ranking_loss": t["Bloss_loss"] - t["Bcca_forward"],
            "backward": t["C_grad"] - t["Bloss_loss"],
            "backward_whitening_chain": t["C_grad"] - t["C2_grad_stopUV"],
            "adam_update": t["D_step"] - t["C_grad"],
        }
        total = t["D_step"]
        print(f"  components (of {total:.2f} ms total, "
              f"{1000.0 / total:.1f} ups):", file=sys.stderr)
        for k, v in comp.items():
            print(f"    {k:16} {v:7.3f} ms  {100 * v / total:5.1f}%",
                  file=sys.stderr)
        return {"raw_ms": {k: round(v, 4) for k, v in t.items()},
                "components_ms": {k: round(v, 4) for k, v in comp.items()},
                "updates_per_s": round(1000.0 / total, 1)}

    out = {}
    for dt in (["float32", "bfloat16"] if args.dtype == "both"
               else [args.dtype]):
        print(f"[{dt}] batch {base_cfg.batch_size}, {n_b}-step fused scan",
              file=sys.stderr)
        out[dt] = probe(dataclasses.replace(base_cfg, compute_dtype=dt))
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
