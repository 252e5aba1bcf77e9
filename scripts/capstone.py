"""MSMD-scale capstone: full training schedule + reference eval protocol
on the synthetic corpus (200 pieces x 3 performances, ~108k entities).

Reproduces the RESULTS.md capstone and serves as the accuracy A/B harness
for compute-dtype / whitening choices (ROADMAP #8):

    python scripts/capstone.py --compute_dtype bfloat16
    python scripts/capstone.py --compute_dtype float32

Prints one JSON line with val MRR and held-out snippet-retrieval metrics
(S2A / A2S, with and without the 25k-sample CCA refinement), mirroring the
reference protocol (train_dcca_pool.py eval + refine_cca.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--whitening", default="polar", choices=["polar", "eigh"])
    p.add_argument("--cca_grad", default="full",
                   choices=["full", "projection"])
    p.add_argument("--n_train_pieces", type=int, default=200)
    p.add_argument("--n_eval_pieces", type=int, default=20)
    p.add_argument("--max_epochs", type=int, default=40)
    p.add_argument("--n_test", type=int, default=2000)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--save_ckpt", default=None,
                   help="save the best params pytree to this path")
    p.add_argument("--serving_ab", action="store_true",
                   help="after training, measure GROUND-TRUTH piece-ID "
                        "accuracy of the fused spec serving path at f32 "
                        "vs bf16 on the held-out pieces (VERDICT r2 #2)")
    args = p.parse_args(argv)

    import dataclasses

    import jax

    from audio_sheet_retrieval_tpu.data import device_pool as dpool
    from audio_sheet_retrieval_tpu.data import pools, synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import cca as cca_ops
    from audio_sheet_retrieval_tpu.ops.metrics import eval_retrieval
    from audio_sheet_retrieval_tpu.train import engine
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype,
                              whitening=args.whitening,
                              cca_grad=args.cca_grad,
                              max_epochs=args.max_epochs)

    t0 = time.time()
    tr = synthetic.make_piece_list(args.seed, args.n_train_pieces,
                                   n_performances=3, n_onsets=200)
    va = synthetic.make_piece_list(args.seed + 1, args.n_eval_pieces,
                                   n_onsets=200)
    te = synthetic.make_piece_list(args.seed + 2, args.n_eval_pieces,
                                   n_performances=1, n_onsets=200)
    data = {
        "train": dpool.DevicePool(*tr, data_augmentation=pools.FULL_AUGMENT,
                                  rng=np.random.default_rng(args.seed)),
        "valid": dpool.DevicePool(*va, data_augmentation=pools.NO_AUGMENT,
                                  shuffle=False,
                                  rng=np.random.default_rng(args.seed + 1)),
    }
    n_entities = data["train"].shape[0]
    print(f"corpus: {n_entities} train entities "
          f"({time.time() - t0:.0f}s build)", file=sys.stderr)

    params = cca_model.init_model(jax.random.PRNGKey(args.seed), cfg)
    tr_it = dpool.DeviceBatchIterator(batch_size=cfg.batch_size,
                                      k_samples=cfg.k_samples)
    va_it = dpool.DeviceBatchIterator(batch_size=cfg.batch_size,
                                      shuffle=False, train=False)
    import tempfile

    t0 = time.time()
    best, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                                out_path=tempfile.mkdtemp(prefix="capstone_"),
                                verbose=False)
    train_secs = time.time() - t0
    print(f"trained in {train_secs:.0f}s, best val MRR {best_map:.3f}",
          file=sys.stderr)

    # held-out snippet retrieval (reference protocol: n_test samples,
    # both directions, then the 25k large-batch CCA refinement)
    test_pool = dpool.DevicePool(*te, data_augmentation=pools.NO_AUGMENT,
                                 shuffle=False,
                                 rng=np.random.default_rng(args.seed + 2))
    emb = dpool.make_embed_runner(cfg, test_pool)
    n_test = min(args.n_test, test_pool.shape[0])
    bs = cfg.batch_size
    nb = int(np.ceil(n_test / bs))
    idx = (np.arange(nb * bs) % test_pool.shape[0]).reshape(nb, bs)
    lv1, lv2, _ = emb(best, test_pool._order[idx])
    lv1 = np.asarray(lv1)[:n_test]
    lv2 = np.asarray(lv2)[:n_test]

    def metrics(a, b):
        _, med, _, hits, mrr = eval_retrieval(a, b)
        return {"R@1": hits[1] / len(a), "R@25": hits[25] / len(a),
                "MRR": mrr, "med_rank": med}

    out = {
        "dtype": args.compute_dtype, "whitening": args.whitening,
        "cca_grad": args.cca_grad,
        "entities": int(n_entities), "train_secs": round(train_secs, 1),
        "val_mrr": round(float(best_map), 4),
        "s2a": metrics(lv1, lv2), "a2s": metrics(lv2, lv1),
    }

    # 25k-sample CCA refinement on train embeddings (refine_cca.py protocol)
    emb_tr = dpool.make_embed_runner(cfg, data["train"])
    n_ref = min(25000, data["train"].shape[0])
    nb = int(np.ceil(n_ref / bs))
    idx = (np.arange(nb * bs) % data["train"].shape[0]).reshape(nb, bs)
    h1, h2, _ = emb_tr(best, data["train"]._order[idx])
    res = cca_ops.cca_fit(np.asarray(h1)[:n_ref], np.asarray(h2)[:n_ref],
                          method="svd")
    r1 = np.asarray(cca_ops.cca_transform_v1(res, lv1))
    r2 = np.asarray(cca_ops.cca_transform_v2(res, lv2))
    out["s2a_refined"] = metrics(r1, r2)
    out["a2s_refined"] = metrics(r2, r1)

    # serving checkpoint = trained weights + the refined projection written
    # back into the CCA head, the reference's exact deployment protocol
    # (refine_cca.py:86-107 fits on PRE-CCA latents and rewrites
    # U/V/means — fitting on post-CCA embeddings and writing into the
    # pre-CCA layer would apply the projection in the wrong space)
    import jax.numpy as jnp

    assemble_eval = data["train"]._assemble[False]

    @jax.jit
    def run_pre(params_, strip, spec, cmat, omat, key):
        def body(k, inputs):
            k, sub = jax.random.split(k)
            x1, x2 = assemble_eval(strip, spec, inputs[0], inputs[1], sub)
            h1 = cca_model.pre_cca_latent_v1(
                params_, engine.prepare_view1_device(x1, cfg), cfg)
            h2 = cca_model.pre_cca_latent_v2(
                params_, engine.prepare_view2_device(x2), cfg)
            return k, (h1, h2)

        _, (h1s, h2s) = jax.lax.scan(body, key, (cmat, omat))
        return (h1s.reshape(-1, h1s.shape[-1]),
                h2s.reshape(-1, h2s.shape[-1]))

    tr_pool = data["train"]
    ent = tr_pool._order[idx]  # same first-n_ref sample set as emb_tr above
    ph1, ph2 = run_pre(
        best, tr_pool.strip, tr_pool.spec,
        tr_pool._put(tr_pool.entity_coords[ent], matrix=True),
        tr_pool._put(tr_pool.entity_onsets[ent], matrix=True),
        jax.random.PRNGKey(7))
    res_pre = cca_ops.cca_fit(np.asarray(ph1)[:n_ref],
                              np.asarray(ph2)[:n_ref], method="svd")
    refined = best._replace(cca=best.cca._replace(
        U=jnp.asarray(res_pre.U, jnp.float32),
        V=jnp.asarray(res_pre.V, jnp.float32),
        mean1=jnp.asarray(res_pre.m1, jnp.float32),
        mean2=jnp.asarray(res_pre.m2, jnp.float32)))

    if args.save_ckpt:
        from audio_sheet_retrieval_tpu.utils import io as uio

        uio.save_pytree(args.save_ckpt, refined,
                        meta={"source": "scripts/capstone.py",
                              "seed": args.seed, "refined": True,
                              "dtype": args.compute_dtype})
        print(f"checkpoint (refined) -> {args.save_ckpt}", file=sys.stderr)

    if args.serving_ab:
        # ground-truth serving A/B: same trained weights, same held-out
        # pieces, fused spec piece-ID queries at f32 vs bf16 (gallery
        # build AND query both run at the arm's dtype)
        from audio_sheet_retrieval_tpu.retrieval.accuracy import (
            piece_id_accuracy,
        )

        # the reference detect_score protocol exactly: 100 linspace
        # excerpts over the WHOLE piece, 25 candidates, vote — one query
        # per piece over >=50 held-out pieces (VERDICT r2 #2)
        ab = synthetic.make_piece_list(args.seed + 3, 60,
                                       n_performances=1, n_onsets=200)
        ab_specs = [sp[0] for sp in ab[1]]
        ab_coords = [oc[0][:, 1] for oc in ab[2]]  # onset-aligned gallery
        out["serving_ab"] = {}
        for dt in ("float32", "bfloat16"):
            acc = piece_id_accuracy(
                refined, dataclasses.replace(cfg, compute_dtype=dt),
                ab[0], ab_specs, coords=ab_coords, queries_per_piece=1,
                excerpts_per_query=100)
            acc.pop("ranks", None)  # per-query detail is the sweep's job
            out["serving_ab"][dt] = acc
            print(f"serving piece-ID [{dt}]: rank<=1 {acc['rank1']}/"
                  f"{acc['n']}, rank<=5 {acc['rank5']}/{acc['n']}",
                  file=sys.stderr)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
