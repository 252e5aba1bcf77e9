#!/usr/bin/env python
"""Discriminative serving-accuracy sweep (VERDICT r3 #1).

The round-3 accuracy gate saturated (60/60 on every arm), proving nothing
about how far each fast serving recipe sits from the accuracy cliff. This
sweep makes the evidence discriminative:

  * HARD corpus: >=300 confusable pieces (shared motif bank, transposed
    copies, near-duplicates — data/synthetic.make_confusable_piece_list):
    local windows recur across pieces, so snippet votes must integrate
    piece-level structure;
  * difficulty axis: excerpts_per_query 100 -> 25 -> 5 (the reference
    protocol uses 100, audio_sheet_server.py:216) and BOTH gallery
    constructions (onset-aligned like initialize_sheet_db, and stride
    context//4 windows like initialize_sheet_db_from_imges);
  * arms: f32-highest (strict parity), f32-high (shipped default), bf16
    (fast serving), each at the rank-agreement-gated u16 spec upload,
    plus the u8 minimum-wire opt-in on the fast arms;
  * reported per cell: rank<=1, rank<=5, and the SIGNED VOTE-MARGIN
    distribution (true-piece votes minus best impostor; <=0 = lost/tied)
    — the margin locates the distance to the decision boundary even
    where rank counts still saturate.

Usage: python scripts/accuracy_sweep.py [--n_pieces 300] [--out FILE]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# (compute_dtype, conv_precision) -> wire arms (spec quantize bits)
LADDER = [
    ("f32-highest", "float32", "highest", (16,)),
    ("f32-high", "float32", "high", (16, 8)),
    ("bf16", "bfloat16", "default", (16, 8)),
]
# (excerpts_per_query, queries_per_piece)
DIFFICULTY = [(100, 1), (25, 2), (5, 3)]
MODES = ("onset", "stride")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_pieces", type=int, default=300)
    p.add_argument("--n_onsets", type=int, default=120)
    p.add_argument("--seed", type=int, default=31)
    p.add_argument("--out", default=None, help="JSON dump path")
    args = p.parse_args(argv)

    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.data import synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.retrieval.accuracy import (
        build_piece_gallery,
        piece_id_accuracy,
    )
    from audio_sheet_retrieval_tpu.utils import io as uio
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    cfg0 = get_model_config("mutopia_ccal_cont_rsz")
    ckpt = os.path.join(os.path.dirname(assets.tutorial_checkpoint_path()),
                        "synth_serving_ckpt.pkl")
    params = uio.load_pytree(ckpt, like=cca_model.init_model(
        jax.random.PRNGKey(0), cfg0))

    images, specs, o2cs, kinds = synthetic.make_confusable_piece_list(
        args.seed, args.n_pieces, n_onsets=args.n_onsets)
    te_specs = [sp[0] for sp in specs]
    coords = [oc[0][:, 1] for oc in o2cs]
    from collections import Counter

    print(f"corpus: {args.n_pieces} pieces ({dict(Counter(kinds))}), "
          f"{args.n_onsets} onsets each", file=sys.stderr)

    results = {}
    for base, dtype, prec, qbits_arms in LADDER:
        cfg = dataclasses.replace(cfg0, compute_dtype=dtype,
                                  conv_precision=prec)
        for mode in MODES:
            t0 = time.time()
            gallery = build_piece_gallery(
                params, cfg, images,
                coords=coords if mode == "onset" else None)
            print(f"{base:12s} {mode:6s}: gallery "
                  f"{gallery.n} rows ({time.time() - t0:.0f}s)",
                  file=sys.stderr)
            for qbits in qbits_arms:
                label = f"{base}+u{qbits}"
                for epq, qpp in DIFFICULTY:
                    t0 = time.time()
                    acc = piece_id_accuracy(
                        params, cfg, images, te_specs,
                        queries_per_piece=qpp, excerpts_per_query=epq,
                        quantize=qbits, gallery=gallery)
                    m = np.asarray(acc.pop("margins"))
                    errors = int((m <= 0).sum())
                    cell = {
                        "rank1": acc["rank1"], "rank5": acc["rank5"],
                        "n": acc["n"], "errors": errors,
                        "margin_min": acc["margin_min"],
                        "margin_p10": acc["margin_p10"],
                        "margin_p50": acc["margin_p50"],
                    }
                    results[f"{label}|{mode}|e{epq}"] = cell
                    print(f"{label:16s} {mode:6s} e={epq:3d}: "
                          f"rank<=1 {acc['rank1']}/{acc['n']} "
                          f"rank<=5 {acc['rank5']}/{acc['n']} "
                          f"margin min/p10/p50 {acc['margin_min']}/"
                          f"{acc['margin_p10']:.0f}/{acc['margin_p50']:.0f} "
                          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    out = {"n_pieces": args.n_pieces, "n_onsets": args.n_onsets,
           "seed": args.seed, "cells": results}
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(out, fp, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
