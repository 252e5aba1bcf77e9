#!/usr/bin/env python
"""Full-schedule convergence rehearsal (VERDICT r4 weak #4 / next #4).

The shipped training schedule — patience 15 (cont) / 30 (rsz), up to 10/5
refinement restarts at lr*0.5, <=1000-epoch envelope (reference
mutopia_ccal_cont.py:23-29, train_dcca_pool.py:492-529) — had only been
unit/integration tested at 25-epoch scale. This driver rehearses the real
envelope end-to-end on the largest synthetic corpus this host holds:

  1. one uninterrupted run per model variant (cont + rsz) through the
     EXACT shipped schedule via the real CLI (cli/run_train.py), f32
     (the reference's dtype), device-resident data;
  2. a kill twin of the cont run: the same command is SIGKILLed once its
     results curve shows the run inside refinement phase >= 3 (lr <=
     ini * 0.5^3), then resumed with --resume (full fit-state snapshot);
  3. verification that the resumed twin's final curves and params are
     BIT-IDENTICAL to the uninterrupted run — the mid-refinement resume
     invariant at full scale.

Observables per run: epochs executed, refinement restarts observed
(distinct lr drops in the curve), best validation MRR, wall time.
Prints one JSON line; curves stay in the workdir for RESULTS.md.

Usage: python scripts/schedule_rehearsal.py [--n_train_pieces 60]
           [--variants cont,rsz] [--kill] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANT_MODELS = {"cont": "mutopia_ccal_cont", "rsz": "mutopia_ccal_cont_rsz"}


def _results_path(exp_root, model, split_file, cfg_yaml):
    from audio_sheet_retrieval_tpu import config as cfg_mod

    tag = cfg_mod.compile_tag(split_file, cfg_yaml)
    return os.path.join(exp_root, model, f"results_{tag}.pkl"), tag


def _load_curves(path):
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as fp:
            obj = pickle.load(fp)
        return obj.get("curves", obj) if isinstance(obj, dict) else obj
    except Exception:
        return None  # mid-write


def refinements_seen(curves) -> int:
    """Number of refinement restarts so far = distinct lr drops."""
    if not curves or not curves.get("lr"):
        return 0
    lrs = np.asarray(curves["lr"], np.float64)
    return int(np.sum(np.diff(lrs) < 0))


def run_variant(cmd, env, log_path, *, kill_at_refinement=None,
                poll_results=None, timeout_s=7200):
    """Run one training subprocess. With ``kill_at_refinement`` set, poll
    the results curve and SIGKILL the process the first epoch the lr
    curve shows >= that many refinement drops; returns (rc, killed_epoch).
    """
    killed_epoch = None
    with open(log_path, "ab") as logf:
        proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                                env=env)
        t0 = time.time()
        while proc.poll() is None:
            time.sleep(5.0)
            if time.time() - t0 > timeout_s:
                proc.kill()
                proc.wait()
                raise RuntimeError(f"run exceeded {timeout_s}s: {cmd}")
            if kill_at_refinement is not None:
                curves = _load_curves(poll_results)
                if curves and refinements_seen(curves) >= kill_at_refinement:
                    killed_epoch = len(curves["lr"])
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    return -9, killed_epoch
        return proc.returncode, killed_epoch


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_train_pieces", type=int, default=60)
    p.add_argument("--n_valid_pieces", type=int, default=12)
    p.add_argument("--n_performances", type=int, default=2)
    p.add_argument("--n_onsets", type=int, default=200)
    p.add_argument("--seed", type=int, default=31)
    p.add_argument("--variants", default="cont,rsz")
    p.add_argument("--kill", action="store_true",
                   help="also run the SIGKILL-inside-refinement>=3 twin "
                        "of the first variant and verify bit-identity")
    p.add_argument("--kill_at_refinement", type=int, default=3)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="cap the envelope (default: the shipped 1000)")
    p.add_argument("--workdir", default=None)
    p.add_argument("--config", default="mutopia_full_aug")
    args = p.parse_args(argv)

    import importlib.util
    import tempfile

    spec = importlib.util.spec_from_file_location(
        "asr_full_protocol",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "full_protocol.py"))
    fp_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fp_mod)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = args.workdir or tempfile.mkdtemp(prefix="schedule_rehearsal_")
    os.makedirs(work, exist_ok=True)
    npz_dir = os.path.join(work, "npz")
    cfg_yaml = os.path.join(repo, "exp_configs", f"{args.config}.yaml")

    print(f"workdir: {work}", file=sys.stderr)
    split_file = os.path.join(npz_dir, "all_split.yaml")
    if not os.path.exists(split_file):
        print("[1] exporting synthetic corpus", file=sys.stderr)
        split_file = fp_mod.export_synthetic_npz(
            npz_dir, args.seed, args.n_train_pieces, args.n_valid_pieces,
            4, args.n_performances, args.n_onsets)

    env = dict(os.environ)
    base_cmd = [sys.executable, "-m",
                "audio_sheet_retrieval_tpu.cli.run_train",
                "--data", f"npz:{npz_dir}", "--train_split", split_file,
                "--config", cfg_yaml, "--seed", str(args.seed),
                "--compute_dtype", "float32"]
    if args.max_epochs is not None:
        base_cmd += ["--max_epochs", str(args.max_epochs)]

    out = {"workdir": work, "runs": {}}
    variants = [v for v in args.variants.split(",") if v]
    for vi, variant in enumerate(variants):
        model = VARIANT_MODELS[variant]
        exp_root = os.path.join(work, f"exp_{variant}")
        res_path, tag = _results_path(exp_root, model, split_file, cfg_yaml)
        cmd = base_cmd + ["--model", model, "--exp_root", exp_root]
        print(f"[2] uninterrupted {variant} run (shipped schedule)",
              file=sys.stderr)
        t0 = time.time()
        rc, _ = run_variant(cmd, env, os.path.join(work, f"{variant}.log"))
        wall = time.time() - t0
        assert rc == 0, f"{variant} run failed rc={rc} (see {variant}.log)"
        curves = _load_curves(res_path)
        row = {
            "epochs": len(curves["lr"]),
            "refinements": refinements_seen(curves),
            "best_map_va": round(float(np.max(curves["map_val"])), 4),
            "final_lr": float(curves["lr"][-1]),
            "wall_s": round(wall, 1),
            "results": res_path,
        }
        out["runs"][variant] = row
        print(f"  {variant}: {row['epochs']} epochs, "
              f"{row['refinements']} refinement restarts, best MRR "
              f"{row['best_map_va']:.3f} ({wall / 60:.1f} min)",
              file=sys.stderr)

        if args.kill and vi == 0:
            print(f"[3] kill twin of {variant}: SIGKILL inside refinement "
                  f">= {args.kill_at_refinement}, then --resume",
                  file=sys.stderr)
            assert row["refinements"] >= args.kill_at_refinement, (
                "uninterrupted run saw fewer refinements than the kill "
                "trigger — raise corpus difficulty or lower "
                "--kill_at_refinement")
            exp_kill = os.path.join(work, f"exp_{variant}_kill")
            res_kill, _ = _results_path(exp_kill, model, split_file,
                                        cfg_yaml)
            kcmd = base_cmd + ["--model", model, "--exp_root", exp_kill]
            rc, killed_epoch = run_variant(
                kcmd, env, os.path.join(work, f"{variant}_kill.log"),
                kill_at_refinement=args.kill_at_refinement,
                poll_results=res_kill)
            assert rc == -9 and killed_epoch is not None, (
                "kill twin finished before reaching refinement "
                f">= {args.kill_at_refinement} (rc={rc})")
            print(f"  killed at epoch ~{killed_epoch}; resuming",
                  file=sys.stderr)
            rc, _ = run_variant(
                kcmd + ["--resume"], env,
                os.path.join(work, f"{variant}_kill.log"))
            assert rc == 0, f"resume failed rc={rc}"

            ref = _load_curves(res_path)
            got = _load_curves(res_kill)
            curves_equal = all(
                np.array_equal(np.asarray(ref[k], np.float64),
                               np.asarray(got[k], np.float64))
                for k in ("map_val", "pred_tr_err", "lr", "rank_val"))
            with open(os.path.join(exp_root, model,
                                   f"params_{tag}.pkl"), "rb") as fa, \
                    open(os.path.join(exp_kill, model,
                                      f"params_{tag}.pkl"), "rb") as fb:
                params_equal = fa.read() == fb.read()
            out["kill_twin"] = {
                "variant": variant, "killed_epoch": killed_epoch,
                "curves_bit_identical": bool(curves_equal),
                "params_bit_identical": bool(params_equal),
            }
            print(f"  resumed == uninterrupted: curves "
                  f"{curves_equal}, params {params_equal}",
                  file=sys.stderr)
            assert curves_equal and params_equal, \
                "mid-refinement resume diverged from the uninterrupted run"

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
