"""The reference's full experiment workflow through the real CLI entry
points (train -> eval -> refine_cca -> eval --estimate_UV), mirroring
train_models.sh / eval_models.sh on the synthetic corpus with a tiny
registered model. This is the coverage for cli/run_train.py,
cli/run_eval.py and cli/refine_cca.py as CLIs (the engine itself is
covered by tests/test_train.py)."""

import dataclasses
import os

import numpy as np
import pytest
import yaml

from audio_sheet_retrieval_tpu.models import configs


@pytest.fixture()
def tiny_model(monkeypatch):
    cfg = configs.get_model_config(
        "mutopia_ccal_cont_rsz", num_filters=4, dim_latent=8, batch_size=8,
        k_samples=32, patience=0, refinement_steps=1, refinement_patience=0,
        max_epochs=2)
    cfg = dataclasses.replace(cfg, name="tiny_test")
    monkeypatch.setitem(configs.MODEL_REGISTRY, "tiny_test", cfg)
    return cfg


@pytest.mark.slow
def test_train_eval_refine_eval_workflow(tiny_model, tmp_path, capsys):
    from audio_sheet_retrieval_tpu.cli import refine_cca, run_eval, run_train

    exp_root = str(tmp_path)
    common = ["--model", "tiny_test", "--data", "synthetic",
              "--exp_root", exp_root]

    # 1) train (device-resident data path, dump params + results)
    run_train.main(common + ["--seed", "3"])
    params_file = os.path.join(exp_root, "tiny_test", "params.pkl")
    results_file = os.path.join(exp_root, "tiny_test", "results.pkl")
    assert os.path.exists(params_file) and os.path.exists(results_file)

    # 2) eval the trained checkpoint, dump the yaml
    run_eval.main(common + ["--dump_results", "--n_test", "64"])
    eval_yaml = os.path.join(exp_root, "tiny_test", "eval_S2A.yaml")
    assert os.path.exists(eval_yaml)
    with open(eval_yaml) as fp:
        res = yaml.safe_load(fp)
    assert 0.0 <= res["map"] <= 1.0
    assert res["recall_at_k"] and res["med_rank"] >= 1.0

    # 3) refine_cca writes the _est_UV checkpoint next door
    refine_cca.main(common + ["--n_train", "128"])
    est_file = os.path.join(exp_root, "tiny_test_est_UV", "params.pkl")
    assert os.path.exists(est_file)

    # 4) eval the refined checkpoint via --estimate_UV
    run_eval.main(common + ["--dump_results", "--n_test", "64",
                            "--estimate_UV"])
    est_yaml = os.path.join(exp_root, "tiny_test_est_UV", "eval_S2A.yaml")
    assert os.path.exists(est_yaml)

    # 5) direction flip + max_dim truncation paths execute
    run_eval.main(common + ["--n_test", "32", "--V2_to_V1", "--max_dim", "4"])
    out = capsys.readouterr().out
    assert "Hit Rates" in out or "Median Rank" in out


@pytest.mark.slow
def test_run_train_resume(tiny_model, tmp_path):
    from audio_sheet_retrieval_tpu.cli import run_train
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.retrieval.wrapper import load_any_checkpoint

    exp_root = str(tmp_path)
    common = ["--model", "tiny_test", "--data", "synthetic",
              "--exp_root", exp_root]
    run_train.main(common + ["--max_epochs", "1"])
    params_file = os.path.join(exp_root, "tiny_test", "params.pkl")
    before = load_any_checkpoint(params_file, tiny_model)
    run_train.main(common + ["--max_epochs", "1", "--resume"])
    after = load_any_checkpoint(params_file, tiny_model)
    # resumed run continued from the dump (weights moved again)
    b = np.asarray(before.view1["blocks"][0]["w"])
    a = np.asarray(after.view1["blocks"][0]["w"])
    assert b.shape == a.shape
    assert not np.allclose(a, b)


@pytest.mark.slow
def test_dset_size_sweep_workflow(tiny_model, tmp_path, capsys):
    """Dataset-size sweep driver semantics (scripts/train_models_dset_size
    .sh / eval_models_dset_size.sh; reference train_models_dset_size.sh):
    --max_train_pieces subsets the training pieces, --tag routes artifacts
    under the split-name convention, and `reports dset-size` aggregates
    the per-fraction refined evals into the MRR-vs-size table."""
    from audio_sheet_retrieval_tpu.cli import (
        refine_cca,
        reports,
        run_eval,
        run_train,
    )

    exp_root = str(tmp_path)
    common = ["--model", "tiny_test", "--data", "synthetic",
              "--exp_root", exp_root]
    for n, tag in ((2, "all_split_10_mutopia_no_aug"),
                   (4, "all_split_mutopia_no_aug")):
        run_train.main(common + ["--max_train_pieces", str(n),
                                 "--tag", tag, "--seed", "5"])
        assert os.path.exists(os.path.join(
            exp_root, "tiny_test", f"params_{tag}.pkl"))
        refine_cca.main(common + ["--max_train_pieces", str(n),
                                  "--tag", tag, "--n_train", "64"])
        run_eval.main(common + ["--tag", tag, "--estimate_UV",
                                "--dump_results", "--n_test", "32",
                                "--V2_to_V1"])
        assert os.path.exists(os.path.join(
            exp_root, "tiny_test_est_UV", f"eval_{tag}_A2S.yaml"))

    rows = reports.main(["dset-size", "--out_path",
                         os.path.join(exp_root, "tiny_test_est_UV")])
    out = capsys.readouterr().out
    assert len(rows) == 2 and "10% train data" in out \
        and "100% train data" in out


@pytest.mark.slow
def test_full_protocol_driver(tiny_model, capsys):
    """The one-command full-breadth capstone (scripts/full_protocol.py):
    synthetic npz export -> train_models.sh semantics -> eval_models.sh
    semantics -> `reports retrieval` TISMIR-style table, on a regime
    subset with the tiny registered model."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "full_protocol", os.path.join(repo, "scripts", "full_protocol.py"))
    fp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fp)

    out = fp.main([
        "--model", "tiny_test", "--n_train_pieces", "3",
        "--n_valid_pieces", "2", "--n_test_pieces", "2",
        "--n_onsets", "40", "--max_epochs", "1", "--n_test", "40",
        "--n_refine", "80", "--compute_dtype", "float32",
        "--regimes", "mutopia_no_aug,mutopia_full_aug"])
    # the aggregator prints all four regime rows per direction; the two
    # trained regimes carry real metric cells in the all_split column
    assert len(out["table"]) == 8
    filled = [r for r in out["table"]
              if not r.endswith("- & - & - & - \\\\")]
    assert len(filled) == 4
    for row in filled:
        assert row.count("&") == 12
        assert row.startswith(("none", "full"))
    # npz export round-tripped: one file per piece + the split yaml
    npz_dir = os.path.join(out["workdir"], "npz")
    assert len([f for f in os.listdir(npz_dir) if f.endswith(".npz")]) == 7
