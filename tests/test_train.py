"""Training engine smoke tests: learning happens, refinement schedule runs."""

import os

import jax
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.data import synthetic
from audio_sheet_retrieval_tpu.data.iterators import (
    MultiviewPoolIteratorUnsupervised,
)
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.train import engine, state as ts


def _setup(tmp_path, **cfg_over):
    defaults = dict(
        num_filters=4, dim_latent=8, batch_size=20,
        k_samples=100, patience=2, refinement_steps=1,
        refinement_patience=1, max_epochs=4, ini_learning_rate=2e-3)
    defaults.update(cfg_over)
    cfg = get_model_config("mutopia_ccal_cont_rsz", **defaults)
    data = synthetic.load_synthetic_retrieval(
        n_train=3, n_valid=1, n_test=1, seed=7, n_onsets=60)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(
        batch_size=cfg.batch_size, k_samples=cfg.k_samples)
    va_it = MultiviewPoolIteratorUnsupervised(
        batch_size=cfg.batch_size, shuffle=False)
    return cfg, data, params, tr_it, va_it


@pytest.mark.slow
def test_fit_improves_over_chance(tmp_path):
    cfg, data, params, tr_it, va_it = _setup(tmp_path)
    epochs = []
    dump = os.path.join(tmp_path, "params.pkl")
    best, best_map = engine.fit(
        params, data, cfg, tr_it, va_it,
        out_path=str(tmp_path), dump_file=dump, verbose=False,
        on_epoch=epochs.append)
    assert len(epochs) >= 2
    # loss must decrease and validation MRR must beat chance (~5/len for the
    # tiny pool) after a few epochs of the learnable synthetic correspondence
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]
    assert best_map > 0.05
    assert os.path.exists(dump)
    # results curves written
    assert os.path.exists(os.path.join(tmp_path, "results.pkl"))
    from audio_sheet_retrieval_tpu.utils.io import load_results

    curves = load_results(os.path.join(tmp_path, "results.pkl"))
    assert len(curves["map_val"]) == len(epochs)


@pytest.mark.slow
def test_fit_full_state_resume_matches_uninterrupted(tmp_path):
    """fit(resume_file=...) kill-and-resume: a run stopped after epoch 2
    and resumed from the snapshot continues bit-identically to an
    uninterrupted run (params, optimizer, early-stop bookkeeping AND the
    pool rng/key/order state all round-trip)."""
    from audio_sheet_retrieval_tpu.data import device_pool as dpool
    from audio_sheet_retrieval_tpu.data import pools as hpools

    def run(outdir, resume_file, n_epochs):
        cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                               dim_latent=8, batch_size=16, k_samples=48,
                               patience=50, refinement_steps=0)
        tr = synthetic.make_piece_list(5, 4, n_onsets=40)
        va = synthetic.make_piece_list(6, 2, n_onsets=40)
        data = {
            "train": dpool.DevicePool(
                *tr, data_augmentation=hpools.FULL_AUGMENT,
                rng=np.random.default_rng(0)),
            "valid": dpool.DevicePool(
                *va, data_augmentation=hpools.NO_AUGMENT, shuffle=False,
                rng=np.random.default_rng(1)),
        }
        params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
        tr_it = dpool.DeviceBatchIterator(batch_size=16, k_samples=48)
        va_it = dpool.DeviceBatchIterator(batch_size=16, shuffle=False,
                                          train=False)
        recs = []
        engine.fit(params, data, cfg, tr_it, va_it, out_path=outdir,
                   num_epochs=n_epochs, verbose=False,
                   on_epoch=recs.append, resume_file=resume_file)
        return recs

    def key(r):
        return (float(r["train_loss"]).hex(), float(r["valid_loss"]).hex(),
                float(r["map_va"]).hex())

    full = run(str(tmp_path / "full"), None, 4)
    assert len(full) == 4
    snap = str(tmp_path / "fit_state.pkl")
    p1 = run(str(tmp_path / "p1"), snap, 2)
    assert os.path.exists(snap)
    p2 = run(str(tmp_path / "p2"), snap, 4)
    assert [key(r) for r in p1] == [key(r) for r in full[:2]]
    assert [r["number"] for r in p2] == [3, 4]
    assert [key(r) for r in p2] == [key(r) for r in full[2:]]


@pytest.mark.slow
def test_refinement_restart_decays_lr(tmp_path):
    # patience 0 forces immediate 'early stopping' + one refinement restart
    cfg, data, params, tr_it, va_it = _setup(
        tmp_path, patience=0, refinement_steps=1, refinement_patience=0,
        max_epochs=4, k_samples=40)
    lrs = []

    class Probe:
        def __call__(self, ep):
            lrs.append(ep["number"])

    best, _ = engine.fit(params, data, cfg, tr_it, va_it,
                         out_path=str(tmp_path), dump_file=None,
                         verbose=False, on_epoch=Probe())
    # 1st epoch improves (map>=0), 2nd epoch exceeds patience -> refine,
    # then one more window -> stop; must terminate before max_epochs misuse
    assert 2 <= len(lrs) <= 4


def test_train_step_updates_only_trainable(tmp_path):
    cfg, data, params, tr_it, va_it = _setup(tmp_path)
    optimizer = ts.make_optimizer(1e-3)
    st = ts.init_train_state(params, cfg, optimizer)
    step = engine.make_train_step(cfg, optimizer)
    x1, x2 = data["train"][0:cfg.batch_size]
    st2, metrics = step(st, x1, x2)
    assert np.isfinite(float(metrics["loss"]))
    # trainable weights changed
    w0 = np.asarray(st.trainable["view1"]["blocks"][0]["w"])
    w1 = np.asarray(st2.trainable["view1"]["blocks"][0]["w"])
    assert not np.allclose(w0, w1)
    # CCA state updated as running state, not by the optimizer
    assert not np.allclose(np.asarray(st.non_trainable["cca"].U),
                           np.asarray(st2.non_trainable["cca"].U))


def test_split_merge_roundtrip():
    cfg = get_model_config("mutopia_ccal_cont", num_filters=4, dim_latent=8)
    params = cca_model.init_model(jax.random.PRNGKey(1), cfg)
    t, n = ts.split_params(params, cfg)
    back = ts.merge_params(t, n, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_learned_cca_variant_trains_uv():
    cfg = get_model_config("mutopia_ccal_cont", num_filters=4, dim_latent=8,
                           use_ccal=False, batch_size=10)
    params = cca_model.init_model(jax.random.PRNGKey(2), cfg)
    optimizer = ts.make_optimizer(1e-3)
    st = ts.init_train_state(params, cfg, optimizer)
    step = engine.make_train_step(cfg, optimizer)
    rng = np.random.default_rng(0)
    x1 = rng.random((10, 1, 160, 200)).astype(np.float32) * 255
    x2 = rng.random((10, 1, 92, 42)).astype(np.float32)
    st2, _ = step(st, x1, x2)
    assert not np.allclose(np.asarray(st.trainable["cca_uv"]["U"]),
                           np.asarray(st2.trainable["cca_uv"]["U"]))
