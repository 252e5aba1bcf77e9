"""Polar (Newton-Schulz) whitening: equivalence with the eigh formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_sheet_retrieval_tpu.ops import cca, losses, metrics
import pytest


def _views(rng, n=300, d=16, noise=0.4):
    z = rng.standard_normal((n, d))
    H1 = (z @ rng.standard_normal((d, d)) + noise * rng.standard_normal((n, d))
          ).astype(np.float32)
    H2 = (z @ rng.standard_normal((d, d)) + noise * rng.standard_normal((n, d))
          ).astype(np.float32)
    return jnp.asarray(H1), jnp.asarray(H2)


def test_ns_inv_sqrt_matches_eigh():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((32, 32)).astype(np.float32)
    S = jnp.asarray(A @ A.T / 32 + 1e-3 * np.eye(32, dtype=np.float32))
    want = np.asarray(cca.inv_sqrt_spd(S))
    got = np.asarray(cca.inv_sqrt_spd_ns(S))
    np.testing.assert_allclose(got, want, atol=5e-3)
    # it actually inverts: S^-1/2 S S^-1/2 = I
    eye = np.asarray(jnp.asarray(got) @ S @ jnp.asarray(got))
    np.testing.assert_allclose(eye, np.eye(32), atol=5e-3)


def test_polar_ns_matches_svd():
    rng = np.random.default_rng(1)
    T = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32) * 0.1
                    + 0.5 * np.eye(32, dtype=np.float32))
    P, _, Qt = np.linalg.svd(np.asarray(T))
    want = P @ Qt
    got = np.asarray(cca.polar_ns(T))
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_allclose(got.T @ got, np.eye(32), atol=5e-3)


def test_polar_layer_same_loss_and_metrics_as_eigh():
    """The contrastive loss and retrieval metrics are invariant between the
    eigh (E, F) projections and the polar (W, I) projections."""
    rng = np.random.default_rng(2)
    H1, H2 = _views(rng)
    state0 = cca.CCAState.zeros(16)

    lv1_e, lv2_e, st_e, _ = cca.cca_layer_train(H1, H2, state0, rT=0.0,
                                                whitening="eigh")
    lv1_p, lv2_p, st_p, _ = cca.cca_layer_train(H1, H2, state0,
                                                whitening="polar")

    def norm(x):
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    loss_e = float(losses.contrastive_cos_loss(norm(lv1_e), norm(lv2_e)))
    loss_p = float(losses.contrastive_cos_loss(norm(lv1_p), norm(lv2_p)))
    np.testing.assert_allclose(loss_p, loss_e, atol=2e-3)

    # eval-mode retrieval metrics with the stored projections agree
    ev1_e, ev2_e = cca.cca_layer_eval(H1, H2, st_e)
    ev1_p, ev2_p = cca.cca_layer_eval(H1, H2, st_p)
    m_e = metrics.eval_retrieval(np.asarray(ev1_e), np.asarray(ev2_e))
    m_p = metrics.eval_retrieval(np.asarray(ev1_p), np.asarray(ev2_p))
    assert m_e[3] == m_p[3]                      # identical hit rates
    np.testing.assert_allclose(m_e[4], m_p[4], atol=1e-5)  # identical MRR


def test_polar_gradients_finite_and_nonzero():
    rng = np.random.default_rng(3)
    H1, H2 = _views(rng, n=100, d=8)
    state0 = cca.CCAState.zeros(8)

    def loss_fn(h1):
        lv1, lv2, _, _ = cca.cca_layer_train(h1, H2, state0,
                                             whitening="polar")
        n1 = lv1 / jnp.linalg.norm(lv1, axis=1, keepdims=True)
        n2 = lv2 / jnp.linalg.norm(lv2, axis=1, keepdims=True)
        return losses.contrastive_cos_loss(n1, n2)

    g = np.asarray(jax.grad(loss_fn)(H1))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


@pytest.mark.slow
def test_polar_training_learns(tmp_path):
    """End-to-end: tiny model with polar whitening trains above chance."""
    from audio_sheet_retrieval_tpu.data import synthetic
    from audio_sheet_retrieval_tpu.data.iterators import (
        MultiviewPoolIteratorUnsupervised,
    )
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.train import engine

    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=20, k_samples=100,
                           patience=2, refinement_steps=0, max_epochs=4,
                           whitening="polar")
    data = synthetic.load_synthetic_retrieval(n_train=3, n_valid=1, n_test=1,
                                              seed=7, n_onsets=60)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=20, k_samples=100)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=20, shuffle=False)
    epochs = []
    _, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                             out_path=str(tmp_path), verbose=False,
                             on_epoch=epochs.append)
    assert epochs[-1]["train_loss"] < epochs[0]["train_loss"]
    assert best_map > 0.05
