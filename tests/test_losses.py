"""Losses vs hand-computed numpy references (semantics of models/objectives.py)."""

import numpy as np
import pytest

from audio_sheet_retrieval_tpu.ops import losses


def _np_contrastive_cos(lv1, lv2, weight, gamma, symmetric=False):
    def one(a, b):
        n = a.shape[0]
        D = a @ b.T
        d = np.diag(D).reshape(-1, 1)
        O = D[~np.eye(n, dtype=bool)].reshape(n, n - 1)
        L = np.clip(np.repeat(gamma - d, n - 1, 1) + O, 0, 1000)
        return L.mean()

    loss = one(lv1, lv2)
    if symmetric:
        loss += one(lv2, lv1)
    return weight * loss


def _rand_latents(rng, n=13, d=8, normalize=True):
    a = rng.standard_normal((n, d)).astype(np.float32)
    b = rng.standard_normal((n, d)).astype(np.float32)
    if normalize:
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
    return a, b


@pytest.mark.parametrize("symmetric", [False, True])
def test_contrastive_cos_loss_matches_numpy(symmetric):
    rng = np.random.default_rng(0)
    a, b = _rand_latents(rng)
    got = float(losses.contrastive_cos_loss(a, b, weight=0.8, gamma=0.7,
                                            symmetric=symmetric))
    want = _np_contrastive_cos(a, b, weight=0.8, gamma=0.7, symmetric=symmetric)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kiros_loss_matches_numpy():
    rng = np.random.default_rng(1)
    a, b = _rand_latents(rng)
    n = a.shape[0]
    D = a @ b.T
    diag = np.diag(D)
    cost_s = np.maximum(0, 0.7 - diag[None, :] + D)
    cost_im = np.maximum(0, 0.7 - diag[:, None] + D)
    np.fill_diagonal(cost_s, 0)
    np.fill_diagonal(cost_im, 0)
    want = cost_s.sum() + cost_im.sum()
    got = float(losses.contrastive_loss_kiros(a, b, gamma=0.7))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_arccos_loss_matches_numpy():
    rng = np.random.default_rng(2)
    a, b = _rand_latents(rng)
    n = a.shape[0]
    D = np.arccos(np.clip(a @ b.T, -1, 1))
    d = np.diag(D).reshape(-1, 1)
    O = D[~np.eye(n, dtype=bool)].reshape(n, n - 1)
    want = 0.5 * np.clip(np.repeat(0.7 + d, n - 1, 1) - O, 0, 1000).mean()
    got = float(losses.contrastive_arccos_loss(a, b, weight=0.5, gamma=0.7))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_cos2_loss_matches_numpy():
    rng = np.random.default_rng(3)
    a, b = _rand_latents(rng)
    want = (1.0 - 0.25) * np.mean((1.0 - np.sum(a * b, axis=-1)) ** 2)
    got = float(losses.cos2_distance_loss(a, b, weight=0.25))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_perfect_alignment_has_low_loss():
    rng = np.random.default_rng(4)
    a, _ = _rand_latents(rng, n=16)
    # identical views with margin 0.7: diagonal scores are 1.0, off-diag < 1
    loss_same = float(losses.contrastive_cos_loss(a, a.copy(), gamma=0.7))
    b = rng.standard_normal(a.shape).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    loss_rand = float(losses.contrastive_cos_loss(a, b, gamma=0.7))
    assert loss_same < loss_rand


def test_factories_match_partials():
    rng = np.random.default_rng(5)
    a, b = _rand_latents(rng)
    f = losses.get_contrastive_cos_loss(1.0, 0.7)
    np.testing.assert_allclose(
        float(f(a, b)), float(losses.contrastive_cos_loss(a, b)), rtol=1e-6
    )
