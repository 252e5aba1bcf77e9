"""CCA parity vs an independent numpy re-implementation of
reference utils/cca.py (svd / eigen / eigen-4 families) and the in-graph
CCA layer (lasagne cca.py:82-203)."""

import numpy as np
import pytest
from scipy.linalg import sqrtm

from audio_sheet_retrieval_tpu.ops import cca


def _np_covs(H1, H2, r1=1e-3, r2=1e-3):
    m = H1.shape[0]
    m1, m2 = H1.mean(0), H2.mean(0)
    H1b, H2b = (H1 - m1).T, (H2 - m2).T
    S12 = H1b @ H2b.T / (m - 1)
    S11 = H1b @ H1b.T / (m - 1) + r1 * np.eye(H1.shape[1])
    S22 = H2b @ H2b.T / (m - 1) + r2 * np.eye(H2.shape[1])
    return m1, m2, S12, S11, S22


def _np_cca_svd(H1, H2):
    m1, m2, S12, S11, S22 = _np_covs(H1, H2)
    S11i = np.linalg.inv(sqrtm(S11))
    S22i = np.linalg.inv(sqrtm(S22))
    T = S11i @ S12 @ S22i
    U, vals, V = np.linalg.svd(T)
    return S11i @ U, S22i @ V.T, m1, m2, vals


def _np_cca_eigen(H1, H2):
    m1, m2, S12, S11, S22 = _np_covs(H1, H2)
    S11i = np.linalg.inv(sqrtm(S11))
    S22i = np.linalg.inv(sqrtm(S22))
    T = S11i @ S12 @ S22i
    vals, E = np.linalg.eigh(T @ T.T)
    _, F = np.linalg.eigh(T.T @ T)
    E, F = E[:, ::-1], F[:, ::-1]
    coeffs = np.sqrt(np.clip(vals[::-1], 0, None))
    U, V = S11i @ E, S22i @ F
    s = np.sign(np.diag(U.T @ S12 @ V))
    return U * s, V, m1, m2, coeffs


def _correlated_views(rng, n=400, d=6, noise=0.5):
    z = rng.standard_normal((n, d))
    A = rng.standard_normal((d, d))
    B = rng.standard_normal((d, d))
    H1 = z @ A + noise * rng.standard_normal((n, d))
    H2 = z @ B + noise * rng.standard_normal((n, d))
    return H1.astype(np.float32), H2.astype(np.float32)


def _assert_projection_equiv(U_got, U_want, atol=5e-2, cols=3):
    """Projections are unique up to per-component sign (and degenerate
    subspace rotation). Compare only the leading well-separated components;
    trailing near-degenerate ones are f32-noise sensitive."""
    for j in range(min(cols, U_got.shape[1])):
        err_pos = np.abs(U_got[:, j] - U_want[:, j]).max()
        err_neg = np.abs(U_got[:, j] + U_want[:, j]).max()
        assert min(err_pos, err_neg) < atol, (j, err_pos, err_neg)


def test_cca_svd_matches_numpy():
    rng = np.random.default_rng(0)
    H1, H2 = _correlated_views(rng)
    res = cca.cca_fit(H1, H2, method="svd")
    U, V, m1, m2, coeffs = _np_cca_svd(H1.astype(np.float64), H2.astype(np.float64))
    np.testing.assert_allclose(np.asarray(res.coeffs), coeffs, atol=2e-2)
    np.testing.assert_allclose(np.asarray(res.m1), m1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.m2), m2, atol=1e-5)
    _assert_projection_equiv(np.asarray(res.U), U)
    _assert_projection_equiv(np.asarray(res.V), V)


def test_cca_eigen_matches_numpy_with_sign_fix():
    rng = np.random.default_rng(1)
    H1, H2 = _correlated_views(rng)
    res = cca.cca_fit(H1, H2, method="eigen")
    U, V, _, _, coeffs = _np_cca_eigen(H1.astype(np.float64), H2.astype(np.float64))
    np.testing.assert_allclose(np.asarray(res.coeffs), coeffs, atol=2e-2)
    # after the diag-sign fix the U/V PAIR is consistent: projections of the
    # two views must correlate positively per component
    lv1 = np.asarray(cca.cca_transform_v1(res, H1))
    lv2 = np.asarray(cca.cca_transform_v2(res, H2))
    per_dim_corr = np.sum(lv1 * lv2, 0) / (
        np.linalg.norm(lv1, axis=0) * np.linalg.norm(lv2, axis=0)
    )
    assert (per_dim_corr[:3] > 0.2).all()
    # same check for the numpy reference result
    lv1n, lv2n = (H1 - H1.mean(0)) @ U, (H2 - H2.mean(0)) @ V
    np.testing.assert_allclose(
        np.abs(per_dim_corr),
        np.abs(np.sum(lv1n * lv2n, 0)
               / (np.linalg.norm(lv1n, axis=0) * np.linalg.norm(lv2n, axis=0))),
        atol=5e-3,
    )


def test_cca_method_aliases_agree():
    rng = np.random.default_rng(2)
    H1, H2 = _correlated_views(rng, n=200)
    r_svd = cca.cca_fit(H1, H2, method="svd")
    r_svd2 = cca.cca_fit(H1, H2, method="svd-2")
    np.testing.assert_allclose(np.asarray(r_svd.U), np.asarray(r_svd2.U))
    r_e2 = cca.cca_fit(H1, H2, method="eigen-2")
    r_e = cca.cca_fit(H1, H2, method="eigen")
    np.testing.assert_allclose(np.asarray(r_e.U), np.asarray(r_e2.U))
    with pytest.raises(NotImplementedError):
        cca.cca_fit(H1, H2, method="nope")


def test_cca_recovers_correlation():
    rng = np.random.default_rng(3)
    H1, H2 = _correlated_views(rng, n=1000, noise=0.1)
    res = cca.cca_fit(H1, H2)
    assert float(res.coeffs[0]) > 0.9
    lv1 = np.asarray(cca.cca_transform_v1(res, H1))
    lv2 = np.asarray(cca.cca_transform_v2(res, H2))
    c = np.corrcoef(lv1[:, 0], lv2[:, 0])[0, 1]
    assert c > 0.9


def test_cca_fit_from_sharded_moments_equals_monolithic():
    rng = np.random.default_rng(4)
    H1, H2 = _correlated_views(rng, n=512)
    full = cca.cca_fit(H1, H2)
    # shard into 4 pieces, sum moments (simulating a psum), fit from moments
    parts = [cca.cca_moments(H1[i::4], H2[i::4]) for i in range(4)]
    import jax
    summed = jax.tree.map(lambda *xs: sum(xs), *parts)
    sharded = cca.cca_fit_from_moments(summed)
    np.testing.assert_allclose(np.asarray(full.U), np.asarray(sharded.U),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(full.coeffs),
                               np.asarray(sharded.coeffs), atol=1e-4)


def test_cca_layer_train_alpha1_matches_offline_eigen():
    """With alpha=1 and rT=0 the layer's U/V equal the offline eigen fit."""
    rng = np.random.default_rng(5)
    H1, H2 = _correlated_views(rng, n=300)
    state0 = cca.CCAState.zeros(H1.shape[1])
    lv1, lv2, new_state, corr = cca.cca_layer_train(
        jnp_arr(H1), jnp_arr(H2), state0, rT=0.0, alpha=1.0
    )
    offline = cca.cca_fit(H1, H2, method="eigen")
    # the layer keeps eigh's ascending order (reference lasagne cca.py:157-167
    # does not reverse columns); the offline fit reverses to descending
    _assert_projection_equiv(np.asarray(new_state.U)[:, ::-1],
                             np.asarray(offline.U))
    np.testing.assert_allclose(np.asarray(new_state.mean1),
                               np.asarray(offline.m1), atol=1e-5)
    # projections must reproduce eval path with the new state
    ev1, ev2 = cca.cca_layer_eval(jnp_arr(H1), jnp_arr(H2), new_state)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(ev1), atol=1e-4)


def test_cca_layer_train_is_differentiable():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    H1, H2 = _correlated_views(rng, n=100, d=5)
    state0 = cca.CCAState.zeros(5)

    def loss_fn(h1):
        lv1, lv2, _, _ = cca.cca_layer_train(h1, jnp.asarray(H2), state0)
        return jnp.mean((lv1 - lv2) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(H1))
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0


def test_cca_layer_running_average_alpha():
    """alpha<1 blends batch stats into running stats (cca.py:98-141)."""
    rng = np.random.default_rng(7)
    H1, H2 = _correlated_views(rng, n=100, d=4)
    state0 = cca.CCAState.zeros(4)
    _, _, s_full, _ = cca.cca_layer_train(jnp_arr(H1), jnp_arr(H2), state0,
                                          alpha=1.0)
    _, _, s_half, _ = cca.cca_layer_train(jnp_arr(H1), jnp_arr(H2), state0,
                                          alpha=0.5)
    np.testing.assert_allclose(np.asarray(s_half.mean1),
                               0.5 * np.asarray(s_full.mean1), atol=1e-6)
    # with alpha=0.5 the batch covariance is computed around the BLENDED mean
    # (cca.py:98-125): recompute explicitly in numpy
    blended_mean = 0.5 * H1.mean(0)
    H1b = H1 - blended_mean
    want_S11 = 0.5 * (H1b.T @ H1b / (len(H1) - 1.0) + 1e-3 * np.eye(4))
    np.testing.assert_allclose(np.asarray(s_half.S11), want_S11, atol=1e-5)


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_cca_layer_projection_grad_mode():
    """grad_mode='projection' (fast training recipe): gradients equal the
    whitening-frozen analytic gradient — the U/V/mean chain is cut — and
    differ from the full reference-parity gradient; forward values are
    identical in both modes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    H1 = jnp.asarray(rng.standard_normal((24, 6)), jnp.float32)
    H2 = jnp.asarray(rng.standard_normal((24, 6)), jnp.float32)
    state = cca.CCAState.zeros(6)

    lv1_f, lv2_f, new_state, _ = cca.cca_layer_train(
        H1, H2, state, whitening="polar")
    lv1_p, lv2_p, _, _ = cca.cca_layer_train(
        H1, H2, state, whitening="polar", grad_mode="projection")
    np.testing.assert_allclose(np.asarray(lv1_f), np.asarray(lv1_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv2_f), np.asarray(lv2_p),
                               atol=1e-6)

    def loss(h1, mode):
        a, b, _, _ = cca.cca_layer_train(h1, H2, state, whitening="polar",
                                         grad_mode=mode)
        return jnp.sum(a * b)

    g_proj = jax.grad(lambda h: loss(h, "projection"))(H1)
    g_full = jax.grad(lambda h: loss(h, "full"))(H1)

    def loss_frozen(h1):
        a = (h1 - new_state.mean1).dot(new_state.U)
        b = (H2 - new_state.mean2).dot(new_state.V)
        return jnp.sum(a * b)

    g_frozen = jax.grad(loss_frozen)(H1)
    np.testing.assert_allclose(np.asarray(g_proj), np.asarray(g_frozen),
                               atol=1e-5)
    assert not np.allclose(np.asarray(g_proj), np.asarray(g_full),
                           atol=1e-3)
