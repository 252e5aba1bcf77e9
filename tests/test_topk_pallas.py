"""Pallas streaming top-k kernel (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.ops.topk_gallery import topk_gallery
from audio_sheet_retrieval_tpu.retrieval.gallery import DeviceGallery


def _oracle(q, g, k):
    s, i = jax.lax.top_k(jnp.dot(q, g.T, preferred_element_type=jnp.float32),
                         k)
    return np.asarray(s), np.asarray(i)


@pytest.mark.parametrize("n,qn,k", [(2048, 16, 8), (1536, 8, 25),
                                    (4096, 40, 25)])
def test_topk_matches_xla(n, qn, k):
    rng = np.random.default_rng(n + qn)
    g = jnp.asarray(rng.standard_normal((n, 32)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((qn, 32)), jnp.float32)
    s, i = map(np.asarray, topk_gallery(q, g, k))
    want_s, want_i = _oracle(q, g, k)
    np.testing.assert_allclose(s, want_s, atol=1e-4)
    for r in range(qn):
        assert set(i[r]) == set(want_i[r])


def test_topk_unaligned_sizes_padded():
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((777, 32)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((5, 32)), jnp.float32)
    s, i = map(np.asarray, topk_gallery(q, g, 10))
    want_s, want_i = _oracle(q, g, 10)
    np.testing.assert_allclose(s, want_s, atol=1e-4)
    assert (i < 777).all()


def test_topk_rejects_bad_k():
    g = jnp.zeros((100, 8))
    q = jnp.zeros((2, 8))
    with pytest.raises(ValueError):
        topk_gallery(q, g, 101)
    with pytest.raises(ValueError):
        topk_gallery(q, g, 200)


def test_device_gallery_pallas_backend_agrees():
    rng = np.random.default_rng(1)
    codes = rng.standard_normal((3000, 16)).astype(np.float32)
    ids = rng.integers(0, 9, 3000)
    queries = rng.standard_normal((7, 16)).astype(np.float32)
    gal_xla = DeviceGallery(codes, ids, use_pallas=False)
    gal_pal = DeviceGallery(codes, ids, use_pallas=True)
    d1, i1 = gal_xla.topk(queries, 15)
    d2, i2 = gal_pal.topk(queries, 15)
    np.testing.assert_allclose(np.sort(d1, 1), np.sort(d2, 1), atol=1e-5)
    for r in range(7):
        assert set(i1[r]) == set(i2[r])


def test_device_gallery_pallas_padding_indices_stay_in_range():
    """Anti-correlated queries: padding zeros outscore real rows; indices
    must still be valid for the ids[] lookup."""
    rng = np.random.default_rng(2)
    codes = rng.standard_normal((10, 8)).astype(np.float32)
    gal = DeviceGallery(codes, np.arange(10), bucket=128, use_pallas=True)
    q = -codes[:3]  # scores all negative -> zeros would win
    d, i = gal.topk(q, 8)
    assert (i < 10).all() and (i >= 0).all()
    ids, idx = gal.topk_ids(q, 8)  # must not raise
    assert ids.shape == (3, 8)
