"""Retrieval metric parity vs an independent numpy re-implementation of
reference utils/train_dcca_pool.py:28-82 (eval_retrieval)."""

import numpy as np
from scipy.spatial.distance import cdist

from audio_sheet_retrieval_tpu.ops import metrics


def _np_eval_retrieval(lv1, lv2):
    n_v1, n_v2 = lv1.shape[0], lv2.shape[0]
    k = n_v2 // n_v1 if n_v2 > n_v1 else 1
    h = n_v1 // n_v2 if n_v1 > n_v2 else 1
    dists = cdist(lv1, lv2, metric="cosine")
    ranks, aps = [], []
    hit_rates = {1: 0, 5: 0, 10: 0, 25: 0}
    for i in range(n_v1):
        i_fixed = i // h
        sorted_idx = np.argsort(dists[i])
        for key in hit_rates:
            top_k = sorted_idx[0:key] // k
            if i_fixed in top_k:
                hit_rates[key] += 1
        fixed_sorted_idx = sorted_idx // k
        rank = np.min(np.nonzero(fixed_sorted_idx == i_fixed)[0]) + 1
        ranks.append(rank)
        aps.append(1.0 / rank)
    return (np.mean(ranks), np.median(ranks), np.diag(dists).mean(),
            hit_rates, np.mean(aps))


def _embeds(rng, n1, n2, d=16, noise=0.15):
    """Correlated pair sets: row i of view1 matches row(s) of view2."""
    base = rng.standard_normal((max(n1, n2), d)).astype(np.float32)
    lv1 = base[:n1] + noise * rng.standard_normal((n1, d)).astype(np.float32)
    lv2 = base[:n2] + noise * rng.standard_normal((n2, d)).astype(np.float32)
    return lv1, lv2


def test_eval_retrieval_square_matches_numpy():
    rng = np.random.default_rng(0)
    lv1, lv2 = _embeds(rng, 64, 64)
    got = metrics.eval_retrieval(lv1, lv2)
    want = _np_eval_retrieval(lv1, lv2)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)   # mean rank
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5)   # median rank
    np.testing.assert_allclose(got[2], want[2], rtol=1e-4)   # mean diag dist
    assert got[3] == want[3]                                 # hit rates
    np.testing.assert_allclose(got[4], want[4], rtol=1e-5)   # MRR


def test_eval_retrieval_unequal_gallery_floor_divide():
    # n2 = 3 * n1: reference floor-divides sorted indices by k=3
    rng = np.random.default_rng(1)
    n1 = 20
    lv1 = rng.standard_normal((n1, 8)).astype(np.float32)
    lv2 = np.repeat(lv1, 3, axis=0) + 0.05 * rng.standard_normal(
        (n1 * 3, 8)
    ).astype(np.float32)
    got = metrics.eval_retrieval(lv1, lv2)
    want = _np_eval_retrieval(lv1, lv2)
    assert got[3] == want[3]
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
    np.testing.assert_allclose(got[4], want[4], rtol=1e-5)


def test_eval_retrieval_more_queries_than_gallery():
    rng = np.random.default_rng(2)
    n2 = 15
    lv2 = rng.standard_normal((n2, 8)).astype(np.float32)
    lv1 = np.repeat(lv2, 2, axis=0) + 0.05 * rng.standard_normal(
        (n2 * 2, 8)
    ).astype(np.float32)
    got = metrics.eval_retrieval(lv1, lv2)
    want = _np_eval_retrieval(lv1, lv2)
    assert got[3] == want[3]
    np.testing.assert_allclose(got[1], want[1], rtol=1e-5)


def test_perfect_retrieval():
    rng = np.random.default_rng(3)
    lv = rng.standard_normal((32, 8)).astype(np.float32)
    mean_rank, med_rank, _, hits, mrr = metrics.eval_retrieval(lv, lv.copy())
    assert mean_rank == 1.0 and med_rank == 1.0 and mrr == 1.0
    assert hits[1] == 32


def test_topk_fast_path_agrees_with_full():
    rng = np.random.default_rng(4)
    lv1, lv2 = _embeds(rng, 50, 50)
    full_ranks, _ = metrics.retrieval_ranks(lv1, lv2)
    topk_ranks, found = metrics.retrieval_ranks_topk(lv1, lv2, topk=25)
    mask = full_ranks <= 25
    assert np.array_equal(found, mask)
    assert np.array_equal(topk_ranks[mask], full_ranks[mask])


def test_device_metrics_match_host_eval():
    """retrieval_metrics_device + unpack == eval_retrieval (all shapes)."""
    import jax

    rng = np.random.default_rng(5)
    for n1, n2 in [(40, 40), (20, 60), (60, 20)]:
        lv1, lv2 = _embeds(rng, n1, n2)
        want = metrics.eval_retrieval(lv1, lv2)
        vec = jax.jit(metrics.retrieval_metrics_device)(lv1, lv2)
        got = metrics.unpack_retrieval_metrics(vec)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-5)  # mean rank
        np.testing.assert_allclose(got[1], want[1], rtol=1e-5)  # median
        np.testing.assert_allclose(got[2], want[2], rtol=1e-4)  # mean diag
        assert got[3] == want[3]                                # hit dict
        np.testing.assert_allclose(got[4], want[4], rtol=1e-5)  # mrr


def test_fused_epoch_eval_matches_host_pipeline():
    """make_fused_eval (CCA refit + metrics in one jit) == host sequence."""
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import cca as cca_ops
    from audio_sheet_retrieval_tpu.train.engine import make_fused_eval

    rng = np.random.default_rng(6)
    lv1_tr, lv2_tr = _embeds(rng, 64, 64)
    lv1_va, lv2_va = _embeds(rng, 32, 32)

    cfg = get_model_config("mutopia_ccal_cont_rsz", dim_latent=8,
                           fit_cca=True)
    assert cfg.fit_cca
    vec_tr, vec_va = make_fused_eval(cfg)(lv1_tr, lv2_tr, lv1_va, lv2_va)

    res = cca_ops.cca_fit(np.asarray(lv1_tr), np.asarray(lv2_tr),
                          method="svd")
    p = lambda f, x: np.asarray(f(res, x))
    want_tr = metrics.eval_retrieval(p(cca_ops.cca_transform_v1, lv1_tr),
                                     p(cca_ops.cca_transform_v2, lv2_tr))
    want_va = metrics.eval_retrieval(p(cca_ops.cca_transform_v1, lv1_va),
                                     p(cca_ops.cca_transform_v2, lv2_va))
    got_tr = metrics.unpack_retrieval_metrics(vec_tr)
    got_va = metrics.unpack_retrieval_metrics(vec_va)
    for got, want in [(got_tr, want_tr), (got_va, want_va)]:
        assert got[3] == want[3]
        np.testing.assert_allclose(got[4], want[4], rtol=1e-4)
        np.testing.assert_allclose(got[1], want[1], rtol=1e-4)
