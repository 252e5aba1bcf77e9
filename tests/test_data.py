"""Data pools / iterators: entity indexing, augmentation, sub-epoch semantics."""

import numpy as np
import pytest

from audio_sheet_retrieval_tpu.data import iterators, pools, synthetic


def _small_pool(augment=None, shuffle=False, seed=0):
    images, specs, o2cs = synthetic.make_piece_list(
        seed, 2, n_onsets=30, n_performances=2)
    return pools.AudioScoreRetrievalPool(
        images, specs, o2cs,
        data_augmentation=augment or pools.NO_AUGMENT,
        shuffle=shuffle, rng=np.random.default_rng(seed))


def test_pool_entity_filtering_bounds():
    pool = _small_pool()
    assert pool.shape[0] > 0
    for (i_sheet, i_spec, i_onset) in pool.train_entities:
        m = pool.o2c_maps[i_sheet][i_spec]
        onset, coord = int(m[i_onset, 0]), int(m[i_onset, 1])
        o_start = onset - pools.SPEC_CONTEXT // 2
        assert o_start >= 0
        assert o_start + pools.SPEC_CONTEXT < pool.specs[i_sheet][i_spec].shape[1]
        assert coord - pools.SHEET_CONTEXT // 2 >= 0
        # reference quirk: sheet stop bound uses o_start (data_pools.py:110)
        assert o_start + pools.SHEET_CONTEXT < pool.images[i_sheet].shape[1]


def test_pool_batch_shapes_and_centering():
    pool = _small_pool()
    sheet, spec = pool[0:5]
    assert sheet.shape == (5, 1, 160, 200)
    assert spec.shape == (5, 1, 92, 42)
    # without augmentation the note head is centered in the snippet (pick an
    # entity away from the strip edges: the 4x-context window must not clip)
    for idx, (i_sheet, i_spec, i_onset) in enumerate(pool.train_entities):
        coord = int(pool.o2c_maps[i_sheet][i_spec][i_onset, 1])
        w = pool.images[i_sheet].shape[1]
        if 2 * 200 <= coord <= w - 2 * 200:
            break
    sheet_c, _ = pool[idx:idx + 1]
    # the target note head (pure black blob) must sit at the snippet center
    center_cols = sheet_c[0, 0][:, 94:106]
    assert center_cols.min() == 0.0


def test_pool_augmentation_changes_samples():
    pool_aug = _small_pool(augment=pools.FULL_AUGMENT, seed=1)
    a, sa = pool_aug[0:1]
    b, sb = pool_aug[0:1]
    # same entity, different augmented crops (scaling/translation jitter)
    assert not np.array_equal(a, b) or not np.array_equal(sa, sb)
    assert a.shape == (1, 1, 160, 200)
    pool_noaug = _small_pool(seed=1)
    c, _ = pool_noaug[0:1]
    d, _ = pool_noaug[0:1]
    np.testing.assert_array_equal(c, d)


def test_multiview_iterator_subepochs_and_wraparound():
    pool = _small_pool()
    n = pool.shape[0]
    k = (n // 2) - ((n // 2) % 10)  # half the pool, multiple of batch
    it = iterators.MultiviewPoolIteratorUnsupervised(
        batch_size=10, k_samples=k, shuffle=False)
    it = it(pool)
    assert it.n_epochs == n // k
    b1 = sum(1 for _ in it)
    assert b1 == int(np.ceil(k / 10))
    assert it.epoch_counter == 1
    # second sub-epoch iterates the next slice of the pool
    first_next = next(iter(it))
    expect, _ = pool[k:k + 10]
    np.testing.assert_array_equal(first_next[0], expect)


def test_iterator_wraparound_fill():
    pool = _small_pool()
    bs = 7
    it = iterators.MultiviewPoolIteratorUnsupervised(
        batch_size=bs, k_samples=None, shuffle=False)(pool)
    batches = list(it)
    assert all(b[0].shape[0] == bs for b in batches)


def test_threaded_generator_order():
    gen = iterators.threaded_generator(iter(range(50)), num_cached=4)
    assert list(gen) == list(range(50))


def test_batch_compute_padding():
    X = np.random.default_rng(0).random((23, 3)).astype(np.float32)
    got = iterators.batch_compute1(X, lambda e: e * 2.0, batch_size=10)
    np.testing.assert_allclose(got, X * 2.0, rtol=1e-6)
    got2 = iterators.batch_compute2(X, X, lambda a, b: a + b, batch_size=10)
    np.testing.assert_allclose(got2, 2 * X, rtol=1e-6)


def test_unwrap_sheet_image_coords():
    # two synthetic 'systems' on a page; noteheads remap onto the strip
    page = np.full((400, 300), 255, np.uint8)
    page[95:105, 50] = 0     # note in system 1
    page[295:305, 120] = 0   # note in system 2
    systems = [(60, 10, 140, 290), (260, 10, 340, 290)]
    coords = {1: (100.0, 50.0), 2: (300.0, 120.0)}
    strip, un_coords = pools.unwrap_sheet_image(
        page, systems, coords, window_top=80, window_bottom=80)
    assert strip.shape[0] == 160
    assert strip.shape[1] == 2 * 280
    y1, x1 = un_coords[1]
    y2, x2 = un_coords[2]
    assert x2 > 280  # second system appended after the first
    assert abs(y1 - y2) < 1  # same relative height in both systems
    # pixel content actually moved with the coords
    assert strip[int(y1), int(x1)] == 0
    assert strip[int(y2), int(x2)] == 0


def test_onset_to_coordinates_dedup():
    alignment = [(1, 10), (2, 10), (3, 14)]
    coords = {1: (0, 100), 2: (0, 105), 3: (0, 200)}
    m = pools.onset_to_coordinates(alignment, coords)
    assert m.shape == (2, 2)
    assert m[0].tolist() == [10, 100]  # first mapping per onset frame kept
    assert m[1].tolist() == [14, 200]


def test_confusable_piece_list_structure():
    """Hard-corpus generator (VERDICT r3 #1): shared motif bank,
    transposed copies, near-duplicates — rendered identically to the
    training distribution."""
    from audio_sheet_retrieval_tpu.data import synthetic

    imgs, specs, o2cs, kinds = synthetic.make_confusable_piece_list(
        31, 9, n_onsets=60)
    assert kinds == ["base", "transposed", "neardup"] * 3
    # all pieces share geometry
    assert all(im.shape == imgs[0].shape for im in imgs)
    # near-duplicate differs from its base in only a few note glyphs
    nd_diff = (imgs[0] != imgs[2]).mean()
    assert 0 < nd_diff < 0.02
    # transposition moves EVERY notehead (same x grid, shifted y)
    tr_diff = (imgs[0] != imgs[1]).mean()
    assert tr_diff > nd_diff
    # distinct bases are distinct
    assert (imgs[0] != imgs[3]).mean() > nd_diff
    # onset maps identical across the triple (same x grid/onset frames)
    np.testing.assert_array_equal(o2cs[0][0], o2cs[1][0])
    # deterministic
    imgs2, _, _, kinds2 = synthetic.make_confusable_piece_list(
        31, 9, n_onsets=60)
    assert kinds2 == kinds and np.array_equal(imgs2[4], imgs[4])


def test_piece_id_accuracy_margins_consistent():
    """piece_id_accuracy margin bookkeeping: errors (margin<=0) and
    rank<=1 counts are two views of the same outcomes."""
    import jax

    from audio_sheet_retrieval_tpu.data import synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.retrieval.accuracy import piece_id_accuracy

    imgs, specs, o2cs, _ = synthetic.make_confusable_piece_list(
        7, 6, n_onsets=40)
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8)
    params = cca_model.init_model(jax.random.PRNGKey(1), cfg)
    acc = piece_id_accuracy(params, cfg, imgs, [s[0] for s in specs],
                            coords=[oc[0][:, 1] for oc in o2cs],
                            queries_per_piece=1, excerpts_per_query=8,
                            quantize=16)
    m = np.asarray(acc["margins"])  # plain list in the dict (json-able)
    assert len(m) == acc["n"] == 6
    # a strictly positive margin IS a rank-1 hit under the pessimistic
    # tie rule; margin 0 is a tie and counts as rank>=2
    assert int((m > 0).sum()) == acc["rank1"]
    # per-query ranks (the sweep's pairing channel) agree with the counts
    r = np.asarray(acc["ranks"])
    assert len(r) == acc["n"]
    assert int((r <= 1).sum()) == acc["rank1"]
    assert int((r <= 5).sum()) == acc["rank5"]


def test_accuracy_sweep_paired_stats():
    """scripts/accuracy_sweep.py statistics: exact McNemar and the paired
    delta CI, checked against hand-computed values."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "asr_sweep", os.path.join(os.path.dirname(__file__), "..",
                                  "scripts", "accuracy_sweep.py"))
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    # no discordant pairs -> p = 1
    assert sweep.mcnemar_exact(0, 0) == 1.0
    # b=5, c=0: two-sided exact = 2 * (1/2)^5 = 0.0625
    assert sweep.mcnemar_exact(5, 0) == pytest.approx(0.0625)
    assert sweep.mcnemar_exact(0, 5) == pytest.approx(0.0625)
    # symmetric split is maximally insignificant
    assert sweep.mcnemar_exact(3, 3) == 1.0
    # b=9, c=1: 2 * (C(10,0)+C(10,1)) / 2^10 = 22/1024
    assert sweep.mcnemar_exact(9, 1) == pytest.approx(22 / 1024)

    # paired CI: identical arms -> delta 0, zero-width interval
    a = np.array([1, 1, 0, 1, 0], bool)
    d, ci = sweep.paired_delta_ci(a, a)
    assert d == 0.0 and ci == (0.0, 0.0)
    # one discordant pair out of 5 -> delta 0.2; CI contains 0 (n tiny)
    b = np.array([1, 1, 0, 0, 0], bool)
    d, ci = sweep.paired_delta_ci(a, b)
    assert d == pytest.approx(0.2)
    assert ci[0] < 0 < ci[1]
