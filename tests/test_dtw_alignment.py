"""DTW accumulation/traceback parity + alignment pipeline behavior."""

import numpy as np

from audio_sheet_retrieval_tpu.ops import dtw
from audio_sheet_retrieval_tpu.retrieval import alignment


def _np_reference_dtw(dist):
    """Direct transcription of the reference recurrence for the oracle."""
    transposed = False
    if dist.shape[1] > dist.shape[0]:
        dist = dist.T
        transposed = True
    r, c = dist.shape
    D0 = np.zeros((r + 1, c + 1))
    D0[0, 1:] = np.inf
    D0[1:, 0] = np.inf
    D0[1:, 1:] = dist
    D1 = D0[1:, 1:]
    C = D1.copy()
    for i in range(r):
        for j in range(c):
            D1[i, j] += min(D0[i, j], D0[i, j + 1], D0[i + 1, j])
    path = dtw._traceback(D0)
    if not transposed:
        path = (path[1], path[0])
    return D1[-1, -1] / sum(D1.shape), C, D1.copy(), path


def test_device_accumulation_matches_numpy():
    rng = np.random.default_rng(0)
    dist = rng.random((90, 70))
    want = _np_reference_dtw(dist.copy())
    # force the device path
    got = dtw.dtw_by_dist(dist.copy(), use_device=True)
    np.testing.assert_allclose(got[2], want[2], rtol=1e-5)
    np.testing.assert_allclose(got[0], want[0], rtol=1e-5)
    np.testing.assert_array_equal(got[3][0], want[3][0])
    np.testing.assert_array_equal(got[3][1], want[3][1])


def test_dtw_transpose_convention():
    rng = np.random.default_rng(1)
    dist = rng.random((40, 80))  # wide: triggers internal transpose
    got = dtw.dtw_by_dist(dist, use_device=False)
    want = _np_reference_dtw(dist.copy())
    np.testing.assert_allclose(got[2], want[2])
    np.testing.assert_array_equal(got[3][0], want[3][0])


def test_dtw_identity_path():
    n = 30
    dist = np.ones((n, n)) - np.eye(n)  # zero cost on the diagonal
    _, _, D1, path = dtw.dtw_by_dist(dist, use_device=False)
    np.testing.assert_array_equal(path[0], np.arange(n))
    np.testing.assert_array_equal(path[1], np.arange(n))
    assert D1[-1, -1] == 0.0


def test_compute_alignment_recovers_linear_map():
    """Synthetic embeddings with a known monotone correspondence: DTW must
    recover the frame->pixel mapping to a few pixels."""
    rng = np.random.default_rng(2)
    n_sheet, n_spec, d = 120, 150, 16
    # shared latent trajectory sampled at different rates
    t_sheet = np.linspace(0, 1, n_sheet)
    t_spec = np.linspace(0, 1, n_spec)
    basis = rng.standard_normal((8, d))

    def embed(ts):
        # sin+cos features: never the zero vector, injective over [0, 1]
        feats = np.stack(
            [np.sin((k + 1) * np.pi * ts) for k in range(4)]
            + [np.cos((k + 1) * np.pi * ts) for k in range(4)], axis=1)
        e = feats @ basis
        return (e / np.linalg.norm(e, axis=1, keepdims=True)).astype(np.float32)

    img_codes = embed(t_sheet)
    spec_codes = embed(t_spec) + 0.01 * rng.standard_normal(
        (n_spec, d)).astype(np.float32)

    sheet_idxs = (t_sheet * 2000).astype(int)     # pixel coordinates
    spec_idxs = np.arange(n_spec) * 2             # frame indices

    mapping, res = alignment.compute_alignment(
        img_codes, spec_codes, sheet_idxs, spec_idxs, align_by="pydtw")
    # ground truth: frame f (spec index f/2) -> pixel t*2000
    frames = np.asarray(sorted(mapping.keys()))
    got = np.asarray([mapping[f] for f in frames])
    want = np.interp(frames, spec_idxs, t_spec * 2000)
    err = np.abs(got - want)
    assert np.median(err) < 40  # a couple of sheet-slice quanta

    base_map, _ = alignment.compute_alignment(
        img_codes, spec_codes, sheet_idxs, spec_idxs, align_by="baseline")
    assert len(base_map) == len(mapping)


def test_estimate_alignment_error():
    mapping = {10: 100.0, 11: 110.0, 12: 120.0}
    errs = alignment.estimate_alignment_error(
        true_coords=[105.0, 125.0], true_onsets=[10, 12],
        a2s_mapping=mapping)
    np.testing.assert_allclose(errs, [5.0, 5.0])


def test_hashing_pool_entities_and_slices():
    rng = np.random.default_rng(3)
    sheets = [np.zeros((50, 400), np.float32)]
    coords = [np.stack([np.zeros(10), np.linspace(60, 340, 10)], axis=1)]
    specs = [rng.random((92, 300)).astype(np.float32)]
    onsets = [np.linspace(30, 270, 10).astype(int)]
    pool = alignment.ContinuousSpec2SheetHashingPool(
        sheets, coords, specs, onsets, spec_context=40, sheet_context=100,
        staff_height=50, shuffle=False)
    assert pool.shape[0] == 10
    sh, sp = pool[0:3]
    assert sh.shape == (3, 1, 50, 100)
    assert sp.shape == (3, 1, 92, 40)


def test_fastdtw_from_sequences():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((30, 8)).astype(np.float32)
    # y is x with some frames repeated: path must be monotone through all
    y = np.repeat(x, 2, axis=0)
    d, C, D1, path = dtw.fastdtw(x, y, dist="cosine", use_device=False)
    assert np.isfinite(d)
    assert len(path[0]) >= max(len(x), len(y))
    # identical sequences align on the diagonal with ~zero cost
    d2, _, _, p2 = dtw.fastdtw(x, x.copy(), dist="cosine", use_device=False)
    assert d2 < 1e-5


def test_device_traceback_matches_host_exactly():
    """Device traceback (scalar-read scan over the diagonal layout) must
    reproduce the host path bit-for-bit, including argmin tie order —
    quantized costs force plenty of exact ties."""
    from audio_sheet_retrieval_tpu.ops import dtw

    rng = np.random.default_rng(3)
    for shape in [(90, 70), (64, 128), (70, 65)]:  # all >= device cutoff
        # low-cardinality costs -> many exact ties in the DP
        dist = (rng.integers(0, 4, shape) / 4.0).astype(np.float32)
        nd_d, _, acc_d, p_d = dtw.dtw_by_dist(dist, use_device=True,
                                              return_acc=False)
        nd_h, _, acc_h, p_h = dtw.dtw_by_dist(dist, use_device=False)
        assert acc_d is None and acc_h is not None
        np.testing.assert_array_equal(p_d[0], p_h[0])
        np.testing.assert_array_equal(p_d[1], p_h[1])
        np.testing.assert_allclose(nd_d, nd_h, atol=1e-5)
