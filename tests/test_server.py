"""Piece-identification server: DB build, voting, both directions, persistence."""

import numpy as np
import pytest

import jax

from audio_sheet_retrieval_tpu.data import synthetic
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.retrieval.gallery import DeviceGallery
from audio_sheet_retrieval_tpu.retrieval.server import AudioSheetServer
from audio_sheet_retrieval_tpu.retrieval.wrapper import RetrievalWrapper


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    # identity projection so encoder output distances are meaningful
    import jax.numpy as jnp

    params = params._replace(cca=params.cca._replace(
        U=jnp.eye(cfg.dim_latent), V=jnp.eye(cfg.dim_latent)))
    wrapper = RetrievalWrapper(cfg, params=params, batch_size=50)

    names = ["piece_%d" % i for i in range(4)]
    images, specs, o2cs = synthetic.make_piece_list(5, 4, n_onsets=40)
    piece_data = {n: (images[i], specs[i], o2cs[i])
                  for i, n in enumerate(names)}

    srv = AudioSheetServer()
    srv.initialize_embedding_network(wrapper)
    srv.initialize_sheet_db(names, lambda n: piece_data[n])
    srv.initialize_audio_db(names, lambda n: piece_data[n])
    return srv, names, images, specs


def test_gallery_topk_matches_bruteforce():
    rng = np.random.default_rng(0)
    codes = rng.standard_normal((500, 16)).astype(np.float32)
    ids = rng.integers(0, 7, 500)
    gal = DeviceGallery(codes, ids, bucket=128)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    d, idx = gal.topk(q, 10)
    # brute force cosine
    from scipy.spatial.distance import cdist

    dists = cdist(q, codes, metric="cosine")
    want = np.sort(dists, axis=1)[:, :10]
    np.testing.assert_allclose(np.sort(d, axis=1), want, atol=1e-5)


def test_detect_score_votes_for_matching_gallery(setup):
    """End-to-end detect_score machinery (windowing -> embed -> top-k ->
    vote). An untrained encoder has no cross-modal correspondence, so the
    'sheet' gallery is stood up from audio-window codes: the query piece's
    own windows must then dominate the vote."""
    srv, names, images, specs = setup
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.initialize_audio_db_from_specs(names, [s[0] for s in specs])
    srv2.sheet_snippet_codes = srv2.perform_excerpt_codes
    srv2.sheet_snippet_ids = srv2.perform_excerpt_ids
    srv2.id_to_piece = dict(srv2.id_to_perform)
    srv2._refresh_sheet_gallery()
    result, votes = srv2.detect_score(specs[2][0], top_k=4, n_candidates=5)
    assert result[0] == names[2]
    assert votes[0] == max(votes)


def test_detect_performance_votes_for_matching_gallery(setup):
    srv, names, images, specs = setup
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.initialize_sheet_db_from_imges(names, images)
    srv2.perform_excerpt_codes = srv2.sheet_snippet_codes
    srv2.perform_excerpt_ids = srv2.sheet_snippet_ids
    srv2.id_to_perform = dict(srv2.id_to_piece)
    srv2._refresh_audio_gallery()
    result, votes = srv2.detect_performance(images[1], top_k=4, n_candidates=5)
    assert result[0] == names[1]


def test_db_save_load_roundtrip(setup, tmp_path):
    srv, names, images, specs = setup
    p = str(tmp_path / "sheet_db.pkl")
    srv.save_sheet_db_file(p)
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.load_sheet_db_file(p)
    np.testing.assert_array_equal(srv2.sheet_snippet_codes,
                                  srv.sheet_snippet_codes)
    r1, _ = srv.detect_score(specs[0][0], top_k=2, n_candidates=3)
    r2, _ = srv2.detect_score(specs[0][0], top_k=2, n_candidates=3)
    assert r1 == r2


def test_sliding_window_db_variants(setup):
    srv, names, images, specs = setup
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.initialize_sheet_db_from_imges(names, images)
    assert srv2.sheet_snippet_codes.shape[1] == 8
    assert len(np.unique(srv2.sheet_snippet_ids)) == 4
    srv2.initialize_audio_db_from_specs(names, [s[0] for s in specs])
    assert len(srv2.perform_excerpt_codes) > 0
    r, v = srv2.detect_score(specs[3][0], top_k=4, n_candidates=5)
    assert names[3] in r


def test_streaming_run_reports(setup):
    srv, names, images, specs = setup
    updates = []
    ranking, votes = srv.run(
        spec=specs[0][0][:, :80], top_k=3, n_candidates=3,
        running_frames=20,
        on_update=lambda i, r, v, fps: updates.append((i, list(r))))
    assert len(updates) == 80
    # after the window fills, rankings appear
    assert any(r for _, r in updates)


def test_streaming_run_from_live_frame_source(setup):
    """The mic injection point: run(frame_source=...) consumes a frame
    generator (the live-capture abstraction standing in for the reference's
    madmom Stream, reference audio_sheet_server.py:44-50,95) and produces
    the same ranking as the equivalent precomputed-spec run."""
    srv, names, images, specs = setup
    spec = specs[0][0][:, :80]

    def mic_frames():
        for i in range(spec.shape[1]):
            yield spec[:, i]

    updates = []
    ranking, votes = srv.run(
        frame_source=mic_frames, top_k=3, n_candidates=3, running_frames=20,
        on_update=lambda i, r, v, fps: updates.append((i, list(r))))
    assert len(updates) == 80
    ref_ranking, _ = srv.run(
        spec=spec, top_k=3, n_candidates=3, running_frames=20,
        on_update=lambda *a: None)
    assert ranking == ref_ranking
    # max_frames caps a (potentially infinite) live source
    few = []
    srv.run(frame_source=iter(spec.T), max_frames=5, top_k=3,
            n_candidates=3, on_update=lambda i, *a: few.append(i))
    assert len(few) == 5


def test_device_stream_matches_host_stream_votes(setup):
    """Fused streaming path produces the same ranking as the host loop."""
    srv, names, images, specs = setup
    # same-modality gallery (untrained encoder: see detect_score test)
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.initialize_audio_db_from_specs(names, [s[0] for s in specs])
    srv2.sheet_snippet_codes = srv2.perform_excerpt_codes
    srv2.sheet_snippet_ids = srv2.perform_excerpt_ids
    srv2.id_to_piece = dict(srv2.id_to_perform)
    srv2._refresh_sheet_gallery()

    spec = specs[1][0][:, :90]
    host_rank, host_votes = srv2.run(spec=spec, top_k=3, n_candidates=5,
                                     on_update=lambda *a: None)
    dev_rank, dev_votes, fps = srv2.run_device_stream(
        spec, top_k=3, n_candidates=5)
    assert dev_rank[0] == host_rank[0]
    # identical vote histograms (exact host-loop parity incl. warm-up)
    np.testing.assert_allclose(np.asarray(dev_votes),
                               np.asarray(host_votes), atol=1e-9)
    assert fps > 0
    # cached retriever reused on a second call; tail-remainder path covered
    dev_rank2, _, _ = srv2.run_device_stream(spec[:, :61], top_k=3,
                                             n_candidates=5)
    assert srv2._stream_cache is not None


def test_detect_score_from_audio_matches_host_chain(setup):
    """Fused one-dispatch query (DSP+embed+top-k+vote on device, mu-law
    ingest) ranks like proc.process(signal) -> detect_score."""
    from audio_sheet_retrieval_tpu.ops.audio import AudioProcessor

    srv, names, images, specs = setup
    proc = AudioProcessor()
    sr = proc.sample_rate
    rng = np.random.default_rng(9)
    t = np.arange(sr * 6) / sr
    sig = ((np.sin(2 * np.pi * 440 * t) + np.sin(2 * np.pi * 660 * t))
           * 8000 + rng.standard_normal(len(t)) * 400).astype(np.int16)

    spec = proc.process(sig)
    want_rank, want_votes = srv.detect_score(spec, top_k=4, n_candidates=5)
    got_rank, got_votes = srv.detect_score_from_audio(sig, top_k=4,
                                                      n_candidates=5)
    assert got_rank[0] == want_rank[0]
    # vote histograms agree up to mu-law quantization jitter
    np.testing.assert_allclose(got_votes[:len(want_votes)], want_votes,
                               atol=0.05)
    # cached program reused on a second query
    key = srv._fused_query_key
    srv.detect_score_from_audio(sig, top_k=2, n_candidates=5)
    assert srv._fused_query_key == key


def test_detect_score_from_spec_matches_host_chain(setup):
    """Spec-upload fused query (host DSP, u8-quantized wire — the
    minimum-wire serving mode) ranks like the host detect_score chain,
    and the f32 payload variant matches it near-exactly."""
    from audio_sheet_retrieval_tpu.ops.audio import AudioProcessor

    srv, names, images, specs = setup
    proc = AudioProcessor()
    sr = proc.sample_rate
    rng = np.random.default_rng(23)
    t = np.arange(sr * 6) / sr
    sig = ((np.sin(2 * np.pi * 392 * t) + np.sin(2 * np.pi * 523 * t))
           * 8000 + rng.standard_normal(len(t)) * 400).astype(np.int16)
    spec = proc.process_host(sig)

    want_rank, want_votes = srv.detect_score(spec, top_k=4, n_candidates=5)
    got_rank, got_votes = srv.detect_score_from_spec(spec, top_k=4,
                                                     n_candidates=5)
    assert got_rank[0] == want_rank[0]
    np.testing.assert_allclose(got_votes[:len(want_votes)], want_votes,
                               atol=0.05)  # u8 quantization jitter
    # cached program reused across calls with the same geometry key
    key = srv._fused_spec_query_key
    srv.detect_score_from_spec(spec, top_k=2, n_candidates=5)
    assert srv._fused_spec_query_key == key
    f32_rank, f32_votes = srv.detect_score_from_spec(
        spec, top_k=4, n_candidates=5, quantize=None)
    assert f32_rank[0] == want_rank[0]
    np.testing.assert_allclose(f32_votes[:len(want_votes)], want_votes,
                               atol=1e-6)


def test_detect_performance_from_sheet_matches_host_chain(setup):
    """Fused one-dispatch sheet query (4-bit upload, device windows+embed+
    top-k+vote) ranks like the host detect_performance chain."""
    srv, names, images, specs = setup
    srv2 = AudioSheetServer()
    srv2.initialize_embedding_network(srv.embed_network)
    srv2.initialize_sheet_db_from_imges(names, images)
    srv2.perform_excerpt_codes = srv2.sheet_snippet_codes
    srv2.perform_excerpt_ids = srv2.sheet_snippet_ids
    srv2.id_to_perform = dict(srv2.id_to_piece)
    srv2._refresh_audio_gallery()

    want_rank, want_votes = srv2.detect_performance(images[1], top_k=4,
                                                    n_candidates=5)
    got_rank, got_votes = srv2.detect_performance_from_sheet(
        images[1], top_k=4, n_candidates=5)
    assert got_rank[0] == want_rank[0]
    np.testing.assert_allclose(got_votes[:len(want_votes)], want_votes,
                               atol=1e-6)  # lossless strip upload
    keys = set(srv2._fused_sheet_queries)
    srv2.detect_performance_from_sheet(images[2], top_k=2, n_candidates=5)
    # same geometry bucket -> the cached program is reused, not rebuilt
    assert set(srv2._fused_sheet_queries) == keys


def test_device_resident_sheet_db_matches_host_build(setup):
    """initialize_sheet_db_from_imges_device (strip uploaded once via
    bitmap-RLE, codes stay on device) must agree with the host window-loop
    build: near-identical codes (folded vs unfolded eval paths) and the
    same retrieval behavior; save/load round-trips the device codes."""
    import tempfile

    srv, names, images, specs = setup
    host = AudioSheetServer()
    host.initialize_embedding_network(srv.embed_network)
    host.initialize_sheet_db_from_imges(names, images)

    dev = AudioSheetServer()
    dev.initialize_embedding_network(srv.embed_network)
    dev.initialize_sheet_db_from_imges_device(names, images)

    assert dev.sheet_snippet_codes.shape == host.sheet_snippet_codes.shape
    np.testing.assert_array_equal(dev.sheet_snippet_ids,
                                  host.sheet_snippet_ids)
    cos = np.sum(np.asarray(dev.sheet_snippet_codes)
                 * np.asarray(host.sheet_snippet_codes), axis=1)
    assert cos.min() > 0.9999  # folded-vs-unfolded eval tolerance

    r_host, _ = host.detect_score(specs[2][0], top_k=3, n_candidates=5)
    r_dev, _ = dev.detect_score(specs[2][0], top_k=3, n_candidates=5)
    assert r_dev[0] == r_host[0]

    with tempfile.NamedTemporaryFile(suffix=".pkl") as tf:
        dev.save_sheet_db_file(tf.name)
        srv3 = AudioSheetServer()
        srv3.initialize_embedding_network(srv.embed_network)
        srv3.load_sheet_db_file(tf.name)
        assert isinstance(srv3.sheet_snippet_codes, np.ndarray)
        np.testing.assert_allclose(srv3.sheet_snippet_codes,
                                   np.asarray(dev.sheet_snippet_codes))


def test_device_resident_audio_db_matches_host_build(setup):
    srv, names, images, specs = setup
    host = AudioSheetServer()
    host.initialize_embedding_network(srv.embed_network)
    host.initialize_audio_db_from_specs(names, [s[0] for s in specs])

    dev = AudioSheetServer()
    dev.initialize_embedding_network(srv.embed_network)
    dev.initialize_audio_db_from_specs_device(names, [s[0] for s in specs])

    assert dev.perform_excerpt_codes.shape == host.perform_excerpt_codes.shape
    np.testing.assert_array_equal(dev.perform_excerpt_ids,
                                  host.perform_excerpt_ids)
    cos = np.sum(np.asarray(dev.perform_excerpt_codes)
                 * np.asarray(host.perform_excerpt_codes), axis=1)
    assert cos.min() > 0.9999
    r_host, _ = host.detect_performance(images[1], top_k=2, n_candidates=5)
    r_dev, _ = dev.detect_performance(images[1], top_k=2, n_candidates=5)
    assert r_dev[0] == r_host[0]
