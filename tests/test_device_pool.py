"""Device-resident pool: parity with the host pool + augmentation behavior."""

import numpy as np
import pytest

from audio_sheet_retrieval_tpu.data import device_pool, pools, synthetic


@pytest.fixture(scope="module")
def piece_data():
    return synthetic.make_piece_list(11, 3, n_onsets=40, n_performances=2)


def _host_pool(piece_data, augment=None, shuffle=False):
    return pools.AudioScoreRetrievalPool(
        *piece_data, data_augmentation=augment or pools.NO_AUGMENT,
        shuffle=shuffle, rng=np.random.default_rng(0))


def _dev_pool(piece_data, augment=None, shuffle=False):
    return device_pool.DevicePool(
        *piece_data, data_augmentation=augment or pools.NO_AUGMENT,
        shuffle=shuffle, rng=np.random.default_rng(0))


def test_entity_count_matches_host_pool(piece_data):
    hp = _host_pool(piece_data)
    dp = _dev_pool(piece_data)
    assert dp.shape[0] == hp.shape[0]


def test_noaug_batches_match_host_pool_exactly(piece_data):
    hp = _host_pool(piece_data)
    dp = _dev_pool(piece_data)
    want_sheet, want_spec = hp[0:16]
    got_sheet, got_spec = dp[0:16]
    np.testing.assert_array_equal(np.asarray(got_sheet), want_sheet)
    np.testing.assert_allclose(np.asarray(got_spec), want_spec, atol=1e-6)


def test_noaug_edge_entities_match(piece_data):
    """First/last entities sit near piece boundaries — the clipped-crop
    centering must reproduce the host pool."""
    hp = _host_pool(piece_data)
    dp = _dev_pool(piece_data)
    n = hp.shape[0]
    for sl in (slice(0, 4), slice(n - 4, n)):
        want_sheet, _ = hp[sl]
        got_sheet, _ = dp[sl]
        np.testing.assert_array_equal(np.asarray(got_sheet), want_sheet)


def test_augmented_batches_vary_and_keep_shape(piece_data):
    dp = _dev_pool(piece_data, augment=pools.FULL_AUGMENT)
    a1, b1 = dp.batch(np.arange(8))
    a2, b2 = dp.batch(np.arange(8))
    assert a1.shape == (8, 1, 160, 200)
    assert b1.shape == (8, 1, 92, 42)
    assert not np.array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(b1), np.asarray(b2))
    # eval-mode assembly is deterministic even with augment configured
    c1, d1 = dp.batch(np.arange(8), train=False)
    c2, d2 = dp.batch(np.arange(8), train=False)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_device_iterator_semantics(piece_data):
    dp = _dev_pool(piece_data)
    n = dp.shape[0]
    k = (n // 2) - ((n // 2) % 10)
    it = device_pool.DeviceBatchIterator(batch_size=10, k_samples=k,
                                         shuffle=False)(dp)
    assert it.n_epochs == n // k
    batches = list(it)
    assert len(batches) == int(np.ceil(k / 10))
    assert all(b[0].shape[0] == 10 for b in batches)
    assert it.epoch_counter == 1


@pytest.mark.slow
def test_device_pool_trains_with_engine(tmp_path):
    """End-to-end: the engine's fit loop over device-resident data."""
    import jax

    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.train import engine

    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=20, k_samples=100,
                           patience=1, refinement_steps=0, max_epochs=2)
    tr = synthetic.make_piece_list(7, 2, n_onsets=50)
    va = synthetic.make_piece_list(8, 1, n_onsets=50)
    data = {
        "train": device_pool.DevicePool(
            *tr, data_augmentation=pools.FULL_AUGMENT,
            rng=np.random.default_rng(0)),
        "valid": device_pool.DevicePool(
            *va, data_augmentation=pools.NO_AUGMENT, shuffle=False,
            rng=np.random.default_rng(1)),
    }
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = device_pool.DeviceBatchIterator(batch_size=20, k_samples=100)
    va_it = device_pool.DeviceBatchIterator(batch_size=20, shuffle=False,
                                            train=False)
    epochs = []
    best, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                                out_path=str(tmp_path), verbose=False,
                                on_epoch=epochs.append)
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["train_loss"])
