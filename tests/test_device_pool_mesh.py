"""Mesh-sharded DevicePool: data-parallel fused training on 8 devices."""

import jax
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.data import device_pool as dpool
from audio_sheet_retrieval_tpu.data import pools, synthetic
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.parallel import mesh as pm
from audio_sheet_retrieval_tpu.train import engine, state as tstate

pytestmark = pytest.mark.slow  # compile-heavy virtual-mesh suite


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8
    return pm.make_mesh((8,), axis_names=(pm.DATA_AXIS,))


def test_sharded_pool_batches_match_unsharded(mesh8):
    tr = synthetic.make_piece_list(5, 2, n_onsets=40)
    dp1 = dpool.DevicePool(*tr, data_augmentation=pools.NO_AUGMENT,
                           shuffle=False, rng=np.random.default_rng(0))
    dp2 = dpool.DevicePool(*tr, data_augmentation=pools.NO_AUGMENT,
                           shuffle=False, rng=np.random.default_rng(0),
                           mesh=mesh8)
    idx = np.arange(16)
    a1, b1 = dp1.batch(idx, train=False)
    a2, b2 = dp2.batch(idx, train=False)
    assert len(a2.sharding.device_set) == 8  # sharded across the mesh
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_sharded_fused_epoch_trains(mesh8):
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16)
    tr = synthetic.make_piece_list(6, 2, n_onsets=60)
    dp = dpool.DevicePool(*tr, data_augmentation=pools.FULL_AUGMENT,
                          rng=np.random.default_rng(0), mesh=mesh8)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    opt = tstate.make_optimizer(1e-3)
    st = tstate.init_train_state(params, cfg, opt)
    from jax.sharding import NamedSharding, PartitionSpec as P

    st = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh8, P())), st)
    runner = dpool.make_epoch_runner(cfg, opt, dp)
    ent = (np.arange(5 * 16) % dp.shape[0]).reshape(5, 16)
    st2, losses, corrs = runner(st, ent)
    assert np.isfinite(np.asarray(losses)).all()
    w0 = np.asarray(st.trainable["view1"]["blocks"][0]["w"])
    w1 = np.asarray(st2.trainable["view1"]["blocks"][0]["w"])
    assert not np.allclose(w0, w1)


def test_fit_with_sharded_device_pool(mesh8):
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16, k_samples=64,
                           patience=1, refinement_steps=0, max_epochs=2)
    tr = synthetic.make_piece_list(7, 2, n_onsets=60)
    va = synthetic.make_piece_list(8, 1, n_onsets=60)
    data = {
        "train": dpool.DevicePool(*tr, data_augmentation=pools.FULL_AUGMENT,
                                  rng=np.random.default_rng(0), mesh=mesh8),
        "valid": dpool.DevicePool(*va, data_augmentation=pools.NO_AUGMENT,
                                  shuffle=False,
                                  rng=np.random.default_rng(1), mesh=mesh8),
    }
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = dpool.DeviceBatchIterator(batch_size=16, k_samples=64)
    va_it = dpool.DeviceBatchIterator(batch_size=16, shuffle=False,
                                      train=False)
    epochs = []
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        _, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                                 out_path=td, verbose=False,
                                 on_epoch=epochs.append, mesh=mesh8)
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["train_loss"])
