"""Piece-sharded dataset over the virtual 8-device mesh: locality, memory
partitioning, and fused data-parallel training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from audio_sheet_retrieval_tpu.data import pools, synthetic
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.parallel import sharded_pool as spool
from audio_sheet_retrieval_tpu.train import state as tstate

pytestmark = pytest.mark.slow  # compile-heavy virtual-mesh suite


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("data",))


def test_partition_balances_width():
    widths = [100, 90, 80, 10, 10, 10, 5, 5]
    groups = spool.partition_pieces(widths, 4)
    loads = sorted(sum(widths[i] for i in g) for g in groups)
    assert all(len(g) > 0 for g in groups)
    assert loads[-1] - loads[0] <= 80  # greedy balance, no empty shard


def test_dataset_is_partitioned_not_replicated(mesh8):
    tr = synthetic.make_piece_list(3, 8, n_onsets=40)
    dp = spool.ShardedDevicePool(*tr, mesh=mesh8,
                                 data_augmentation=pools.NO_AUGMENT,
                                 rng=np.random.default_rng(0))
    # each device holds exactly ONE [1, H, W] plane, 1/8 of the stack
    shard_shapes = {s.data.shape for s in dp.strip.addressable_shards}
    assert shard_shapes == {(1,) + dp.strip.shape[1:]}
    assert len(dp.strip.addressable_shards) == 8
    assert dp.shape[0] == 8 * 40  # all entities survive filtering here


def test_batches_respect_shard_locality(mesh8):
    """Device d's slice of the batch must come from device d's pieces.
    Pieces get distinctive constant strips; with 8 pieces on 8 shards the
    assembled sheet pixels identify the source piece exactly."""
    tr = synthetic.make_piece_list(3, 8, n_onsets=40)
    images, specs, o2c = tr
    marked = [np.full_like(im, 10 * i + 50) for i, im in enumerate(images)]
    dp = spool.ShardedDevicePool(marked, specs, o2c, mesh=mesh8,
                                 data_augmentation=pools.NO_AUGMENT,
                                 rng=np.random.default_rng(1))
    groups = spool.partition_pieces([im.shape[1] for im in marked], 8)
    idx = dp.epoch_indices(1, 16)
    # assemble one batch with the same shard_map machinery the runner uses:
    # entity tables are device-resident, the host streams only indices
    from jax.sharding import PartitionSpec as P

    assemble = dp._local_assemble[True]

    def local(strip, spec, cp, op, ix, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        a, b = assemble(strip[0], spec[0], cp[0][ix[0]], op[0][ix[0]], key)
        return a[None], b[None]

    sh = jax.shard_map(
        local, mesh=mesh8,
        in_specs=(P("data", None, None), P("data", None, None),
                  P("data", None), P("data", None), P("data", None), P()),
        out_specs=(P("data", None, None, None, None),
                   P("data", None, None, None, None)),
        check_vma=False)
    x1, _ = jax.jit(sh)(dp.strip, dp.spec, dp.coords_plane, dp.onsets_plane,
                        dp.put_indices(idx)[0], jax.random.PRNGKey(3))
    x1 = np.asarray(x1)  # [8, 2, 1, sh, ctx]
    for d in range(8):
        vals = np.unique(x1[d])
        allowed = {10 * p + 50 for p in groups[d]} | {255.0}  # margins white
        assert set(vals.tolist()) <= allowed, (d, vals, allowed)


def test_sharded_epoch_trains_and_loss_drops(mesh8):
    tr = synthetic.make_piece_list(5, 8, n_onsets=60)
    dp = spool.ShardedDevicePool(*tr, mesh=mesh8,
                                 data_augmentation=pools.FULL_AUGMENT,
                                 rng=np.random.default_rng(2))
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    opt = tstate.make_optimizer(cfg.ini_learning_rate)
    st = tstate.init_train_state(params, cfg, opt)
    runner = spool.make_sharded_epoch_runner(cfg, opt, dp)
    st, losses, corrs = runner(st, dp.epoch_indices(40, 16))
    st, losses2, _ = runner(st, dp.epoch_indices(40, 16))
    losses = np.concatenate([np.asarray(losses), np.asarray(losses2)])
    assert np.all(np.isfinite(losses))
    assert losses[-20:].mean() < losses[:20].mean()  # it learns


def test_too_many_shards_raises(mesh8):
    tr = synthetic.make_piece_list(3, 4, n_onsets=30)
    with pytest.raises(ValueError, match="cannot fill"):
        spool.ShardedDevicePool(*tr, mesh=mesh8,
                                data_augmentation=pools.NO_AUGMENT)


def test_fit_over_sharded_dataset(mesh8, tmp_path):
    """engine.fit end-to-end with the TRAIN corpus partitioned by piece
    (ShardedDevicePool + ShardedBatchIterator) and a mesh-sharded valid
    DevicePool: fused epochs + fully on-device evaluation."""
    from audio_sheet_retrieval_tpu.data import device_pool as dpool
    from audio_sheet_retrieval_tpu.train import engine

    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16, k_samples=64,
                           patience=1, refinement_steps=0, max_epochs=2)
    tr = synthetic.make_piece_list(7, 8, n_onsets=50)
    va = synthetic.make_piece_list(8, 2, n_onsets=50)
    data = {
        "train": spool.ShardedDevicePool(
            *tr, mesh=mesh8, data_augmentation=pools.FULL_AUGMENT,
            rng=np.random.default_rng(0)),
        "valid": dpool.DevicePool(
            *va, data_augmentation=pools.NO_AUGMENT, shuffle=False,
            rng=np.random.default_rng(1), mesh=mesh8),
    }
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = spool.ShardedBatchIterator(batch_size=16, k_samples=64)
    va_it = dpool.DeviceBatchIterator(batch_size=16, shuffle=False,
                                      train=False)
    epochs = []
    best, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                                out_path=str(tmp_path), verbose=False,
                                on_epoch=epochs.append, mesh=mesh8)
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["train_loss"])
    assert np.isfinite(best_map)


def test_from_piece_loader_builds_without_global_host_corpus(mesh8):
    """Multi-host construction path: pieces load lazily per shard, planes
    are assembled with jax.make_array_from_single_device_arrays, and the
    result matches the legacy constructor's layout + trains."""
    tr = synthetic.make_piece_list(5, 8, n_onsets=40)
    images, specs, o2c = tr
    calls = []

    def loader(i):
        calls.append(i)
        return images[i], specs[i], o2c[i]

    dp = spool.ShardedDevicePool.from_piece_loader(
        loader, n_pieces=8, mesh=mesh8,
        widths=[im.shape[1] for im in images],
        data_augmentation=pools.NO_AUGMENT, rng=np.random.default_rng(0))
    assert sorted(calls) == list(range(8))  # every piece loaded exactly once
    assert len(dp.strip.addressable_shards) == 8
    assert {s.data.shape for s in dp.strip.addressable_shards} == \
        {(1,) + dp.strip.shape[1:]}

    # identical plane content to the legacy (host-materialized) constructor
    ref = spool.ShardedDevicePool(
        images, specs, o2c, mesh=mesh8,
        data_augmentation=pools.NO_AUGMENT, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(np.asarray(dp.strip), np.asarray(ref.strip))
    np.testing.assert_array_equal(np.asarray(dp.coords_plane),
                                  np.asarray(ref.coords_plane))
    assert dp.shape == ref.shape

    # and it trains through the fused epoch runner
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16)
    opt = tstate.make_optimizer(cfg.ini_learning_rate)
    st = tstate.init_train_state(
        cca_model.init_model(jax.random.PRNGKey(0), cfg), cfg, opt)
    runner = spool.make_sharded_epoch_runner(cfg, opt, dp)
    st, losses, _ = runner(st, dp.epoch_indices(2, 16))
    assert np.isfinite(np.asarray(losses)).all()
