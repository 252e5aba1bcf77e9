"""Child program for tests/test_multiprocess.py: one of N processes in a
real jax.distributed SPMD job on the CPU backend (4 local virtual devices
each). Builds the piece-sharded corpus with
ShardedDevicePool.from_piece_loader — so each process loads ONLY the piece
shards owned by its devices — and runs a fused training epoch under the
global mesh. Prints machine-checkable lines the parent asserts on."""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=proc_id)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audio_sheet_retrieval_tpu.data import pools, synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.parallel import mesh as pm
    from audio_sheet_retrieval_tpu.parallel import sharded_pool as spool
    from audio_sheet_retrieval_tpu.train import state as tstate

    n_dev = jax.device_count()
    mesh = pm.make_mesh((n_dev,), axis_names=(pm.DATA_AXIS,))

    images, specs, o2c = synthetic.make_piece_list(5, n_dev, n_onsets=40)
    loaded = []

    def loader(i):
        loaded.append(i)
        return images[i], specs[i], o2c[i]

    dp = spool.ShardedDevicePool.from_piece_loader(
        loader, n_pieces=n_dev, mesh=mesh,
        widths=[im.shape[1] for im in images],
        data_augmentation=pools.NO_AUGMENT, rng=np.random.default_rng(0))
    print(f"LOADED {proc_id}: {sorted(loaded)}", flush=True)
    print(f"SHAPE {proc_id}: {dp.shape[0]}", flush=True)

    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=2 * n_dev)
    opt = tstate.make_optimizer(cfg.ini_learning_rate)
    st = tstate.init_train_state(
        cca_model.init_model(jax.random.PRNGKey(0), cfg), cfg, opt)
    st = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), st)
    runner = spool.make_sharded_epoch_runner(cfg, opt, dp)
    st, losses, _ = runner(st, dp.epoch_indices(2, 2 * n_dev))
    # losses are replicated (P()) — every addressable shard holds the full
    # global value, so read it without a cross-process gather
    losses = np.asarray(losses.addressable_shards[0].data)
    # full-precision hex so the parent's equality check really asserts
    # bit-identical cross-host losses
    print(f"LOSSES {proc_id}: "
          f"{[float(x).hex() for x in losses.reshape(-1)]}", flush=True)
    assert np.isfinite(losses).all()
    print(f"OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
