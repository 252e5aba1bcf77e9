"""Child program for tests/test_multiprocess.py kill-and-resume: one of N
processes in a real jax.distributed SPMD job (CPU backend, 4 virtual
devices each). Runs engine.fit over a piece-sharded corpus in one of three
modes:

  full   -- uninterrupted fit, max_epochs=4
  part1  -- fit max_epochs=2 with a resume_file ("the run that gets killed"
            -- stopping at the epoch budget leaves exactly the state a
            SIGKILL after epoch 2's snapshot would)
  part2  -- same fit call, max_epochs=4, same resume_file: must restore the
            part1 snapshot on BOTH processes and continue epoch-for-epoch
            identical to `full`'s epochs 3-4

Prints one machine-checkable line per epoch (float hex -- the parent
asserts bit-identical trajectories) plus the LOSSES/OK protocol lines.
"""

import os
import sys


def main():
    proc_id = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    mode = sys.argv[4]
    outdir = sys.argv[5]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=proc_id)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from audio_sheet_retrieval_tpu.data import pools, synthetic
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.parallel import mesh as pm
    from audio_sheet_retrieval_tpu.parallel import sharded_pool as spool
    from audio_sheet_retrieval_tpu.train import engine

    n_dev = jax.device_count()
    mesh = pm.make_mesh((n_dev,), axis_names=(pm.DATA_AXIS,))

    def make_pool(list_seed, rng_seed, augment):
        images, specs, o2c = synthetic.make_piece_list(list_seed, n_dev,
                                                       n_onsets=40)
        return spool.ShardedDevicePool.from_piece_loader(
            lambda i: (images[i], specs[i], o2c[i]), n_pieces=n_dev,
            mesh=mesh, widths=[im.shape[1] for im in images],
            data_augmentation=augment, rng=np.random.default_rng(rng_seed))

    data = {
        "train": make_pool(5, 0, pools.FULL_AUGMENT),
        "valid": make_pool(6, 1, pools.NO_AUGMENT),
    }
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=2 * n_dev,
                           k_samples=4 * n_dev, patience=50,
                           refinement_steps=0)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = spool.ShardedBatchIterator(batch_size=2 * n_dev,
                                      k_samples=4 * n_dev)
    va_it = spool.ShardedBatchIterator(batch_size=2 * n_dev, shuffle=False,
                                       train=False)

    num_epochs = 2 if mode == "part1" else 4
    resume_file = (None if mode == "full"
                   else os.path.join(outdir, "fit_state.pkl"))

    def on_epoch(rec):
        print(f"EPOCH {proc_id} {rec['number']}: "
              f"{float(rec['train_loss']).hex()},"
              f"{float(rec['valid_loss']).hex()},"
              f"{float(rec['map_va']).hex()}", flush=True)

    best, best_map = engine.fit(
        params, data, cfg, tr_it, va_it,
        out_path=os.path.join(outdir, f"exp_{mode}"),
        num_epochs=num_epochs, verbose=False, on_epoch=on_epoch,
        mesh=mesh, resume_file=resume_file)
    assert np.isfinite(best_map)
    print(f"BESTMAP {proc_id}: {float(best_map).hex()}", flush=True)
    print(f"OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
