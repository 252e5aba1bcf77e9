"""Piece-sharded device dataset: each chip holds 1/D of the corpus.

`data.device_pool.DevicePool(mesh=...)` replicates the dataset arrays on
every chip and shards only the assembled batches — right for single-host
multi-chip, but a pod-scale corpus must be *partitioned*. Here pieces are
assigned to mesh-axis shards (balanced by strip width), each shard's strips/
spectrograms are stacked into per-device planes sharded on the leading axis,
and batch assembly runs inside `jax.shard_map`: device d slices windows only
from ITS local plane and contributes B/D samples of every global batch.
The assembled batch emerges sharded over the data axis, so the existing
GSPMD training step (train.engine.make_train_step under a Mesh) consumes it
unchanged — XLA still derives the gradient allreduce and the cross-chip CCA
batch statistics.

Semantics note (standard multi-host practice): each device samples from its
own piece subset, so a global batch is stratified by shard rather than iid
over the whole corpus; per-shard entity counts are equalized by wrap-around
padding. The reference has no analog (single-GPU, host batches —
reference:utils/data_pools.py:127-228).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_sheet_retrieval_tpu.data.device_pool import _make_assemble
from audio_sheet_retrieval_tpu.data.pools import (
    NO_AUGMENT,
    SHEET_CONTEXT,
    SPEC_CONTEXT,
    SYSTEM_HEIGHT,
)


def partition_pieces(widths: Sequence[int], n_shards: int) -> List[List[int]]:
    """Greedy balanced partition of piece indices by strip width."""
    order = np.argsort(widths)[::-1]
    groups: List[List[int]] = [[] for _ in range(n_shards)]
    loads = np.zeros(n_shards)
    for i in order:
        g = int(np.argmin(loads))
        groups[g].append(int(i))
        loads[g] += widths[i]
    return groups


class ShardedDevicePool:
    """(strips, specs, entities) partitioned by piece over a mesh axis."""

    def __init__(
        self,
        images: Sequence[np.ndarray],
        specs: Sequence[Sequence[np.ndarray]],
        o2c_maps: Sequence[Sequence[np.ndarray]],
        mesh: Mesh,
        data_axis: str = "data",
        spec_context: int = SPEC_CONTEXT,
        sheet_context: int = SHEET_CONTEXT,
        staff_height: int = SYSTEM_HEIGHT,
        data_augmentation: Optional[Dict] = None,
        rng: Optional[np.random.Generator] = None,
    ):
        from audio_sheet_retrieval_tpu.data.device_pool import DevicePool

        self.mesh = mesh
        self.data_axis = data_axis
        self.rng = rng if rng is not None else np.random.default_rng()
        D = mesh.shape[data_axis]
        self.n_shards = D
        groups = partition_pieces([im.shape[1] for im in images], D)
        if any(len(g) == 0 for g in groups):
            raise ValueError(
                f"{len(images)} pieces cannot fill {D} dataset shards")

        # build each shard's flat arrays with DevicePool's exact margin /
        # entity-filtering / edge-centering arithmetic (single source of
        # truth), then stack to common per-device planes
        shard_pools = []
        for g in groups:
            shard_pools.append(DevicePool(
                [images[i] for i in g],
                [specs[i] for i in g],
                [o2c_maps[i] for i in g],
                spec_context=spec_context, sheet_context=sheet_context,
                staff_height=staff_height,
                data_augmentation=data_augmentation, rng=self.rng,
                shuffle=False, mesh=None))
        strip_h = max(p.strip_h for p in shard_pools)
        bins = shard_pools[0].bins
        w_max = max(np.asarray(p.strip).shape[1] for p in shard_pools)
        t_max = max(np.asarray(p.spec).shape[1] for p in shard_pools)
        n_max = max(p.shape[0] for p in shard_pools)
        self.shape = [sum(p.shape[0] for p in shard_pools)]
        self.entities_per_shard = n_max

        strips = np.full((D, strip_h, w_max), 255, np.uint8)
        specs_arr = np.zeros((D, bins, t_max), np.float32)
        coords = np.zeros((D, n_max), np.int32)
        onsets = np.zeros((D, n_max), np.int32)
        for d, p in enumerate(shard_pools):
            s = np.asarray(p.strip)
            sp = np.asarray(p.spec)
            strips[d, :s.shape[0], :s.shape[1]] = s
            specs_arr[d, :, :sp.shape[1]] = sp
            # wrap-around padding equalizes per-shard entity counts
            fill = np.resize(np.arange(p.shape[0]), n_max)
            coords[d] = p.entity_coords[fill]
            onsets[d] = p.entity_onsets[fill]

        ax = data_axis
        self.strip = jax.device_put(
            strips, NamedSharding(mesh, P(ax, None, None)))
        self.spec = jax.device_put(
            specs_arr, NamedSharding(mesh, P(ax, None, None)))
        # entity tables are device-resident and piece-sharded like the data
        # planes: the host streams only random LOCAL indices, so no host
        # ever needs another shard's entity table (multi-host safe)
        self.coords_plane = jax.device_put(
            coords, NamedSharding(mesh, P(ax, None)))
        self.onsets_plane = jax.device_put(
            onsets, NamedSharding(mesh, P(ax, None)))
        self._finish_init(mesh, data_axis, sheet_context, staff_height,
                          spec_context, strip_h, bins, data_augmentation)

    def _finish_init(self, mesh, data_axis, sheet_context, staff_height,
                     spec_context, strip_h, bins, data_augmentation):
        ax = data_axis
        self._idx_sharding = NamedSharding(mesh, P(None, ax, None))
        self.strip_h = strip_h
        self.bins = bins
        self.data_augmentation = dict(data_augmentation or NO_AUGMENT)
        self._local_assemble = {
            train: _make_assemble(self.data_augmentation, sheet_context,
                                  staff_height, spec_context, strip_h, bins,
                                  train=train)
            for train in (True, False)
        }
        self._key = jax.random.PRNGKey(int(self.rng.integers(2 ** 31)))

    @classmethod
    def from_piece_loader(
        cls,
        piece_loader,
        n_pieces: int,
        mesh: Mesh,
        widths: Optional[Sequence[int]] = None,
        data_axis: str = "data",
        spec_context: int = SPEC_CONTEXT,
        sheet_context: int = SHEET_CONTEXT,
        staff_height: int = SYSTEM_HEIGHT,
        data_augmentation: Optional[Dict] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> "ShardedDevicePool":
        """Multi-host construction: every process loads and materializes
        ONLY the piece shards owned by its addressable devices.

        ``piece_loader(i) -> (image, [specs], [o2c_maps])`` is called per
        piece, shard by shard; each shard's padded planes go straight to
        that shard's device and the global arrays are assembled with
        ``jax.make_array_from_single_device_arrays`` — no host ever holds
        the whole corpus. Shard padding dims are agreed through a process
        allgather of the local maxima.

        ``widths`` (cheap metadata, e.g. from an index file) enables
        width-balanced piece placement; otherwise round-robin.
        """
        from jax.experimental import multihost_utils

        from audio_sheet_retrieval_tpu.data.device_pool import DevicePool

        self = cls.__new__(cls)
        self.mesh = mesh
        self.data_axis = data_axis
        self.rng = rng if rng is not None else np.random.default_rng()
        D = mesh.shape[data_axis]
        self.n_shards = D
        # SPMD invariant: the shared generator must advance identically on
        # every process no matter how many shards are local, or the
        # "replicated" epoch key/indices silently diverge on asymmetric
        # multi-host meshes. Each shard's DevicePool therefore gets its own
        # child generator keyed by shard id (ONE draw here, local-count
        # independent), and the epoch rng/key are re-derived below from a
        # process-0 broadcast seed.
        shard_seeds = np.random.SeedSequence(
            int(self.rng.integers(2 ** 63))).spawn(D)
        if widths is not None:
            groups = partition_pieces(widths, D)
        else:
            groups = [list(range(d, n_pieces, D)) for d in range(D)]
        if any(len(g) == 0 for g in groups):
            raise ValueError(f"{n_pieces} pieces cannot fill {D} shards")

        # mesh devices along the data axis, in axis order
        ax_index = mesh.axis_names.index(data_axis)
        mesh_devs = np.moveaxis(mesh.devices, ax_index, 0).reshape(D, -1)
        my_process = jax.process_index()

        # A process participates in shard d when ANY device of that mesh
        # row is addressable from it (a non-data axis may cross hosts, in
        # which case every host in the row builds the same shard and puts
        # buffers only on its own devices). The pieces load through a
        # host_only DevicePool (single source of the entity arithmetic, no
        # device round-trip) and only the flat numpy shard arrays are kept.
        local = {}  # shard -> {"strip","spec","coords","onsets","my_devs"}
        n_ent_total = 0
        h_ = w_ = t_ = n_ = b_ = 0
        for d in range(D):
            my_devs = [dev for dev in mesh_devs[d]
                       if dev.process_index == my_process]
            if not my_devs:
                continue
            pieces = [piece_loader(i) for i in groups[d]]
            p = DevicePool(
                [im for im, _, _ in pieces],
                [sp for _, sp, _ in pieces],
                [oc for _, _, oc in pieces],
                spec_context=spec_context, sheet_context=sheet_context,
                staff_height=staff_height,
                data_augmentation=data_augmentation,
                rng=np.random.default_rng(shard_seeds[d]),
                shuffle=False, mesh=None, host_only=True)
            local[d] = {
                "strip": np.asarray(p.strip), "spec": np.asarray(p.spec),
                "coords": p.entity_coords, "onsets": p.entity_onsets,
                "n_ent": p.shape[0], "my_devs": my_devs,
            }
            h_ = max(h_, p.strip_h)
            w_ = max(w_, local[d]["strip"].shape[1])
            t_ = max(t_, local[d]["spec"].shape[1])
            n_ = max(n_, p.shape[0])
            b_ = p.bins
            # only rows whose FIRST device is ours count toward the global
            # entity total (rows shared across hosts are built redundantly)
            if mesh_devs[d][0].process_index == my_process:
                n_ent_total += p.shape[0]
            del p, pieces

        # agree on global padded dims + total entity count across processes
        dims = multihost_utils.process_allgather(
            np.asarray([h_, w_, t_, n_, b_, n_ent_total], np.int64))
        dims = np.atleast_2d(dims)
        strip_h, w_max, t_max, n_max, bins = (
            int(dims[:, 0].max()), int(dims[:, 1].max()),
            int(dims[:, 2].max()), int(dims[:, 3].max()),
            int(dims[:, 4].max()))
        self.shape = [int(dims[:, 5].sum())]
        self.entities_per_shard = n_max

        ax = data_axis
        specs = {
            "strip": (NamedSharding(mesh, P(ax, None, None)),
                      (D, strip_h, w_max), np.uint8, 255),
            "spec": (NamedSharding(mesh, P(ax, None, None)),
                     (D, bins, t_max), np.float32, 0),
            "coords_plane": (NamedSharding(mesh, P(ax, None)),
                             (D, n_max), np.int32, 0),
            "onsets_plane": (NamedSharding(mesh, P(ax, None)),
                             (D, n_max), np.int32, 0),
        }

        def shard_arrays(d):
            sh = local[d]
            s, sp = sh["strip"], sh["spec"]
            strip_pad = np.full((strip_h, w_max), 255, np.uint8)
            strip_pad[:s.shape[0], :s.shape[1]] = s
            spec_pad = np.zeros((bins, t_max), np.float32)
            spec_pad[:, :sp.shape[1]] = sp
            fill = np.resize(np.arange(sh["n_ent"]), n_max)
            return {"strip": strip_pad, "spec": spec_pad,
                    "coords_plane": sh["coords"][fill].astype(np.int32),
                    "onsets_plane": sh["onsets"][fill].astype(np.int32)}

        per_shard = {d: shard_arrays(d) for d in local}
        for name, (sharding, shape, dtype, _fill) in specs.items():
            bufs = []
            for d, sh in local.items():
                # a shard row replicates across any non-data mesh axes:
                # this process provides buffers for ITS devices in the row
                for dev in sh["my_devs"]:
                    bufs.append(
                        jax.device_put(per_shard[d][name][None], dev))
            arr = jax.make_array_from_single_device_arrays(
                shape, sharding, bufs)
            setattr(self, name, arr)
        del per_shard, local

        # replicate the epoch rng/key across processes even when host rngs
        # were seeded differently: process 0's seed wins
        seed = int(multihost_utils.broadcast_one_to_all(
            np.int64(self.rng.integers(2 ** 31))))
        self.rng = np.random.default_rng(seed)
        self._finish_init(mesh, data_axis, sheet_context, staff_height,
                          spec_context, strip_h, bins, data_augmentation)
        return self

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def epoch_indices(self, n_batches: int, batch_size: int) -> np.ndarray:
        """[n_batches, D, B/D] per-shard LOCAL entity indices: every device
        samples its slice of each global batch from its own pieces. The
        entity tables live on device (piece-sharded), so this is the ONLY
        thing the host streams per epoch."""
        D = self.n_shards
        if batch_size % D:
            raise ValueError(f"batch {batch_size} not divisible by {D} shards")
        return self.rng.integers(
            0, self.entities_per_shard,
            size=(n_batches, D, batch_size // D)).astype(np.int32)

    def put_indices(self, idx: np.ndarray):
        """idx [n, D, B/D] -> device, sharded over the data axis."""
        return jax.device_put(idx, self._idx_sharding)


def make_sharded_epoch_runner(cfg, optimizer, pool: ShardedDevicePool):
    """Fused scanned sub-epoch over the piece-sharded dataset.

    Per scan step: shard_map assembles each device's B/D samples from its
    local dataset plane (distinct fold_in'd PRNG per shard), the outputs
    re-enter GSPMD sharded on the batch axis, and the standard train step
    runs — one dispatch per sub-epoch, same contract as
    device_pool.make_epoch_runner.
    """
    from audio_sheet_retrieval_tpu.train.engine import make_train_step

    train_step = make_train_step(cfg, optimizer)
    assemble = pool._local_assemble[True]
    mesh, ax = pool.mesh, pool.data_axis

    def local_assemble(strip, spec, coords_pl, onsets_pl, idx, key):
        # per-device slices: strip [1, H, W], entity planes [1, n_max],
        # idx [1, b] — gather THIS shard's entities on device, then assemble
        key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        coords = coords_pl[0][idx[0]]
        onsets = onsets_pl[0][idx[0]]
        x1, x2 = assemble(strip[0], spec[0], coords, onsets, key)
        return x1[None], x2[None]

    sharded_assemble = jax.shard_map(
        local_assemble, mesh=mesh,
        in_specs=(P(ax, None, None), P(ax, None, None), P(ax, None),
                  P(ax, None), P(ax, None), P()),
        out_specs=(P(ax, None, None, None, None),
                   P(ax, None, None, None, None)),
        check_vma=False)

    @jax.jit
    def run_epoch(state, strip, spec, coords_pl, onsets_pl, idx_mat, key):
        def body(carry, idx):
            st, k = carry                    # idx [D, B/D] sharded on D
            k, sub = jax.random.split(k)
            x1, x2 = sharded_assemble(strip, spec, coords_pl, onsets_pl,
                                      idx, sub)
            # [D, b, 1, sh, ctx] -> [B, 1, sh, ctx], still sharded on batch
            x1 = x1.reshape((-1,) + x1.shape[2:])
            x2 = x2.reshape((-1,) + x2.shape[2:])
            st, m = train_step(st, x1, x2)
            return (st, k), (m["loss"], m["corr"])

        (state, _), (losses, corrs) = jax.lax.scan(
            body, (state, key), idx_mat)
        return state, losses, corrs

    def runner(state, idx: np.ndarray, key=None):
        """idx: [n_batches, D, B/D] from pool.epoch_indices."""
        if key is None:
            key = pool.next_key()
        return run_epoch(state, pool.strip, pool.spec, pool.coords_plane,
                         pool.onsets_plane, pool.put_indices(idx), key)

    return runner


def make_sharded_embed_runner(cfg, pool: ShardedDevicePool):
    """Fused evaluation over the piece-sharded dataset: ONE dispatch embeds
    n batches (deterministic assembly) — the sharded counterpart of
    device_pool.make_embed_runner, same return contract."""
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.ops import losses as loss_ops
    from audio_sheet_retrieval_tpu.train.engine import (
        prepare_view1_device,
        prepare_view2_device,
    )

    assemble = pool._local_assemble[False]
    mesh, ax = pool.mesh, pool.data_axis
    loss_weight = 1.0 - cfg.weight_tno

    def local_assemble(strip, spec, coords_pl, onsets_pl, idx, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        coords = coords_pl[0][idx[0]]
        onsets = onsets_pl[0][idx[0]]
        x1, x2 = assemble(strip[0], spec[0], coords, onsets, key)
        return x1[None], x2[None]

    sharded_assemble = jax.shard_map(
        local_assemble, mesh=mesh,
        in_specs=(P(ax, None, None), P(ax, None, None), P(ax, None),
                  P(ax, None), P(ax, None), P()),
        out_specs=(P(ax, None, None, None, None),
                   P(ax, None, None, None, None)),
        check_vma=False)

    @jax.jit
    def run(params, strip, spec, coords_pl, onsets_pl, idx_mat, key):
        def body(k, idx):
            k, sub = jax.random.split(k)
            x1, x2 = sharded_assemble(strip, spec, coords_pl, onsets_pl,
                                      idx, sub)
            x1 = x1.reshape((-1,) + x1.shape[2:])
            x2 = x2.reshape((-1,) + x2.shape[2:])
            lv1 = cca_model.embed_view1(
                params, prepare_view1_device(x1, cfg), cfg)
            lv2 = cca_model.embed_view2(params, prepare_view2_device(x2), cfg)
            loss = loss_ops.contrastive_cos_loss(
                lv1, lv2, weight=loss_weight, gamma=cfg.gamma)
            return k, (lv1, lv2, loss)

        _, (lv1s, lv2s, losses) = jax.lax.scan(body, key, idx_mat)
        d = lv1s.shape[-1]
        return lv1s.reshape(-1, d), lv2s.reshape(-1, d), losses

    def runner(params, idx: np.ndarray):
        """idx: [n, D, B/D] local indices (pool.epoch_indices)."""
        return run(params, pool.strip, pool.spec, pool.coords_plane,
                   pool.onsets_plane, pool.put_indices(idx), pool.next_key())

    return runner


class ShardedBatchIterator:
    """engine.fit-compatible iterator over a ShardedDevicePool: every
    sub-epoch samples each device's batch share uniformly from its own
    piece group (per-shard stratified sampling — the multi-host analog of
    the reference's shuffled epoch order).

    Use this for the TRAIN pool; keep the validation pool a (replicated)
    DevicePool + DeviceBatchIterator so per-epoch validation covers the
    same fixed entity set every epoch — a sharded valid iterator would
    re-sample a different random subset per epoch and add early-stopping
    noise."""

    def __init__(self, batch_size: int, k_samples: Optional[int] = None,
                 shuffle: bool = True, train: bool = True):
        self.batch_size = batch_size
        self.k_samples = k_samples
        self.shuffle = shuffle
        self.train = train
        self.epoch_counter = 0

    def __call__(self, pool: ShardedDevicePool):
        self.pool = pool
        if self.k_samples is None or self.k_samples > pool.shape[0]:
            self.k_samples = pool.shape[0]
        self.n_batches = max(1, self.k_samples // self.batch_size)
        return self

    def epoch_entity_indices(self) -> np.ndarray:
        self.epoch_counter += 1
        return self.pool.epoch_indices(self.n_batches, self.batch_size)

    def __iter__(self):
        raise TypeError(
            "ShardedDevicePool has no host batch loop — pass the pool's "
            "mesh to engine.fit(..., mesh=pool.mesh) so the fused "
            "shard_map epoch runner is used")
