"""Pallas fused gallery search: streaming matmul + running top-k.

The serving hot path scores a query batch against the whole snippet gallery
and keeps the top-k neighbors (reference:audio_sheet_server.py:530-551 did a
per-query host cdist + argsort). The XLA fast path (retrieval/gallery.py)
materializes the full [Q, N] score matrix in HBM before ``lax.top_k`` (a
bitonic sort, O(N log^2 N) compare-exchanges).

This kernel never materializes the score matrix: gallery tiles are streamed
HBM -> VMEM by the pallas pipeline, each tile's scores come off the MXU, and
a per-query running top-k (VMEM scratch, persistent across sequential grid
steps) is updated by K unrolled max-extract passes — O(N * K / TILE) work,
~10x fewer VPU ops than a sort for K<=32, and HBM traffic is exactly one
gallery read.

``lax.top_k`` has no Mosaic lowering (checked: "Unimplemented primitive ...
top_k"), hence the manual extraction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
KBUF = 128           # running top-k buffer width (k <= KBUF)
QBLK = 128           # query rows per grid block
DEFAULT_TILE = 4096  # gallery rows per grid step

# Tile size, measured on v5e (N=1M, Q=100, k=25, scan-fused timing):
# 512 -> 15.6 ms, 2048 -> 9.3 ms, 4096 -> 8.9 ms (XLA top_k: 10.2 ms);
# 8192+ fails to compile (VMEM). The merge's k extract passes sweep the
# [QBLK, KBUF+tile] augmented buffer, and with 128 queries per block the
# any-query threshold prune fires on almost every tile — so fewer, larger
# tiles win until VMEM runs out. Small QBLK is much worse (the gallery is
# re-streamed from HBM once per query block).


def _topk_kernel(q_ref, g_ref, out_s_ref, out_i_ref, scratch_s, scratch_i,
                 *, k: int, tile: int, n_real: int):
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        scratch_s[:] = jnp.full(scratch_s.shape, NEG_INF, jnp.float32)
        scratch_i[:] = jnp.zeros(scratch_i.shape, jnp.int32)

    # tile scores on the MXU: [Q, tile]
    scores = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # padding rows (gallery index >= n_real) must never beat real rows,
    # even negative-scoring ones: mask to -inf BEFORE selection
    col_global = t * tile + jax.lax.broadcasted_iota(
        jnp.int32, scores.shape, 1)
    scores = jnp.where(col_global < n_real, scores, NEG_INF)

    q = scores.shape[0]
    # threshold pruning: merge only when some query's k-th best is beaten
    # (after warm-up almost every tile is skipped — the common case costs
    # one matmul + one max reduction)
    kth = scratch_s[:, k - 1]                       # [Q] current k-th best
    tile_best = jnp.max(scores, axis=1)             # [Q]
    need_merge = jnp.any(tile_best > kth)

    @pl.when(need_merge)
    def _():
        aug_w = KBUF + tile
        aug_s = jnp.concatenate([scratch_s[:], scores], axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (q, aug_w), 1)
        tile_ids = (t * tile
                    + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1))
        aug_i = jnp.concatenate([scratch_i[:], tile_ids], axis=1)

        new_s = jnp.full((q, KBUF), NEG_INF, jnp.float32)
        new_i = jnp.zeros((q, KBUF), jnp.int32)
        kbuf_ids = jax.lax.broadcasted_iota(jnp.int32, (q, KBUF), 1)
        big = jnp.int32(aug_w + 1)
        for j in range(k):  # unrolled: k is small and static
            m = jnp.max(aug_s, axis=1, keepdims=True)             # [Q, 1]
            is_max = aug_s == m
            sel = jnp.min(jnp.where(is_max, col_ids, big), axis=1,
                          keepdims=True)                          # first hit
            chosen = col_ids == sel
            idx_val = jnp.sum(jnp.where(chosen, aug_i, 0), axis=1,
                              keepdims=True)                      # [Q, 1]
            # column-j writes as masked selects (no scatter on TPU)
            slot = kbuf_ids == j
            new_s = jnp.where(slot, m, new_s)
            new_i = jnp.where(slot, idx_val, new_i)
            aug_s = jnp.where(chosen, NEG_INF, aug_s)

        scratch_s[:] = new_s
        scratch_i[:] = new_i

    @pl.when(t == n_tiles - 1)
    def _():
        out_s_ref[:] = scratch_s[:]
        out_i_ref[:] = scratch_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "n_real", "interpret"))
def _topk_pallas(queries: jnp.ndarray, gallery: jnp.ndarray, k: int,
                 tile: int, n_real: int, interpret: bool = False):
    qn, d = queries.shape
    n = gallery.shape[0]
    assert n % tile == 0, (n, tile)
    qblk = min(qn, QBLK)
    assert qn % qblk == 0, (qn, qblk)
    # grid: query blocks outer, gallery tiles inner (tiles iterate fastest,
    # so the running top-k scratch is swept per query block)
    grid = (qn // qblk, n // tile)
    out_s, out_i = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, tile=tile, n_real=n_real),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qblk, d), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda qb, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qblk, KBUF), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qblk, KBUF), lambda qb, t: (qb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qn, KBUF), jnp.float32),
            jax.ShapeDtypeStruct((qn, KBUF), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qblk, KBUF), jnp.float32),
            pltpu.VMEM((qblk, KBUF), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d + 25 * qn * (KBUF + tile) * (n // tile),
            bytes_accessed=n * d * 4 + qn * d * 4 + 2 * qn * KBUF * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, gallery)
    return out_s[:, :k], out_i[:, :k]


def topk_gallery(queries, gallery, k: int, tile: int = DEFAULT_TILE,
                 interpret: bool | None = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k inner-product search of [Q, d] queries over an [N, d] gallery.

    Pads Q to the float32 sublane multiple (8) and N to the tile size with
    -inf-scoring rows. Returns (scores [Q, k], row indices [Q, k]),
    descending. Padding rows never appear in results for k <= N.
    """
    queries = jnp.asarray(queries, jnp.float32)
    gallery = jnp.asarray(gallery, jnp.float32)
    qn, d = queries.shape
    n = gallery.shape[0]
    if k > n:
        raise ValueError(f"k={k} > gallery size {n}")
    if k > KBUF:
        raise ValueError(f"k={k} > KBUF={KBUF}")
    q_pad = int(np.ceil(qn / 8) * 8)
    if q_pad > QBLK:
        q_pad = int(np.ceil(qn / QBLK) * QBLK)
    n_pad = int(np.ceil(n / tile) * tile)
    if q_pad != qn:
        queries = jnp.pad(queries, ((0, q_pad - qn), (0, 0)))
    if n_pad != n:
        # zero-padding rows are masked to -inf inside the kernel (by global
        # column index), so they can never evict real rows
        gallery = jnp.pad(gallery, ((0, n_pad - n), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # CPU tests use interpreter
    s, i = _topk_pallas(queries, gallery, k, tile, n, interpret)
    return s[:qn], i[:qn]
