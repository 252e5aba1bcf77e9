"""Dynamic time warping over a precomputed distance matrix.

Parity with reference:utils/dtw_by_dist.py:6-83 — same cost recurrence
(D[i,j] += min(up, left, diag) over the inf-bordered matrix), same
transpose-to-tall convention, same return signature (min_dist, C, D1, path)
and the same traceback tie-breaking (argmin over (diag, up, left)).

TPU-first: the reference's O(N*M) python double loop becomes an
anti-diagonal wavefront ``lax.scan`` — each diagonal updates min(N, M)
cells in parallel on the VPU; only the (cheap, sequential) traceback stays
on the host. A numpy fallback is kept for tiny problems.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)


@jax.jit
def _dtw_accumulate_diagonals(dist: jnp.ndarray) -> jnp.ndarray:
    """Accumulate DTW costs over anti-diagonals.

    dist: [R, C]; returns diagonals [R+C-1, C] where diagonal d holds the
    accumulated cost of cells (i=d-j, j) (inf outside the matrix).
    """
    R, C = dist.shape
    j_idx = jnp.arange(C)

    def step(carry, d):
        prev, prev2 = carry  # diagonals d-1 and d-2, each [C]
        i = d - j_idx
        valid = (i >= 0) & (i < R)
        dist_d = jnp.where(valid, dist[jnp.clip(i, 0, R - 1), j_idx], INF)

        up = prev                                    # (i-1, j)
        left = jnp.concatenate([jnp.full((1,), INF), prev[:-1]])   # (i, j-1)
        diag = jnp.concatenate([jnp.full((1,), INF), prev2[:-1]])  # (i-1, j-1)
        best = jnp.minimum(jnp.minimum(up, left), diag)
        # base case: cell (0, 0) accumulates nothing
        best = jnp.where((d == 0) & (j_idx == 0), 0.0, best)
        acc = jnp.where(valid, dist_d + best, INF)
        return (acc, prev), acc

    init = (jnp.full((C,), INF), jnp.full((C,), INF))
    _, diagonals = jax.lax.scan(step, init, jnp.arange(R + C - 1))
    return diagonals


def _diagonals_to_matrix(diagonals: np.ndarray, R: int, C: int) -> np.ndarray:
    i = np.arange(R)[:, None]
    j = np.arange(C)[None, :]
    return diagonals[i + j, j].astype(np.float64)


def _accumulate_numpy(dist: np.ndarray) -> np.ndarray:
    r, c = dist.shape
    D0 = np.zeros((r + 1, c + 1))
    D0[0, 1:] = np.inf
    D0[1:, 0] = np.inf
    D0[1:, 1:] = dist
    D1 = D0[1:, 1:]
    for i in range(r):
        for j in range(c):
            D1[i, j] += min(D0[i, j], D0[i, j + 1], D0[i + 1, j])
    return D1.copy()


def _traceback(D0: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Reference traceback (dtw_by_dist.py:69-83), inf-bordered D0."""
    i, j = np.asarray(D0.shape) - 2
    p, q = [i], [j]
    while (i > 0) or (j > 0):
        tb = np.argmin((D0[i, j], D0[i, j + 1], D0[i + 1, j]))
        if tb == 0:
            i -= 1
            j -= 1
        elif tb == 1:
            i -= 1
        else:
            j -= 1
        p.insert(0, i)
        q.insert(0, j)
    return np.asarray(p), np.asarray(q)


def fastdtw(x: np.ndarray, y: np.ndarray, dist: str = "cosine",
            use_device: bool = True):
    """DTW of two feature sequences: distance matrix + dtw_by_dist
    (reference dtw_by_dist.py:37-66). ``dist`` is any scipy cdist metric;
    'cosine' runs as a device matmul."""
    if dist == "cosine":
        from audio_sheet_retrieval_tpu.ops.metrics import (
            cosine_distance_matrix,
        )

        D = np.asarray(cosine_distance_matrix(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)))
    else:
        from scipy.spatial.distance import cdist

        D = cdist(x, y, dist)
    return dtw_by_dist(D, use_device=use_device)


def dtw_by_dist(dist: np.ndarray, use_device: bool = True):
    """-> (normalized min distance, cost matrix, accumulated matrix, path).

    ``path`` is (rows_of_input, cols_of_input) index arrays — the reference
    returns them swapped when no transpose happened (dtw_by_dist.py:31-32),
    which is mirrored exactly.
    """
    dist = np.asarray(dist, np.float64)
    transposed = False
    if dist.shape[1] > dist.shape[0]:
        dist = dist.T
        transposed = True

    C = dist.copy()
    R_, C_ = dist.shape
    if use_device and dist.size >= 4096:
        diagonals = np.asarray(
            _dtw_accumulate_diagonals(jnp.asarray(dist, jnp.float32)))
        D1 = _diagonals_to_matrix(diagonals, R_, C_)
    else:
        D1 = _accumulate_numpy(dist)

    D0 = np.full((R_ + 1, C_ + 1), np.inf)
    D0[0, 0] = 0.0
    D0[1:, 1:] = D1
    path = _traceback(D0)

    if not transposed:
        path = (path[1], path[0])

    return D1[-1, -1] / sum(D1.shape), C, D1, path
