"""Gallery-sharded retrieval and psum'd CCA statistics over a device mesh.

Design (new; the reference has no distributed path — SURVEY.md §2):

  * the gallery's rows are sharded across the ``db`` mesh axis; each chip
    computes a local [Q, N/m] score matmul and a local top-k,
  * the k per-shard candidates (scores + globalized indices) ride ICI via
    ``all_gather``, and a final top-k over the m*k candidates re-ranks
    globally — exact, with communication k*m per query instead of N,
  * the large-batch CCA refinement shards the sample axis: each chip
    accumulates 32x32 sufficient statistics over its shard and a single
    ``psum`` reproduces the exact global covariances (ops/cca.py moments).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_sheet_retrieval_tpu.ops import cca as cca_ops
from audio_sheet_retrieval_tpu.parallel.mesh import DB_AXIS


def make_sharded_topk(mesh: Mesh, k: int, axis: str = DB_AXIS,
                      n_real: Optional[int] = None):
    """Build a jitted sharded gallery search.

    Returned fn: (gallery_shards [N, d] (sharded on axis over dim 0),
    queries [Q, d] (replicated)) -> (scores [Q, k], global indices [Q, k]).
    ``n_real``: actual gallery row count — padding rows beyond it are masked
    to -inf BEFORE the local top-k so zero-padding can never evict real
    (possibly negative-scoring) rows.
    """
    n_shards = mesh.shape[axis]

    def local_search(gal, q):
        # gal: [N/m, d] local shard; q: [Q, d] replicated
        shard_size = gal.shape[0]
        base = jax.lax.axis_index(axis) * shard_size
        scores = jnp.dot(q, gal.T, preferred_element_type=jnp.float32)
        # NaN queries (e.g. an untrained zero projection) must not leak
        # padding indices — same defensive mask as the single-chip
        # retrieval.gallery._topk_query
        scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
        if n_real is not None:
            col_global = base + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1)
            scores = jnp.where(col_global < n_real, scores, -jnp.inf)
        # tiny shards may hold fewer than k rows; m*k_local >= k still holds
        k_local = min(k, shard_size)
        s, i = jax.lax.top_k(scores, k_local)
        i = i + base
        # gather the candidate lists of all shards: [Q, m*k]
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        s_top, pos = jax.lax.top_k(s_all, k)
        i_top = jnp.take_along_axis(i_all, pos, axis=1)
        return s_top, i_top

    fn = jax.shard_map(
        local_search, mesh=mesh,
        in_specs=(P(axis, None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn), n_shards


def _pad_normalize_gallery(gallery: np.ndarray, m: int) -> np.ndarray:
    """Pad rows to a multiple of the shard count and L2-normalize (zero
    padding rows stay zero => score 0; callers mask by n_real)."""
    n, d = gallery.shape
    n_pad = int(np.ceil(n / m) * m)
    g = np.zeros((n_pad, d), np.float32)
    g[:n] = gallery
    norms = np.linalg.norm(g, axis=1, keepdims=True)
    return g / np.where(norms == 0, 1.0, norms)


def sharded_gallery_search(mesh: Mesh, gallery: np.ndarray,
                           queries: np.ndarray, k: int,
                           axis: str = DB_AXIS
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot exact top-k of normalized ``queries`` against a gallery
    sharded row-wise over ``axis``. Pads the gallery to a multiple of the
    shard count with -inf-scoring rows."""
    n = gallery.shape[0]
    g = _pad_normalize_gallery(gallery, mesh.shape[axis])

    fn, _ = make_sharded_topk(mesh, k, axis, n_real=n)
    gal_dev = jax.device_put(g, NamedSharding(mesh, P(axis, None)))
    q = np.asarray(queries, np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    q_dev = jax.device_put(qn, NamedSharding(mesh, P(None, None)))
    s, i = fn(gal_dev, q_dev)
    s, i = np.asarray(s), np.asarray(i)
    # padding is masked in-kernel; clamp defensively for k > n
    valid = i < n
    return np.where(valid, s, -np.inf), np.where(valid, i, 0)


def make_sharded_piece_query(mesh: Mesh, params, cfg, gallery: np.ndarray,
                             ids: np.ndarray, n_pieces: int, *,
                             n_candidates: int = 25, axis: str = DB_AXIS,
                             quantized: bool = True):
    """Pod-scale fused detect_score: ONE jitted program per query with the
    snippet gallery PARTITIONED row-wise across the mesh.

    The single-chip serving path (retrieval.gallery.make_fused_piece_query
    _spec) holds the whole gallery in one HBM; beyond ~10M snippets the
    rows must shard. Here the query spec payload is replicated, the
    excerpt embedding runs under GSPMD, and the gallery top-k runs as a
    shard_map: local [Q, N/m] matmul + local top-k, candidate exchange
    over ICI (all_gather of k*m rows/query instead of N), global re-rank,
    then the piece-id vote histogram — numerically identical counts to
    the single-chip program (tests/test_parallel.py).

    Returns query(payload [bins, T], scale, starts) -> counts [n_pieces].
    """
    from audio_sheet_retrieval_tpu.retrieval.gallery import (
        embed_spec_excerpts,
    )

    n = gallery.shape[0]
    k = min(n_candidates, n)
    g = _pad_normalize_gallery(np.asarray(gallery, np.float32),
                               mesh.shape[axis])
    gal_dev = jax.device_put(g, NamedSharding(mesh, P(axis, None)))
    ids_pad = np.full(g.shape[0], n_pieces, np.int32)  # pad -> overflow bin
    ids_pad[:n] = np.asarray(ids, np.int32)
    ids_dev = jax.device_put(ids_pad, NamedSharding(mesh, P(None)))
    topk_fn, _ = make_sharded_topk(mesh, k, axis, n_real=n)

    @jax.jit
    def q(p, gal, idtab, payload, scale, starts):
        codes = embed_spec_excerpts(p, cfg, payload, scale, starts,
                                    quantized)
        _, idx = topk_fn(gal, codes.astype(jnp.float32))
        pid = idtab[idx]
        return jnp.sum(pid[..., None] == jnp.arange(n_pieces), axis=(0, 1))

    params = jax.device_put(params)

    def query(payload, scale, starts):
        return q(params, gal_dev, ids_dev, payload, jnp.float32(scale),
                 starts)

    return query


def make_sharded_cca_moments(mesh: Mesh, axis: str = "data"):
    """Jitted exact CCA sufficient statistics over a sample-sharded pair of
    latent matrices: per-shard sums + one psum."""
    def local_moments(h1, h2):
        m = cca_ops.cca_moments(h1, h2)
        return jax.tree.map(lambda x: jax.lax.psum(x, axis), m)

    fn = jax.shard_map(
        local_moments, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=cca_ops.CCAMoments(n=P(), s1=P(), s2=P(), s11=P(),
                                     s22=P(), s12=P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_cca_fit(mesh: Mesh, H1: np.ndarray, H2: np.ndarray,
                    axis: str = "data", method: str = "svd",
                    r1: float = 1e-3, r2: float = 1e-3) -> cca_ops.CCAResult:
    """Exact multi-chip CCA fit: shard samples, psum 32x32 moments, fit.

    Trims the sample count to a multiple of the mesh axis (callers control
    n_train, reference refine_cca.py:31 uses 25000)."""
    m = mesh.shape[axis]
    n = (H1.shape[0] // m) * m
    fn = make_sharded_cca_moments(mesh, axis)
    sh = NamedSharding(mesh, P(axis, None))
    h1 = jax.device_put(np.asarray(H1[:n], np.float32), sh)
    h2 = jax.device_put(np.asarray(H2[:n], np.float32), sh)
    moments = fn(h1, h2)
    return cca_ops.cca_fit_from_moments(moments, r1=r1, r2=r2, method=method)
