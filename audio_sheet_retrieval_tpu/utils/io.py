"""Checkpoint / result IO.

Native format: a pickle of a numpy-ified pytree plus a format tag — simple,
dependency-free, and stable across JAX versions. The reference's pickle
conventions (params_<tag>.pkl on every validation improvement,
reference:utils/train_dcca_pool.py:398-401; results_<tag>.pkl per epoch,
:476-489; *_est_UV refined dumps, refine_cca.py:61-65) are mirrored by the
training engine and CLIs on top of these helpers.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_TAG = "asr-tpu-v1"
SCHEMA_VERSION = 1

# schema negotiation: older payloads are upgraded in order through these
# hooks (version n -> n+1 each); newer-than-known versions are refused with
# an actionable error instead of silently misloading
_MIGRATIONS: dict[int, Any] = {}


def to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"format": FORMAT_TAG, "version": SCHEMA_VERSION,
               "tree": to_numpy_tree(tree), "meta": dict(meta or {})}
    with open(path, "wb") as fp:
        pickle.dump(payload, fp, protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path: str, like: Any = None) -> Any:
    with open(path, "rb") as fp:
        payload = pickle.load(fp)
    if not (isinstance(payload, dict) and payload.get("format") == FORMAT_TAG):
        raise ValueError(f"{path} is not an {FORMAT_TAG} checkpoint")
    version = int(payload.get("version", 1))  # pre-"version" dumps are v1
    if version > SCHEMA_VERSION:
        raise ValueError(
            f"{path} is schema v{version}, newer than this build's "
            f"v{SCHEMA_VERSION} — upgrade audio_sheet_retrieval_tpu to load it")
    while version < SCHEMA_VERSION:
        payload = _MIGRATIONS[version](payload)
        version += 1
    tree = payload["tree"]
    if like is not None:
        # restore the container types (NamedTuples etc.) of a template tree
        leaves = jax.tree.leaves(tree)
        treedef = jax.tree.structure(like)
        tree = jax.tree.unflatten(treedef, [jnp.asarray(v) for v in leaves])
    return tree


_orbax_ckptr = None


def save_pytree_orbax(path: str, tree: Any, wait: bool = True) -> None:
    """Durable checkpointing via Orbax (directory-based) — the production
    alternative to the pickle format for long training runs.

    ``wait=False`` returns as soon as the on-device arrays are snapshotted
    and writes in the background (the next save or `orbax_wait()` joins it),
    so long runs never stall the train loop on checkpoint IO.
    """
    global _orbax_ckptr
    import orbax.checkpoint as ocp

    if _orbax_ckptr is None:
        _orbax_ckptr = ocp.StandardCheckpointer()
    _orbax_ckptr.save(os.path.abspath(path), to_numpy_tree(tree), force=True)
    if wait:
        _orbax_ckptr.wait_until_finished()


def orbax_wait() -> None:
    """Join any in-flight async orbax save (no-op when none)."""
    if _orbax_ckptr is not None:
        _orbax_ckptr.wait_until_finished()


def load_pytree_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             target=to_numpy_tree(like))
    leaves = jax.tree.leaves(restored)
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, [jnp.asarray(v) for v in leaves])


def save_results(path: str, results: dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fp:
        pickle.dump(results, fp, protocol=pickle.HIGHEST_PROTOCOL)


def load_results(path: str) -> dict:
    with open(path, "rb") as fp:
        return pickle.load(fp)
