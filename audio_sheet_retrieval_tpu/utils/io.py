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


def to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {"format": FORMAT_TAG, "tree": to_numpy_tree(tree),
               "meta": dict(meta or {})}
    with open(path, "wb") as fp:
        pickle.dump(payload, fp, protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path: str, like: Any = None) -> Any:
    with open(path, "rb") as fp:
        payload = pickle.load(fp)
    if not (isinstance(payload, dict) and payload.get("format") == FORMAT_TAG):
        raise ValueError(f"{path} is not an {FORMAT_TAG} checkpoint")
    tree = payload["tree"]
    if like is not None:
        # restore the container types (NamedTuples etc.) of a template tree
        leaves = jax.tree.leaves(tree)
        treedef = jax.tree.structure(like)
        tree = jax.tree.unflatten(treedef, [jnp.asarray(v) for v in leaves])
    return tree


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Durable checkpointing via Orbax (directory-based, async-capable) —
    the production alternative to the pickle format for long training runs.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), to_numpy_tree(tree), force=True)
    ckptr.wait_until_finished()


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
