"""Embedding service API.

Parity with reference:retrieval_wrapper.py — ``compute_view_1/2`` batched
embedding of raw sheet snippets / spectrogram excerpts. Improvements over the
reference: no dummy-second-view inputs (eval-mode CCA is per-view affine),
each view is one jitted function compiled once for a fixed batch size, and an
optional BN-folded fast path for serving.

Accepts both checkpoint formats: this framework's native pytree pickles and
reference Theano/Lasagne .pkl dumps (auto-detected).
"""

from __future__ import annotations

import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_sheet_retrieval_tpu.data.iterators import batch_compute1
from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
from audio_sheet_retrieval_tpu.models.cca_model import ModelParams
from audio_sheet_retrieval_tpu.models.configs import ModelConfig
from audio_sheet_retrieval_tpu.train.engine import (
    prepare_view1_device,
    prepare_view2_device,
)
from audio_sheet_retrieval_tpu.utils import io as uio


def load_any_checkpoint(path: str, cfg: ModelConfig) -> ModelParams:
    """Load a native pytree checkpoint or a reference lasagne .pkl."""
    with open(path, "rb") as fp:
        payload = pickle.load(fp, encoding="latin1")
    if isinstance(payload, dict) and payload.get("format") == uio.FORMAT_TAG:
        template = cca_model.init_model(jax.random.PRNGKey(0), cfg)
        leaves = jax.tree.leaves(payload["tree"])
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, [jnp.asarray(v) for v in leaves])
    if isinstance(payload, list):
        if payload and isinstance(payload[0], (list, tuple)):
            full = [p for p in payload if len(p) == lasagne_import.N_TOTAL]
            payload = full[0]
        arrays = [np.asarray(a, np.float32) for a in payload]
        return lasagne_import.import_retrieval_params(arrays, cfg)
    raise ValueError(f"unrecognized checkpoint format in {path}")


class RetrievalWrapper:
    """Cross-modality embedding wrapper (reference retrieval_wrapper.py:12-77)."""

    def __init__(self, model_cfg: ModelConfig, param_file: Optional[str] = None,
                 params: Optional[ModelParams] = None, batch_size: int = 100,
                 folded: bool = True):
        self.cfg = model_cfg
        self.code_dim = model_cfg.dim_latent
        self.batch_size = batch_size
        if params is None:
            if param_file is None:
                raise ValueError("need param_file or params")
            params = load_any_checkpoint(param_file, model_cfg)
        self.params = params
        self.shape_view1 = model_cfg.input_shape_1
        self.shape_view2 = model_cfg.input_shape_2

        cfg = model_cfg
        if folded:
            fm = cca_model.fold(params)

            @jax.jit
            def v1(x):
                return cca_model.folded_embed_view1(
                    fm, prepare_view1_device(x, cfg))

            @jax.jit
            def v2(x):
                return cca_model.folded_embed_view2(
                    fm, prepare_view2_device(x))
        else:
            @jax.jit
            def v1(x):
                return cca_model.embed_view1(
                    params, prepare_view1_device(x, cfg), cfg)

            @jax.jit
            def v2(x):
                return cca_model.embed_view2(
                    params, prepare_view2_device(x), cfg)

        self._v1 = v1
        self._v2 = v2

    def compute_view_1(self, X: np.ndarray) -> np.ndarray:
        """Embed raw sheet snippets [N, 1, H, W] (uint8 range) -> [N, 32]."""
        X = np.asarray(X, np.float32)
        bs = min(self.batch_size, X.shape[0])
        return batch_compute1(X, lambda e: self._v1(jnp.asarray(e)), bs)

    def compute_view_2(self, Z: np.ndarray) -> np.ndarray:
        """Embed spectrogram excerpts [N, 1, bins, frames] -> [N, 32]."""
        Z = np.asarray(Z, np.float32)
        bs = min(self.batch_size, Z.shape[0])
        return batch_compute1(Z, lambda e: self._v2(jnp.asarray(e)), bs)
