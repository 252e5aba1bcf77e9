"""Vendored weight/demo assets so the framework is self-contained.

Files here are generated once by ``scripts/import_reference_assets.py`` from
the reference's shipped binaries (numeric weights + tutorial demo inputs,
not code):

* ``tutorial_checkpoint.npz`` — the shipped retrieval checkpoint
  (reference tutorials/params_all_split_mutopia_full_aug.pkl) as the repo's
  raw-array npz format: keys ``arr_000..arr_096`` + ``__meta__``.
* ``omr_{system,bar,note}.npz`` — the three OMR U-Net weight sets
  (reference sheet_utils/omr_models/*.pkl), 99 arrays each.
* ``sheet_image.png`` / ``audio.mp3`` — the tutorial demo page/recording.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))

FORMAT_TAG = "asr_tpu_raw_arrays_v1"


def assets_dir() -> str:
    return _DIR


def asset_path(name: str) -> str:
    return os.path.join(_DIR, name)


def has_asset(name: str) -> bool:
    return os.path.exists(asset_path(name))


def tutorial_checkpoint_path() -> str:
    return asset_path("tutorial_checkpoint.npz")


def omr_weights_path(kind: str) -> str:
    assert kind in ("system", "bar", "note"), kind
    return asset_path(f"omr_{kind}.npz")


def tutorial_sheet_path() -> str:
    return asset_path("sheet_image.png")


def tutorial_audio_path() -> str:
    return asset_path("audio.mp3")


def load_raw_arrays(path: str) -> List[np.ndarray]:
    """Load a raw-array npz asset back into the flat list-of-arrays form the
    lasagne importers consume (same order as the original pickle)."""
    with np.load(path, allow_pickle=False) as z:
        meta = str(z["__meta__"][0]) if "__meta__" in z.files else ""
        if FORMAT_TAG not in meta:
            raise ValueError(f"{path}: not a {FORMAT_TAG} asset ({meta!r})")
        keys = sorted(k for k in z.files if k.startswith("arr_"))
        return [np.asarray(z[k]) for k in keys]
