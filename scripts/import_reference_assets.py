#!/usr/bin/env python
"""One-time conversion of the reference's shipped binary artifacts into the
repo's own versioned asset format (compressed .npz of the raw array lists),
so the framework is self-contained (runs with /root/reference unmounted).

Converted (weights only — numeric data, not code):
  * tutorials/params_all_split_mutopia_full_aug.pkl -> tutorial_checkpoint.npz
    (flat 97-array lasagne dump, SURVEY.md section 2 row 23)
  * sheet_utils/omr_models/{system,bar,note}_params.pkl -> omr_{kind}.npz
    (99-array lasagne U-Net dumps, reference sheet_utils/omr.py:200-303)
  * tutorials/sheet_image.png + audio.mp3 -> copied verbatim as the tutorial
    demo inputs (reference tutorials/Embedding Tutorial.ipynb)

Run: python scripts/import_reference_assets.py [--reference /root/reference]
Idempotent; overwrites existing assets.
"""

from __future__ import annotations

import argparse
import os
import pickle
import shutil

import numpy as np

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "audio_sheet_retrieval_tpu", "assets")


def pkl_to_npz(pkl_path: str, npz_path: str, source: str) -> int:
    with open(pkl_path, "rb") as fp:
        arrays = pickle.load(fp, encoding="latin1")
    if arrays and isinstance(arrays[0], (list, tuple)):
        arrays = next(a for a in arrays if len(a) == 97)
    payload = {f"arr_{i:03d}": np.asarray(a, dtype=np.float32)
               for i, a in enumerate(arrays)}
    payload["__meta__"] = np.array(
        [f"asr_tpu_raw_arrays_v1:n={len(arrays)}:source={source}"])
    np.savez_compressed(npz_path, **payload)
    return len(arrays)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    ref = args.reference
    os.makedirs(ASSETS, exist_ok=True)

    n = pkl_to_npz(
        os.path.join(ref, "tutorials", "params_all_split_mutopia_full_aug.pkl"),
        os.path.join(ASSETS, "tutorial_checkpoint.npz"),
        "tutorials/params_all_split_mutopia_full_aug.pkl")
    print(f"tutorial_checkpoint.npz: {n} arrays")

    for kind in ("system", "bar", "note"):
        n = pkl_to_npz(
            os.path.join(ref, "audio_sheet_retrieval", "sheet_utils",
                         "omr_models", f"{kind}_params.pkl"),
            os.path.join(ASSETS, f"omr_{kind}.npz"),
            f"sheet_utils/omr_models/{kind}_params.pkl")
        print(f"omr_{kind}.npz: {n} arrays")

    for name in ("sheet_image.png", "audio.mp3"):
        shutil.copyfile(os.path.join(ref, "tutorials", name),
                        os.path.join(ASSETS, name))
        print(f"copied {name}")


if __name__ == "__main__":
    main()
