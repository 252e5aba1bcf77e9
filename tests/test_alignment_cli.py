"""CLI coverage for the alignment pipeline entries: audio2sheet_align
(embed strips/specs at fixed steps -> DTW -> pixel-error stats -> pkl
dump, reference audio2sheet_align.py:24-239) and alignment_video
(frame rendering, reference alignment_video.py:22-95)."""

import dataclasses
import os
import pickle

import jax
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.models import cca_model, configs
from audio_sheet_retrieval_tpu.utils import io as uio


@pytest.fixture()
def tiny_ckpt(monkeypatch, tmp_path):
    cfg = configs.get_model_config(
        "mutopia_ccal_cont_rsz", num_filters=4, dim_latent=8)
    cfg = dataclasses.replace(cfg, name="tiny_align")
    monkeypatch.setitem(configs.MODEL_REGISTRY, "tiny_align", cfg)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    params = params._replace(cca=params.cca._replace(
        U=np.eye(cfg.dim_latent, dtype=np.float32),
        V=np.eye(cfg.dim_latent, dtype=np.float32)))
    path = os.path.join(tmp_path, "params.pkl")
    uio.save_pytree(path, params)
    return cfg, path


@pytest.mark.slow
def test_audio2sheet_align_cli_and_video(tiny_ckpt, tmp_path, monkeypatch):
    from audio_sheet_retrieval_tpu.cli import alignment_video, audio2sheet_align

    cfg, ckpt = tiny_ckpt
    monkeypatch.chdir(tmp_path)
    errors = audio2sheet_align.main([
        "--model", "tiny_align", "--data", "synthetic",
        "--param_file", ckpt, "--align_by", "pydtw",
        "--n_test_pieces", "2", "--dump_alignment",
        "--step_sheet", "20", "--step_spec", "4",
    ])
    assert len(errors) == 2
    for pxl in errors.values():
        assert np.isfinite(pxl).all() and len(pxl) > 0

    res_file = None
    for root, _, files in os.walk(tmp_path):
        for f in files:
            if f.startswith("alignment_res_"):
                res_file = os.path.join(root, f)
    assert res_file, "alignment dump missing"
    with open(res_file, "rb") as fp:
        dumped = pickle.load(fp)
    assert set(dumped) == set(errors)

    # video renderer consumes a [spec, sheet, mapping, dtw_res] pickle
    from audio_sheet_retrieval_tpu.data import synthetic as syn
    from audio_sheet_retrieval_tpu.cli.audio2sheet_align import align_piece
    from audio_sheet_retrieval_tpu.retrieval.wrapper import RetrievalWrapper

    images, specs, o2cs = syn.make_piece_list(1, 1, n_onsets=40)
    wrapper = RetrievalWrapper(cfg, param_file=ckpt)
    _, mapping, dtw_res = align_piece(
        wrapper, cfg, images[0], specs[0][0], o2cs[0][0][:, 1],
        o2cs[0][0][:, 0], step_sheet=20, step_spec=4, align_by="pydtw")
    dump = os.path.join(tmp_path, "video_input.pkl")
    with open(dump, "wb") as fp:
        pickle.dump([specs[0][0], images[0], mapping, dtw_res], fp)
    out_dir = os.path.join(tmp_path, "figs")
    n = alignment_video.main([dump, "--out_dir", out_dir,
                              "--max_frames", "5"])
    assert n == 5
    assert len([f for f in os.listdir(out_dir) if f.endswith(".png")]) == 5
