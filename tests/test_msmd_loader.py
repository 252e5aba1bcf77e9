"""Exercises the real-MSMD branch end-to-end against a stub ``msmd`` package
(tests/msmd_stub) that replicates the Piece/Score/mungos/
align_score_to_performance API surface used by the loader (shaped after
reference utils/data_pools.py:369-439 and utils/mutopia_data.py:21-44):

  prepare_piece_data_msmd -> cli/export_msmd_npz -> npz loader -> pools
  -> one training epoch.

Until the real corpus is available this is the only execution coverage of
data/msmd.py's msmd branch, so API drift (e.g. notes_to_onsets returning an
array, performance-key parsing) is caught here."""

import os
import sys

import numpy as np
import pytest
import yaml


@pytest.fixture()
def msmd_stub(monkeypatch):
    stub_dir = os.path.join(os.path.dirname(__file__), "msmd_stub")
    monkeypatch.syspath_prepend(stub_dir)
    # purge any previously-imported msmd modules so the stub wins
    for mod in [m for m in sys.modules if m == "msmd" or m.startswith("msmd.")]:
        monkeypatch.delitem(sys.modules, mod)
    yield
    for mod in [m for m in sys.modules if m == "msmd" or m.startswith("msmd.")]:
        sys.modules.pop(mod, None)


def test_prepare_piece_data_msmd_filters_and_aligns(msmd_stub):
    from audio_sheet_retrieval_tpu.data import msmd as loader
    from audio_sheet_retrieval_tpu.data.pools import FULL_AUGMENT, NO_AUGMENT

    assert loader.msmd_available()

    image, specs, o2cs = loader.prepare_piece_data_msmd(
        "/fake/collection", "StubPiece_A", aug_config=NO_AUGMENT)
    # NO_AUGMENT: only ElectricPiano @ tempo 1.0 -> exactly 1 performance
    assert len(specs) == 1 and len(o2cs) == 1
    assert image.dtype == np.uint8 and image.ndim == 2
    # the stub has 2 pages x 2 systems unwrapped side by side
    assert image.shape[1] > image.shape[0]
    spec, o2c = specs[0], o2cs[0]
    assert spec.shape[0] == 92
    assert o2c.shape[1] == 2 and len(o2c) > 0
    # onsets within the spectrogram, x-coords within the strip
    assert (o2c[:, 0] >= 0).all() and (o2c[:, 0] < spec.shape[1]).all()
    assert (o2c[:, 1] >= 0).all() and (o2c[:, 1] < image.shape[1]).all()
    # onsets must be monotonically increasing along the unwrapped strip
    order = np.argsort(o2c[:, 0])
    assert (np.diff(o2c[order, 1]) > 0).mean() > 0.9

    # FULL_AUGMENT admits tempo 0.95 + 1.0 for ElectricPiano -> 2 perfs
    _, specs_f, _ = loader.prepare_piece_data_msmd(
        "/fake/collection", "StubPiece_A", aug_config=FULL_AUGMENT)
    assert len(specs_f) == 2


@pytest.mark.slow
def test_export_roundtrip_and_one_epoch(msmd_stub, tmp_path, monkeypatch):
    from audio_sheet_retrieval_tpu import config as cfg_mod
    from audio_sheet_retrieval_tpu.cli import export_msmd_npz
    from audio_sheet_retrieval_tpu.data import msmd as loader

    split = dict(train=["StubPiece_A", "StubPiece_B"],
                 valid=["StubPiece_C"], test=["StubPiece_D"])
    split_file = os.path.join(tmp_path, "split.yaml")
    with open(split_file, "w") as fp:
        yaml.safe_dump(split, fp)
    out_dir = os.path.join(tmp_path, "npz")

    monkeypatch.setattr(cfg_mod, "DATA_ROOT_MSMD", "/fake/collection")
    n = export_msmd_npz.main(["--train_split", split_file,
                              "--out_dir", out_dir])
    assert n == 4
    for piece in ("StubPiece_A", "StubPiece_D"):
        assert os.path.exists(os.path.join(out_dir, piece + ".npz"))

    # npz round-trip into the pool builder
    data = loader.load_audio_score_retrieval(split_file, npz_dir=out_dir)
    assert data["train"].shape[0] > 0
    assert data["test"].shape[0] > 0
    x1, x2 = data["train"][np.arange(8)]
    assert x1.shape == (8, 1, 160, 200) and x2.shape == (8, 1, 92, 42)

    # ... and one training epoch on the exported corpus
    import jax

    from audio_sheet_retrieval_tpu.data.iterators import (
        MultiviewPoolIteratorUnsupervised,
    )
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.train import engine

    cfg = get_model_config(
        "mutopia_ccal_cont_rsz", num_filters=4, dim_latent=8, batch_size=8,
        k_samples=16, patience=0, refinement_steps=0, max_epochs=1)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=8, k_samples=16)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=8, shuffle=False)
    epochs = []
    engine.fit(params, data, cfg, tr_it, va_it, out_path=str(tmp_path),
               verbose=False, on_epoch=epochs.append)
    assert len(epochs) >= 1
    assert np.isfinite(epochs[-1]["train_loss"])


def test_ragged_system_counts_per_page(msmd_stub):
    """Multi-page piece whose pages have DIFFERING system counts (3 then
    1): stitching + unwrap + onset mapping must handle the ragged layout
    (real MSMD pieces are not uniform; VERDICT r3 #7)."""
    from audio_sheet_retrieval_tpu.data import msmd as loader
    from audio_sheet_retrieval_tpu.data.pools import NO_AUGMENT

    image, specs, o2cs = loader.prepare_piece_data_msmd(
        "/fake/collection", "StubPiece_Ragged", aug_config=NO_AUGMENT)
    assert len(specs) == 1 and len(o2cs) == 1
    # 4 systems total (3 + 1) at 8 notes each -> most onsets mapped
    o2c = o2cs[0]
    assert len(o2c) >= 24
    assert (o2c[:, 0] >= 0).all()
    assert (o2c[:, 0] < specs[0].shape[1]).all()
    assert (o2c[:, 1] >= 0).all() and (o2c[:, 1] < image.shape[1]).all()
    # onsets monotone along the unwrapped strip despite the ragged pages
    order = np.argsort(o2c[:, 0])
    assert (np.diff(o2c[order, 1]) > 0).mean() > 0.9


def test_missing_alignment_skips_performance_not_piece(msmd_stub, capsys):
    """A performance whose alignment is missing is skipped with a warning;
    the piece survives with its remaining performances (the reference's
    per-piece try/except would discard the whole piece,
    mutopia_data.py:31-37 -- documented hardening)."""
    from audio_sheet_retrieval_tpu.data import msmd as loader
    from audio_sheet_retrieval_tpu.data.pools import FULL_AUGMENT

    # FULL_AUGMENT admits ElectricPiano at tempo 0.95 AND 1.0; the stub
    # breaks alignment for tempo-950 -> exactly one performance survives
    image, specs, o2cs = loader.prepare_piece_data_msmd(
        "/fake/collection", "StubPiece_NoAlign", aug_config=FULL_AUGMENT)
    assert len(specs) == 1 and len(o2cs) == 1
    assert "Problems with performance" in capsys.readouterr().out
    # the piece-list loop keeps the piece
    imgs, sp, oc = loader.load_piece_list(
        ["StubPiece_NoAlign"], aug_config=FULL_AUGMENT,
        collection_dir="/fake/collection")
    assert len(imgs) == 1 and len(sp[0]) == 1


def test_non_22050_audio_resample_fallback(msmd_stub):
    """Performance with NO precomputed spectrogram and only 44.1 kHz raw
    audio: the loader computes the log-filterbank spectrogram on the fly
    through the polyphase resample path (PARITY.md #4); onset frames stay
    in range of the computed feature."""
    from audio_sheet_retrieval_tpu.data import msmd as loader
    from audio_sheet_retrieval_tpu.data.pools import NO_AUGMENT

    image, specs, o2cs = loader.prepare_piece_data_msmd(
        "/fake/collection", "StubPiece_Audio44k", aug_config=NO_AUGMENT)
    assert len(specs) == 1
    spec, o2c = specs[0], o2cs[0]
    assert spec.shape[0] == 92 and spec.dtype == np.float32
    # ~14.8s of audio at 20 fps
    assert spec.shape[1] > 200
    assert np.isfinite(spec).all() and spec.max() > 0
    assert (o2c[:, 0] < spec.shape[1]).all()
    # the sine-mixture audio must produce energy at the note onsets
    energy = spec.sum(axis=0)
    assert energy[o2c[:, 0]].mean() > energy.mean() * 0.5


def test_msmd_branch_via_select_data(msmd_stub, tmp_path, monkeypatch):
    """select_data('mutopia') reaches the real-msmd collection branch."""
    from audio_sheet_retrieval_tpu import config as cfg_mod
    from audio_sheet_retrieval_tpu.data import msmd as loader

    split_file = os.path.join(tmp_path, "split.yaml")
    with open(split_file, "w") as fp:
        yaml.safe_dump(dict(train=["P1"], valid=["P2"], test=["P3"]), fp)
    monkeypatch.setattr(cfg_mod, "DATA_ROOT_MSMD", "/fake/collection")
    data = loader.select_data("mutopia", split_file, None, test_only=True)
    assert data["test"].shape[0] > 0
    x1, x2 = data["test"][np.arange(4)]
    assert x1.shape == (4, 1, 160, 200) and x2.shape == (4, 1, 92, 42)
