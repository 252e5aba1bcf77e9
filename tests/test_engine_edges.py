"""Engine edge cases: fit_cca per-epoch refit, NaN abort, OMR golden boxes."""

import os

import jax
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.data import synthetic
from audio_sheet_retrieval_tpu.data.iterators import (
    MultiviewPoolIteratorUnsupervised,
)
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.train import engine


def _tiny(**over):
    defaults = dict(num_filters=4, dim_latent=8, batch_size=20, k_samples=60,
                    patience=1, refinement_steps=0, max_epochs=2)
    defaults.update(over)
    return get_model_config("mutopia_ccal_cont_rsz", **defaults)


@pytest.mark.slow
def test_fit_cca_true_path_runs(tmp_path):
    """FIT_CCA=True: per-epoch offline numpy-CCA refit on the embedded
    train subset (reference train_dcca_pool.py:249-253)."""
    cfg = _tiny(fit_cca=True)
    data = synthetic.load_synthetic_retrieval(n_train=2, n_valid=1, n_test=1,
                                              seed=11, n_onsets=40)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=20, k_samples=60)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=20, shuffle=False)
    epochs = []
    _, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                             out_path=str(tmp_path), verbose=False,
                             on_epoch=epochs.append)
    assert len(epochs) == 2
    assert np.isfinite(best_map)


@pytest.mark.slow
def test_nan_loss_aborts(tmp_path):
    """NaN training loss forces patience exhaustion (reference :410-411)."""
    cfg = _tiny(ini_learning_rate=1e20, max_epochs=10)  # guaranteed blowup
    data = synthetic.load_synthetic_retrieval(n_train=2, n_valid=1, n_test=1,
                                              seed=12, n_onsets=40)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=20, k_samples=60)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=20, shuffle=False)
    epochs = []
    engine.fit(params, data, cfg, tr_it, va_it, out_path=str(tmp_path),
               verbose=False, on_epoch=epochs.append)
    # must stop well before max_epochs once the loss goes NaN
    assert len(epochs) <= 4


from audio_sheet_retrieval_tpu import assets as _assets
from audio_sheet_retrieval_tpu.retrieval.umc import resolve_omr_weights as _resolve_omr

OMR_DIR = _assets.assets_dir()
PAGE = _assets.tutorial_sheet_path()

# golden system boxes detected on the tutorial page (row0, row1) per system
GOLDEN_SYSTEM_ROWS = [(116, 214), (299, 393), (478, 571), (657, 760),
                      (845, 947), (1032, 1127)]


@pytest.mark.skipif(not _assets.has_asset("omr_system.npz"), reason="vendored OMR assets missing")
@pytest.mark.slow
def test_omr_system_boxes_match_golden():
    import cv2

    from audio_sheet_retrieval_tpu.omr.detectors import OpticalMusicRecognizer
    from audio_sheet_retrieval_tpu.omr.inference import (
        SegmentationNetwork,
        prepare_image,
    )

    img = cv2.imread(PAGE, 0)
    img = cv2.resize(img, (835, int(835 / img.shape[1] * img.shape[0])))
    omr = OpticalMusicRecognizer(
        system_detector=SegmentationNetwork.load(
            _resolve_omr(OMR_DIR, "system")),
        bar_detector=SegmentationNetwork.load(
            _resolve_omr(OMR_DIR, "bar")))
    systems = omr.detect_systems(prepare_image(img))
    assert len(systems) == len(GOLDEN_SYSTEM_ROWS)
    for (r0, r1), sys_box in zip(GOLDEN_SYSTEM_ROWS, systems):
        assert abs(sys_box[0, 0] - r0) <= 6, (r0, sys_box[0, 0])
        assert abs(sys_box[2, 0] - r1) <= 6, (r1, sys_box[2, 0])


@pytest.mark.slow
def test_pretrain_burn_in_runs(tmp_path):
    """pretrain_epochs warms the CCA running statistics before training
    (reference train_dcca_pool.py:170-182)."""
    cfg = _tiny(pretrain_epochs=2, alpha=0.5)
    data = synthetic.load_synthetic_retrieval(n_train=2, n_valid=1, n_test=1,
                                              seed=13, n_onsets=40)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=20, k_samples=60)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=20, shuffle=False)
    epochs = []
    _, best = engine.fit(params, data, cfg, tr_it, va_it,
                         out_path=str(tmp_path), verbose=False,
                         on_epoch=epochs.append)
    assert len(epochs) == 2 and np.isfinite(best)


def test_unet_intermediates():
    from tests.test_omr import _random_unet_params

    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import unet

    params = _random_unet_params(9)
    x = jnp.zeros((1, 32, 32, 1))
    out, inter = unet.unet_apply(params, x, return_intermediates=True)
    assert out.shape == (1, 32, 32)
    assert inter["enc0"].shape == (1, 32, 32, 8)
    assert inter["dec2"].shape == (1, 32, 32, 8)
