"""Data-parallel fit loop on the 8-device virtual mesh."""

import jax
import numpy as np

from audio_sheet_retrieval_tpu.data import synthetic
from audio_sheet_retrieval_tpu.data.iterators import (
    MultiviewPoolIteratorUnsupervised,
)
from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.parallel import mesh as pm
from audio_sheet_retrieval_tpu.train import engine
import pytest

pytestmark = pytest.mark.slow  # compile-heavy virtual-mesh suite


def test_fit_under_mesh(tmp_path):
    assert jax.device_count() >= 8
    mesh = pm.make_mesh((8,), axis_names=(pm.DATA_AXIS,))
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8, batch_size=16, k_samples=64,
                           patience=1, refinement_steps=0, max_epochs=2)
    data = synthetic.load_synthetic_retrieval(n_train=2, n_valid=1, n_test=1,
                                              seed=3, n_onsets=40)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    tr_it = MultiviewPoolIteratorUnsupervised(batch_size=16, k_samples=64)
    va_it = MultiviewPoolIteratorUnsupervised(batch_size=16, shuffle=False)
    epochs = []
    best, best_map = engine.fit(params, data, cfg, tr_it, va_it,
                                out_path=str(tmp_path), verbose=False,
                                on_epoch=epochs.append, mesh=mesh)
    assert len(epochs) == 2
    assert np.isfinite(epochs[-1]["train_loss"])
    assert np.isfinite(best_map)
