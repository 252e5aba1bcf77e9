"""Golden regression: embeddings of the reference checkpoint on fixed real
inputs must stay stable across refactors (import conventions, encoder
numerics, DSP chain). Regenerate tests/golden/reference_embeddings.npz only
for intentional, understood changes — and only when tests/test_oracle.py
(the independent pure-numpy re-derivation of the lasagne semantics) agrees
with the new values."""

import os

import numpy as np
import pytest

from audio_sheet_retrieval_tpu import assets

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "reference_embeddings.npz")
REF_CKPT = assets.tutorial_checkpoint_path()
PAGE = assets.tutorial_sheet_path()

requires_ref = pytest.mark.skipif(
    not (os.path.exists(REF_CKPT) and os.path.exists(PAGE)),
    reason="vendored tutorial assets missing")


@requires_ref
def test_sheet_embeddings_match_golden():
    import cv2
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.train.engine import prepare_view1_device

    golden = np.load(GOLDEN)
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(REF_CKPT, cfg)

    img = cv2.imread(PAGE, 0)
    img = cv2.resize(img, (835, int(835 / img.shape[1] * img.shape[0])))
    snips = np.stack([img[260:420, 40 + i * 60:40 + i * 60 + 200]
                      for i in range(8)]).astype(np.float32)
    lv1 = np.asarray(cca_model.embed_view1(
        params, prepare_view1_device(jnp.asarray(snips[:, None]), cfg), cfg))
    np.testing.assert_allclose(lv1, golden["sheet_codes"], atol=2e-4)


@requires_ref
def test_audio_chain_and_embeddings_match_golden():
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops.audio import AudioProcessor
    from audio_sheet_retrieval_tpu.train.engine import prepare_view2_device

    golden = np.load(GOLDEN)
    proc = AudioProcessor()
    sr = proc.sample_rate
    t = np.arange(sr * 5) / sr
    sig = (0.4 * np.sin(2 * np.pi * (220 + 80 * t) * t) * 32767
           ).astype(np.int16)
    spec = proc.process(sig)
    # the DSP chain itself is pinned
    np.testing.assert_allclose(spec[:, :300], golden["spec"], atol=2e-5)

    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(REF_CKPT, cfg)
    exc = np.stack([spec[:, i * 6:i * 6 + 42] for i in range(8)]
                   ).astype(np.float32)
    lv2 = np.asarray(cca_model.embed_view2(
        params, prepare_view2_device(jnp.asarray(exc[:, None])), cfg))
    np.testing.assert_allclose(lv2, golden["spec_codes"], atol=2e-4)
