"""Encoder/model structure, checkpoint import, folded-inference equivalence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_sheet_retrieval_tpu.models import cca_model, encoder, lasagne_import
from audio_sheet_retrieval_tpu.models.configs import get_model_config

from audio_sheet_retrieval_tpu import assets as _assets

REF_CKPT = _assets.tutorial_checkpoint_path()


def _tiny_cfg():
    # small net for fast CPU tests
    return get_model_config("mutopia_ccal_cont", num_filters=4, dim_latent=8)


def test_encoder_output_shape_sheet_and_spec():
    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    params = encoder.init_encoder(key, 1, cfg.num_filters, cfg.dim_latent)
    x_sheet = jnp.zeros((2, 160, 200, 1))
    lat, _ = encoder.encoder_apply(params, x_sheet)
    assert lat.shape == (2, cfg.dim_latent)
    x_spec = jnp.zeros((2, 92, 42, 1))
    lat2, _ = encoder.encoder_apply(params, x_spec)
    assert lat2.shape == (2, cfg.dim_latent)


@pytest.mark.slow
def test_forward_train_and_grads():
    cfg = _tiny_cfg()
    params = cca_model.init_model(jax.random.PRNGKey(1), cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(2), (12, 32, 40, 1))
    x2 = jax.random.normal(jax.random.PRNGKey(3), (12, 46, 42, 1))
    lv1, lv2, new_params, corr = cca_model.forward_train(params, x1, x2, cfg)
    assert lv1.shape == (12, cfg.dim_latent)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(lv1), axis=1), 1.0,
                               atol=1e-4)
    assert np.isfinite(np.asarray(corr)).all()
    # BN stats moved
    b0 = params.view1["blocks"][0]["mean"]
    b1 = new_params.view1["blocks"][0]["mean"]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))

    def loss(p):
        a, b, _, _ = cca_model.forward_train(p, x1, x2, cfg)
        return jnp.mean((a - b) ** 2)

    g = jax.grad(lambda p: loss(p))(params)
    gw = np.asarray(g.view1["blocks"][0]["w"])
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0


def test_eval_views_independent_and_normalized():
    cfg = _tiny_cfg()
    params = cca_model.init_model(jax.random.PRNGKey(4), cfg)
    # non-trivial projection
    params = params._replace(cca=params.cca._replace(
        U=jnp.eye(cfg.dim_latent), V=jnp.eye(cfg.dim_latent)))
    x1 = jax.random.normal(jax.random.PRNGKey(5), (3, 80, 100, 1))
    lv1 = cca_model.embed_view1(params, x1, cfg)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(lv1), axis=1), 1.0,
                               atol=1e-4)


def test_folded_matches_unfolded_eval():
    cfg = _tiny_cfg()
    params = cca_model.init_model(jax.random.PRNGKey(6), cfg)
    # randomize BN stats so folding is non-trivial
    def jitter(view, key):
        blocks = []
        for i, blk in enumerate(view["blocks"]):
            k1, k2, key = jax.random.split(key, 3)
            blocks.append(dict(
                blk,
                mean=0.1 * jax.random.normal(k1, blk["mean"].shape),
                inv_std=1.0 + 0.1 * jax.random.uniform(k2, blk["inv_std"].shape),
            ))
        return {"blocks": blocks}

    params = params._replace(
        view1=jitter(params.view1, jax.random.PRNGKey(7)),
        view2=jitter(params.view2, jax.random.PRNGKey(8)),
        cca=params.cca._replace(U=jnp.eye(cfg.dim_latent),
                                V=jnp.eye(cfg.dim_latent),
                                mean1=0.05 * jnp.ones(cfg.dim_latent)),
    )
    x1 = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 80, 1))
    want = cca_model.embed_view1(params, x1, cfg)
    fm = cca_model.fold(params)
    got = cca_model.folded_embed_view1(fm, x1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not mounted")
def test_import_reference_checkpoint():
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(REF_CKPT, cfg)
    assert params.view1["blocks"][0]["w"].shape == (3, 3, 1, 24)
    assert params.cca.U.shape == (32, 32)
    # embed a synthetic sheet snippet (80x100 after rsz-prepare) + excerpt
    x1 = jnp.asarray(np.random.default_rng(0).random((4, 80, 100, 1)),
                     jnp.float32)
    x2 = jnp.asarray(np.random.default_rng(1).random((4, 92, 42, 1)),
                     jnp.float32)
    lv1 = cca_model.embed_view1(params, x1, cfg)
    lv2 = cca_model.embed_view2(params, x2, cfg)
    assert lv1.shape == (4, 32) and lv2.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(lv1), axis=1), 1.0,
                               atol=1e-4)
    assert np.isfinite(np.asarray(lv2)).all()


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference checkpoint not mounted")
def test_export_roundtrip():
    cfg = get_model_config("mutopia_ccal_cont_rsz")
    arrays = lasagne_import.load_lasagne_pickle(REF_CKPT)
    params = lasagne_import.import_retrieval_params(arrays, cfg)
    back = lasagne_import.export_lasagne_arrays(params)
    assert len(back) == len(arrays)
    for a, b in zip(arrays, back):
        np.testing.assert_array_equal(a, b)


def test_import_rejects_wrong_variant():
    if not os.path.exists(REF_CKPT):
        pytest.skip("reference checkpoint not mounted")
    cfg = get_model_config("mutopia_ccal_cont")  # 12 filters, ckpt has 24
    with pytest.raises(ValueError):
        lasagne_import.load_retrieval_checkpoint(REF_CKPT, cfg)
