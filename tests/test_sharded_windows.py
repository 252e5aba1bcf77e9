"""Window-axis sharding: embedding a piece's windows across the mesh.

SURVEY §5: long inputs are windowed on device; the window axis is
embarrassingly parallel — sharding the starts vector over the mesh splits
the batch across chips (XLA partitions the gather + encoder automatically).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from audio_sheet_retrieval_tpu.models import cca_model
from audio_sheet_retrieval_tpu.models.configs import get_model_config
from audio_sheet_retrieval_tpu.ops import windows as win
from audio_sheet_retrieval_tpu.parallel import mesh as pm


def test_strip_embedding_with_sharded_window_axis():
    mesh = pm.make_mesh((8,), axis_names=(pm.DATA_AXIS,))
    cfg = get_model_config("mutopia_ccal_cont_rsz", num_filters=4,
                           dim_latent=8)
    params = cca_model.init_model(jax.random.PRNGKey(0), cfg)
    embed = win.make_strip_embedder(params, cfg, center_crop=160)

    rng = np.random.default_rng(0)
    strip = jnp.asarray((rng.random((200, 4000)) * 255).astype(np.uint8))
    starts = win.linspace_starts(4000, 200, 64)

    want = np.asarray(embed(strip, jnp.asarray(starts)))

    strip_sh = jax.device_put(strip, NamedSharding(mesh, P()))
    starts_sh = jax.device_put(jnp.asarray(starts),
                               NamedSharding(mesh, P(pm.DATA_AXIS)))
    got = embed(strip_sh, starts_sh)
    # outputs sharded over the window axis across all 8 devices
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
