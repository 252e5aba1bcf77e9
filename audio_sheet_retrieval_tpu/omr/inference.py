"""Segmentation inference over arbitrary page sizes.

Parity with reference:sheet_utils/omr.py:200-303 (SegmentationNetwork):
direct prediction when the page matches the training shape; otherwise
sliding-window tiles with sqrt-Hamming blending, normalized by the summed
window weights, cropped back to the page.

TPU-first: all tiles are gathered into ONE batch, run through the U-Net in a
single jitted call, and blended with a weighted scatter-add on device — the
reference looped tile-by-tile through a per-tile compiled function.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_sheet_retrieval_tpu.models import unet


def prepare_image(img: np.ndarray) -> np.ndarray:
    """Normalize a page image to [0, 1] float (reference omr.py:16-20)."""
    img = img.astype(np.float32)
    if img.max() != 0:
        img /= img.max()
    return img


def _quantize_page(img_01: np.ndarray) -> np.ndarray:
    """[0, 1] float page -> u16 wire codes (see _U16)."""
    return np.round(np.clip(img_01, 0.0, 1.0) * _U16).astype(np.uint16)


_U16 = 65535.0  # wire quantization: page up + prob map down ride as u16
# codes (error 7.6e-6, far below the network's own noise floor) — the
# f32 round trip of a padded page was ~12.6 MB and dominated per-page
# latency on tunneled hosts (measured: U-Net 88 ms vs 401 ms total)


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "out_h",
                                             "out_w", "compute_dtype",
                                             "conv_precision"))
def _tiled_predict(params, image_u16: jnp.ndarray, row0: jnp.ndarray,
                   col0: jnp.ndarray, ham2d: jnp.ndarray,
                   tile_h: int, tile_w: int, out_h: int, out_w: int,
                   compute_dtype: str = "float32",
                   conv_precision: str = "highest"):
    """image_u16 [H, W] u16-quantized [0,1] page (padded); (row0, col0)
    tile corner lists. Returns the blended probability map as u16 codes."""
    n_tiles = row0.shape[0]
    image = image_u16.astype(jnp.float32) * (1.0 / _U16)

    def gather(i):
        return jax.lax.dynamic_slice(image, (row0[i], col0[i]),
                                     (tile_h, tile_w))

    tiles = jax.vmap(gather)(jnp.arange(n_tiles))[..., None]  # [T, h, w, 1]
    probs = unet.unet_apply(params, tiles,
                            compute_dtype=compute_dtype,
                            conv_precision=conv_precision)    # [T, h, w]
    weighted = probs * ham2d[None]

    R = jnp.zeros((out_h, out_w), jnp.float32)
    V = jnp.zeros((out_h, out_w), jnp.float32)

    def body(i, carry):
        R, V = carry
        R = jax.lax.dynamic_update_slice(
            R, jax.lax.dynamic_slice(R, (row0[i], col0[i]),
                                     (tile_h, tile_w)) + weighted[i],
            (row0[i], col0[i]))
        V = jax.lax.dynamic_update_slice(
            V, jax.lax.dynamic_slice(V, (row0[i], col0[i]),
                                     (tile_h, tile_w)) + ham2d,
            (row0[i], col0[i]))
        return R, V

    R, V = jax.lax.fori_loop(0, n_tiles, body, (R, V))
    return jnp.round(jnp.clip(R / V, 0.0, 1.0) * _U16).astype(jnp.uint16)


class SegmentationNetwork:
    """U-Net predictor with sliding-window blending for large pages.

    ``compute_dtype``/``conv_precision`` select the OMR precision-ladder
    arm (f32-highest = strict parity default; f32-high and bfloat16 are
    the measured fast recipes, gated on detection equality —
    scripts/omr_probe.py, tests/test_omr.py)."""

    def __init__(self, params, input_shape: Tuple[int, int] = (512, 512),
                 compute_dtype: str = "float32",
                 conv_precision: str = "highest"):
        self.params = params
        self.input_shape = tuple(input_shape)
        self.compute_dtype = compute_dtype
        self.conv_precision = conv_precision

        @jax.jit
        def _direct(p, x_u16):
            y = unet.unet_apply(p, x_u16.astype(jnp.float32) * (1.0 / _U16),
                                compute_dtype=compute_dtype,
                                conv_precision=conv_precision)
            return jnp.round(jnp.clip(y, 0.0, 1.0) * _U16
                             ).astype(jnp.uint16)

        self._direct = _direct

    @classmethod
    def load(cls, path: str, input_shape: Tuple[int, int] = (512, 512),
             compute_dtype: str = "float32",
             conv_precision: str = "highest"):
        return cls(unet.load_unet_checkpoint(path), input_shape,
                   compute_dtype=compute_dtype,
                   conv_precision=conv_precision)

    def predict_proba(self, image: np.ndarray, squeeze: bool = True,
                      overlap: float = 0.5) -> np.ndarray:
        """[H, W] or [N, 1, H, W] float image -> probability map."""
        image = np.asarray(image, np.float32)
        if image.ndim == 2:
            image = image[None, None]
        n, _, h, w = image.shape
        sh, sw = self.input_shape

        if (h, w) == (sh, sw):
            q = _quantize_page(image[:, 0])
            proba = np.asarray(self._direct(
                self.params, jnp.asarray(q[..., None]))
            ).astype(np.float32) / _U16
        else:
            proba = np.stack([self._sliding(image[i, 0], overlap)
                              for i in range(n)])
        if squeeze:
            proba = proba.squeeze()
        return proba

    def predict(self, image: np.ndarray, thresh: float = 0.5) -> np.ndarray:
        return (self.predict_proba(image, squeeze=True) > thresh)

    def _sliding(self, img: np.ndarray, overlap: float) -> np.ndarray:
        h, w = img.shape
        sh, sw = self.input_shape
        missing_h = int(sh * np.ceil(h / sh) - h)
        missing_w = int(sw * np.ceil(w / sw) - w)
        pad_top, pad_left = missing_h // 2, missing_w // 2
        pad_bottom, pad_right = missing_h - pad_top, missing_w - pad_left
        padded = np.pad(img, ((pad_top, pad_bottom), (pad_left, pad_right)),
                        mode="constant")

        step_h = int(sh * (1.0 - overlap))
        step_w = int(sw * (1.0 - overlap))
        row0 = np.arange(0, padded.shape[0] - sh + 1, step_h, np.int32)
        col0 = np.arange(0, padded.shape[1] - sw + 1, step_w, np.int32)
        rr, cc = np.meshgrid(row0, col0, indexing="ij")

        ham2d = np.sqrt(np.outer(np.hamming(sh), np.hamming(sw))
                        ).astype(np.float32)

        blended = _tiled_predict(
            self.params, jnp.asarray(_quantize_page(padded)),
            jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel()),
            jnp.asarray(ham2d), sh, sw,
            int(padded.shape[0]), int(padded.shape[1]),
            compute_dtype=self.compute_dtype,
            conv_precision=self.conv_precision)
        out = np.asarray(blended).astype(np.float32) / _U16
        return out[pad_top:padded.shape[0] - pad_bottom,
                   pad_left:padded.shape[1] - pad_right]
