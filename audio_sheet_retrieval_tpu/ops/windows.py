"""Device-side window extraction over long sequences (strips, spectrograms).

The reference windows long inputs host-side with python loops
(reference:audio_sheet_server.py:216-223,465-477; audio2sheet_align.py:
112-135). On TPU the full unrolled strip / spectrogram stays resident in HBM
and all windows are produced by one batched gather — uploading a piece once
costs 4-16x less host->device traffic than uploading its overlapping windows
(the serving DB build uses stride context//4).

All functions are jit-specialized on (num_windows, window); callers bucket
start counts (pad with repeated starts, drop tails host-side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("window",))
def gather_windows(seq: jnp.ndarray, starts: jnp.ndarray, window: int):
    """[H, W] sequence + [N] starts -> [N, H, window] windows (gather)."""
    cols = starts[:, None] + jnp.arange(window)[None, :]      # [N, window]
    return jnp.transpose(seq[:, cols], (1, 0, 2))             # [N, H, window]


def linspace_starts(total: int, window: int, n: int) -> np.ndarray:
    return np.linspace(0, total - window, num=n).astype(np.int32)


def stride_starts(total: int, window: int, stride: int) -> np.ndarray:
    return np.arange(0, total - window, stride, dtype=np.int32)


def make_strip_embedder(params, cfg, *, center_crop: int | None = None):
    """Sheet-strip -> window embeddings, fully fused on device.

    Returns fn(strip_u8 [H, W], starts [N]) -> [N, dim] where the strip is
    raw uint8; the vertical center crop (server semantics,
    audio_sheet_server.py:265-271), /255 normalization, optional half
    resize ('prepare') and the encoder+CCA+L2 all run in one computation.

    Parameters are threaded as a jit ARGUMENT (never a closure): closed-over
    weight arrays would be inlined as HLO constants, bloating the program
    and degrading every subsequent dispatch on tunneled backends.
    """
    crop_h = center_crop or cfg.input_shape_1[1]

    @jax.jit
    def embed_p(p, strip_u8: jnp.ndarray, starts: jnp.ndarray):
        return _strip_embed_core(p, strip_u8, starts, cfg, False, crop_h)

    params = jax.device_put(params)

    def embed(strip_u8, starts):
        return embed_p(params, strip_u8, starts)

    return embed


def _strip_embed_core(p, strip, starts, cfg, packed: bool, crop_h: int):
    """Traceable strip-embedding core (optionally 4-bit packed input):
    vertical center crop, window gather, 'prepare', encoder+CCA+L2.
    Compose inside larger jits (the embedders below, bench ceiling scans)."""
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.train.engine import prepare_view1_device

    if packed:
        strip = unpack_strip_4bit(strip)
    window = cfg.input_shape_1[2]
    r0 = strip.shape[0] // 2 - crop_h // 2
    strip = jax.lax.dynamic_slice_in_dim(strip, r0, crop_h, axis=0)
    wins = gather_windows(strip.astype(jnp.float32), starts, window)
    x = prepare_view1_device(wins[:, None, :, :], cfg)
    return cca_model.embed_view1(p, x, cfg)


def pack_strip_4bit(strip_u8: np.ndarray) -> np.ndarray:
    """Pack a [H, W] uint8 sheet strip to 4 bits/pixel ([H, W/2] uint8).

    Sheet images are near-binary; 16 gray levels change embeddings less than
    bfloat16 compute does (measured with the reference checkpoint: pairwise
    cosine >= 0.99996 vs full precision) while halving the dominant
    host->device stream. Odd widths drop the last column.
    """
    s = np.asarray(strip_u8, np.uint8)
    w2 = (s.shape[1] // 2) * 2
    codes = (s[:, :w2].astype(np.uint16) + 8) // 17  # round(v/17)
    codes = np.minimum(codes, 15).astype(np.uint8)
    return (codes[:, 0::2] << 4) | codes[:, 1::2]


def unpack_strip_4bit(packed: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of pack_strip_4bit -> [H, 2*Wp] uint8 values."""
    hi = (packed >> 4) * jnp.uint8(17)
    lo = (packed & jnp.uint8(0xF)) * jnp.uint8(17)
    h, wp = packed.shape
    return jnp.stack([hi, lo], axis=2).reshape(h, 2 * wp)


def make_strip_embedder_packed(params, cfg, *, center_crop: int | None = None):
    """4-bit-packed variant of make_strip_embedder: the host uploads the
    packed strip (half the bytes); unpacking fuses into the same program."""
    crop_h = center_crop or cfg.input_shape_1[1]

    @jax.jit
    def embed_p(p, packed: jnp.ndarray, starts: jnp.ndarray):
        return _strip_embed_core(p, packed, starts, cfg, True, crop_h)

    params = jax.device_put(params)

    def embed(packed, starts):
        return embed_p(params, packed, starts)

    return embed


def make_spec_embedder(params, cfg):
    """Spectrogram [bins, T] -> window embeddings, fused on device."""
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.train.engine import prepare_view2_device

    window = cfg.input_shape_2[2]

    @jax.jit
    def embed_p(p, spec: jnp.ndarray, starts: jnp.ndarray):
        wins = gather_windows(spec, starts, window)
        x = prepare_view2_device(wins[:, None, :, :])
        return cca_model.embed_view2(p, x, cfg)

    params = jax.device_put(params)

    def embed(spec, starts):
        return embed_p(params, spec, starts)

    return embed


def make_audio_embedder(params, cfg, processor):
    """Raw int16-range waveform -> spectrogram -> window embeddings.

    The complete audio serving path as ONE jitted computation: framing +
    STFT + log filterbank (ops/audio.py) + window gather + encoder. The
    host uploads int16 samples only. Params and the filterbank ride as jit
    arguments (see make_strip_embedder on why closures are harmful).
    """
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.train.engine import prepare_view2_device

    window = cfg.input_shape_2[2]

    @functools.partial(jax.jit, static_argnames=("num_frames",))
    def embed_p(p, fb, win_fn, signal_i16, starts, num_frames: int):
        # madmom folds the int16 range into the window (1/32767)
        sig = signal_i16.astype(jnp.float32) * (1.0 / 32767.0)
        from audio_sheet_retrieval_tpu.ops.audio import _spectrogram_core

        starts_f = (jnp.arange(num_frames) * processor.hop_size
                    ).astype(jnp.int32)
        spec = _spectrogram_core(sig, win_fn, fb, starts_f, num_frames,
                                 processor.frame_size).T
        wins = gather_windows(spec, starts, window)
        x = prepare_view2_device(wins[:, None, :, :])
        return cca_model.embed_view2(p, x, cfg)

    params = jax.device_put(params)
    fb = processor.filterbank
    win_arr = processor._window

    def embed(signal_i16, starts, num_frames):
        return embed_p(params, fb, win_arr, signal_i16, starts, num_frames)

    return embed


def mulaw_encode(signal_i16: np.ndarray, mu: int = 255) -> np.ndarray:
    """int16 waveform -> 8-bit mu-law companded bytes (host side).

    Halves the audio host->device stream, which dominates serving ingest
    once sheet strips are 4-bit packed. Decoding fuses into the embedding
    program (make_audio_embedder_mulaw). Quality A/B with the reference
    checkpoint + the reference tutorial recording: excerpt-embedding cosine
    and cross-modal rankings in tests/test_windows.py; see PARITY.md.
    """
    x = np.asarray(signal_i16, np.float32) * (1.0 / 32768.0)
    y = np.sign(x) * np.log1p(mu * np.abs(x)) * (1.0 / np.log1p(mu))
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def mulaw_decode_device(u8: jnp.ndarray, mu: float = 255.0) -> jnp.ndarray:
    """Device-side inverse of mulaw_encode -> float32 in [-1, 1]."""
    y = u8.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    return jnp.sign(y) * jnp.expm1(jnp.abs(y) * jnp.log1p(mu)) * (1.0 / mu)


def make_audio_embedder_mulaw(params, cfg, processor):
    """mu-law variant of make_audio_embedder: the host uploads 8-bit
    companded samples (half the bytes); expansion + DSP + encoder stay one
    jitted program."""
    from audio_sheet_retrieval_tpu.models import cca_model
    from audio_sheet_retrieval_tpu.train.engine import prepare_view2_device

    window = cfg.input_shape_2[2]

    @functools.partial(jax.jit, static_argnames=("num_frames",))
    def embed_p(p, fb, win_fn, signal_u8, starts, num_frames: int):
        # decode is /32768-scaled; the raw path divides int16 by 32767
        sig = mulaw_decode_device(signal_u8) * (32768.0 / 32767.0)
        from audio_sheet_retrieval_tpu.ops.audio import _spectrogram_core

        starts_f = (jnp.arange(num_frames) * processor.hop_size
                    ).astype(jnp.int32)
        spec = _spectrogram_core(sig, win_fn, fb, starts_f, num_frames,
                                 processor.frame_size).T
        wins = gather_windows(spec, starts, window)
        x = prepare_view2_device(wins[:, None, :, :])
        return cca_model.embed_view2(p, x, cfg)

    params = jax.device_put(params)
    fb = processor.filterbank
    win_arr = processor._window

    def embed(signal_u8, starts, num_frames):
        return embed_p(params, fb, win_arr, signal_u8, starts, num_frames)

    return embed
