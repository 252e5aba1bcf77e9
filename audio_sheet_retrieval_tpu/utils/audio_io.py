"""Audio file reading.

The reference decodes flac/mp3 through madmom->ffmpeg. This environment has
no ffmpeg/librosa/soundfile; supported here:

  * .wav — via scipy.io.wavfile (pure python)
  * .flac — via the native C++ decoder in native/audioio (ctypes), built with
    ``python native/audioio/build.py`` (MSMD performances are flac)

Returns (signal, sample_rate) with signal int16 [n] mono or [n, ch].
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_NATIVE_LIB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "audioio", "libasraudio.so")


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    from scipy.io import wavfile

    sr, sig = wavfile.read(path)
    if sig.dtype == np.float32 or sig.dtype == np.float64:
        sig = np.clip(sig * 32767.0, -32768, 32767).astype(np.int16)
    elif sig.dtype == np.int32:
        sig = (sig >> 16).astype(np.int16)
    elif sig.dtype == np.uint8:
        sig = ((sig.astype(np.int16) - 128) << 8)
    return sig, int(sr)


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    from audio_sheet_retrieval_tpu.utils import flac_native

    return flac_native.decode_file(path, _NATIVE_LIB)


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path)
    if ext == ".flac":
        return read_flac(path)
    raise ValueError(
        f"unsupported audio format '{ext}' ({path}); this environment has "
        f"no mp3 decoder — convert to wav/flac")
