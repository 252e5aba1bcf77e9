"""Audio front-end: filterbank construction + spectrogram semantics."""

import numpy as np

from audio_sheet_retrieval_tpu.ops import audio, filterbank as fb


def test_canonical_filterbank_is_92_bins():
    m = fb.logarithmic_filterbank()
    assert m.shape == (1024, fb.SPEC_BINS) == (1024, 92)
    # area-normalized triangular filters
    np.testing.assert_allclose(m.sum(axis=0), 1.0, atol=1e-9)
    assert (m >= 0).all()
    # band centers strictly increasing
    centers = np.argmax(m, axis=0)
    assert (np.diff(centers) >= 0).all()
    # coverage roughly 30..6000 Hz
    freqs = fb.fft_frequencies(1024, fb.SAMPLE_RATE)
    nz = np.nonzero(m.sum(axis=1))[0]
    assert freqs[nz[0]] < 50 and freqs[nz[-1]] > 5500


def test_log_frequencies_spacing():
    f = fb.log_frequencies(16, 30, 6000)
    ratios = f[1:] / f[:-1]
    np.testing.assert_allclose(ratios, 2 ** (1 / 16), rtol=1e-10)
    assert f[0] >= 30 and f[-1] <= 6000
    # aligned to 440 Hz reference
    k = np.log2(f / 440.0) * 16
    np.testing.assert_allclose(k, np.round(k), atol=1e-9)


def test_spectrogram_shape_and_framing():
    proc = audio.AudioProcessor()
    sr = proc.sample_rate
    n = sr * 3  # 3 seconds
    sig = (0.2 * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr) * 32767)
    sig = sig.astype(np.int16)
    spec = proc.process(sig)
    assert spec.shape[0] == 92
    # 20 fps: ceil(n / hop) frames
    assert spec.shape[1] == int(np.ceil(n / (sr / 20.0)))
    assert np.isfinite(spec).all()


def test_spectrogram_peak_at_tone_band():
    proc = audio.AudioProcessor()
    sr = proc.sample_rate
    n = sr * 2
    tone = 440.0
    sig = (0.5 * np.sin(2 * np.pi * tone * np.arange(n) / sr) * 32767)
    sig = sig.astype(np.int16)
    spec = proc.process(sig)
    mean_spec = spec[:, 5:-5].mean(axis=1)
    peak_band = int(np.argmax(mean_spec))
    # locate the 440 Hz filter in the filterbank
    freqs = fb.fft_frequencies(1024, sr)
    centers = freqs[np.argmax(np.asarray(proc.filterbank), axis=0)]
    want_band = int(np.argmin(np.abs(centers - tone)))
    assert abs(peak_band - want_band) <= 1


def test_spectrogram_matches_numpy_reference():
    """Full numpy re-implementation of the madmom chain as oracle."""
    proc = audio.AudioProcessor()
    sr = proc.sample_rate
    rng = np.random.default_rng(0)
    n = sr  # 1 second of noise
    sig = (rng.standard_normal(n) * 3000).astype(np.int16)

    hop = sr / 20.0
    nf = int(np.ceil(n / hop))
    window = np.hanning(2048) / 32767.0
    fbm = fb.logarithmic_filterbank()
    want = np.zeros((nf, 92))
    padded = np.concatenate([sig.astype(np.float64), np.zeros(2048 + int(nf * hop))])
    for k in range(nf):
        start = int(k * hop)
        frame = padded[start:start + 2048] * window
        mag = np.abs(np.fft.rfft(frame))[:1024]
        want[k] = np.log10(1.0 + mag @ fbm)

    got = proc.process(sig).T
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_frame_bucketing_consistency():
    """Different signal lengths in the same bucket give identical prefixes."""
    proc = audio.AudioProcessor()
    sr = proc.sample_rate
    rng = np.random.default_rng(1)
    sig = (rng.standard_normal(sr) * 1000).astype(np.int16)
    full = proc.process(sig)
    # re-process a truncated copy: shared frames (away from the cut) agree
    cut = proc.process(sig[: sr // 2])
    # frames whose 2048-sample window stays inside the truncated signal
    nshared = int((sr // 2 - 2048) // (sr / 20.0)) + 1
    np.testing.assert_allclose(full[:, :nshared], cut[:, :nshared], atol=1e-5)


def test_resample_int16_roundtrip_shape():
    sr_in, sr_out = 44100, 22050
    sig = (np.sin(2 * np.pi * 440 * np.arange(sr_in) / sr_in) * 20000
           ).astype(np.int16)
    out = audio.resample(sig, sr_in, sr_out)
    assert out.dtype == np.int16
    assert abs(len(out) - sr_out) <= 2


def test_process_host_matches_device_process():
    """The pure-numpy host DSP (spectrogram-upload serving clients) must
    match the jitted device chain to float32 tolerance, including int16
    scaling, multi-channel downmix, and frame bucketing edges."""
    proc = audio.AudioProcessor()
    sr = proc.sample_rate
    rng = np.random.default_rng(17)
    sig = (rng.standard_normal(sr * 2 + 137) * 4000).astype(np.int16)
    dev = proc.process(sig)
    host = proc.process_host(sig)
    assert host.shape == dev.shape and host.dtype == np.float32
    np.testing.assert_allclose(host, dev, atol=2e-4)

    stereo = np.stack([sig, (sig // 2)], axis=1)
    np.testing.assert_allclose(proc.process_host(stereo),
                               proc.process(stereo), atol=2e-4)
