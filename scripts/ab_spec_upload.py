#!/usr/bin/env python
"""A/B the spectrogram-upload serving codings on the reference checkpoint +
the reference tutorial recording (VERDICT r2 #1; rigor per PARITY.md 11-12).

Arms (all vs the raw-int16-waveform device path as the oracle):
  mulaw   — 8-bit companded waveform (round-2 default), 22 kB/s
  specf32 — host DSP (AudioProcessor.process_host), f32 spec upload, 7.4 kB/s
  specu16 — u16 log-magnitude quantized spec, 3.7 kB/s
  specu8  — u8 quantized spec, 1.8 kB/s

Reported per arm: wire bytes/s, excerpt-embedding cosine (min/mean) vs the
oracle, and cross-modal retrieval agreement (top-1/top-5 sheet-snippet
rankings of each audio excerpt against a real-page snippet gallery built
from the vendored tutorial page — the protocol of the reference's
Embedding Tutorial).

Runs on CPU (parity precision) by default: pass --tpu to keep the session
backend. Usage: python scripts/ab_spec_upload.py [--tpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--tpu" not in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax
    import jax.numpy as jnp

    from audio_sheet_retrieval_tpu import assets
    from audio_sheet_retrieval_tpu.models import cca_model, lasagne_import
    from audio_sheet_retrieval_tpu.models.configs import get_model_config
    from audio_sheet_retrieval_tpu.ops import audio as audio_ops
    from audio_sheet_retrieval_tpu.ops import windows as win
    from audio_sheet_retrieval_tpu.train.engine import prepare_view1_device
    from audio_sheet_retrieval_tpu.utils.audio_io import read_audio
    from audio_sheet_retrieval_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()

    cfg = get_model_config("mutopia_ccal_cont_rsz")
    params = lasagne_import.load_retrieval_checkpoint(
        assets.tutorial_checkpoint_path(), cfg)
    proc = audio_ops.AudioProcessor()

    # the reference tutorial recording (vendored)
    sig, sr = read_audio(assets.tutorial_audio_path())
    if sig.ndim == 2:
        sig = sig.mean(axis=1)
    sig = np.asarray(sig, np.float64)
    if sr != proc.sample_rate:
        sig = audio_ops.resample(sig, sr, proc.sample_rate)
    sig = np.clip(np.round(sig * 32767), -32768, 32767).astype(np.int16) \
        if np.abs(sig).max() <= 1.0 else sig.astype(np.int16)
    secs = len(sig) / proc.sample_rate
    print(f"recording: {secs:.1f}s @ {proc.sample_rate} Hz")

    nf = audio_ops.num_frames_for(len(sig), proc.hop_size)
    spec_w = cfg.input_shape_2[2]
    n_q = 100
    starts = jnp.asarray(win.linspace_starts(nf, spec_w, n_q))

    # oracle: raw int16 waveform -> fused device DSP+embed
    oracle = np.asarray(win.make_audio_embedder(params, cfg, proc)(
        jnp.asarray(sig), starts, nf))

    # sheet gallery: snippets from the vendored tutorial page (real
    # engraving), the Embedding Tutorial protocol
    img = cv2.imread(assets.tutorial_sheet_path(), 0)
    img = cv2.resize(img, (835, int(835 / img.shape[1] * img.shape[0])))
    bands = [img[r:r + 160] for r in (260, 430, 600)]
    snips = []
    for band in bands:
        for x in range(0, band.shape[1] - 200, 25):
            snips.append(band[:, x:x + 200])
    snips = np.stack(snips).astype(np.float32)[:, None]
    gal = np.asarray(cca_model.embed_view1(
        params, prepare_view1_device(jnp.asarray(snips), cfg), cfg))
    print(f"gallery: {len(gal)} real-page snippets; {n_q} audio excerpts")

    def rank_sets(codes):
        s = codes @ gal.T
        order = np.argsort(-s, axis=1)
        return order[:, :1], order[:, :5]

    top1_o, top5_o = rank_sets(oracle)

    spec_host = proc.process_host(sig)
    bps = {
        "mulaw": proc.sample_rate * 1.0,
        "specf32": spec_host.shape[0] * proc.fps * 4.0,
        "specu16": spec_host.shape[0] * proc.fps * 2.0,
        "specu8": spec_host.shape[0] * proc.fps * 1.0,
        "specu16_high": spec_host.shape[0] * proc.fps * 2.0,
    }

    arms = {}
    arms["mulaw"] = np.asarray(win.make_audio_embedder_mulaw(
        params, cfg, proc)(jnp.asarray(win.mulaw_encode(sig)), starts, nf))
    arms["specf32"] = np.asarray(win.make_spec_embedder(params, cfg)(
        jnp.asarray(spec_host), starts))
    q = win.make_spec_embedder_q(params, cfg)
    for bits in (16, 8):
        codes, scale = win.spec_quantize(spec_host, bits=bits)
        arms[f"specu{bits}"] = np.asarray(q(jnp.asarray(codes), scale,
                                            starts))
    # conv_precision="high" serving recipe: same u16 wire, bf16x3 convs
    # (gallery side stays the HIGHEST-precision oracle gallery, so this
    # also checks cross-precision compatibility of stored galleries)
    import dataclasses as _dc

    cfg_high = _dc.replace(cfg, conv_precision="high")
    codes16, scale16 = win.spec_quantize(spec_host, bits=16)
    arms["specu16_high"] = np.asarray(
        win.make_spec_embedder_q(params, cfg_high)(
            jnp.asarray(codes16), scale16, starts))

    print(f"\n{'arm':8} {'kB/s':>6} {'cos_min':>9} {'cos_mean':>9} "
          f"{'top1':>9} {'top5':>9}")
    for name, emb in arms.items():
        cos = np.sum(emb * oracle, axis=1)
        t1, t5 = rank_sets(emb)
        agree1 = float(np.mean(t1[:, 0] == top1_o[:, 0]))
        agree5 = float(np.mean([len(np.intersect1d(a, b)) / 5.0
                                for a, b in zip(t5, top5_o)]))
        print(f"{name:8} {bps[name] / 1e3:6.1f} {cos.min():9.5f} "
              f"{cos.mean():9.5f} {agree1:9.2%} {agree5:9.2%}")


if __name__ == "__main__":
    main()
