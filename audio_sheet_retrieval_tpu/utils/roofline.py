"""Analytic FLOP / roofline accounting for the twin-encoder models.

Turns the bench's task-unit figures (emb/s, updates/s) into auditable
hardware terms: model FLOPs per embedding / per training update from the
known conv geometry (models/encoder.py — 8x SAME 3x3 + 1x1 head, maxpool2
after every second block), achieved TFLOP/s, and % of the chip's effective
peak for the dtype/precision arm actually run.

Conventions (stated so the numbers are checkable):
  * FLOPs count multiply-adds as 2 (the standard MFU convention); conv
    FLOPs = 2 * H_out * W_out * K^2 * C_in * C_out. BN/ELU/pool
    elementwise work and the window gathers are EXCLUDED from model FLOPs
    (they are not MXU work); they show up as the gap between achieved and
    the packing bound instead.
  * A training update is counted as 3x forward (forward + input-grad conv
    + weight-grad conv, each the same MAC count) for both views — the
    standard conv-backward accounting. Optimizer/BN/CCA-whitening FLOPs
    are O(params) / O(32^2) and ignored (the CCA eigh/Newton-Schulz is
    ~100 kFLOP against ~100 MFLOP of conv work per sample).
  * Effective peak on TPU depends on how f32 convs are lowered: DEFAULT
    multiplies in bf16 (1 MXU pass), HIGH runs the bf16x3 emulation
    (3 passes), HIGHEST bf16x6 (6 passes). So peak_f32_highest =
    peak_bf16 / 6 etc. This matches the observed ~2x HIGHEST->HIGH and
    ~3x HIGH->bf16 ceiling ratios (scripts/precision_probe.py).

Reference has no analog (SURVEY.md §6: the repo publishes no numbers);
this module exists to make OUR ceiling claims auditable (VERDICT r4).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

from audio_sheet_retrieval_tpu.models.encoder import (
    N_CONV_BLOCKS,
    block_channels,
)

# Public per-chip peaks (Google Cloud TPU docs). Keyed by substrings of
# jax device_kind. v5e = "TPU v5 lite". HBM bandwidth in bytes/s.
CHIP_PEAKS: Dict[str, Dict[str, float]] = {
    "v5 lite": {"bf16_flops": 197e12, "int8_ops": 394e12,
                "hbm_bytes_per_s": 819e9, "hbm_bytes": 16e9,
                "name": "TPU v5e"},
    "v5e": {"bf16_flops": 197e12, "int8_ops": 394e12,
            "hbm_bytes_per_s": 819e9, "hbm_bytes": 16e9,
            "name": "TPU v5e"},
    "v5p": {"bf16_flops": 459e12, "int8_ops": 918e12,
            "hbm_bytes_per_s": 2765e9, "hbm_bytes": 95e9,
            "name": "TPU v5p"},
    "v4": {"bf16_flops": 275e12, "int8_ops": 275e12,
           "hbm_bytes_per_s": 1228e9, "hbm_bytes": 32e9,
           "name": "TPU v4"},
}

# MXU passes per f32 multiply for each lax.Precision arm (bf16xN split
# emulation); bfloat16 compute is always 1 pass.
F32_PASSES = {"highest": 6, "high": 3, "default": 1}

MXU_DIM = 128  # systolic array lane/column count (v4/v5 generations)


@dataclasses.dataclass(frozen=True)
class ConvBlock:
    index: int
    h: int              # output spatial height
    w: int
    k: int              # kernel size (3 or 1)
    c_in: int
    c_out: int
    flops: int          # 2 * h * w * k^2 * c_in * c_out (per sample)

    @property
    def mxu_packing(self) -> float:
        """Upper bound on MXU utilization for this conv treated as the
        im2col matmul [M, K^2*C_in] x [K^2*C_in, C_out]: both contraction
        and output-channel dims pad to the 128-lane array. An ESTIMATE of
        the layout bound (XLA may tile convs differently), not a measured
        quantity — useful because the model's narrow channels (12-96)
        structurally underfill the 128-wide MXU."""
        kdim = self.k * self.k * self.c_in
        pad = lambda n: -(-n // MXU_DIM) * MXU_DIM  # noqa: E731
        return (kdim / pad(kdim)) * (self.c_out / pad(self.c_out))


def conv_stack(cfg, view: int) -> List[ConvBlock]:
    """Per-block geometry of one encoder view, mirroring
    models/encoder.py::encoder_apply (SAME 3x3 convs keep H,W; maxpool2
    after blocks 1,3,5,7; final block is a 1x1 VALID conv)."""
    shape = cfg.encoder_input_shape_1 if view == 1 else cfg.input_shape_2
    c_in, h, w = shape
    chans = block_channels(cfg.num_filters, cfg.dim_latent)
    blocks = []
    for i, c_out in enumerate(chans):
        k = 1 if i == N_CONV_BLOCKS - 1 else 3
        flops = 2 * h * w * k * k * c_in * c_out
        blocks.append(ConvBlock(i, h, w, k, c_in, c_out, flops))
        c_in = c_out
        if i < N_CONV_BLOCKS - 1 and i % 2 == 1:
            h, w = h // 2, w // 2
    return blocks


def embed_flops(cfg, view: int) -> int:
    """Model FLOPs for ONE embedding (forward, conv MACs x2 + the 32x32
    CCA projection; see module conventions)."""
    total = sum(b.flops for b in conv_stack(cfg, view))
    return total + 2 * cfg.dim_latent * cfg.dim_latent  # CCA projection


def train_update_flops(cfg) -> int:
    """Model FLOPs for ONE optimizer update at cfg.batch_size (both
    views, forward + backward = 3x forward)."""
    per_sample = embed_flops(cfg, 1) + embed_flops(cfg, 2)
    return 3 * per_sample * cfg.batch_size


def mxu_packing_bound(cfg, view: int) -> float:
    """FLOP-weighted MXU packing upper bound across the view's conv
    stack — the fraction of peak this geometry could reach even with
    zero overhead, given 128-lane padding of narrow channel dims."""
    blocks = conv_stack(cfg, view)
    total = sum(b.flops for b in blocks)
    return sum(b.flops * b.mxu_packing for b in blocks) / total


def chip_peaks(device_kind: str) -> Optional[Dict[str, float]]:
    dk = device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in dk:
            return peaks
    return None


def effective_peak_flops(device_kind: str, compute_dtype: str,
                         conv_precision: str) -> Optional[float]:
    """Per-chip matmul peak (FLOP/s) for the given dtype/precision arm,
    accounting for the bf16xN f32 emulation passes."""
    peaks = chip_peaks(device_kind)
    if peaks is None:
        return None
    base = peaks["bf16_flops"]
    if compute_dtype == "bfloat16":
        return base
    return base / F32_PASSES.get(conv_precision, 6)


def mfu(achieved_flops_per_s: float, device_kind: str, compute_dtype: str,
        conv_precision: str) -> Optional[float]:
    """Model FLOPs utilization in [0,1] vs the arm's effective peak."""
    peak = effective_peak_flops(device_kind, compute_dtype, conv_precision)
    if peak is None:
        return None
    return achieved_flops_per_s / peak


def summarize(cfg, device_kind: str) -> Dict[str, float]:
    """One-stop numbers for bench/RESULTS: per-embed and per-update model
    FLOPs plus the geometry's packing bounds."""
    return {
        "flops_per_sheet_embed": embed_flops(cfg, 1),
        "flops_per_spec_embed": embed_flops(cfg, 2),
        "flops_per_update": train_update_flops(cfg),
        "mxu_packing_bound_sheet": mxu_packing_bound(cfg, 1),
        "mxu_packing_bound_spec": mxu_packing_bound(cfg, 2),
        "chip": (chip_peaks(device_kind) or {}).get("name"),
    }
