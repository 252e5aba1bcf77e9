"""Profiling / step-time instrumentation.

The reference's only telemetry is a 5-sample updates/sec running average in
the train progress bar (reference:utils/train_dcca_pool.py:216-231) and a
10-frame fps meter in the streaming server (audio_sheet_server.py:202-207).
This module adds first-class TPU tooling: JAX profiler traces (viewable in
TensorBoard/XProf) and a lightweight step-time meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache (big win over the slow
    remote-compile tunnel; call early in CLIs/benchmarks).

    The directory is suffixed with the active backend platform so CPU AOT
    entries never mix into a TPU-session cache (and vice versa).

    On the CPU backend the persistent cache is NOT enabled (returns None):
    XLA:CPU AOT blobs are checked against "compile machine features" that
    include XLA *tuning* pseudo-features (`+prefer-no-gather`,
    `+prefer-no-scatter`) which no host's cpuinfo carries — so every load,
    even same-host, fails the feature match and warns `cpu_aot_loader ...
    could lead to execution errors such as SIGILL` (round-3 host-feature
    keying could not fix this; see MULTICHIP_r03.json tail). A cache that
    can never load cleanly is pure flake risk; CPU runs (the multi-chip
    dryrun, virtual-mesh tests) recompile instead (~60 s)."""
    import os

    import jax

    # ASR_PLATFORM=cpu|tpu forces the backend for CLI subprocesses: plain
    # JAX_PLATFORMS is overridden by TPU plugins (e.g. the tunneled axon
    # backend); jax.config takes precedence. Every CLI calls this helper
    # before touching jax, so the hook lands early enough.
    plat = os.environ.get("ASR_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    if cache_dir is None:
        base = os.environ.get(
            "ASR_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))
        try:
            platform = jax.default_backend()
        except Exception:
            platform = "unknown"
        if platform == "cpu":
            return None  # see docstring: XLA:CPU AOT entries never load
        cache_dir = os.path.join(base, platform)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return cache_dir
    except Exception:
        return None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/asr_tpu_trace"):
    """Capture a JAX profiler trace around a block of device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running-average step timer (generalizes the reference 'ups' meter)."""

    def __init__(self, window: int = 5):
        self.times = np.zeros(window, np.float64)
        self.n = 0
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            self.times[:-1] = self.times[1:]
            self.times[-1] = now - self._last
            self.n += 1
        self._last = now
        return self.steps_per_sec

    @property
    def steps_per_sec(self) -> float:
        k = min(self.n, len(self.times))
        if k == 0:
            return 0.0
        return 1.0 / max(self.times[-k:].mean(), 1e-12)

    @property
    def mean_step_time(self) -> float:
        k = min(self.n, len(self.times))
        return float(self.times[-k:].mean()) if k else 0.0


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
