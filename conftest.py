# Root conftest: force tests onto a virtual 8-device CPU mesh so multi-chip
# sharding paths compile and execute deterministically without TPU hardware.
# (The driver separately dry-runs the multi-chip path via __graft_entry__.py.)
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# The session presets JAX_PLATFORMS=axon (real TPU tunnel) and the plugin wins
# over the env var — use jax.config, which takes precedence.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
