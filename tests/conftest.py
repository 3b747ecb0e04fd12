"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); we build one. Multi-device
GSPMD paths are exercised without TPU hardware via JAX's standard fake
backend: ``--xla_force_host_platform_device_count=8`` on the CPU platform.
Must be set before JAX initializes, hence module-level in conftest.
"""
import os

# Force CPU (the ambient env may pre-set JAX_PLATFORMS to a TPU platform;
# tests must be hermetic, fast, and run the fp32 CPU backend).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times snappy and numerics deterministic in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A TPU-terminal plugin (axon) may have force-set jax_platforms at interpreter
# boot via sitecustomize; override back to CPU before any backend is cached.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
