"""Test configuration: CPU platform, float64, 8 virtual devices for
multi-chip sharding tests (mirrors how the driver validates multi-chip
paths with xla_force_host_platform_device_count)."""

import os

os.environ.setdefault("TNAX_PLATFORM", "cpu")
# tests must never initialize a remote accelerator backend (the sandbox
# pins JAX_PLATFORMS=axon globally); the env var is read at backend init,
# so overriding it here — before any jax.devices() — is effective even
# though jax may already be imported by the interpreter's sitecustomize
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TNAX_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import tnax  # noqa: E402  (applies platform/precision config)

tnax.ensure_precision()
