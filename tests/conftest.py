"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

# Force CPU even when the environment pins JAX_PLATFORMS to TPU hardware:
# tests exercise multi-chip sharding on virtual host devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Persistent XLA compilation cache: the suite is compile-bound on CPU
# (custom-VJP scans, sharded programs); repeat runs and xdist workers
# reuse each other's compiles.
from wenet_celoss_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
