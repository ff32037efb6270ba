"""Root pytest config: force the CPU backend with 8 virtual devices BEFORE
any plugin/module imports jax (tests exercise multi-chip sharding without
TPU hardware)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may already be imported at interpreter startup (site .pth hooks), in
# which case it has latched JAX_PLATFORMS — override through the config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-bound on CPU
# (custom-VJP scans, sharded programs); repeat runs and xdist workers
# reuse each other's compiles.
from wenet_celoss_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
