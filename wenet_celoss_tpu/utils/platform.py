"""TPU runtime configuration for the performance-critical entry points.

The one setting that matters today: JAX's default PRNG. The portable
``threefry2x32`` generator is computed on the VPU and dominates dropout
cost at training scale — profiled on one chip at the flagship operating
point (B=256, T=512, bf16), the conformer encoder fwd+bwd step is
252 ms with threefry vs 146 ms with the hardware ``unsafe_rbg``
generator (tools/profile_rng.py). ``unsafe_rbg`` uses the TPU's native
RngBitGenerator and cheap key derivation for split/fold_in; its streams
are statistically weaker than threefry's, which is irrelevant for
dropout masks (the same trade T5X ships with).

Training CLIs and bench call :func:`configure_tpu_runtime` before
creating any PRNG key. Explicitly setting ``JAX_DEFAULT_PRNG_IMPL``
wins over our default, and inference paths (no dropout) don't care.
"""

from __future__ import annotations

import os


def configure_tpu_runtime() -> None:
    """Set performance defaults; must run before the first PRNGKey."""
    import jax

    if "JAX_DEFAULT_PRNG_IMPL" not in os.environ:
        try:
            jax.config.update("jax_default_prng_impl", "unsafe_rbg")
        except Exception:
            pass  # older jax without the option — keep the default


def enable_compilation_cache(
        path: str = os.path.expanduser("~/.cache/wenet_celoss_tpu/jit"),
) -> None:
    """Persistent XLA compilation cache shared by every CLI invocation.

    The recognize CLI pays a cold multi-minute XLA compile per decode
    mode per process; the reference never has this problem (eager
    torch). With the cache, a recipe's four decode stages compile once
    ever per (program, shape). Safe to call multiple times; env
    JAX_COMPILATION_CACHE_DIR wins. Off when the dir can't be created
    (read-only containers).

    CPU-backend entries are segregated into a per-machine subdirectory:
    jax's cache key does NOT fully capture the XLA:CPU AOT target (a
    cache written under one toolchain/flag set loads on another host
    with "machine type doesn't match ... could lead to SIGILL"
    cpu_aot_loader warnings — observed here as intermittent libgcc
    unwinder segfaults killing long CPU train runs when a remote-compile
    environment shared the cache). TPU entries are device-compiled and
    keyed by topology; they stay in the shared root so warm tunnel
    compiles survive."""
    import hashlib
    import platform as _pyplat

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        # Configured platform WITHOUT initializing backends (train.py
        # calls this before jax.distributed.initialize).
        plats = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", "") or "")
        if plats.split(",")[0] == "cpu":
            try:
                with open("/proc/cpuinfo") as f:
                    flags = next((ln for ln in f
                                  if ln.startswith("flags")), "")
            except OSError:
                flags = ""
            fp = hashlib.sha1(
                (_pyplat.machine() + jax.__version__ + flags)
                .encode()).hexdigest()[:10]
            cache_dir = os.path.join(path + "-cpu", fp)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that took ≥1s to compile, however small.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
