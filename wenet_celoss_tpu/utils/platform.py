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
