"""wenet_celoss_tpu — TPU-native speech framework package.

Platform-selection guard: some deployment environments (the axon TPU
tunnel among them) pre-import jax from an interpreter-startup site hook
and pin the platform, which silently LATCHES the backend choice before
any user code runs — after that the documented ``JAX_PLATFORMS``
environment variable is ignored (observed: ``JAX_PLATFORMS=cpu python
-c 'import jax; jax.devices()'`` returning the TPU). Every CLI,
subprocess worker and recipe in this package states its platform intent
through ``JAX_PLATFORMS``, so re-assert the env var's value through the
config API here, at package import, while backends are still
uninitialized. No-op when jax has not been imported yet (the env var
works normally) or when the value already matches.
"""

import os as _os
import sys as _sys


def _apply_env_platform():
    want = _os.environ.get("JAX_PLATFORMS")
    if not want or "jax" not in _sys.modules:
        return
    import jax
    try:
        if getattr(jax.config, "jax_platforms", None) != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        # Backends already initialized: too late to switch; leave the
        # latched platform in place rather than crash the import.
        pass


_apply_env_platform()
del _apply_env_platform
