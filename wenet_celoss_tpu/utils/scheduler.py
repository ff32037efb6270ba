"""Learning-rate schedules (optax-native).

Parity with reference ``wenet/utils/scheduler.py:24-73`` (WarmupLR:
``lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)``), expressed as an
optax schedule function so it composes with any optax optimizer and is
resumable by construction (pure function of step — no ``set_step`` needed).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(peak_lr: float, warmup_steps: int = 25000):
    """Noam-style warmup-then-inverse-sqrt decay.

    At step == warmup_steps the LR equals ``peak_lr``; before that it ramps
    linearly (times step/warmup), after it decays as step^-0.5.
    """
    w = float(warmup_steps)

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return peak_lr * w**0.5 * jnp.minimum(s**-0.5, s * w**-1.5)

    return schedule
