"""Pin down where ctc_loss's time goes: gather vs scan vs unroll factor.

Usage: python tools/profile_ctc.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.utils.common import LOG_ZERO


def timed(fn, args, iters=8, windows=3, name=""):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    rates = []
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    print(f"[ctc-profile] {name}: {rates[1]*1000:.1f} ms", flush=True)
    return rates[1]


def main():
    b, t_max, u, v = 256, 127, 32, 1024
    s = 2 * u + 1
    rng = np.random.default_rng(0)
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t_max, v)), jnp.float32),
        axis=-1)
    labels = jnp.asarray(rng.integers(1, v - 2, (b, u)), jnp.int32)
    emit_pre = jnp.asarray(rng.standard_normal((t_max, b, s)) - 3.0,
                           jnp.float32)
    can_skip = jnp.asarray(rng.integers(0, 2, (b, s)), bool)
    in_range = jnp.ones((b, s), bool)

    # 1) gather only
    def gather_only(lp):
        ext2 = jnp.zeros((b, s), labels.dtype).at[:, 1::2].set(labels)
        emit = jnp.take_along_axis(
            lp, ext2[:, None, :].repeat(t_max, 1), axis=2)
        return jnp.sum(emit)

    timed(jax.jit(jax.grad(gather_only)), (logp,), name="gather fwd+bwd")

    # 2) scan only, several unrolls (fwd)
    def make_scan(unroll):
        def scan_only(emit):
            def step(alpha, emit_t):
                prev1 = jnp.concatenate(
                    [jnp.full((b, 1), LOG_ZERO), alpha[:, :-1]], axis=1)
                prev2 = jnp.concatenate(
                    [jnp.full((b, 2), LOG_ZERO), alpha[:, :-2]], axis=1)
                prev2 = jnp.where(can_skip, prev2, LOG_ZERO)
                new = jnp.logaddexp(jnp.logaddexp(alpha, prev1),
                                    prev2) + emit_t
                new = jnp.where(in_range, new, LOG_ZERO)
                return new, new
            a0 = emit[0]
            _, alphas = jax.lax.scan(step, a0, emit[1:], unroll=unroll)
            return jnp.sum(alphas[-1])
        return scan_only

    for unroll in (1, 8, 32, 127):
        timed(jax.jit(make_scan(unroll)), (emit_pre,),
              name=f"scan fwd unroll={unroll}")
    timed(jax.jit(jax.grad(make_scan(8))), (emit_pre,),
          name="scan fwd+bwd unroll=8")

    # 3) full ctc for reference
    from wenet_celoss_tpu.ops.ctc_loss import ctc_loss
    tlens = jnp.full((b,), t_max, jnp.int32)
    ulens = jnp.full((b,), u, jnp.int32)

    def full(lp):
        return jnp.mean(ctc_loss(lp, labels, tlens, ulens, 0))

    timed(jax.jit(full), (logp,), name="ctc full fwd")
    timed(jax.jit(jax.grad(full)), (logp,), name="ctc full fwd+bwd")


if __name__ == "__main__":
    main()
