"""On-TPU validation of the fused 2-layer LSTM kernel (ops/lstm_pallas.py).

Run on a real TPU (the CPU interpreter cannot execute pltpu.prng_seed, so
the dropout paths are only checkable here):

  1. fwd parity vs the hoisted-input XLA scan (bf16 compute, rate=0)
  2. grad parity (all five diff args)
  3. dropout keep-rate statistics + determinism in seed
  4. fwd/bwd mask-stream consistency: directional derivative of the
     dropout-on loss matches finite differences (the backward regenerates
     each step's mask from the same (program, step) seed)

Usage: python tools/check_lstm_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.ops.lstm_pallas import lstm2_seq

B, U, H, E = 256, 33, 256, 256
rng = np.random.default_rng(0)
cdt = jnp.bfloat16

x = jnp.asarray(rng.standard_normal((B, U, E)) * 0.5, cdt)
wi1 = jnp.asarray(rng.standard_normal((E, 4 * H)) * 0.05, cdt)
bh1 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
wh1 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, cdt)
wi2 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, cdt)
bh2 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
wh2 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.05, cdt)
xw1 = (jax.lax.dot_general(x, wi1, (((2,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)
       + bh1[None, None, :]).astype(cdt)


def ref(xw1, wh1, wi2, bh2, wh2):
    """XLA scan reference, f32 gates on bf16 matmuls (kernel numerics)."""
    z = jnp.zeros((xw1.shape[0], H), jnp.float32)

    def layer(xw, wh, carry0):
        def step(carry, xwt):
            c, h = carry
            zz = xwt.astype(jnp.float32) + jax.lax.dot_general(
                h.astype(cdt), wh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            i_, f_, g_, o_ = jnp.split(zz, 4, axis=-1)
            c2 = jax.nn.sigmoid(f_) * c + jax.nn.sigmoid(i_) * jnp.tanh(g_)
            h2 = jax.nn.sigmoid(o_) * jnp.tanh(c2)
            return (c2, h2), h2

        (_, _), hs = jax.lax.scan(step, carry0, jnp.swapaxes(xw, 0, 1))
        return jnp.swapaxes(hs, 0, 1)

    h1 = layer(xw1, wh1, (z, z))
    xw2 = (jax.lax.dot_general(h1.astype(cdt), wi2,
                               (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bh2[None, None, :])
    h2 = layer(xw2, wh2, (z, z))
    return h2.astype(cdt)


seed0 = jnp.zeros((), jnp.int32)
y_k = jax.jit(lambda a: lstm2_seq(a, wh1, wi2, bh2, wh2, seed0, 0.0))(xw1)
y_r = jax.jit(ref)(xw1, wh1, wi2, bh2, wh2)
err = float(jnp.max(jnp.abs(y_k.astype(jnp.float32)
                            - y_r.astype(jnp.float32))))
print(f"[1] fwd parity (bf16): max abs err {err:.3e}")
assert err < 5e-2, err

g = jnp.asarray(rng.standard_normal((B, U, H)), jnp.float32)


def loss_k(xw1, wh1, wi2, bh2, wh2):
    return jnp.sum(lstm2_seq(xw1, wh1, wi2, bh2, wh2, seed0, 0.0)
                   .astype(jnp.float32) * g)


def loss_r(xw1, wh1, wi2, bh2, wh2):
    return jnp.sum(ref(xw1, wh1, wi2, bh2, wh2).astype(jnp.float32) * g)


gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(
    xw1, wh1, wi2, bh2, wh2)
gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(
    xw1, wh1, wi2, bh2, wh2)
for name, a, b in zip(("dxw1", "dwh1", "dwi2", "dbh2", "dwh2"), gk, gr):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(b))) + 1e-9
    rel = float(jnp.max(jnp.abs(a - b))) / scale
    print(f"[2] grad {name}: rel err {rel:.3e}")
    assert rel < 6e-2, (name, rel)

# [3] dropout statistics + determinism.
rate = 0.5
f = jax.jit(lambda s: lstm2_seq(xw1, wh1, wi2, bh2, wh2, s, rate))
y1 = f(jnp.int32(123))
y2 = f(jnp.int32(123))
y3 = f(jnp.int32(124))
same = bool(jnp.all(y1 == y2))
diff = bool(jnp.any(y1 != y3))
print(f"[3] dropout deterministic={same} seed-sensitive={diff}")
assert same and diff

# keep-rate: compare dropout-on vs off mean magnitude of LAYER-1 output
# indirectly — instead check the fraction of h2 entries that changed is
# large (mask stream real) and the overall scale is preserved.
ratio = float(jnp.mean(jnp.abs(y1.astype(jnp.float32)))
              / jnp.mean(jnp.abs(y_k.astype(jnp.float32))))
print(f"[3] |h2|-scale ratio dropout-on/off: {ratio:.3f}")
assert 0.5 < ratio < 1.6, ratio

# [4] fwd/bwd mask consistency via directional derivative.
seed_d = jnp.int32(77)


def loss_d(xw1):
    return jnp.sum(lstm2_seq(xw1, wh1, wi2, bh2, wh2, seed_d, 0.3)
                   .astype(jnp.float32) * g)


gd = jax.jit(jax.grad(loss_d))(xw1).astype(jnp.float32)
d = np.zeros((B, U, 4 * H), np.float32)
idx = [(1, 2, 100), (5, 30, 900), (100, 17, 512)]
for i in idx:
    d[i] = 1.0
d = jnp.asarray(d, cdt)
eps = 0.05
num = (float(loss_d(xw1 + eps * d)) - float(loss_d(xw1 - eps * d))) \
    / (2 * eps)
ana = float(jnp.sum(gd * d.astype(jnp.float32)))
print(f"[4] dropout dirderiv: analytic {ana:.4f} numeric {num:.4f}")
assert abs(ana - num) < 0.15 * (abs(num) + 1.0), (ana, num)

# [5] speed
def timed(fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


f_fwd = jax.jit(lambda: lstm2_seq(xw1, wh1, wi2, bh2, wh2, seed0, 0.1))
r_fwd = jax.jit(lambda: ref(xw1, wh1, wi2, bh2, wh2))
gk_j = jax.jit(lambda: jax.grad(loss_d)(xw1))
gr_j = jax.jit(lambda: jax.grad(loss_r)(xw1, wh1, wi2, bh2, wh2)[0])
print(f"[5] fwd: kernel {timed(f_fwd):.2f} ms  xla {timed(r_fwd):.2f} ms")
print(f"[5] fwd+bwd(dxw1): kernel {timed(gk_j):.2f} ms  "
      f"xla {timed(gr_j):.2f} ms")
print("ALL LSTM KERNEL CHECKS PASSED")
