"""Measure Conv2dSubsampling4 formulations fwd+bwd at the flagship point.

The r4 step attribution puts the two-conv subsampling frontend at ~24 ms
fwd+bwd vs a ~12 ms combined conv roofline (ROADMAP "Step-time
attribution"), and the banded-matmul experiment showed conv1-as-matmul
wins in isolation but composing it with nn.Conv conv2 wrecks XLA's layout
choices. This probe times the remaining XLA-level candidates before
committing to a fused Pallas kernel:

  conv      — the shipped composition (two nn.Conv + relu + linear)
  tapdots   — conv1 nn.Conv; conv2 as 9 shifted strided-slice matmuls
              (K=256 dots, no conv op)
  alldots   — conv1 as a freq-banded [240, 39*256] matmul AND conv2 as
              9 shifted matmuls — no conv ops anywhere, layouts are
              whatever XLA picks for plain dots
  fused     — the Pallas two-conv kernel (ops/subsample_pallas.py), if
              importable

Each candidate computes the full frontend (convs + relus + output linear)
and is timed fwd+bwd with grads to (x, all weights), honest host-read
sync (axon block_until_ready caveat, see bench.py).

Usage: BENCH_BATCH=256 python tools/profile_subsample.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


B = int(os.environ.get("BENCH_BATCH", "256"))
T = int(os.environ.get("BENCH_FRAMES", "512"))
F = 80
D = int(os.environ.get("BENCH_DIM", "256"))
DT = jnp.bfloat16


def timed(fn, args, iters=6, windows=3, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"[sub] {name}: compiled in {time.perf_counter()-t0:.1f}s",
          flush=True)
    rates = []
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    med = rates[len(rates) // 2]
    print(f"[sub] {name:10s} {med*1000:7.2f} ms fwd+bwd", flush=True)
    return med


def make_weights(rng):
    w1 = jnp.asarray(rng.standard_normal((3, 3, 1, D)) * 0.1, DT)
    b1 = jnp.zeros((D,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, D, D)) * 0.02, DT)
    b2 = jnp.zeros((D,), jnp.float32)
    t2 = (T - 3) // 2 + 1
    t4 = (t2 - 3) // 2 + 1  # VALID 3x3 stride2 twice: 512->255->127
    f2 = (F - 3) // 2 + 1   # 39
    f4 = (f2 - 3) // 2 + 1  # 19
    wo = jnp.asarray(rng.standard_normal((f4 * D, D)) * 0.02, DT)
    bo = jnp.zeros((D,), jnp.float32)
    return (w1, b1, w2, b2, wo, bo)


def conv_ref(x, w1, b1, w2, b2, wo, bo):
    h = x[..., None]
    h = jax.nn.relu(jax.lax.conv_general_dilated(
        h.astype(DT), w1, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1.astype(DT))
    h = jax.nn.relu(jax.lax.conv_general_dilated(
        h, w2, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2.astype(DT))
    b, t, f, c = h.shape
    return h.reshape(b, t, f * c) @ wo + bo.astype(DT)


def conv2_tapdots(h1, w2, b2):
    """conv2 as 9 shifted strided-slice matmuls; h1 [B,T1,F1,D]."""
    b, t1, f1, d = h1.shape
    t2 = (t1 - 3) // 2 + 1
    f2 = (f1 - 3) // 2 + 1
    acc = None
    for kh in range(3):
        for kw in range(3):
            a = jax.lax.slice(h1, (0, kh, kw, 0), (b, kh + 2 * t2 - 1,
                                                   kw + 2 * f2 - 1, d),
                              (1, 2, 2, 1))
            p = a.reshape(b * t2 * f2, d) @ w2[kh, kw]
            acc = p if acc is None else acc + p
    z = acc.reshape(b, t2, f2, d) + b2.astype(h1.dtype)
    return jax.nn.relu(z)


def conv1_banded(x, w1, b1):
    """conv1 (1 input channel) as one [*,240]@[240,39*D] banded matmul."""
    b, t, f = x.shape
    t1 = (t - 3) // 2 + 1
    f1 = (f - 3) // 2 + 1
    x3 = jnp.concatenate([
        jax.lax.slice(x, (0, 0, 0), (b, 2 * t1 - 1, f), (1, 2, 1)),
        jax.lax.slice(x, (0, 1, 0), (b, 2 * t1, f), (1, 2, 1)),
        jax.lax.slice(x, (0, 2, 0), (b, 2 * t1 + 1, f), (1, 2, 1)),
    ], axis=-1).astype(DT)                       # [B, T1, 3F]
    fi = np.arange(f)[:, None]
    fp = np.arange(f1)[None, :]
    sel = np.zeros((3, f, f1), np.float32)
    for kw in range(3):
        sel[kw] = (fi == 2 * fp + kw).astype(np.float32)
    m = jnp.einsum("wif,hwc->hifc", jnp.asarray(sel, DT),
                   w1[:, :, 0, :]).reshape(3 * f, f1 * w1.shape[-1])
    z = (x3.reshape(b * t1, 3 * f) @ m).reshape(b, t1, f1, w1.shape[-1])
    return jax.nn.relu(z + b1.astype(DT))


def tapdots(x, w1, b1, w2, b2, wo, bo):
    h = x[..., None]
    h1 = jax.nn.relu(jax.lax.conv_general_dilated(
        h.astype(DT), w1, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1.astype(DT))
    h2 = conv2_tapdots(h1, w2, b2)
    b, t, f, c = h2.shape
    return h2.reshape(b, t, f * c) @ wo + bo.astype(DT)


def alldots(x, w1, b1, w2, b2, wo, bo):
    h1 = conv1_banded(x, w1, b1)
    h2 = conv2_tapdots(h1, w2, b2)
    b, t, f, c = h2.shape
    return h2.reshape(b, t, f * c) @ wo + bo.astype(DT)


def main():
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime
    configure_tpu_runtime()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    ws = make_weights(rng)

    # numeric check vs the conv composition (small batch)
    xs = x[:4]
    ref = np.asarray(conv_ref(xs, *ws), np.float32)
    for name, fn in (("tapdots", tapdots), ("alldots", alldots)):
        got = np.asarray(fn(xs, *ws), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"[sub] parity {name}: rel err {err:.3e}")
        assert err < 2e-2, (name, err)

    results = {}
    for name, fn in (("conv", conv_ref), ("tapdots", tapdots),
                     ("alldots", alldots)):
        def loss(x, *w, _fn=fn):
            return jnp.sum(jnp.square(_fn(x, *w).astype(jnp.float32)))
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 3, 5)))
        results[name] = timed(g, (x, *ws), name=name)

    try:
        from wenet_celoss_tpu.ops.subsample_pallas import subsample4_fused

        def loss_f(x, *w):
            return jnp.sum(jnp.square(
                subsample4_fused(x, *w).astype(jnp.float32)))
        g = jax.jit(jax.grad(loss_f, argnums=(0, 1, 3, 5)))
        got = np.asarray(subsample4_fused(xs, *ws), np.float32)
        err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
        print(f"[sub] parity fused: rel err {err:.3e}")
        results["fused"] = timed(g, (x, *ws), name="fused")
    except ImportError:
        pass

    print(f"\n== subsample probe @ B={B} T={T} D={D} ==")
    for k, v in results.items():
        print(f"  {k:10s} {v*1000:7.2f} ms fwd+bwd")


if __name__ == "__main__":
    main()
