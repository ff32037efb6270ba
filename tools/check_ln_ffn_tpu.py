"""On-chip validation of the fused LN→FFN→residual Pallas kernel
(ops/ffn_pallas.ln_ffn_residual) — the parts CPU interpret mode cannot
cover (pltpu.prng_seed has no CPU lowering):

1. rate=0 forward + all gradients vs the plain-JAX composition (compiled
   on the TPU, fp32);
2. dropout statistics: ~rate2 of FFN contributions zeroed;
3. mask-stream determinism: same seed → identical output;
4. fwd/bwd mask consistency: with a LINEAR path (relu kept positive and
   w2 = identity-ish) the analytic gradient through the same masks is
   checked against the custom-VJP output.

Usage: python tools/check_ln_ffn_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.ops.ffn_pallas import ln_ffn_residual


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(3)
    n, d, f = 300, 256, 1024
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.float32)
    bl = jnp.asarray(0.1 * rng.standard_normal((d,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    seed = jnp.asarray(7, jnp.int32)
    args = (x, g, bl, w1, b1, w2, b2)

    def ref(x, g, bl, w1, b1, w2, b2):
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + bl
        h = xn @ w1 + b1
        h = h * jax.nn.sigmoid(h)
        return x + 0.5 * (h @ w2 + b2)

    def fused(x, g, bl, w1, b1, w2, b2):
        return ln_ffn_residual(x, g, bl, w1, b1, w2, b2, seed,
                               "swish", 0.0, 0.0, 0.5)

    y_ref = np.asarray(jax.jit(ref)(*args))
    y_got = np.asarray(jax.jit(fused)(*args))
    np.testing.assert_allclose(y_got, y_ref, rtol=3e-5, atol=3e-5)
    print("fwd parity ok")

    gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(ref(*a))),
                          argnums=tuple(range(7))))(*args)
    gg = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(fused(*a))),
                          argnums=tuple(range(7))))(*args)
    names = ["dx", "dg", "dbl", "dw1", "db1", "dw2", "db2"]
    for nm, a, b in zip(names, gg, gr):
        a, b = np.asarray(a), np.asarray(b)
        # Scale-aware atol: XLA's reference matmuls run fp32 via bf16
        # passes on the MXU, so absolute error scales with the tensor's
        # magnitude (CPU interpret mode matches to 1e-5; see
        # tests/test_models.py::test_ln_ffn_residual_matches_reference).
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=2e-3 * max(1.0, float(np.abs(b).max())),
            err_msg=nm)
    print("grad parity ok")

    # Dropout statistics + determinism (rate2 on the output).
    y1 = jax.jit(lambda *a: ln_ffn_residual(
        *a, seed, "relu", 0.0, 0.5, 1.0))(*args)
    y2 = jax.jit(lambda *a: ln_ffn_residual(
        *a, seed, "relu", 0.0, 0.5, 1.0))(*args)
    contrib = np.asarray(y1 - x)
    zero_frac = float(np.mean(np.isclose(contrib, 0.0, atol=1e-6)))
    assert 0.42 < zero_frac < 0.58, zero_frac
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    print(f"dropout stats ok (zero_frac={zero_frac:.3f}), "
          "stream deterministic")

    # fwd/bwd mask consistency — EXACT checks (finite differences drown
    # in fp32 cancellation noise over 77k terms; these don't):
    #
    # mask2: with w1=w2=0, b2=1, rate2=0.5 the forward's FFN contribution
    # is exactly mask2*k2, and the backward's db2 is the column sum of the
    # same mask2*k2 — equal iff bwd regenerated the identical mask.
    z = jnp.zeros_like
    y_m2 = jax.jit(lambda xx: ln_ffn_residual(
        xx, g, bl, z(w1), z(b1), z(w2), jnp.ones_like(b2), seed,
        "relu", 0.0, 0.5, 1.0))(x)
    m2k2 = np.asarray(y_m2 - x)                       # [n, d] = mask2*k2
    db2 = np.asarray(jax.jit(jax.grad(
        lambda b2_: jnp.sum(ln_ffn_residual(
            x, g, bl, z(w1), z(b1), z(w2), b2_, seed,
            "relu", 0.0, 0.5, 1.0))))(jnp.ones_like(b2)))
    np.testing.assert_allclose(db2, m2k2.sum(0), rtol=1e-5,
                               err_msg="mask2 fwd/bwd mismatch")
    # mask1: with w1=0, b1=10, w2=I (f=d here? f!=d — use w2 with a
    # single 1 per hidden row is overkill; instead b1=10, w2=0, read
    # db1 = colsum(mask1*k1*relu'(10)) and compare against a second
    # INDEPENDENT forward read of mask1 via w2 = first-row indicator).
    db1 = np.asarray(jax.jit(jax.grad(
        lambda b1_: jnp.sum(ln_ffn_residual(
            x, g, bl, z(w1), b1_, jnp.ones_like(w2), z(b2), seed,
            "relu", 0.5, 0.0, 1.0))))(jnp.full_like(b1, 10.0)))
    y_m1 = jax.jit(lambda xx: ln_ffn_residual(
        xx, g, bl, z(w1), jnp.full_like(b1, 10.0), jnp.ones_like(w2),
        z(b2), seed, "relu", 0.5, 0.0, 1.0))(x)
    # forward: y2[i,j] = 10*k1*rowsum(mask1) for every j, so
    # sum(y-x) = d*10*k1*sum(mask1); backward: db1[j] =
    # d*k1*colsum_j(mask1), so db1.sum() = d*k1*sum(mask1). Both
    # normalize to k1*sum(mask1) — equal iff bwd's mask1 == fwd's
    # (a regenerated-from-wrong-stream mask differs by ~0.4%, far
    # outside the tolerance).
    fwd_mass = float(np.asarray(y_m1 - x).sum()) / (10.0 * d)
    bwd_mass = float(db1.sum()) / d
    np.testing.assert_allclose(bwd_mass, fwd_mass, rtol=1e-4,
                               err_msg="mask1 fwd/bwd mismatch")
    print("dropout fwd/bwd mask consistency ok (exact)")
    print("ALL OK")


if __name__ == "__main__":
    main()
