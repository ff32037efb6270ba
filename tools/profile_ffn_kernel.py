"""Attribute the fused FFN block kernel's VPU cost at the flagship point.

The r4 step attribution left the encoder FFN blocks VPU-bound at ~1.9x
their MXU roofline, naming transcendental (swish) + dropout-mask cost as
the gap. This probe times ln_ffn_residual fwd+bwd at the flagship shape
([B*T', D=256, F=2048]) across the isolating variants:

  swish+drop   — the shipped configuration (rate1=rate2=0.1)
  swish+nodrop — dropout off: isolates the PRNG/mask cost
  relu+drop    — relu activation: isolates the transcendental cost

Run twice with FFN_HALFBITS=0/1 to measure the two-draws-per-PRNG-word
mask scheme (ops/ffn_pallas._mask).

Usage: FFN_HALFBITS=1 python tools/profile_ffn_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", "256"))
TP = 127            # encoder frames after x4 subsampling at T=512
D = 256
F = 2048
LAYERS = 24         # 12 conformer layers x 2 macaron FFN halves


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
    med = rates[len(rates) // 2]
    print(f"[ffn] {name:14s} {med*1000:7.3f} ms/block fwd+bwd "
          f"({med*1000*LAYERS:6.1f} ms per step's {LAYERS} blocks)",
          flush=True)
    return med


def main():
    from wenet_celoss_tpu.ops.ffn_pallas import ln_ffn_residual
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime
    configure_tpu_runtime()
    print(f"[ffn] FFN_HALFBITS={os.environ.get('FFN_HALFBITS', '1')}")

    rng = np.random.default_rng(0)
    n = B * TP
    x = jnp.asarray(rng.standard_normal((n, D)), jnp.bfloat16)
    g = jnp.ones((D,), jnp.float32)
    bl = jnp.zeros((D,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.float32)
    seed = jnp.asarray(7, jnp.int32)

    for name, act, r1, r2, rows in (
            ("swish+drop", "swish", 0.1, 0.1, 128),
            ("swish+nodrop", "swish", 0.0, 0.0, 128),
            ("relu+drop", "relu", 0.1, 0.1, 128),
            ("rows=256", "swish", 0.1, 0.1, 256),
            ("rows=512", "swish", 0.1, 0.1, 512)):
        # rows=1024 exceeds the 16 MB VMEM scoped limit in the backward
        # kernel ([rows,F] fp32 hidden + weights + dgrads): measured OOM.
        def loss(x, w1, w2, _a=act, _r1=r1, _r2=r2, _rw=rows):
            y = ln_ffn_residual(x, g, bl, w1, b1, w2, b2, seed, _a,
                                _r1, _r2, 0.5, 1e-5, _rw)
            return jnp.sum(jnp.square(y.astype(jnp.float32)))
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        timed(fn, (x, w1, w2), name=name)

    # MXU roofline for comparison: the 4 matmuls (fwd 2 + bwd dgrads)
    flops = 6 * n * D * F * 2
    print(f"[ffn] analytic matmul FLOPs/block: {flops/1e9:.1f} GF "
          f"(~{flops/197e12*1000:.3f} ms at 197 TF/s bf16)")


if __name__ == "__main__":
    main()
