"""Quantify dropout-PRNG cost: encoder fwd+bwd with dropout under the
default (threefry) vs hardware (rbg/unsafe_rbg) PRNG implementations.

Run twice:
  python tools/profile_rng.py
  JAX_DEFAULT_PRNG_IMPL=unsafe_rbg python tools/profile_rng.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.models.factory import init_model

    cfg = conformer_rnnt_bias(tiny=False, vocab_size=1024)
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = init_model(cfg)

    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)

    u, v = 8, cfg["output_dim"]
    init_args = (feats[:2], lens[:2], jnp.ones((2, u), jnp.int32),
                 jnp.full((2,), u, jnp.int32), jnp.ones((8, 4), jnp.int32),
                 jnp.full((8,), 4, jnp.int32), jnp.zeros((2, u), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), *init_args)["params"]

    def enc_loss(p, rng_key):
        def fwd(m, feats, lens):
            out, _ = m.encoder(feats, lens, deterministic=False,
                               train=True, chunk_rng=rng_key)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        return model.apply({"params": p}, feats, lens, method=fwd,
                           rngs={"dropout": rng_key})

    g = jax.jit(jax.grad(enc_loss))
    key = jax.random.PRNGKey(1)
    out = g(params, key)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    rates = []
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = g(params, key)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        rates.append((time.perf_counter() - t0) / 4)
    rates.sort()
    impl = jax.config.jax_default_prng_impl
    print(f"[rng-profile] impl={impl}: enc(train) "
          f"{rates[1]*1000:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
