"""Split the conformer encoder's train-step cost into its pieces.

Variants timed (fwd+bwd, same honest host-read sync as bench.py):
  enc(train)    — full encoder with dropout + dynamic chunk mask
  enc(no-drop)  — deterministic (no dropout RNG): isolates PRNG cost
  subsample     — conv2d subsampling frontend only
  layers-only   — the 12 conformer layers on a pre-subsampled input
  no-conv       — layers with the conv module disabled (config clone)
  no-macaron    — layers with macaron FFN disabled

Usage: BENCH_BATCH=256 BENCH_DTYPE=bfloat16 python tools/profile_encoder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=4, windows=3, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"[enc-profile] {name}: compiled in {time.perf_counter()-t0:.0f}s",
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
    print(f"[enc-profile] {name}: {med*1000:.1f} ms/step", flush=True)
    return med


def main():
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime

    configure_tpu_runtime()
    cfg = conformer_rnnt_bias(tiny=False, vocab_size=1024)
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")

    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    key = jax.random.PRNGKey(1)
    results = {}

    def build(cfg):
        model = init_model(cfg)
        u, v = 8, cfg["output_dim"]
        args = (feats[:2], lens[:2], jnp.ones((2, u), jnp.int32),
                jnp.full((2,), u, jnp.int32),
                jnp.ones((8, 4), jnp.int32), jnp.full((8,), 4, jnp.int32),
                jnp.zeros((2, u), jnp.int32))
        variables = model.init(jax.random.PRNGKey(0), *args)
        return model, variables["params"]

    model, params = build(cfg)

    def enc_loss(p, rng_key, deterministic):
        def fwd(m, feats, lens):
            out, mask = m.encoder(feats, lens, deterministic=deterministic,
                                  train=not deterministic,
                                  chunk_rng=rng_key)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        return model.apply({"params": p}, feats, lens, method=fwd,
                           rngs={"dropout": rng_key})

    results["enc(train)"] = timed(
        jax.jit(jax.grad(lambda p, k: enc_loss(p, k, False))),
        (params, key), name="enc(train)")
    results["enc(no-drop)"] = timed(
        jax.jit(jax.grad(lambda p, k: enc_loss(p, k, True))),
        (params, key), name="enc(no-drop)")

    # subsampling frontend only
    def sub_loss(p, rng_key):
        def fwd(m, feats):
            x = m.encoder._apply_cmvn(feats)
            h, _pos, _nl = m.encoder.embed(x, lens, deterministic=False)
            return jnp.mean(jnp.square(h.astype(jnp.float32)))
        return model.apply({"params": p}, feats, method=fwd,
                           rngs={"dropout": rng_key})

    try:
        results["subsample"] = timed(jax.jit(jax.grad(sub_loss)),
                                     (params, key), name="subsample")
    except Exception as e:  # module API drift — report, keep going
        print(f"[enc-profile] subsample failed: {e}", flush=True)

    # architecture ablations (fresh model/params per config clone)
    import copy
    for name, patch in [
        ("no-conv", {"use_cnn_module": False}),
        ("no-macaron", {"macaron_style": False}),
        ("abs-pos", {"pos_enc_layer_type": "abs_pos",
                     "selfattention_layer_type": "selfattn"}),
    ]:
        c2 = copy.deepcopy(cfg)
        c2["encoder_conf"].update(patch)
        try:
            m2, p2 = build(c2)

            def loss2(p, rng_key, m2=m2):
                def fwd(m, feats, lens):
                    out, _ = m.encoder(feats, lens, deterministic=False,
                                       train=True, chunk_rng=rng_key)
                    return jnp.mean(jnp.square(out.astype(jnp.float32)))
                return m2.apply({"params": p}, feats, lens, method=fwd,
                                rngs={"dropout": rng_key})

            results[name] = timed(jax.jit(jax.grad(loss2)), (p2, key),
                                  name=name)
        except Exception as e:
            print(f"[enc-profile] {name} failed: {e}", flush=True)

    print(f"\n== encoder profile @ B={b} T={t} dtype={cfg['dtype']} ==")
    for k, sec in results.items():
        print(f"  {k:14s} {sec*1000:9.1f} ms/step")


if __name__ == "__main__":
    main()
