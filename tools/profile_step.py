"""Decompose the flagship train-step time into component costs.

Times forward+backward of each major component in isolation at the bench
operating point (B, T, U, V from the same env knobs as bench.py), using
the same honest host-read sync as bench.py (on the axon platform
block_until_ready can return before the program finishes).

Components:
  full        — the real fused train step (reference scale)
  encoder     — conformer encoder fwd+bwd (loss = mean(out^2))
  enc+bias    — encoder + context-bias recombine
  predictor   — RNN predictor fwd+bwd over [B, U+1]
  loss        — RNN-T loss given precomputed joint projections
  att+ctc+hw  — the aux losses given a fixed encoder output

Usage: BENCH_BATCH=256 BENCH_DTYPE=bfloat16 python tools/profile_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=4, windows=3, name=""):
    """Median window rate (steps/s) with honest sync via host read."""
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # compile+sync
    print(f"[profile] {name}: compiled+warm in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = time.perf_counter() - t0
        rates.append(dt / iters)
    rates.sort()
    med = rates[len(rates) // 2]
    print(f"[profile] {name}: {med*1000:.1f} ms/step", flush=True)
    return med


def main():
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils.common import add_blank
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime

    configure_tpu_runtime()

    cfg = conformer_rnnt_bias(tiny=os.environ.get("BENCH_TINY", "0") == "1",
                              vocab_size=1024)
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    if os.environ.get("BENCH_RNNT"):
        cfg["model_conf"]["rnnt_impl"] = os.environ["BENCH_RNNT"]
    model = init_model(cfg)

    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))
    u = int(os.environ.get("BENCH_LABELS", "32"))
    v = cfg["output_dim"]
    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, v - 2, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
        "context_list": jnp.asarray(rng.integers(1, v - 2, (8, 4)), jnp.int32),
        "context_lengths": jnp.full((8,), 4, jnp.int32),
        "hw_labels": jnp.asarray(rng.integers(0, 2, (b, u)), jnp.int32),
    }
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    params = variables["params"]
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    train_step = T.make_train_step(model, tx)

    key = jax.random.PRNGKey(1)
    results = {}

    # ---- full step ----
    @jax.jit
    def full(state, key):
        state, m, _ = train_step(state, batch, key)
        return jax.tree_util.tree_leaves(state.params)[0]

    results["full"] = timed(full, (state, key), name="full")

    # ---- encoder only ----
    def enc_loss(p, rng_key):
        def fwd(m, feats, lens):
            out, mask = m.encoder(feats, lens, deterministic=False,
                                  train=True, chunk_rng=rng_key)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        return model.apply({"params": p}, batch["feats"],
                           batch["feat_lengths"], method=fwd,
                           rngs={"dropout": rng_key})

    enc_grad = jax.jit(jax.grad(enc_loss))
    results["encoder"] = timed(enc_grad, (params, key), name="encoder")

    # ---- encoder + bias recombine ----
    def encbias_loss(p, rng_key):
        def fwd(m, feats, lens, cl, cll):
            bh = m.context_bias.forward_bias_hidden(cl, cll, None)
            out, mask = m.encoder(feats, lens, deterministic=False,
                                  train=True, chunk_rng=rng_key)
            out2, eb = m.context_bias.forward_encoder_bias(bh, out, None)
            return jnp.mean(jnp.square(out2.astype(jnp.float32))) + \
                jnp.mean(jnp.square(eb.astype(jnp.float32)))
        return model.apply({"params": p}, batch["feats"],
                           batch["feat_lengths"], batch["context_list"],
                           batch["context_lengths"], method=fwd,
                           rngs={"dropout": rng_key})

    results["enc+bias"] = timed(jax.jit(jax.grad(encbias_loss)), (params, key), name="enc+bias")

    # ---- predictor only ----
    ys_in = add_blank(batch["labels"], batch["label_lengths"], 0, -1)

    def pred_loss(p, rng_key):
        def fwd(m, ys):
            out = m.predictor(ys, deterministic=False)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        return model.apply({"params": p}, ys_in, method=fwd,
                           rngs={"dropout": rng_key})

    results["predictor"] = timed(jax.jit(jax.grad(pred_loss)), (params, key), name="predictor")

    # ---- RNN-T loss given joint projections ----
    impl = cfg["model_conf"].get("rnnt_impl", "streaming")
    dt_c = jnp.bfloat16 if cfg["dtype"] == "bfloat16" else jnp.float32
    t_sub = (t - 3) // 4 if not os.environ.get("BENCH_TSUB") else \
        int(os.environ["BENCH_TSUB"])
    joint_dim = cfg["joint_conf"].get("join_dim", 512)
    enc_j = jnp.asarray(rng.standard_normal((b, t_sub, joint_dim)), dt_c)
    pred_j = jnp.asarray(rng.standard_normal((b, u + 1, joint_dim)), dt_c)
    w_out = jnp.asarray(rng.standard_normal((joint_dim, v)) * 0.05, dt_c)
    b_out = jnp.zeros((v,), dt_c)
    enc_lens = jnp.full((b,), t_sub, jnp.int32)
    rnnt_text = batch["labels"]

    if impl == "streaming":
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_streaming

        def loss_only(ej, pj, w, bb):
            ls = rnnt_loss_streaming(ej, pj, w, bb, rnnt_text, enc_lens,
                                     batch["label_lengths"], 0,
                                     activation="tanh", chunk=16)
            return jnp.mean(ls)

        g = jax.jit(jax.grad(loss_only, argnums=(0, 1, 2)))
        results["loss"] = timed(g, (enc_j, pred_j, w_out, b_out), name="loss")

    # ---- aux losses (att + ctc + hw) ----
    d_enc = cfg["encoder_conf"]["output_size"]
    enc_out = jnp.asarray(rng.standard_normal((b, t_sub, d_enc)), dt_c)
    enc_mask = jnp.ones((b, t_sub), bool)

    def att_loss(p, rng_key):
        def fwd(m, eo, mask):
            la, _ = m._calc_att_loss(eo, mask, batch["labels"],
                                     batch["label_lengths"],
                                     deterministic=False)
            return la
        return model.apply({"params": p}, enc_out, enc_mask, method=fwd,
                           rngs={"dropout": rng_key})

    def ctc_loss_only(p, rng_key):
        def fwd(m, eo, mask):
            return m.ctc(eo, jnp.sum(mask, axis=1), batch["labels"],
                         batch["label_lengths"], deterministic=False)
        return model.apply({"params": p}, enc_out, enc_mask, method=fwd,
                           rngs={"dropout": rng_key})

    results["att"] = timed(jax.jit(jax.grad(att_loss)), (params, key),
                           name="att")
    results["ctc"] = timed(jax.jit(jax.grad(ctc_loss_only)), (params, key),
                           name="ctc")

    audio_s = b * t * 0.01
    print(f"\n== profile @ B={b} T={t} U={u} V={v} dtype={cfg['dtype']} "
          f"impl={impl} ==")
    for k, sec in results.items():
        print(f"  {k:12s} {sec*1000:9.1f} ms/step   "
              f"({audio_s/sec:8.0f} audio-s/s if alone)")
    known = sum(sec for k, sec in results.items() if k != "full")
    print(f"  {'sum(parts)':12s} {known*1000:9.1f} ms/step   "
          f"(full - sum = {1000*(results['full']-known):.1f} ms "
          f"unattributed: optimizer, cmvn, loss-combine, overlap)")


if __name__ == "__main__":
    main()
