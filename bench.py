"""Benchmark: training throughput of the flagship conformer-RNN-T + bias
model on one chip, in audio-seconds per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no in-tree throughput numbers (BASELINE.md), so
vs_baseline is reported against this project's own recorded baseline when
BENCH_BASELINE.json exists, else 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime

    # Hardware RNG for dropout (+106ms/step at B=256 with threefry;
    # see utils/platform.py). Env JAX_DEFAULT_PRNG_IMPL overrides.
    configure_tpu_runtime()

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    cfg = conformer_rnnt_bias(tiny=tiny, vocab_size=1024)
    # bf16 compute with fp32 params is the TPU mixed-precision analog of
    # the reference's AMP training (executor.py:92-122) and the tuned
    # operating point: 3125 (bf16) vs 2802 (fp32) audio-s/s at B=256.
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    rnnt_impl = os.environ.get("BENCH_RNNT")
    if rnnt_impl:
        cfg["model_conf"]["rnnt_impl"] = rnnt_impl
    model = init_model(cfg)

    # Large batch is the TPU-native operating point (SPMD training).
    # With the streaming-V loss (rnnt_impl=streaming, the flagship
    # default) B=512 fits one v5e chip (the materialized-joint paths top
    # out near B=64 at T=512, V=1024: [B,T',U+1,V] is ~70 GB at B=512).
    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))   # 10ms frames
    u = int(os.environ.get("BENCH_LABELS", "32"))
    rng = np.random.default_rng(0)
    v = cfg["output_dim"]
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, v - 2, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
        "context_list": jnp.asarray(rng.integers(1, v - 2, (8, 4)),
                                    jnp.int32),
        "context_lengths": jnp.full((8,), 4, jnp.int32),
        "hw_labels": jnp.asarray(rng.integers(0, 2, (b, u)), jnp.int32),
    }
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    train_step = T.make_train_step(model, tx)

    def step(state, key):
        state, metrics, _ = train_step(state, batch, key)
        return state, metrics

    def sync(state, m):
        """Force REAL completion of the last step. On the experimental
        'axon' platform jax.block_until_ready can return before the
        program finishes (output buffers are marked ready early), which
        silently turns a timing loop into a dispatch-rate measurement.
        A host read of a value computed FROM the final parameters cannot
        lie: it requires the optimizer update to have run."""
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(m["loss"]) + float(jnp.sum(jnp.abs(leaf)))

    # Warmup/compile (incl. the sync probe's reduction).
    key = jax.random.PRNGKey(1)
    state, m = step(state, key)
    sync(state, m)

    # Median of probe-synced windows (never best-of: a window whose
    # block returned early would report impossible FLOP rates).
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            key, sub = jax.random.split(key)
            state, m = step(state, sub)
        sync(state, m)
        dt = time.perf_counter() - t0
        rates.append(b * t * 0.01 * iters / dt)
    rates.sort()
    value = rates[len(rates) // 2]

    vs = 1.0
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            with open("BENCH_BASELINE.json") as f:
                base = json.load(f).get("value", 0.0)
            if base > 0:
                vs = value / base
        except Exception:
            pass
    print(json.dumps({
        "metric": "train_throughput_conformer_rnnt_bias",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
