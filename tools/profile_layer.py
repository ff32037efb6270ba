"""Micro-profile ONE conformer layer's pieces at the bench operating point
([B=256, T'=127, D=256] bf16): FFN half, rel-pos attention, conv module,
dropout alone, full layer. Identifies where the encoder's non-MXU time goes.

Usage: python tools/profile_layer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.utils.platform import configure_tpu_runtime

configure_tpu_runtime()

import flax.linen as nn  # noqa: E402

from wenet_celoss_tpu.models.attention import (  # noqa: E402
    NEG_INF, RelPositionMultiHeadedAttention)
from wenet_celoss_tpu.models.convolution import ConvolutionModule  # noqa
from wenet_celoss_tpu.models.encoder_layer import (  # noqa: E402
    ConformerEncoderLayer, PositionwiseFeedForward)


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
    print(f"[layer-profile] {name}: {rates[1]*1000:.2f} ms", flush=True)
    return rates[1]


def main():
    b, t, d = 256, 127, 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), dt)
    pos = jnp.asarray(rng.standard_normal((1, t, d)), dt)
    bias = jnp.zeros((b, t, t), dt)
    key = jax.random.PRNGKey(0)

    def bench_module(mod, call, name, has_rng=True):
        params = mod.init({"params": key, "dropout": key}, *call(None))
        def loss(p, k):
            rngs = {"dropout": k} if has_rng else {}
            out = mod.apply(p, *call(k), rngs=rngs)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean(jnp.square(out.astype(jnp.float32)))
        timed(jax.jit(jax.grad(loss)), (params, key), name=name)

    # FFN half (macaron): Dense 256->2048 -> swish -> dropout -> 2048->256
    ffn = PositionwiseFeedForward(2048, 0.1, "swish", dtype=dt)
    bench_module(ffn, lambda k: (x,), "ffn(2048) fwd+bwd")

    ffn_nodrop = PositionwiseFeedForward(2048, 0.0, "swish", dtype=dt)
    bench_module(ffn_nodrop, lambda k: (x,), "ffn(no-drop)")

    # rel-pos attention with additive bias mask
    att = RelPositionMultiHeadedAttention(4, d, 0.1, dtype=dt)
    def att_call(k):
        return (x, x, x, bias, pos)
    params = att.init({"params": key, "dropout": key}, *att_call(None),
                      deterministic=True)
    def att_loss(p, k):
        out = att.apply(p, *att_call(k), deterministic=False,
                        rngs={"dropout": k})
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    timed(jax.jit(jax.grad(att_loss)), (params, key), name="rel-attn fwd+bwd")

    def att_loss_det(p, k):
        out = att.apply(p, *att_call(k), deterministic=True)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    timed(jax.jit(jax.grad(att_loss_det)), (params, key),
          name="rel-attn(no-drop)")

    # conv module (layer_norm variant, non-causal)
    conv = ConvolutionModule(d, 15, "layer_norm", False, dtype=dt)
    pm = jnp.ones((b, t), bool)
    cparams = conv.init({"params": key}, x, pm)
    def conv_loss(p, k):
        out = conv.apply(p, x, pm)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    timed(jax.jit(jax.grad(conv_loss)), (cparams, key), name="conv fwd+bwd")

    # dropout alone on the residual tensor
    def drop_loss(y, k):
        m = jax.random.bernoulli(k, 0.9, y.shape)
        out = jnp.where(m, y / 0.9, 0)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    timed(jax.jit(jax.grad(drop_loss)), (x, key), name="dropout(1 tensor)")

    # full conformer layer
    layer = ConformerEncoderLayer(
        d, 4, 2048, 0.1, 0.1, True, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=15, cnn_module_norm="layer_norm", causal=False,
        pos_enc_layer_type="rel_pos", activation="swish", dtype=dt)
    lparams = layer.init({"params": key, "dropout": key}, x, bias, pos, pm)
    def layer_loss(p, k):
        out = layer.apply(p, x, bias, pos, pm, deterministic=False,
                          train=True, rngs={"dropout": k})
        return jnp.mean(jnp.square(out.astype(jnp.float32)))
    timed(jax.jit(jax.grad(layer_loss)), (lparams, key),
          name="full layer fwd+bwd (x12 = encoder layers)")


if __name__ == "__main__":
    main()
