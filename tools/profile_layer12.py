"""Per-piece conformer-layer costs with the ~4.5ms/dispatch axon overhead
amortized away: each variant applies the module 12x (chained) in ONE jitted
program, like the 12-layer encoder does.

Usage: python tools/profile_layer12.py
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
    RelPositionMultiHeadedAttention)
from wenet_celoss_tpu.models.convolution import ConvolutionModule  # noqa
from wenet_celoss_tpu.models.encoder_layer import (  # noqa: E402
    ConformerEncoderLayer, PositionwiseFeedForward)

N = 12


def timed(fn, args, iters=6, windows=3, name=""):
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
    print(f"[layer12] {name}: {rates[1]*1000:.2f} ms total, "
          f"{rates[1]*1000/N:.2f} ms/layer", flush=True)
    return rates[1]


class Tower(nn.Module):
    """12 chained copies of one sub-module."""
    make: object
    mode: str

    @nn.compact
    def __call__(self, x, bias, pos, pm, deterministic):
        for i in range(N):
            m = self.make()
            if self.mode == "ffn":
                x = x + m(x, deterministic=deterministic)
            elif self.mode == "attn":
                x = x + m(x, x, x, bias, pos, deterministic=deterministic)
            elif self.mode == "conv":
                x = x + m(x, pm)
            elif self.mode == "norm":
                x = m(x)
            elif self.mode == "drop":
                x = m(x, deterministic=deterministic) + 0.01 * x
        return x


def main():
    b, t, d = 256, 127, 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), dt)
    pos = jnp.asarray(rng.standard_normal((1, t, d)), dt)
    bias = jnp.zeros((b, t, t), dt)
    pm = jnp.ones((b, t), bool)
    key = jax.random.PRNGKey(0)

    variants = [
        ("ffn x12", Tower(lambda: PositionwiseFeedForward(
            2048, 0.1, "swish", dtype=dt), "ffn")),
        ("ffn(no-drop) x12", Tower(lambda: PositionwiseFeedForward(
            2048, 0.0, "swish", dtype=dt), "ffn")),
        ("rel-attn x12", Tower(lambda: RelPositionMultiHeadedAttention(
            4, d, 0.1, dtype=dt), "attn")),
        ("rel-attn(no-drop) x12", Tower(
            lambda: RelPositionMultiHeadedAttention(4, d, 0.0, dtype=dt),
            "attn")),
        ("conv x12", Tower(lambda: ConvolutionModule(
            d, 15, "layer_norm", False, dtype=dt), "conv")),
        ("layernorm x12", Tower(lambda: nn.LayerNorm(
            epsilon=1e-5, dtype=dt), "norm")),
        ("dropout x12", Tower(lambda: nn.Dropout(0.1), "drop")),
        ("full layer x12", None),
    ]

    for name, tower in variants:
        if tower is None:
            layer_tower = nn.Sequential([])  # placeholder

            class Full(nn.Module):
                @nn.compact
                def __call__(self, x, bias, pos, pm, deterministic):
                    for i in range(N):
                        x = ConformerEncoderLayer(
                            d, 4, 2048, 0.1, 0.1, True, macaron_style=True,
                            use_cnn_module=True, cnn_module_kernel=15,
                            cnn_module_norm="layer_norm", causal=False,
                            pos_enc_layer_type="rel_pos", activation="swish",
                            dtype=dt)(x, bias, pos, pm,
                                      deterministic=deterministic,
                                      train=True)
                    return x

            tower = Full()
        params = tower.init({"params": key, "dropout": key}, x, bias, pos,
                            pm, True)

        def loss(p, k, tower=tower):
            out = tower.apply(p, x, bias, pos, pm, False,
                              rngs={"dropout": k})
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        timed(jax.jit(jax.grad(loss)), (params, key), name=name)


if __name__ == "__main__":
    main()
