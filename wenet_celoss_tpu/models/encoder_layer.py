"""Transformer / Conformer encoder layers.

Parity with reference ``wenet/transformer/encoder_layer.py:25-269``:
- TransformerEncoderLayer: (pre|post)-norm self-attention + FFN;
- ConformerEncoderLayer: ½-FFN → MHSA → conv → ½-FFN → final LN (macaron),
  all pre-norm with residuals.

Each layer also exposes ``forward_with_cache`` for streaming: the attention
cache is a fixed-size [B, H, C, 2*dk] buffer and the conv cache is
[B, lorder, C] (see attention.py / convolution.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax.numpy as jnp

from wenet_celoss_tpu.models.attention import (
    MultiHeadedAttention, RelPositionMultiHeadedAttention)
from wenet_celoss_tpu.models.convolution import ConvolutionModule


def _use_ffn_pallas() -> bool:
    import os

    import jax
    return (jax.default_backend() == "tpu"
            and os.environ.get("FFN_PALLAS", "1") == "1")


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float
    activation: str = "relu"
    dtype: object = None

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        d = x.shape[-1]
        dense1 = nn.Dense(self.hidden_units, dtype=self.dtype,
                          name="Dense_0")
        dense2 = nn.Dense(d, dtype=self.dtype, name="Dense_1")
        # Fused Pallas path (TPU): matmul → act → on-core-PRNG dropout →
        # matmul in one kernel; the [rows, hidden] activation and the
        # random bits never touch HBM (ops/ffn_pallas.py).
        if (not self.is_initializing() and x.ndim == 3
                and self.activation in ("relu", "swish")
                and _use_ffn_pallas()):
            import jax
            import jax.numpy as jnp

            from wenet_celoss_tpu.ops.ffn_pallas import ffn_fused
            rate = 0.0 if deterministic else self.dropout_rate
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1,
                    dtype=jnp.int32)
            else:
                seed = jnp.zeros((), jnp.int32)
            p1 = dense1.variables["params"]
            p2 = dense2.variables["params"]
            cdt = jnp.dtype(self.dtype) if self.dtype is not None \
                else x.dtype
            b, t, _ = x.shape
            y = ffn_fused(x.reshape(b * t, d).astype(cdt),
                          p1["kernel"].astype(cdt), p1["bias"],
                          p2["kernel"].astype(cdt), p2["bias"],
                          seed, self.activation, rate)
            return y.reshape(b, t, d)
        act = {"relu": nn.relu, "swish": nn.silu, "gelu": nn.gelu}[
            self.activation]
        h = act(dense1(x))
        h = FastDropout(self.dropout_rate, deterministic=deterministic)(h)
        return dense2(h)


class TransformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    dtype: object = None

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.attention_dropout_rate,
            dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dropout = FastDropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear = nn.Dense(self.size)

    def __call__(self, x, att_mask, pos_emb=None, pad_mask=None, *,
                 deterministic=True):
        residual = x
        xn = self.norm1(x) if self.normalize_before else x
        att = self.self_attn(xn, xn, xn, att_mask, pos_emb,
                             deterministic=deterministic)
        if self.concat_after:
            att = self.concat_linear(jnp.concatenate([xn, att], axis=-1))
        x = residual + self.dropout(att, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        xn = self.norm2(x) if self.normalize_before else x
        x = residual + self.dropout(
            self.feed_forward(xn, deterministic=deterministic),
            deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        return x

    def forward_with_cache(self, x, att_cache, att_cache_len, att_mask=None,
                           pos_emb=None, *, deterministic=True):
        residual = x
        xn = self.norm1(x) if self.normalize_before else x
        att, new_cache, new_len = self.self_attn.forward_with_cache(
            xn, xn, xn, att_cache, att_cache_len, att_mask, pos_emb,
            deterministic=deterministic)
        x = residual + att
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        xn = self.norm2(x) if self.normalize_before else x
        x = residual + self.feed_forward(xn, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)
        return x, new_cache, new_len


class ConformerEncoderLayer(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    macaron_style: bool = True
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    cnn_module_norm: str = "batch_norm"
    causal: bool = False
    pos_enc_layer_type: str = "rel_pos"
    activation: str = "swish"
    dtype: object = None

    def setup(self):
        attn_cls = (RelPositionMultiHeadedAttention
                    if self.pos_enc_layer_type == "rel_pos"
                    else MultiHeadedAttention)
        self.self_attn = attn_cls(
            self.attention_heads, self.size, self.attention_dropout_rate,
            dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, self.activation,
            dtype=self.dtype)
        if self.macaron_style:
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.linear_units, self.dropout_rate, self.activation,
                dtype=self.dtype)
            self.norm_ff_macaron = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.use_cnn_module:
            self.conv_module = ConvolutionModule(
                self.size, self.cnn_module_kernel, self.cnn_module_norm,
                self.causal, dtype=self.dtype)
            self.norm_conv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
            self.norm_final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm_ff = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm_mha = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dropout = FastDropout(self.dropout_rate)
        self.ff_scale = 0.5 if self.macaron_style else 1.0

    def __call__(self, x, att_mask, pos_emb, pad_mask=None, *,
                 deterministic=True, train=False):
        drop = lambda h: self.dropout(h, deterministic=deterministic)
        if self.macaron_style:
            x = x + self.ff_scale * drop(self.feed_forward_macaron(
                self.norm_ff_macaron(x), deterministic=deterministic))
        residual = x
        xn = self.norm_mha(x)
        x = residual + drop(self.self_attn(
            xn, xn, xn, att_mask, pos_emb, deterministic=deterministic))
        if self.use_cnn_module:
            x = x + drop(self.conv_module(
                self.norm_conv(x), pad_mask, train=train))
        x = x + self.ff_scale * drop(self.feed_forward(
            self.norm_ff(x), deterministic=deterministic))
        if self.use_cnn_module:
            x = self.norm_final(x)
        return x

    def forward_with_cache(self, x, att_cache, att_cache_len, cnn_cache,
                           att_mask=None, pos_emb=None, *, deterministic=True):
        if self.macaron_style:
            x = x + self.ff_scale * self.feed_forward_macaron(
                self.norm_ff_macaron(x), deterministic=deterministic)
        residual = x
        xn = self.norm_mha(x)
        att, new_att_cache, new_len = self.self_attn.forward_with_cache(
            xn, xn, xn, att_cache, att_cache_len, att_mask, pos_emb,
            deterministic=deterministic)
        x = residual + att
        new_cnn_cache = cnn_cache
        if self.use_cnn_module:
            conv_out, new_cnn_cache = self.conv_module.forward_with_cache(
                self.norm_conv(x), cnn_cache)
            x = x + conv_out
        x = x + self.ff_scale * self.feed_forward(
            self.norm_ff(x), deterministic=deterministic)
        if self.use_cnn_module:
            x = self.norm_final(x)
        return x, new_att_cache, new_len, new_cnn_cache
