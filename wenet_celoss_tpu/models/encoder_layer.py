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


def _use_conv_pallas() -> bool:
    # Default OFF: the fused conv-block kernel was built and MEASURED
    # SLOWER than XLA's composition at the flagship point — 2.34 vs
    # 1.11 ms/layer fwd+bwd (12-block tower, B=256, T'=127; larger
    # batch-groups exceed scoped VMEM). XLA already fuses
    # LN+GLU+depthwise+swish into the pointwise matmuls here; the
    # kernel's fp32 recompute + small sequential groups lose. Kept
    # in-tree (ops/conv_pallas.py, parity-tested) for long-T configs
    # where the [T,2D] hidden stops fitting XLA's fusion budget.
    # See ROADMAP "conv-block kernel decision (r4)".
    import os

    import jax
    return (jax.default_backend() == "tpu"
            and os.environ.get("CONV_PALLAS", "0") == "1")


class PositionwiseFeedForward(nn.Module):
    """FFN, optionally fused with the surrounding pre-LayerNorm, output
    dropout, and scaled residual (the conformer FFN block).

    With ``ln=None`` returns ``dense2(drop(act(dense1(x))))`` (reference
    `positionwise_feed_forward.py` semantics). With a bound LayerNorm
    module passed as ``ln``, returns the WHOLE pre-norm block
    ``x + ff_scale * drop_out(ffn(ln(x)))`` — on TPU this dispatches one
    fused Pallas kernel (ops/ffn_pallas.ln_ffn_residual) where LN stats,
    the [rows, F] hidden, both dropout masks and the residual stay in
    VMEM."""

    hidden_units: int
    dropout_rate: float
    activation: str = "relu"
    dtype: object = None

    @nn.compact
    def __call__(self, x, *, deterministic=True, ln=None,
                 ff_scale: float = 1.0, out_rate: float | None = None):
        d = x.shape[-1]
        dense1 = nn.Dense(self.hidden_units, dtype=self.dtype,
                          name="Dense_0")
        dense2 = nn.Dense(d, dtype=self.dtype, name="Dense_1")
        if out_rate is None:
            out_rate = self.dropout_rate
        # Fused Pallas path (TPU): [LN →] matmul → act → on-core-PRNG
        # dropout → matmul [→ dropout → scaled residual] in one kernel;
        # the [rows, hidden] activation and the random bits never touch
        # HBM (ops/ffn_pallas.py).
        if (not self.is_initializing() and x.ndim == 3
                and self.activation in ("relu", "swish")
                and _use_ffn_pallas()):
            import jax
            import jax.numpy as jnp

            from wenet_celoss_tpu.ops.ffn_pallas import (ffn_fused,
                                                         ln_ffn_residual)
            rate = 0.0 if deterministic else self.dropout_rate
            rate2 = 0.0 if deterministic else out_rate
            if rate > 0.0 or (ln is not None and rate2 > 0.0):
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
            if ln is not None:
                pn = ln.variables["params"]
                y = ln_ffn_residual(
                    x.reshape(b * t, d).astype(cdt), pn["scale"],
                    pn["bias"], p1["kernel"].astype(cdt), p1["bias"],
                    p2["kernel"].astype(cdt), p2["bias"], seed,
                    self.activation, rate, rate2, ff_scale)
            else:
                y = ffn_fused(x.reshape(b * t, d).astype(cdt),
                              p1["kernel"].astype(cdt), p1["bias"],
                              p2["kernel"].astype(cdt), p2["bias"],
                              seed, self.activation, rate)
            return y.reshape(b, t, d)
        act = {"relu": nn.relu, "swish": nn.silu, "gelu": nn.gelu}[
            self.activation]
        xin = ln(x) if ln is not None else x
        h = act(dense1(xin))
        h = FastDropout(self.dropout_rate, deterministic=deterministic)(h)
        y = dense2(h)
        if ln is None:
            return y
        y = FastDropout(out_rate, deterministic=deterministic)(y)
        return x + ff_scale * y


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
        if self.normalize_before:
            x = self.feed_forward(x, deterministic=deterministic,
                                  ln=self.norm2,
                                  out_rate=self.dropout_rate)
        else:
            x = self.norm2(x + self.dropout(
                self.feed_forward(x, deterministic=deterministic),
                deterministic=deterministic))
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
        if self.normalize_before:
            x = self.feed_forward(x, deterministic=deterministic,
                                  ln=self.norm2, out_rate=0.0)
        else:
            x = self.norm2(x + self.feed_forward(
                x, deterministic=deterministic))
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
            # Whole FFN block (pre-LN + FFN + dropout + ½-residual) —
            # one fused Pallas kernel on TPU.
            x = self.feed_forward_macaron(
                x, deterministic=deterministic, ln=self.norm_ff_macaron,
                ff_scale=self.ff_scale, out_rate=self.dropout_rate)
        residual = x
        # Pre-norm fused into the merged QKV projection (ln_matmul).
        x = residual + drop(self.self_attn(
            x, x, x, att_mask, pos_emb, deterministic=deterministic,
            ln=self.norm_mha))
        if self.use_cnn_module:
            if (not self.is_initializing()
                    and self.cnn_module_norm == "layer_norm"
                    and _use_conv_pallas()):
                # Whole conv block (pre-LN + pointwise/GLU/depthwise/
                # LN/swish/pointwise + dropout + residual) — one fused
                # Pallas kernel (ops/conv_pallas.py).
                x = self._fused_conv_block(x, pad_mask,
                                           deterministic=deterministic)
            else:
                # Pre-norm fused into the masked pointwise-conv1
                # projection inside the module (ln_matmul).
                x = x + drop(self.conv_module(
                    x, pad_mask, train=train, ln=self.norm_conv))
        x = self.feed_forward(
            x, deterministic=deterministic, ln=self.norm_ff,
            ff_scale=self.ff_scale, out_rate=self.dropout_rate)
        if self.use_cnn_module:
            x = self.norm_final(x)
        return x

    def _fused_conv_block(self, x, pad_mask, *, deterministic):
        import jax
        import jax.numpy as jnp

        from wenet_celoss_tpu.ops.conv_pallas import conv_block_residual
        pn = self.norm_conv.variables["params"]
        cm = self.conv_module
        p1 = cm.pointwise_conv1.variables["params"]
        pdw = cm.depthwise_conv.variables["params"]
        pln = cm.norm_layer.variables["params"]
        p2 = cm.pointwise_conv2.variables["params"]
        cdt = jnp.dtype(self.dtype) if self.dtype is not None else x.dtype
        b, t, d = x.shape
        rate = 0.0 if deterministic else self.dropout_rate
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                      2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        if pad_mask is None:
            mask = jnp.ones((b, t), jnp.float32)
        else:
            mask = pad_mask.astype(jnp.float32)
        zeros = jnp.zeros((d,), jnp.float32)
        zeros2 = jnp.zeros((2 * d,), jnp.float32)
        return conv_block_residual(
            x.astype(cdt), mask, pn["scale"], pn["bias"],
            p1["kernel"].astype(cdt), p1.get("bias", zeros2),
            pdw["kernel"][:, 0, :], pdw.get("bias", zeros),
            pln["scale"], pln["bias"], p2["kernel"].astype(cdt),
            p2.get("bias", zeros), seed, self.causal, rate)

    def forward_with_cache(self, x, att_cache, att_cache_len, cnn_cache,
                           att_mask=None, pos_emb=None, *, deterministic=True):
        if self.macaron_style:
            x = self.feed_forward_macaron(
                x, deterministic=deterministic, ln=self.norm_ff_macaron,
                ff_scale=self.ff_scale, out_rate=0.0)
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
        x = self.feed_forward(
            x, deterministic=deterministic, ln=self.norm_ff,
            ff_scale=self.ff_scale, out_rate=0.0)
        if self.use_cnn_module:
            x = self.norm_final(x)
        return x, new_att_cache, new_len, new_cnn_cache
