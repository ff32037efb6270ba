"""Attention decoders: L2R transformer decoder and the bidirectional
(U2++) wrapper.

Parity with reference ``wenet/transformer/decoder.py:29-299``
(TransformerDecoder.forward / forward_one_step with per-layer activation
cache; BiTransformerDecoder = left + right decoders sharing the embed) and
``wenet/transformer/decoder_layer.py:23-151``.

The incremental path keeps a per-layer [B, U_max, D] activation buffer with
a step counter instead of growing tensors, so beam search scans stay
shape-static under jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.models.attention import MultiHeadedAttention
from wenet_celoss_tpu.models.embedding import PositionalEncoding
from wenet_celoss_tpu.models.encoder_layer import PositionwiseFeedForward
from wenet_celoss_tpu.utils.mask import make_non_pad_mask, subsequent_mask


class DecoderLayer(nn.Module):
    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    dtype: object = None

    def setup(self):
        self.self_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.self_attention_dropout_rate,
            dtype=self.dtype)
        self.src_attn = MultiHeadedAttention(
            self.attention_heads, self.size, self.src_attention_dropout_rate,
            dtype=self.dtype)
        self.feed_forward = PositionwiseFeedForward(
            self.linear_units, self.dropout_rate, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dropout = FastDropout(self.dropout_rate)
        if self.concat_after:
            self.concat_linear1 = nn.Dense(self.size)
            self.concat_linear2 = nn.Dense(self.size)

    def __call__(self, tgt, tgt_mask, memory, memory_mask, *,
                 deterministic=True):
        """tgt: [B, U, D]; tgt_mask: [B, U, U]; memory: [B, T, D];
        memory_mask: [B, 1, T] or [B, U, T]."""
        drop = lambda h: self.dropout(h, deterministic=deterministic)
        residual = tgt
        if self.normalize_before and not self.concat_after:
            # Pre-norm fused into the merged QKV projection (ln_matmul).
            sa = self.self_attn(tgt, tgt, tgt, tgt_mask,
                                deterministic=deterministic, ln=self.norm1)
        else:
            x = self.norm1(tgt) if self.normalize_before else tgt
            sa = self.self_attn(x, x, x, tgt_mask,
                                deterministic=deterministic)
            if self.concat_after:
                sa = self.concat_linear1(jnp.concatenate([x, sa], axis=-1))
        x = residual + drop(sa)
        if not self.normalize_before:
            x = self.norm1(x)
        residual = x
        if self.normalize_before and not self.concat_after:
            ca = self.src_attn(x, memory, memory, memory_mask,
                               deterministic=deterministic, ln=self.norm2)
        else:
            xn = self.norm2(x) if self.normalize_before else x
            ca = self.src_attn(xn, memory, memory, memory_mask,
                               deterministic=deterministic)
            if self.concat_after:
                ca = self.concat_linear2(jnp.concatenate([xn, ca], axis=-1))
        x = residual + drop(ca)
        if not self.normalize_before:
            x = self.norm2(x)
        if self.normalize_before:
            # Whole FFN block (pre-LN + FFN + dropout + residual) — one
            # fused Pallas kernel on TPU (ops/ffn_pallas.ln_ffn_residual).
            return self.feed_forward(x, deterministic=deterministic,
                                     ln=self.norm3,
                                     out_rate=self.dropout_rate)
        residual = x
        x = residual + drop(self.feed_forward(x, deterministic=deterministic))
        x = self.norm3(x)
        return x


class TransformerDecoder(nn.Module):
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    normalize_before: bool = True
    concat_after: bool = False
    dtype: object = None

    def setup(self):
        d = self.encoder_output_size
        self.embed_tokens = nn.Embed(self.vocab_size, d)
        self.pos_enc = PositionalEncoding(d, self.positional_dropout_rate)
        self.decoders = [DecoderLayer(
            d, self.attention_heads, self.linear_units, self.dropout_rate,
            self.self_attention_dropout_rate, self.src_attention_dropout_rate,
            self.normalize_before, self.concat_after, dtype=self.dtype,
            name=f"layer_{i}") for i in range(self.num_blocks)]
        self.after_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        if self.use_output_layer:
            self.output_layer = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, memory, memory_pad_mask, ys_in_pad, ys_in_lens, *,
                 deterministic=True):
        """Teacher-forced decode.

        Args:
          memory: [B, T, D]; memory_pad_mask: [B, T] True=valid.
          ys_in_pad: [B, U] (<sos> + tokens); ys_in_lens: [B].
        Returns: logits [B, U, V]
        """
        u = ys_in_pad.shape[1]
        tgt_mask = (make_non_pad_mask(ys_in_lens, u)[:, None, :]
                    & subsequent_mask(u)[None, :, :])
        x, _ = self.pos_enc(self.embed_tokens(ys_in_pad),
                            deterministic=deterministic)
        mem_mask = memory_pad_mask[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, memory, mem_mask,
                      deterministic=deterministic)
        if self.normalize_before:
            x = self.after_norm(x)
        if self.use_output_layer:
            x = self.output_layer(x)
        return x

    def forward_one_step(self, memory, memory_pad_mask, ys_buffer, pos):
        """One beam-search step over a FIXED-SIZE token buffer.

        The reference grows the prefix tensor every step
        (`decoder.py:144-185`);
        here the buffer is [B, L_max] with a traced position ``pos`` so the
        whole beam loop is one compiled scan: we run the causal decoder over
        the full buffer (positions > pos masked out) and read the logits at
        ``pos``.

        Args:
          ys_buffer: [B, L_max] tokens, positions 0..pos filled.
          pos: traced scalar — index of the newest token.
        Returns: log-probs of the next token [B, V].
        """
        l_max = ys_buffer.shape[1]
        valid = jnp.arange(l_max) <= pos
        tgt_mask = (valid[None, None, :]
                    & subsequent_mask(l_max)[None, :, :])
        x, _ = self.pos_enc(self.embed_tokens(ys_buffer), deterministic=True)
        mem_mask = memory_pad_mask[:, None, :]
        for layer in self.decoders:
            x = layer(x, tgt_mask, memory, mem_mask, deterministic=True)
        x_pos = jax.lax.dynamic_slice_in_dim(
            x, jnp.asarray(pos, jnp.int32), 1, axis=1)
        if self.normalize_before:
            x_pos = self.after_norm(x_pos)
        if self.use_output_layer:
            x_pos = self.output_layer(x_pos)
        return nn.log_softmax(x_pos[:, 0].astype(jnp.float32), axis=-1)


class BiTransformerDecoder(nn.Module):
    """Left-to-right + right-to-left decoders (U2++), reference
    `decoder.py:188-299`."""
    vocab_size: int
    encoder_output_size: int
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    self_attention_dropout_rate: float = 0.0
    src_attention_dropout_rate: float = 0.0
    use_output_layer: bool = True
    normalize_before: bool = True
    concat_after: bool = False
    dtype: object = None

    def setup(self):
        kw = dict(
            dtype=self.dtype,
            vocab_size=self.vocab_size,
            encoder_output_size=self.encoder_output_size,
            attention_heads=self.attention_heads,
            linear_units=self.linear_units,
            dropout_rate=self.dropout_rate,
            positional_dropout_rate=self.positional_dropout_rate,
            self_attention_dropout_rate=self.self_attention_dropout_rate,
            src_attention_dropout_rate=self.src_attention_dropout_rate,
            use_output_layer=self.use_output_layer,
            normalize_before=self.normalize_before,
            concat_after=self.concat_after)
        self.left_decoder = TransformerDecoder(
            num_blocks=self.num_blocks, name="left", **kw)
        if self.r_num_blocks > 0:
            self.right_decoder = TransformerDecoder(
                num_blocks=self.r_num_blocks, name="right", **kw)

    def __call__(self, memory, memory_pad_mask, ys_in_pad, ys_in_lens,
                 r_ys_in_pad=None, reverse_weight: float = 0.0, *,
                 deterministic=True):
        l_x = self.left_decoder(memory, memory_pad_mask, ys_in_pad,
                                ys_in_lens, deterministic=deterministic)
        r_x = jnp.zeros_like(l_x)
        if self.r_num_blocks > 0 and reverse_weight > 0.0:
            r_x = self.right_decoder(memory, memory_pad_mask, r_ys_in_pad,
                                     ys_in_lens, deterministic=deterministic)
        return l_x, r_x

    def forward_one_step(self, memory, memory_pad_mask, ys_buffer, pos):
        return self.left_decoder.forward_one_step(
            memory, memory_pad_mask, ys_buffer, pos)
