"""U2 shared encoder: Transformer and Conformer variants.

Parity with reference ``wenet/transformer/encoder.py:41-462`` (BaseEncoder:
cmvn → subsample+posenc → chunk mask → N layers → LayerNorm; streaming
``forward_chunk`` with attention/conv caches; TransformerEncoder /
ConformerEncoder).

TPU-first redesign of the streaming path: caches are FIXED-SIZE buffers
([L, B, H, C, 2dk] attention ring + [L, B, lorder, D] conv tail) with a
traced valid-length scalar, so every chunk step runs the same compiled
program — the reference grows/concats/slices tensors per chunk
(`encoder.py:181-268`) which would retrace under jit. The chunk offset is a
traced scalar feeding the sinusoid table directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.models.embedding import (
    NoPositionalEncoding, PositionalEncoding, RelPositionalEncoding,
    sinusoid_table)
from wenet_celoss_tpu.models.encoder_layer import (
    ConformerEncoderLayer, TransformerEncoderLayer)
from wenet_celoss_tpu.models.subsampling import SUBSAMPLE_CLASSES
from wenet_celoss_tpu.utils.mask import (
    add_optional_chunk_mask, make_non_pad_mask)

POS_ENC_CLASSES = {
    "abs_pos": PositionalEncoding,
    "rel_pos": RelPositionalEncoding,
    "no_pos": NoPositionalEncoding,
}


class BaseEncoder(nn.Module):
    input_size: int
    output_size: int = 256
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    input_layer: str = "conv2d"
    pos_enc_layer_type: str = "abs_pos"
    normalize_before: bool = True
    concat_after: bool = False
    static_chunk_size: int = 0
    use_dynamic_chunk: bool = False
    use_dynamic_left_chunk: bool = False
    # CMVN stats as hashable tuples (or None): (mean, istd), each len F.
    cmvn: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None
    # Compute dtype ("bfloat16" string or jnp dtype); params stay fp32.
    dtype: Optional[str] = None

    def _make_layers(self):
        raise NotImplementedError

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype) if self.dtype is not None else None

    def setup(self):
        pos_enc = POS_ENC_CLASSES[self.pos_enc_layer_type](
            self.output_size, self.positional_dropout_rate)
        self.embed = SUBSAMPLE_CLASSES[self.input_layer](
            self.output_size, self.dropout_rate, pos_enc,
            dtype=self.compute_dtype)
        self.layers = self._make_layers()
        self.after_norm = nn.LayerNorm(epsilon=1e-5,
                                       dtype=self.compute_dtype)
        if self.cmvn is not None:
            self._cmvn_mean = jnp.asarray(self.cmvn[0], jnp.float32)
            self._cmvn_istd = jnp.asarray(self.cmvn[1], jnp.float32)

    @property
    def subsampling_rate(self) -> int:
        return SUBSAMPLE_CLASSES[self.input_layer].subsampling_rate

    @property
    def right_context(self) -> int:
        return SUBSAMPLE_CLASSES[self.input_layer].right_context

    def _apply_cmvn(self, xs):
        if self.cmvn is not None:
            xs = (xs - self._cmvn_mean) * self._cmvn_istd
        return xs

    def __call__(self, xs, xs_lens, decoding_chunk_size: int = 0,
                 num_decoding_left_chunks: int = -1, *,
                 deterministic: bool = True, train: bool = False,
                 chunk_rng: jax.Array | None = None):
        """Full-utterance forward.

        Args:
          xs: [B, T, F] features; xs_lens: [B].
          decoding_chunk_size: <0 full context, 0 training default, >0 fixed.
          chunk_rng: PRNG key for dynamic-chunk randomization (train).
        Returns: (ys [B, T', D], pad_mask [B, T'] True=valid)
        """
        xs = self._apply_cmvn(xs)
        xs, pos_emb, xs_lens = self.embed(xs, xs_lens,
                                          deterministic=deterministic)
        t = xs.shape[1]
        pad_mask = make_non_pad_mask(xs_lens, t)
        att_mask = add_optional_chunk_mask(
            pad_mask,
            use_dynamic_chunk=self.use_dynamic_chunk and train,
            use_dynamic_left_chunk=self.use_dynamic_left_chunk,
            decoding_chunk_size=decoding_chunk_size,
            static_chunk_size=self.static_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            rng=chunk_rng)
        # Precompute the attention mask as an ADDITIVE bias once; all N
        # layers reuse it, replacing two boolean select passes over
        # [B, H, T, T] per layer with one add (see attention._attend).
        from wenet_celoss_tpu.models.attention import NEG_INF
        att_bias = jnp.where(att_mask, 0.0, NEG_INF).astype(
            self.compute_dtype or jnp.float32)
        for layer in self.layers:
            xs = self._call_layer(layer, xs, att_bias, pos_emb, pad_mask,
                                  deterministic, train)
        if self.normalize_before:
            xs = self.after_norm(xs)
        return xs, pad_mask

    def _call_layer(self, layer, xs, att_mask, pos_emb, pad_mask,
                    deterministic, train):
        return layer(xs, att_mask, pos_emb, pad_mask,
                     deterministic=deterministic)

    # ------------------------------------------------------------------
    # Streaming
    # ------------------------------------------------------------------
    def init_cache(self, batch_size: int, required_cache_size: int,
                   dtype=jnp.float32) -> dict:
        """Fixed-shape streaming cache pytree."""
        l, b, h = self.num_blocks, batch_size, self.attention_heads
        dk = self.output_size // h
        c = max(required_cache_size, 0)
        lorder = self._conv_lorder()
        return {
            "att": jnp.zeros((l, b, h, c, 2 * dk), dtype),
            "att_len": jnp.zeros((), jnp.int32),
            "cnn": jnp.zeros((l, b, lorder, self.output_size), dtype),
            "offset": jnp.zeros((), jnp.int32),
        }

    def _conv_lorder(self) -> int:
        return 0

    def forward_chunk(self, xs: jnp.ndarray, cache: dict, *,
                      chunk_valid: Optional[jnp.ndarray] = None):
        """One streaming chunk (reference `encoder.py:181-268`).

        Args:
          xs: [B, T_in, F] raw features for this chunk (with right context).
          cache: pytree from init_cache (traced through jit).
          chunk_valid: optional [B] int — number of valid OUTPUT frames of
            this chunk per utterance. Batched streaming feeds full windows
            to every utterance; masking keys past each utterance's end
            keeps its last valid frames from attending to padding garbage
            (the reference streams batch=1 with a truncated final chunk,
            `encoder.py:310-316`, so it never sees this case).
        Returns: (ys [B, T_out, D], new_cache)
        """
        xs = self._apply_cmvn(xs)
        offset = cache["offset"]
        xs, _, _ = self.embed(
            xs, jnp.full((xs.shape[0],), xs.shape[1], jnp.int32),
            offset=offset, deterministic=True)
        t_chunk = xs.shape[1]
        c = cache["att"].shape[3]
        att_mask = None
        if chunk_valid is not None:
            cur_ok = jnp.arange(t_chunk)[None, :] < chunk_valid[:, None]
            key_ok = jnp.concatenate(
                [jnp.ones((xs.shape[0], c), bool), cur_ok], axis=1)
            att_mask = key_ok[:, None, :]        # [B, 1(q), C+T]
        # Rel-pos table over (cache ++ chunk) keys.
        pos = (offset - c) + jnp.arange(c + t_chunk)
        pos_emb = sinusoid_table(pos[None, :], self.output_size
                                 ).astype(xs.dtype)
        new_att = []
        new_cnn = []
        att_len = cache["att_len"]
        new_len = att_len
        for i, layer in enumerate(self.layers):
            xs, a, new_len, cnn = self._call_layer_with_cache(
                layer, xs, cache["att"][i], att_len, cache["cnn"][i],
                pos_emb, att_mask)
            new_att.append(a)
            new_cnn.append(cnn)
        if self.normalize_before:
            xs = self.after_norm(xs)
        new_cache = {
            "att": jnp.stack(new_att),
            "att_len": new_len,
            "cnn": jnp.stack(new_cnn),
            "offset": offset + t_chunk,
        }
        return xs, new_cache

    def _call_layer_with_cache(self, layer, xs, att_cache, att_len,
                               cnn_cache, pos_emb, att_mask=None):
        out, new_att, new_len = layer.forward_with_cache(
            xs, att_cache, att_len, att_mask, pos_emb)
        return out, new_att, new_len, cnn_cache


class TransformerEncoder(BaseEncoder):
    """Parity with reference `encoder.py:329-370`."""

    def _make_layers(self):
        return [TransformerEncoderLayer(
            self.output_size, self.attention_heads, self.linear_units,
            self.dropout_rate, self.attention_dropout_rate,
            self.normalize_before, self.concat_after,
            dtype=self.compute_dtype,
            name=f"layer_{i}") for i in range(self.num_blocks)]


class ConformerEncoder(BaseEncoder):
    """Parity with reference `encoder.py:372-462`."""
    positionwise_conv_kernel_size: int = 1
    macaron_style: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    activation_type: str = "swish"
    use_cnn_module: bool = True
    cnn_module_kernel: int = 15
    causal: bool = False
    cnn_module_norm: str = "batch_norm"

    def _make_layers(self):
        return [ConformerEncoderLayer(
            self.output_size, self.attention_heads, self.linear_units,
            self.dropout_rate, self.attention_dropout_rate,
            self.normalize_before,
            macaron_style=self.macaron_style,
            use_cnn_module=self.use_cnn_module,
            cnn_module_kernel=self.cnn_module_kernel,
            cnn_module_norm=self.cnn_module_norm,
            causal=self.causal,
            pos_enc_layer_type=self.pos_enc_layer_type,
            activation=self.activation_type,
            dtype=self.compute_dtype,
            name=f"layer_{i}") for i in range(self.num_blocks)]

    def _conv_lorder(self) -> int:
        return self.cnn_module_kernel - 1 if (self.use_cnn_module and
                                              self.causal) else 0

    def _call_layer(self, layer, xs, att_mask, pos_emb, pad_mask,
                    deterministic, train):
        return layer(xs, att_mask, pos_emb, pad_mask,
                     deterministic=deterministic, train=train)

    def _call_layer_with_cache(self, layer, xs, att_cache, att_len,
                               cnn_cache, pos_emb, att_mask=None):
        if self.use_cnn_module and not self.causal:
            raise NotImplementedError(
                "streaming a conformer with a CNN module requires causal=True")
        return layer.forward_with_cache(
            xs, att_cache, att_len, cnn_cache, att_mask, pos_emb)


ENCODER_CLASSES = {
    "transformer": TransformerEncoder,
    "conformer": ConformerEncoder,
}
