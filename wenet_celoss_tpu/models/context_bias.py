"""Contextual biasing (hotword) module — the fork's core capability.

Parity with reference ``wenet/transformer/context_bias.py:30-399``:
- Phrase extractors: BLSTM (final fwd/bwd h+c concat → [N, 4e],
  `context_bias.py:30-66`), LSTM (h+c concat → linear → 4e, :68-106),
  Transformer (CLS-token encoder → linear 4e, :108-157).
- Context encoder over the phrase list: 'linear' (Dense+LN) or
  'transformer' (no-pos TransformerEncoder), producing bias_hidden
  [1, N, e] (:213-251).
- Cross-attention recombination of encoder / predictor streams with
  bias_hidden, concat + combine + LN (:366-381).
- Hotword-presence classifier heads: 'pred', 'both' (dec→enc cross
  attention in a unified hw space), 'sep' (:382-399).

TPU redesign: the BLSTM runs as masked `lax.scan`s (state freezes past each
phrase's length — same effect as pack_padded_sequence), and the whole module
is batched over the phrase list with static [N_max, L_max] shapes so the
training step never retraces as the hotword list changes size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.models.attention import MultiHeadedAttention
from wenet_celoss_tpu.models.encoder import TransformerEncoder
from wenet_celoss_tpu.utils.common import reverse_pad_list
from wenet_celoss_tpu.utils.mask import make_non_pad_mask


class _MaskedLSTM(nn.Module):
    """Stacked LSTM whose state freezes beyond each sequence's length,
    returning the final (h, c) of the last layer."""
    hidden: int
    num_layers: int

    def setup(self):
        self.cells = [nn.OptimizedLSTMCell(features=self.hidden,
                                           name=f"lstm_{i}")
                      for i in range(self.num_layers)]

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        """x [N, L, E], lengths [N] → (h [N, H], c [N, H]) of last layer."""
        n = x.shape[0]
        h_fin = c_fin = None
        for cell in self.cells:
            def step(cell, carry, inp):
                (c, h), t = carry
                xt = inp
                (new_c, new_h), out = cell((c, h), xt)
                active = (t < lengths)[:, None]
                c = jnp.where(active, new_c, c)
                h = jnp.where(active, new_h, h)
                return ((c, h), t + 1), h

            init = ((jnp.zeros((n, self.hidden), x.dtype),
                     jnp.zeros((n, self.hidden), x.dtype)),
                    jnp.zeros((), jnp.int32))
            ((c, h), _), outs = nn.scan(
                step, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=1, out_axes=1)(
                    cell, init, x)
            x = outs
            h_fin, c_fin = h, c
        return h_fin, c_fin


class BLSTMExtractor(nn.Module):
    """[N, L] phrases → [N, 4e] (fwd h, bwd h, fwd c, bwd c)."""
    vocab_size: int
    hidden_dim: int
    num_layers: int = 2

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_dim)
        self.fwd = _MaskedLSTM(self.hidden_dim, self.num_layers, name="fwd")
        self.bwd = _MaskedLSTM(self.hidden_dim, self.num_layers, name="bwd")

    def __call__(self, phrases: jnp.ndarray, lengths: jnp.ndarray):
        x = self.embed(jnp.maximum(phrases, 0))
        h_f, c_f = self.fwd(x, lengths)
        rev = reverse_pad_list(jnp.maximum(phrases, 0), lengths, 0.0)
        x_b = self.embed(rev.astype(jnp.int32))
        h_b, c_b = self.bwd(x_b, lengths)
        return jnp.concatenate([h_f, h_b, c_f, c_b], axis=-1)


class LSTMExtractor(nn.Module):
    """[N, L] → [N, 4e] via final (h, c) concat + linear."""
    vocab_size: int
    hidden_dim: int
    num_layers: int = 2

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_dim)
        self.rnn = _MaskedLSTM(self.hidden_dim, self.num_layers, name="rnn")
        self.linear = nn.Dense(self.hidden_dim * 4)

    def __call__(self, phrases: jnp.ndarray, lengths: jnp.ndarray):
        x = self.embed(jnp.maximum(phrases, 0))
        h, c = self.rnn(x, lengths)
        return self.linear(jnp.concatenate([h, c], axis=-1))


class TransformerExtractor(nn.Module):
    """CLS-token transformer phrase encoder → [N, 4e]
    (reference `context_bias.py:108-157`)."""
    vocab_size: int
    hidden_dim: int
    num_layers: int = 3
    attention_heads: int = 8

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden_dim)
        self.encoder = TransformerEncoder(
            input_size=self.hidden_dim, output_size=self.hidden_dim,
            attention_heads=self.attention_heads,
            linear_units=self.hidden_dim * 4, num_blocks=self.num_layers,
            dropout_rate=0.1, input_layer="linear",
            pos_enc_layer_type="abs_pos", name="encoder")
        self.linear = nn.Dense(self.hidden_dim * 4)

    def __call__(self, phrases: jnp.ndarray, lengths: jnp.ndarray):
        cls = jnp.ones((phrases.shape[0], 1), phrases.dtype)
        toks = jnp.concatenate([cls, jnp.maximum(phrases, 0)], axis=1)
        x = self.embed(toks)
        out, _ = self.encoder(x, lengths + 1)
        return self.linear(out[:, 0, :])


EXTRACTOR_CLASSES = {
    "BLSTM": BLSTMExtractor,
    "LSTM": LSTMExtractor,
    "transformer": TransformerExtractor,
}


class ContextBias(nn.Module):
    output_size: int
    vocab_size: int
    embedding_size: int
    num_layers: int = 2
    attention_heads: int = 4
    linear_units: int = 512
    num_block: int = 4
    dropout_rate: float = 0.0
    bias_encoder_type: str = "linear"     # linear | transformer
    context_extractor: str = "BLSTM"      # BLSTM | LSTM | transformer
    num_labels: int = 2
    unified_hw_odim: int = 100
    unified_hw_heads: int = 4

    def setup(self):
        ext_cls = EXTRACTOR_CLASSES[self.context_extractor]
        if self.context_extractor == "transformer":
            self.extractor = ext_cls(self.vocab_size, self.embedding_size,
                                     name="extractor")
        else:
            self.extractor = ext_cls(self.vocab_size, self.embedding_size,
                                     self.num_layers, name="extractor")
        if self.bias_encoder_type == "transformer":
            self.context_encoder = TransformerEncoder(
                input_size=self.embedding_size * 4,
                output_size=self.embedding_size,
                attention_heads=self.attention_heads,
                linear_units=self.linear_units,
                num_blocks=self.num_block,
                dropout_rate=self.dropout_rate,
                positional_dropout_rate=0.0,
                attention_dropout_rate=0.0,
                input_layer="linear",
                pos_enc_layer_type="no_pos",
                name="context_encoder")
        else:
            self.context_proj = nn.Dense(self.embedding_size)
            self.context_norm = nn.LayerNorm(epsilon=1e-5)

        self.encoder_bias = MultiHeadedAttention(
            self.attention_heads, self.embedding_size, 0.0)
        self.predictor_bias = MultiHeadedAttention(
            self.attention_heads, self.embedding_size, 0.0)
        self.hw_bias = MultiHeadedAttention(
            self.unified_hw_heads, self.unified_hw_odim, 0.0)

        self.encoder_bias_combine = nn.Dense(self.embedding_size)
        self.encoder_bias_bias_norm = nn.LayerNorm(epsilon=1e-5)
        self.encoder_bias_out_norm = nn.LayerNorm(epsilon=1e-5)
        self.predictor_bias_combine = nn.Dense(self.embedding_size)
        self.predictor_bias_bias_norm = nn.LayerNorm(epsilon=1e-5)
        self.predictor_bias_out_norm = nn.LayerNorm(epsilon=1e-5)
        self.hw_bias_norm = nn.LayerNorm(epsilon=1e-5)
        self.hw_output_layer = nn.Dense(self.num_labels)
        self.hw_output_layer_enc = nn.Dense(self.unified_hw_odim)
        self.hw_output_layer_dec = nn.Dense(self.unified_hw_odim)
        # 'pred' mode projects the predictor stream into the hw space
        # (the reference feeds embedding_size activations into a
        # unified_hw_odim attention, which only type-checks when the two
        # dims coincide; we make the projection explicit).
        self.hw_pred_proj = nn.Dense(self.unified_hw_odim)

    # ------------------------------------------------------------------
    def forward_bias_hidden(self, context_list: jnp.ndarray,
                            context_lengths: jnp.ndarray,
                            n_valid: Optional[jnp.ndarray] = None):
        """[N, L] phrase ids (+ [N] lengths) → bias_hidden [1, N, e].

        n_valid optionally masks trailing phrase slots (static N batching).
        """
        vec = self.extractor(context_list, context_lengths)    # [N, 4e]
        if self.bias_encoder_type == "transformer":
            n = context_list.shape[0]
            lens = (jnp.reshape(n_valid, (1,)) if n_valid is not None
                    else jnp.full((1,), n, jnp.int32))
            hidden, _ = self.context_encoder(vec[None],
                                             lens.astype(jnp.int32))
        else:
            hidden = self.context_norm(self.context_proj(vec))[None]
        return hidden                                          # [1, N, e]

    def _cross_bias(self, attn, stream, bias_hidden, n_valid):
        b = stream.shape[0]
        bias_kv = jnp.broadcast_to(
            bias_hidden, (b,) + bias_hidden.shape[1:])
        mask = None
        if n_valid is not None:
            mask = jnp.broadcast_to(
                (jnp.arange(bias_kv.shape[1]) < n_valid)[None, None, :],
                (b, 1, bias_kv.shape[1]))
        return attn(stream, bias_kv, bias_kv, mask)

    def forward_encoder_bias(self, bias_hidden, encoder_out,
                             n_valid: Optional[jnp.ndarray] = None):
        """Returns (combined encoder_out, encoder bias branch)."""
        enc_bias = self._cross_bias(self.encoder_bias, encoder_out,
                                    bias_hidden, n_valid)
        enc_bias = self.encoder_bias_bias_norm(enc_bias)
        cat = jnp.concatenate([encoder_out, enc_bias], axis=-1)
        out = self.encoder_bias_out_norm(self.encoder_bias_combine(cat))
        return out, enc_bias

    def forward_predictor_bias(self, bias_hidden, predictor_out,
                               n_valid: Optional[jnp.ndarray] = None):
        pred_bias = self._cross_bias(self.predictor_bias, predictor_out,
                                     bias_hidden, n_valid)
        pred_bias = self.predictor_bias_bias_norm(pred_bias)
        cat = jnp.concatenate([predictor_out, pred_bias], axis=-1)
        out = self.predictor_bias_out_norm(self.predictor_bias_combine(cat))
        return out, pred_bias

    # ------------------------------------------------------------------
    # Hotword-presence classifier heads
    # ------------------------------------------------------------------
    def forward_hw_pred(self, bias_hidden, predictor_out):
        """loss_mode='pred': classify from the (unbiased) predictor stream
        attending over the hotword list."""
        b = predictor_out.shape[0]
        q = self.hw_pred_proj(predictor_out)
        kv = self.hw_pred_proj(jnp.broadcast_to(
            bias_hidden, (b,) + bias_hidden.shape[1:]))
        h = self.hw_bias(q, kv, kv)
        return self.hw_output_layer(self.hw_bias_norm(h))

    def forward_hw_pred_both(self, enc_bias, pred_bias):
        """loss_mode='both': dec-hw queries attend over enc-hw keys
        (reference `context_bias.py:388-394`). → [B, U+1, num_labels]"""
        enc_hw = self.hw_output_layer_enc(enc_bias)
        dec_hw = self.hw_output_layer_dec(pred_bias)
        h = self.hw_bias(dec_hw, enc_hw, enc_hw)
        return self.hw_output_layer(self.hw_bias_norm(h))

    def forward_hw_pred_both_sep(self, enc_bias, pred_bias):
        """loss_mode='sep': independent enc/dec hw projections
        (reference `context_bias.py:395-399`)."""
        return (self.hw_output_layer_enc(enc_bias),
                self.hw_output_layer_dec(pred_bias))
