"""Hybrid CTC + attention ASR model (U2/U2++).

Parity with reference ``wenet/transformer/asr_model.py:34-728``: joint loss
``ctc_weight * ctc + (1 - ctc_weight) * att`` where the attention loss mixes
L2R and (optional U2++) R2L decoders by ``reverse_weight``
(`asr_model.py:69-148`). Decode algorithms live in ``decode/`` as batched
jit-able searches; this module exposes the primitive forward methods they
need (`encode`, `ctc_logprobs`, `decoder_scores`, `decoder_one_step`) —
the functional analog of the reference's TorchScript export surface
(`asr_model.py:541-728`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.models.ctc_head import CTC
from wenet_celoss_tpu.models.decoder import BiTransformerDecoder
from wenet_celoss_tpu.models.label_smoothing import label_smoothing_loss
from wenet_celoss_tpu.utils.common import (
    IGNORE_ID, accuracy, add_sos_eos, reverse_pad_list)
from wenet_celoss_tpu.utils.mask import make_non_pad_mask, subsequent_mask


class ASRModel(nn.Module):
    vocab_size: int
    encoder: nn.Module
    decoder: nn.Module
    ctc: nn.Module
    ctc_weight: float = 0.5
    ignore_id: int = IGNORE_ID
    reverse_weight: float = 0.0
    lsm_weight: float = 0.1
    length_normalized_loss: bool = False

    @property
    def sos(self) -> int:
        return self.vocab_size - 1

    @property
    def eos(self) -> int:
        return self.vocab_size - 1

    def __call__(self, speech, speech_lengths, text, text_lengths, *,
                 deterministic: bool = True, train: bool = False,
                 chunk_rng: jax.Array | None = None) -> Dict[str, Any]:
        """Training forward: returns {'loss', 'loss_att', 'loss_ctc', 'acc'}."""
        encoder_out, enc_pad_mask = self.encoder(
            speech, speech_lengths, deterministic=deterministic, train=train,
            chunk_rng=chunk_rng)
        encoder_lens = jnp.sum(enc_pad_mask.astype(jnp.int32), axis=1)

        loss_att = jnp.zeros((), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        if self.ctc_weight < 1.0:
            loss_att, acc = self._calc_att_loss(
                encoder_out, enc_pad_mask, text, text_lengths,
                deterministic=deterministic)
        loss_ctc = jnp.zeros((), jnp.float32)
        if self.ctc_weight > 0.0:
            loss_ctc = self.ctc(encoder_out, encoder_lens, text, text_lengths,
                                deterministic=deterministic)
        loss = self.ctc_weight * loss_ctc + (1 - self.ctc_weight) * loss_att
        return {"loss": loss, "loss_att": loss_att, "loss_ctc": loss_ctc,
                "acc": acc}

    def _calc_att_loss(self, encoder_out, enc_pad_mask, ys_pad, ys_lens, *,
                       deterministic=True):
        ys_in, ys_out = add_sos_eos(ys_pad, ys_lens, self.sos, self.eos,
                                    self.ignore_id)
        r_ys = reverse_pad_list(ys_pad, ys_lens, float(self.ignore_id))
        r_ys_in, r_ys_out = add_sos_eos(r_ys.astype(ys_pad.dtype), ys_lens,
                                        self.sos, self.eos, self.ignore_id)
        l_logits, r_logits = self.decoder(
            encoder_out, enc_pad_mask, ys_in, ys_lens + 1, r_ys_in,
            self.reverse_weight, deterministic=deterministic)
        loss_l = label_smoothing_loss(
            l_logits, ys_out, self.lsm_weight, self.length_normalized_loss,
            self.ignore_id)
        loss = loss_l
        if self.reverse_weight > 0.0:
            loss_r = label_smoothing_loss(
                r_logits, r_ys_out, self.lsm_weight,
                self.length_normalized_loss, self.ignore_id)
            loss = (1 - self.reverse_weight) * loss_l \
                + self.reverse_weight * loss_r
        return loss, accuracy(l_logits, ys_out, self.ignore_id)

    # ------------------------------------------------------------------
    # Decode-support methods (called via model.apply(..., method=...))
    # ------------------------------------------------------------------
    def encode(self, speech, speech_lengths, decoding_chunk_size: int = -1,
               num_decoding_left_chunks: int = -1):
        """Full-context (or fixed-chunk-mask) encoding for offline decode."""
        encoder_out, enc_pad_mask = self.encoder(
            speech, speech_lengths,
            decoding_chunk_size=decoding_chunk_size,
            num_decoding_left_chunks=num_decoding_left_chunks,
            deterministic=True)
        return encoder_out, enc_pad_mask

    def ctc_logprobs(self, encoder_out):
        return self.ctc.log_softmax(encoder_out)

    def encode_ctc(self, speech, speech_lengths,
                   decoding_chunk_size: int = -1,
                   num_decoding_left_chunks: int = -1):
        encoder_out, enc_pad_mask = self.encode(
            speech, speech_lengths, decoding_chunk_size,
            num_decoding_left_chunks)
        return encoder_out, enc_pad_mask, self.ctc.log_softmax(encoder_out)

    def decoder_scores(self, encoder_out, enc_pad_mask, hyps_in, hyps_lens,
                       r_hyps_in, reverse_weight: float = 0.0):
        """Teacher-forced log-probs for n-best rescoring
        (reference forward_attention_decoder, `asr_model.py:658-728`)."""
        l_logits, r_logits = self.decoder(
            encoder_out, enc_pad_mask, hyps_in, hyps_lens, r_hyps_in,
            reverse_weight, deterministic=True)
        return (nn.log_softmax(l_logits.astype(jnp.float32), axis=-1),
                nn.log_softmax(r_logits.astype(jnp.float32), axis=-1))

    def decoder_one_step(self, memory, memory_pad_mask, ys_buffer, pos):
        return self.decoder.forward_one_step(memory, memory_pad_mask,
                                             ys_buffer, pos)

    def encoder_init_cache(self, batch_size: int, required_cache_size: int):
        return self.encoder.init_cache(batch_size, required_cache_size)

    def encoder_forward_chunk(self, xs, cache, chunk_valid=None):
        return self.encoder.forward_chunk(xs, cache,
                                          chunk_valid=chunk_valid)

    def encoder_forward_chunk_ctc(self, xs, cache, chunk_valid=None):
        ys, new_cache = self.encoder.forward_chunk(
            xs, cache, chunk_valid=chunk_valid)
        return ys, self.ctc.log_softmax(ys), new_cache
