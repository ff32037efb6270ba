"""Attention rescoring of CTC-prefix-beam n-best lists.

Parity with reference ``wenet/transformer/asr_model.py:443-539``
(attention_rescoring): run the CTC prefix beam search, teacher-force the
attention decoder (L2R and, for U2++, R2L) over each of the n-best, and
re-rank by ``att_score (+ reverse) + ctc_weight * ctc_score``. Fully
batched: the [B, N] n-best flattens to [B*N] for one decoder call.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import IGNORE_ID, add_sos_eos, reverse_pad_list


def score_hyps_with_decoder(decoder_scores_fn: Callable, encoder_out,
                            enc_pad_mask, hyp_tokens, hyp_lens, sos: int,
                            eos: int, reverse_weight: float = 0.0):
    """Compute attention scores of hypothesis lists.

    Args:
      decoder_scores_fn: (memory, memory_pad_mask, hyps_in, hyps_lens,
                          r_hyps_in, reverse_weight) -> (l_logp, r_logp)
        each [B*N, U+1, V] log-softmaxed.
      encoder_out: [B, T, D]; hyp_tokens: [B, N, U]; hyp_lens: [B, N].
    Returns: att_scores [B, N] (already reverse-blended).
    """
    b, n, u = hyp_tokens.shape
    flat = hyp_tokens.reshape(b * n, u)
    flat_lens = hyp_lens.reshape(b * n)
    memory = jnp.repeat(encoder_out, n, axis=0)
    memory_mask = jnp.repeat(enc_pad_mask, n, axis=0)

    # Mark padding as ignore for score masking.
    pad_mask = jnp.arange(u)[None, :] < flat_lens[:, None]
    toks = jnp.where(pad_mask, flat, IGNORE_ID)
    hyps_in, hyps_out = add_sos_eos(toks, flat_lens, sos, eos, IGNORE_ID)
    r_toks = reverse_pad_list(toks, flat_lens, float(IGNORE_ID))
    r_hyps_in, r_hyps_out = add_sos_eos(r_toks.astype(toks.dtype), flat_lens,
                                        sos, eos, IGNORE_ID)

    l_logp, r_logp = decoder_scores_fn(memory, memory_mask, hyps_in,
                                       flat_lens + 1, r_hyps_in,
                                       reverse_weight)

    def seq_score(logp, targets):
        picked = jnp.take_along_axis(
            logp, jnp.maximum(targets, 0)[..., None], axis=-1)[..., 0]
        mask = targets != IGNORE_ID
        return jnp.sum(jnp.where(mask, picked, 0.0), axis=-1)

    l_score = seq_score(l_logp, hyps_out)
    if reverse_weight > 0.0:
        r_score = seq_score(r_logp, r_hyps_out)
        score = (1.0 - reverse_weight) * l_score + reverse_weight * r_score
    else:
        score = l_score
    return score.reshape(b, n)


def attention_rescoring(decoder_scores_fn: Callable, encoder_out,
                        enc_pad_mask, nbest: dict, sos: int, eos: int,
                        ctc_weight: float = 0.0,
                        reverse_weight: float = 0.0):
    """Re-rank a ctc_prefix_beam_search result dict.

    Returns (best_tokens [B, U], best_lens [B], total_scores [B, N]).
    """
    att = score_hyps_with_decoder(
        decoder_scores_fn, encoder_out, enc_pad_mask, nbest["tokens"],
        nbest["lens"], sos, eos, reverse_weight)
    total = att + ctc_weight * nbest["scores"]
    best = jnp.argmax(total, axis=1)
    best_tokens = jnp.take_along_axis(
        nbest["tokens"], best[:, None, None], axis=1)[:, 0]
    best_lens = jnp.take_along_axis(nbest["lens"], best[:, None],
                                    axis=1)[:, 0]
    return best_tokens, best_lens, total
