"""Batched attention-decoder beam search.

Parity with reference ``wenet/transformer/asr_model.py:175-279``
(``recognize``): maintain [B, N] hypotheses as flat [B*N] tensors, two
top-k's per step, eos end-flag handling. Here the whole loop is a
`lax.scan` over a fixed max_len with a fixed-size token buffer — one
compiled program per (B, N, max_len) shape.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.utils.common import LOG_ZERO


def attention_beam_search(one_step: Callable, encoder_out, enc_pad_mask,
                          sos: int, eos: int, beam: int, max_len: int):
    """Run the search.

    Args:
      one_step: (memory [B*N, T, D], memory_pad_mask [B*N, T],
                 ys_buffer [B*N, L], pos) -> log-probs [B*N, V].
      encoder_out: [B, T, D]; enc_pad_mask: [B, T].
    Returns: (hyps [B, N, max_len] WITHOUT sos, lens [B, N],
              scores [B, N]) sorted best-first.
    """
    b, t, d = encoder_out.shape
    n = beam
    memory = jnp.repeat(encoder_out, n, axis=0)          # [B*N, T, D]
    memory_mask = jnp.repeat(enc_pad_mask, n, axis=0)

    buf = jnp.full((b * n, max_len + 1), eos, jnp.int32)
    buf = buf.at[:, 0].set(sos)
    scores = jnp.where(jnp.arange(n)[None, :] == 0, 0.0, LOG_ZERO)
    scores = jnp.broadcast_to(scores, (b, n)).reshape(-1)  # [B*N]
    end_flag = jnp.zeros((b * n,), bool)

    def step(carry, pos):
        buf, scores, end_flag = carry
        logp = one_step(memory, memory_mask, buf, pos)     # [B*N, V]
        v = logp.shape[-1]
        # Ended hyps can only emit eos with no score change.
        eos_only = jnp.full((v,), LOG_ZERO).at[eos].set(0.0)
        logp = jnp.where(end_flag[:, None], eos_only[None, :], logp)

        top_lp, top_tok = jax.lax.top_k(logp, n)           # [B*N, N]
        cand = scores[:, None] + top_lp                    # [B*N, N]
        cand = cand.reshape(b, n * n)
        best, best_idx = jax.lax.top_k(cand, n)            # [B, N]
        parent = best_idx // n                             # [B, N] in 0..N-1
        k_idx = best_idx % n

        # Gather parents (flat indices) and their chosen tokens.
        parent_flat = (jnp.arange(b)[:, None] * n + parent).reshape(-1)
        tok = jnp.take_along_axis(
            top_tok[parent_flat], k_idx.reshape(-1)[:, None], axis=1)[:, 0]
        new_buf = buf[parent_flat]
        new_buf = new_buf.at[:, pos + 1].set(
            jnp.where(end_flag[parent_flat], eos, tok))
        new_end = end_flag[parent_flat] | (tok == eos)
        return (new_buf, best.reshape(-1), new_end), None

    (buf, scores, end_flag), _ = jax.lax.scan(
        step, (buf, scores, end_flag), jnp.arange(max_len))

    hyps = buf[:, 1:].reshape(b, n, max_len)
    scores = scores.reshape(b, n)
    # Lengths: position of first eos.
    is_eos = hyps == eos
    lens = jnp.where(is_eos.any(axis=-1),
                     jnp.argmax(is_eos, axis=-1), max_len)
    order = jnp.argsort(-scores, axis=1)
    hyps = jnp.take_along_axis(hyps, order[..., None], axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return hyps, lens, scores


def attention_hyps_to_lists(hyps, lens, eos: int):
    """Host-side top-1 extraction."""
    hyps, lens = np.asarray(hyps), np.asarray(lens)
    out = []
    for bi in range(hyps.shape[0]):
        out.append([int(x) for x in hyps[bi, 0, : lens[bi, 0]]])
    return out
