"""CTC loss — log-domain forward algorithm as a `lax.scan` over time.

Replaces the reference's use of ``torch.nn.CTCLoss`` (reference
`wenet/transformer/ctc.py:21-65`). Fully batched, shape-static, and
differentiable by JAX autodiff through the scan (XLA turns the backward pass
into the standard beta recurrence). Per-sample lengths are handled by
gathering the terminal alphas at each utterance's final frame rather than by
dynamic shapes.

Also provides Viterbi forced alignment over the same blank-interleaved label
topology (parity with reference `wenet/utils/ctc_util.py:27-83`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import LOG_ZERO


def _interleave_blanks(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[B, U] → [B, 2U+1] = (blank, y1, blank, y2, ..., yU, blank)."""
    b, u = labels.shape
    s = 2 * u + 1
    k = jnp.arange(s)
    lab = jnp.where((k % 2) == 1, labels[:, jnp.minimum(k // 2, u - 1)] if u > 0
                    else blank, blank)
    if u == 0:
        lab = jnp.full((b, s), blank, labels.dtype)
    return lab


@partial(jax.jit, static_argnames=("blank",))
def ctc_loss(log_probs: jnp.ndarray, labels: jnp.ndarray,
             input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
             blank: int = 0) -> jnp.ndarray:
    """Per-utterance CTC negative log-likelihood.

    Args:
      log_probs: [B, T, V] log-softmax outputs.
      labels: [B, U] (padding value irrelevant; masked by label_lengths).
      input_lengths: [B] frames, label_lengths: [B] label counts.
    Returns: [B] loss = -log p(labels | log_probs).
    """
    b, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s = 2 * u_max + 1

    ext = _interleave_blanks(labels, blank)                      # [B, S]
    # Whether a diagonal skip (k-2 → k) is allowed: ext[k] != blank and
    # ext[k] != ext[k-2].
    ext_m2 = jnp.concatenate(
        [jnp.full((b, 2), blank, ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (ext != blank) & (ext != ext_m2)                  # [B, S]
    k = jnp.arange(s)[None, :]
    in_range = k < (2 * label_lengths[:, None] + 1)              # valid states

    # Emission log-prob per state per frame: [T, B, S]. One-hot matmul
    # instead of take_along_axis — a V-axis gather's backward is an XLA
    # scatter, which is an order of magnitude slower than this batched
    # matmul on TPU (profiled 26.4ms vs ~1ms at B=256, T=127, V=1024).
    onehot = jax.nn.one_hot(ext, log_probs.shape[2],
                            dtype=log_probs.dtype)               # [B, S, V]
    emit = jnp.einsum("btv,bsv->bts", log_probs, onehot,
                      preferred_element_type=jnp.float32)        # [B, T, S]
    emit = jnp.moveaxis(emit, 1, 0)

    alpha0 = jnp.full((b, s), LOG_ZERO)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    if u_max > 0:
        has_label = label_lengths > 0
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(has_label, emit[0, :, 1], LOG_ZERO))
    alpha0 = jnp.where(in_range, alpha0, LOG_ZERO)

    def step(alpha, emit_t):
        prev1 = jnp.concatenate(
            [jnp.full((b, 1), LOG_ZERO), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate(
            [jnp.full((b, 2), LOG_ZERO), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, LOG_ZERO)
        new = jnp.logaddexp(jnp.logaddexp(alpha, prev1), prev2) + emit_t
        new = jnp.where(in_range, new, LOG_ZERO)
        return new, new

    _, alphas = jax.lax.scan(step, alpha0, emit[1:],
                             unroll=8)                       # [T-1, B, S]
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)     # [T, B, S]

    # Terminal: at t = input_length-1, sum states 2U and 2U-1.
    t_idx = jnp.maximum(input_lengths - 1, 0)                    # [B]
    alpha_T = alphas[t_idx, jnp.arange(b)]                       # [B, S]
    last = 2 * label_lengths                                     # [B]
    a_end = jnp.take_along_axis(alpha_T, last[:, None], axis=1)[:, 0]
    a_end2 = jnp.where(
        label_lengths > 0,
        jnp.take_along_axis(alpha_T, jnp.maximum(last - 1, 0)[:, None],
                            axis=1)[:, 0], LOG_ZERO)
    ll = jnp.logaddexp(a_end, a_end2)
    return -ll


@partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(log_probs: jnp.ndarray, labels: jnp.ndarray,
                     input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                     blank: int = 0) -> jnp.ndarray:
    """Batched Viterbi alignment over the CTC topology.

    Returns [B, T] state-symbol ids: the most-likely blank-interleaved path
    (parity with reference `wenet/utils/ctc_util.py:27-83`, which is
    single-utterance numpy; here a batched max-plus scan with backpointers).
    """
    b, t_max, _ = log_probs.shape
    u_max = labels.shape[1]
    s = 2 * u_max + 1

    ext = _interleave_blanks(labels, blank)
    ext_m2 = jnp.concatenate(
        [jnp.full((b, 2), blank, ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (ext != blank) & (ext != ext_m2)
    k = jnp.arange(s)[None, :]
    in_range = k < (2 * label_lengths[:, None] + 1)

    emit = jnp.take_along_axis(
        log_probs, ext[:, None, :].repeat(t_max, 1), axis=2)
    emit = jnp.moveaxis(emit, 1, 0)                              # [T, B, S]

    alpha0 = jnp.full((b, s), LOG_ZERO)
    alpha0 = alpha0.at[:, 0].set(emit[0, :, 0])
    if u_max > 0:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(label_lengths > 0, emit[0, :, 1], LOG_ZERO))
    alpha0 = jnp.where(in_range, alpha0, LOG_ZERO)

    def step(alpha, emit_t):
        prev1 = jnp.concatenate(
            [jnp.full((b, 1), LOG_ZERO), alpha[:, :-1]], axis=1)
        prev2 = jnp.concatenate(
            [jnp.full((b, 2), LOG_ZERO), alpha[:, :-2]], axis=1)
        prev2 = jnp.where(can_skip, prev2, LOG_ZERO)
        stacked = jnp.stack([alpha, prev1, prev2], axis=0)       # [3, B, S]
        best = jnp.argmax(stacked, axis=0)                       # [B, S]
        new = jnp.max(stacked, axis=0) + emit_t
        new = jnp.where(in_range, new, LOG_ZERO)
        return new, (new, best)

    _, (alphas, bps) = jax.lax.scan(step, alpha0, emit[1:], unroll=8)
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)     # [T, B, S]
    bps = jnp.concatenate(
        [jnp.zeros((1, b, s), bps.dtype), bps], axis=0)          # [T, B, S]

    # Pick terminal state at each utterance's last frame.
    t_idx = jnp.maximum(input_lengths - 1, 0)
    alpha_T = alphas[t_idx, jnp.arange(b)]
    last = 2 * label_lengths
    a_end = jnp.take_along_axis(alpha_T, last[:, None], axis=1)[:, 0]
    a_end2 = jnp.where(
        label_lengths > 0,
        jnp.take_along_axis(alpha_T, jnp.maximum(last - 1, 0)[:, None],
                            axis=1)[:, 0], LOG_ZERO)
    state = jnp.where(a_end >= a_end2, last, jnp.maximum(last - 1, 0))  # [B]

    # Backtrace from t = input_length-1 down to 0; frames beyond length
    # emit state 0 (leading blank).
    def back(carry, t):
        st = carry                                               # [B]
        active = t <= t_idx
        sym = jnp.take_along_axis(ext, st[:, None], axis=1)[:, 0]
        move = bps[t, jnp.arange(b)]
        delta = jnp.take_along_axis(move, st[:, None], axis=1)[:, 0]
        st_next = jnp.where(active & (t > 0), st - delta, st)
        return st_next, jnp.where(active, sym, blank)

    _, path = jax.lax.scan(back, state, jnp.arange(t_max)[::-1],
                           unroll=8)
    return path[::-1].T                                          # [B, T]
