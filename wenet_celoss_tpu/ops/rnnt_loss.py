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


def _beta_scan(blank_lp: jnp.ndarray, emit_lp: jnp.ndarray,
               input_lengths: jnp.ndarray, label_lengths: jnp.ndarray):
    """Reverse wavefront: beta[t, u] = log P(reach the final blank | t, u).

    beta(T_b-1, U_b) starts at blank(T_b-1, U_b); invalid cells (t >= T_b
    or u > U_b) are LOG_ZERO. Returns beta [B, T, U1]; beta[0, 0] == log Z.
    """
    b, t_max, u1 = blank_lp.shape
    u_idx = jnp.arange(u1)

    t_last = (input_lengths - 1)[:, None]                 # [B, 1]
    u_last = label_lengths[:, None]                       # [B, 1]

    def step(carry, d):
        prev = carry                                      # diag d+1: [B, U1]
        t_of = d - u_idx                                  # [U1]
        # blank move: beta(t+1, u) lives on diag d+1 at the same u.
        blank_here = blank_lp[:, jnp.clip(t_of, 0, t_max - 1), u_idx]
        valid_down = (t_of[None, :] + 1) <= t_last        # t+1 < T_b
        blank_term = blank_here + jnp.where(valid_down, prev, LOG_ZERO)
        # terminal: at (T_b-1, U_b) the blank move finishes (beta=0).
        is_term = (t_of[None, :] == t_last) & (u_idx[None, :] == u_last)
        blank_term = jnp.where(is_term, blank_here, blank_term)
        # emit move: beta(t, u+1) lives on diag d+1 at u+1.
        emit_here = emit_lp[:, jnp.clip(t_of, 0, t_max - 1), u_idx]
        prev_up = jnp.concatenate(
            [prev[:, 1:], jnp.full((b, 1), LOG_ZERO)], axis=1)
        valid_right = (u_idx[None, :] + 1) <= u_last
        emit_term = emit_here + jnp.where(valid_right, prev_up, LOG_ZERO)
        new = jnp.logaddexp(blank_term, emit_term)
        valid = ((t_of[None, :] >= 0) & (t_of[None, :] <= t_last)
                 & (u_idx[None, :] <= u_last))
        new = jnp.where(valid, new, LOG_ZERO)
        return new, new

    init = jnp.full((b, u1), LOG_ZERO)
    ds = jnp.arange(t_max + u1 - 1)[::-1]
    _, diags = jax.lax.scan(step, init, ds)
    diags = diags[::-1]                                   # diag index order
    t_idx = jnp.arange(t_max)
    beta = diags[t_idx[:, None] + u_idx[None, :], :, u_idx[None, :]]
    return jnp.moveaxis(beta, -1, 0)                      # [B, T, U1]


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss_fused(logits, labels, input_lengths, label_lengths,
                    blank: int = 0):
    """rnnt_loss with a closed-form occupancy-gradient VJP.

    Numerically identical to :func:`rnnt_loss`, but backward recomputes the
    softmax from the logits instead of letting autodiff store the full
    [B, T, U+1, V] log-softmax residual — roughly halving peak HBM for the
    dominant training tensor (the reference materializes the same tensor
    through torchaudio's autograd, `transducer.py:142`).
    """
    blank_lp, emit_lp = _gather_planes(logits, labels, blank)
    alpha = _alpha_scan(blank_lp, emit_lp)
    b = logits.shape[0]
    t_lastv = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_lastv, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_lastv, label_lengths]
    return -(a_final + lp_final)


def _rnnt_fused_fwd(logits, labels, input_lengths, label_lengths, blank):
    blank_lp, emit_lp = _gather_planes(logits, labels, blank)
    alpha = _alpha_scan(blank_lp, emit_lp)
    b = logits.shape[0]
    t_lastv = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_lastv, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_lastv, label_lengths]
    loss = -(a_final + lp_final)
    return loss, (logits, labels, input_lengths, label_lengths, blank_lp,
                  emit_lp, alpha)


def _rnnt_fused_bwd(blank, res, g):
    (logits, labels, input_lengths, label_lengths, blank_lp, emit_lp,
     alpha) = res
    b, t_max, u1, v = logits.shape
    beta = _beta_scan(blank_lp, emit_lp, input_lengths, label_lengths)
    log_z = beta[:, 0, 0]                                # [B] = -loss

    t_idx = jnp.arange(t_max)[None, :, None]
    u_idx = jnp.arange(u1)[None, None, :]
    t_last = (input_lengths - 1)[:, None, None]
    u_last = label_lengths[:, None, None]
    in_lattice = (t_idx <= t_last) & (u_idx <= u_last)

    # occ_b(t,u): blank transition occupancy. beta(t+1, u); the final cell
    # (T-1, U) transitions to "done" with beta 0.
    beta_down = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((b, 1, u1), LOG_ZERO)], axis=1)
    beta_down = jnp.where((t_idx == t_last) & (u_idx == u_last),
                          0.0, jnp.where(t_idx < t_last, beta_down,
                                         LOG_ZERO))
    occ_b = jnp.exp(jnp.where(
        in_lattice, alpha + blank_lp + beta_down - log_z[:, None, None],
        LOG_ZERO))
    # occ_e(t,u): emit transition occupancy (u < U).
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((b, t_max, 1), LOG_ZERO)], axis=2)
    occ_e = jnp.exp(jnp.where(
        in_lattice & (u_idx < u_last),
        alpha + emit_lp + beta_right - log_z[:, None, None], LOG_ZERO))

    # dL/dlogits = softmax * (occ_b + occ_e) - occ_b * 1[blank]
    #              - occ_e * 1[y_u]   (per (t, u) cell)
    sm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tot = (occ_b + occ_e)[..., None]
    grad = sm * tot
    grad = grad.at[..., blank].add(-occ_b)
    u = u1 - 1
    if u > 0:
        lab = jnp.concatenate(
            [labels[:, :u], jnp.zeros((b, 1), labels.dtype)], axis=1)
        onehot = jax.nn.one_hot(lab, v, dtype=grad.dtype)  # [B, U1, V]
        grad = grad - onehot[:, None, :, :] * occ_e[..., None]
    grad = grad * g[:, None, None, None]
    return (grad.astype(logits.dtype), None, None, None)


rnnt_loss_fused.defvjp(_rnnt_fused_fwd, _rnnt_fused_bwd)


@partial(jax.jit, static_argnames=("blank",))
def rnnt_loss_simple(am: jnp.ndarray, lm: jnp.ndarray, labels: jnp.ndarray,
                     input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                     blank: int = 0) -> jnp.ndarray:
    """k2-style "simple" transducer loss over a factored joint.

    Capability parity with the fork's ``transducer_k2_loss.py:149``
    (k2.rnnt_loss_simple): the joint is the additive factorization
    ``logit(v|t,u) = am[t,v] + lm[u,v]`` with NO joint network, so the
    [B,T,U,V] tensor never exists. The log-softmax denominator

        denom[t,u] = logsumexp_v(am[t,v] + lm[u,v])
                   = log( exp(am) @ exp(lm)^T )   (max-shifted)

    is ONE MXU matmul — the TPU-native formulation. O(B·T·U + B·(T+U)·V)
    memory and compute, ideal as a large-vocab pretraining/pruning loss.

    Args:
      am: [B, T, V] encoder-side logits; lm: [B, U+1, V] predictor-side.
    Returns: [B] negative log-likelihood.
    """
    b, t_max, v = am.shape
    u1 = lm.shape[1]
    am_max = jnp.max(am, axis=-1, keepdims=True)             # [B, T, 1]
    lm_max = jnp.max(lm, axis=-1, keepdims=True)             # [B, U1, 1]
    inner = jnp.einsum("btv,buv->btu", jnp.exp(am - am_max),
                       jnp.exp(lm - lm_max))
    denom = jnp.log(jnp.maximum(inner, jnp.finfo(jnp.float32).tiny)) \
        + am_max + jnp.swapaxes(lm_max, 1, 2)                # [B, T, U1]

    blank_lp = am[:, :, None, blank] + lm[:, None, :, blank] - denom
    u = u1 - 1
    if u > 0:
        lab = jnp.concatenate(
            [labels[:, :u], jnp.zeros((b, 1), labels.dtype)], axis=1)
        am_y = jnp.take_along_axis(
            am[:, :, None, :].repeat(u1, 2), lab[:, None, :, None],
            axis=3)[..., 0]                                   # [B, T, U1]
        lm_y = jnp.take_along_axis(lm, lab[:, :, None], axis=2)  # [B,U1,1]
        emit_lp = am_y + lm_y[:, None, :, 0] - denom
        emit_lp = emit_lp.at[..., u].set(LOG_ZERO)
    else:
        emit_lp = jnp.full((b, t_max, u1), LOG_ZERO)

    alpha = _alpha_scan(blank_lp, emit_lp)
    t_last = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_last, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_last, label_lengths]
    return -(a_final + lp_final)


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
