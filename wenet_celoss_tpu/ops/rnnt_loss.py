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


def _label_onehot(labels: jnp.ndarray, u1: int, v: int, dtype):
    """[B, U] labels → [B, U1, V] one-hot (row U is all-zero, so the
    matmul-gather yields 0 there; callers overwrite it with LOG_ZERO).
    One-hot matmuls replace V-axis take_along_axis because a gather's
    backward is an XLA scatter — order-of-magnitude slower on TPU."""
    b, u = labels.shape
    oh = jax.nn.one_hot(labels, v, dtype=dtype)            # [B, U, V]
    return jnp.concatenate([oh, jnp.zeros((b, 1, v), dtype)], axis=1) \
        if u1 == u + 1 else oh[:, :u1]


def _gather_planes(logits: jnp.ndarray, labels: jnp.ndarray, blank: int):
    """logits [B,T,U1,V], labels [B,U] → blank/emit planes [B,T,U1]."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    blank_lp = lp[..., blank]
    b, t, u1, v = lp.shape
    u = u1 - 1
    if u == 0:
        emit_lp = jnp.full((b, t, u1), LOG_ZERO)
    else:
        onehot = _label_onehot(labels, u1, v, lp.dtype)
        emit_lp = jnp.einsum("btuv,buv->btu", lp, onehot,
                             preferred_element_type=jnp.float32)
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
    _, diags = jax.lax.scan(step, init, jnp.arange(t_max + u1 - 1),
                            unroll=8)
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
    _, diags = jax.lax.scan(step, init, ds, unroll=8)
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


# ---------------------------------------------------------------------------
# Streaming-V loss: the [B, T, U+1, V] joint is NEVER materialized.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def rnnt_loss_planes(blank_lp, emit_lp, input_lengths, label_lengths):
    """Transducer loss given the two [B, T, U+1] log-prob planes.

    Closed-form VJP: dL/d blank_lp = -occ_b, dL/d emit_lp = -occ_e
    (transition occupancies from the alpha/beta recursions). Used by
    :func:`rnnt_loss_streaming`, where upstream autodiff carries the plane
    gradients back through a rematerialized chunked joint."""
    alpha = _alpha_scan(blank_lp, emit_lp)
    b = blank_lp.shape[0]
    t_lastv = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_lastv, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_lastv, label_lengths]
    return -(a_final + lp_final)


def _occupancies(blank_lp, emit_lp, alpha, input_lengths, label_lengths):
    """Blank/emit transition occupancies [B, T, U1] (posterior expected
    counts of each lattice edge)."""
    b, t_max, u1 = blank_lp.shape
    beta = _beta_scan(blank_lp, emit_lp, input_lengths, label_lengths)
    log_z = beta[:, 0, 0]

    t_idx = jnp.arange(t_max)[None, :, None]
    u_idx = jnp.arange(u1)[None, None, :]
    t_last = (input_lengths - 1)[:, None, None]
    u_last = label_lengths[:, None, None]
    in_lattice = (t_idx <= t_last) & (u_idx <= u_last)

    beta_down = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((b, 1, u1), LOG_ZERO)], axis=1)
    beta_down = jnp.where((t_idx == t_last) & (u_idx == u_last),
                          0.0, jnp.where(t_idx < t_last, beta_down,
                                         LOG_ZERO))
    occ_b = jnp.exp(jnp.where(
        in_lattice, alpha + blank_lp + beta_down - log_z[:, None, None],
        LOG_ZERO))
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((b, t_max, 1), LOG_ZERO)], axis=2)
    occ_e = jnp.exp(jnp.where(
        in_lattice & (u_idx < u_last),
        alpha + emit_lp + beta_right - log_z[:, None, None], LOG_ZERO))
    return occ_b, occ_e


def _planes_fwd(blank_lp, emit_lp, input_lengths, label_lengths):
    alpha = _alpha_scan(blank_lp, emit_lp)
    b = blank_lp.shape[0]
    t_lastv = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_lastv, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_lastv, label_lengths]
    loss = -(a_final + lp_final)
    return loss, (blank_lp, emit_lp, input_lengths, label_lengths, alpha)


def _planes_bwd(res, g):
    blank_lp, emit_lp, input_lengths, label_lengths, alpha = res
    occ_b, occ_e = _occupancies(blank_lp, emit_lp, alpha,
                                input_lengths, label_lengths)
    gc = g[:, None, None]
    return (-occ_b * gc, -occ_e * gc, None, None)


rnnt_loss_planes.defvjp(_planes_fwd, _planes_bwd)


def _rnnt_loss_streaming_ad(enc_j: jnp.ndarray, pred_j: jnp.ndarray,
                            w_out: jnp.ndarray, b_out: jnp.ndarray,
                            labels: jnp.ndarray, input_lengths: jnp.ndarray,
                            label_lengths: jnp.ndarray, blank: int = 0,
                            activation: str = "tanh",
                            chunk: int = 16) -> jnp.ndarray:
    """Autodiff reference implementation of the streaming-V loss (see
    :func:`rnnt_loss_streaming`, the production custom-VJP version; this
    one is kept for gradient parity tests)."""
    from wenet_celoss_tpu.utils.common import get_activation
    act = get_activation(activation)
    b, t_max, h = enc_j.shape
    u1 = pred_j.shape[1]
    u = u1 - 1
    v = w_out.shape[1]
    # One-hot target matrix (row U all-zero; fixed up after the scan).
    onehot = _label_onehot(labels[:, :u], u1, v, jnp.float32)  # [B, U1, V]

    n_chunks = -(-t_max // chunk)
    t_pad = n_chunks * chunk
    if t_pad != t_max:
        enc_j = jnp.pad(enc_j, ((0, 0), (0, t_pad - t_max), (0, 0)))
    enc_chunks = enc_j.reshape(b, n_chunks, chunk, h).swapaxes(0, 1)

    # The joint matmul runs in the caller's compute dtype (bf16 under
    # mixed precision — full MXU rate) with fp32 ACCUMULATION
    # (preferred_element_type); softmax/planes/lattice stay fp32. This
    # matches the reference's AMP semantics (the joint matmul autocasts
    # to fp16 under `executor.py:92-99`) while keeping the recursion
    # numerics exact.
    b_f = b_out.astype(jnp.float32)
    w_c = w_out.astype(enc_j.dtype)   # params are fp32; cast once

    @jax.checkpoint
    def step(carry, enc_c):
        # enc_c [B, Tc, H] → planes [B, Tc, U1]; the [B, Tc, U1, V]
        # intermediate is transient (and rematerialized in backward).
        # The normalized log-softmax tensor is never formed: only its
        # blank/target rows are needed, so subtract the logsumexp from
        # those two directly (saves two full [B,Tc,U1,V] HBM passes).
        # The target row uses a one-hot matmul, not take_along_axis —
        # a V-axis gather's backward is an XLA scatter (very slow on TPU).
        hidden = act(enc_c[:, :, None, :]
                     + pred_j.astype(enc_j.dtype)[:, None, :, :])
        logits = jnp.einsum("btuh,hv->btuv", hidden, w_c,
                            preferred_element_type=jnp.float32) + b_f
        m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
        lse = jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)) + m
        blank_c = logits[..., blank] - lse
        emit_c = jnp.einsum("btuv,buv->btu", logits, onehot,
                            preferred_element_type=jnp.float32) - lse
        return carry, (blank_c, emit_c)

    _, (blank_chunks, emit_chunks) = jax.lax.scan(step, 0., enc_chunks)
    # [N, B, Tc, U1] → [B, T, U1]
    blank_lp = blank_chunks.swapaxes(0, 1).reshape(b, t_pad, u1)[:, :t_max]
    emit_lp = emit_chunks.swapaxes(0, 1).reshape(b, t_pad, u1)[:, :t_max]
    emit_lp = emit_lp.at[..., u].set(LOG_ZERO)
    return rnnt_loss_planes(blank_lp, emit_lp, input_lengths, label_lengths)


# ---------------------------------------------------------------------------
# Production streaming-V loss: ONE fused custom VJP over the whole
# (chunked joint → planes → lattice) composition.
# ---------------------------------------------------------------------------


def _act_pair(name: str):
    """activation fn + its derivative as f(pre_activation, activation)."""
    if name == "tanh":
        return jnp.tanh, lambda pre, h: 1.0 - jnp.square(h)
    if name == "relu":
        return jax.nn.relu, lambda pre, h: (pre > 0).astype(h.dtype)
    if name in ("swish", "silu"):
        def d_swish(pre, h):
            s = jax.nn.sigmoid(pre)
            return s * (1.0 + pre * (1.0 - s))
        return jax.nn.silu, d_swish
    raise ValueError(f"unsupported joint activation: {name}")


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def rnnt_loss_streaming(enc_j: jnp.ndarray, pred_j: jnp.ndarray,
                        w_out: jnp.ndarray, b_out: jnp.ndarray,
                        labels: jnp.ndarray, input_lengths: jnp.ndarray,
                        label_lengths: jnp.ndarray, blank: int = 0,
                        activation: str = "tanh",
                        chunk: int = 16) -> jnp.ndarray:
    """Transducer loss from PROJECTED joint streams — the [B, T, U+1, V]
    joint tensor never exists in HBM.

    Args:
      enc_j:  [B, T, H]  encoder stream after the joint's enc projection.
      pred_j: [B, U+1, H] predictor stream after the joint's pred projection.
      w_out:  [H, V], b_out: [V] — the joint output layer.

    The T axis is processed in ``chunk``-frame slices inside a
    ``lax.scan``: each step computes act(enc+pred) @ W (compute dtype on
    the MXU, fp32 accumulation), reduces it to the blank/emit log-prob
    planes + the per-cell logsumexp, and drops it — O(B·T·U) persistent
    memory vs O(B·T·U·V) for the materialized paths (the reference
    materializes the full joint: `wenet/transducer/joint.py:45-70` +
    torchaudio rnnt_loss, `transducer.py:142`).

    The WHOLE composition has one custom VJP: backward runs the beta
    recursion, forms the transition occupancies, and emits dlogits
    analytically per chunk (softmax recomputed from the SAVED logsumexp —
    no max/lse recompute, no autodiff-of-scan bookkeeping):

        dlogit[v] = -g * (occ_b * (1[v=blank] - p_v)
                          + occ_e * (1[v=y_u] - p_v))
    """
    loss, _ = _streaming_fused_fwd(enc_j, pred_j, w_out, b_out, labels,
                                   input_lengths, label_lengths, blank,
                                   activation, chunk)
    return loss


def _streaming_chunked_planes(enc_j, pred_j, w_out, b_out, labels, blank,
                              activation, chunk):
    """Chunk scan → (blank_lp, emit_lp, lse) each [B, T_pad, U1] fp32,
    plus static prep shared by fwd/bwd."""
    act, _ = _act_pair(activation)
    b, t_max, h = enc_j.shape
    u1 = pred_j.shape[1]
    u = u1 - 1
    v = w_out.shape[1]
    onehot = _label_onehot(labels[:, :u], u1, v, jnp.float32)  # [B, U1, V]

    n_chunks = -(-t_max // chunk)
    t_pad = n_chunks * chunk
    enc_p = jnp.pad(enc_j, ((0, 0), (0, t_pad - t_max), (0, 0))) \
        if t_pad != t_max else enc_j
    enc_chunks = enc_p.reshape(b, n_chunks, chunk, h).swapaxes(0, 1)

    b_f = b_out.astype(jnp.float32)
    w_c = w_out.astype(enc_j.dtype)
    pred_c = pred_j.astype(enc_j.dtype)

    def step(carry, enc_c):
        hidden = act(enc_c[:, :, None, :] + pred_c[:, None, :, :])
        logits = jnp.einsum("btuh,hv->btuv", hidden, w_c,
                            preferred_element_type=jnp.float32) + b_f
        m = jnp.max(logits, axis=-1)
        lse = jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)) + m
        blank_c = logits[..., blank] - lse
        emit_c = jnp.einsum("btuv,buv->btu", logits, onehot,
                            preferred_element_type=jnp.float32) - lse
        return carry, (blank_c, emit_c, lse)

    _, (bc, ec, lc) = jax.lax.scan(step, 0., enc_chunks)

    def unstack(x):                                  # [N,B,Tc,U1] → [B,Tp,U1]
        return x.swapaxes(0, 1).reshape(b, t_pad, u1)

    return (unstack(bc), unstack(ec), unstack(lc), onehot, enc_chunks,
            t_pad, n_chunks)


def _use_streaming_pallas() -> bool:
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("RNNT_STREAMING_PALLAS", "1") == "1")


def _streaming_fused_fwd(enc_j, pred_j, w_out, b_out, labels, input_lengths,
                         label_lengths, blank, activation, chunk):
    b, t_max, _ = enc_j.shape
    u1 = pred_j.shape[1]
    u = u1 - 1
    if _use_streaming_pallas():
        from wenet_celoss_tpu.ops.rnnt_pallas import \
            streaming_joint_planes_fwd
        v = w_out.shape[1]
        onehot = _label_onehot(labels[:, :u], u1, v, enc_j.dtype)
        blank_lp, emit_lp, lse = streaming_joint_planes_fwd(
            enc_j, pred_j.astype(enc_j.dtype), w_out.astype(enc_j.dtype),
            b_out, onehot, activation, blank)
    else:
        blank_lp, emit_lp, lse, _, _, _, _ = _streaming_chunked_planes(
            enc_j, pred_j, w_out, b_out, labels, blank, activation, chunk)
        blank_lp = blank_lp[:, :t_max]
        emit_lp = emit_lp[:, :t_max]
        lse = lse[:, :t_max]
    emit_lp = emit_lp.at[..., u].set(LOG_ZERO)
    alpha = _alpha_scan(blank_lp, emit_lp)
    t_lastv = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_lastv, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_lastv, label_lengths]
    loss = -(a_final + lp_final)
    return loss, (enc_j, pred_j, w_out, b_out, labels, input_lengths,
                  label_lengths, blank_lp, emit_lp, lse, alpha)


def _streaming_fused_bwd(blank, activation, chunk, res, g):
    (enc_j, pred_j, w_out, b_out, labels, input_lengths, label_lengths,
     blank_lp, emit_lp, lse, alpha) = res
    act, act_grad = _act_pair(activation)
    b, t_max, h = enc_j.shape
    u1 = pred_j.shape[1]
    v = w_out.shape[1]

    occ_b, occ_e = _occupancies(blank_lp, emit_lp, alpha,
                                input_lengths, label_lengths)
    # Sign folded in: dL/dlogits = (gb+ge)·p - gb·1[blank] - ge·1[y_u]
    # with gb = occ_b·g, ge = occ_e·g (L = -log-lik ⇒ d loss/d plane =
    # -occ; the two minus signs cancel into this form).
    gb = occ_b * g[:, None, None]
    ge = occ_e * g[:, None, None]

    if _use_streaming_pallas():
        from wenet_celoss_tpu.ops.rnnt_pallas import \
            streaming_joint_planes_bwd
        onehot_c = _label_onehot(labels[:, :u1 - 1], u1, v, enc_j.dtype)
        denc, dpred, dw, db = streaming_joint_planes_bwd(
            enc_j, pred_j.astype(enc_j.dtype), w_out.astype(enc_j.dtype),
            b_out, onehot_c, gb, ge, lse, activation, blank)
        return (denc.astype(enc_j.dtype), dpred.astype(pred_j.dtype),
                dw.astype(w_out.dtype), db.astype(b_out.dtype),
                None, None, None)

    onehot = _label_onehot(labels[:, :u1 - 1], u1, v, jnp.float32)
    n_chunks = -(-t_max // chunk)
    t_pad = n_chunks * chunk
    if t_pad != t_max:
        pad3 = ((0, 0), (0, t_pad - t_max), (0, 0))
        enc_p = jnp.pad(enc_j, pad3)
        gb, ge = jnp.pad(gb, pad3), jnp.pad(ge, pad3)
        # Pad lse with +1e9 so p = exp(logits - lse) is exactly 0 on
        # padded frames (0 * finite, never 0 * inf).
        lse = jnp.pad(lse, pad3, constant_values=1e9)
    else:
        enc_p = enc_j
    enc_chunks = enc_p.reshape(b, n_chunks, chunk, h).swapaxes(0, 1)
    to_chunks = lambda x: x.reshape(b, n_chunks, chunk, u1).swapaxes(0, 1)
    gb_c, ge_c, lse_c = to_chunks(gb), to_chunks(ge), to_chunks(lse)

    dt = enc_j.dtype
    w_c = w_out.astype(dt)
    pred_c = pred_j.astype(dt)

    def step(carry, xs):
        dpred_acc, dw_acc, db_acc = carry
        enc_c, gbc, gec, lsec = xs
        pre = enc_c[:, :, None, :] + pred_c[:, None, :, :]
        hidden = act(pre)
        logits = jnp.einsum("btuh,hv->btuv", hidden, w_c,
                            preferred_element_type=jnp.float32) \
            + b_out.astype(jnp.float32)
        p = jnp.exp(logits - lsec[..., None])          # softmax via saved lse
        tot = (gbc + gec)[..., None]
        dlogits = tot * p
        dlogits = dlogits.at[..., blank].add(-gbc)
        dlogits = dlogits - gec[..., None] * onehot[:, None, :, :]
        dlogits_c = dlogits.astype(dt)
        dpre = jnp.einsum("btuv,hv->btuh", dlogits_c, w_c,
                          preferred_element_type=jnp.float32) \
            * act_grad(pre, hidden).astype(jnp.float32)
        denc_c = jnp.sum(dpre, axis=2)                  # [B, Tc, H] fp32
        dpred_acc = dpred_acc + jnp.sum(dpre, axis=1)   # [B, U1, H] fp32
        dw_acc = dw_acc + jnp.einsum("btuh,btuv->hv", hidden.astype(dt),
                                     dlogits_c,
                                     preferred_element_type=jnp.float32)
        db_acc = db_acc + jnp.sum(dlogits, axis=(0, 1, 2))
        return (dpred_acc, dw_acc, db_acc), denc_c

    carry0 = (jnp.zeros((b, u1, h), jnp.float32),
              jnp.zeros((h, v), jnp.float32),
              jnp.zeros((v,), jnp.float32))
    (dpred, dw, db), denc_chunks = jax.lax.scan(
        step, carry0, (enc_chunks, gb_c, ge_c, lse_c))
    denc = denc_chunks.swapaxes(0, 1).reshape(b, t_pad, h)[:, :t_max]
    return (denc.astype(enc_j.dtype), dpred.astype(pred_j.dtype),
            dw.astype(w_out.dtype), db.astype(b_out.dtype),
            None, None, None)


rnnt_loss_streaming.defvjp(_streaming_fused_fwd, _streaming_fused_bwd)


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
    b = am.shape[0]
    blank_lp, emit_lp = _factored_planes(am, lm, labels, blank)
    alpha = _alpha_scan(blank_lp, emit_lp)
    t_last = jnp.maximum(input_lengths - 1, 0)
    a_final = alpha[jnp.arange(b), t_last, label_lengths]
    lp_final = blank_lp[jnp.arange(b), t_last, label_lengths]
    return -(a_final + lp_final)


def _factored_planes(am: jnp.ndarray, lm: jnp.ndarray, labels: jnp.ndarray,
                     blank: int):
    """Blank/emit planes of the factored joint am[t,v]+lm[u,v] (no joint
    net), with the matmul log-softmax denominator (see rnnt_loss_simple)."""
    b, t_max, v = am.shape
    u1 = lm.shape[1]
    am_max = jnp.max(am, axis=-1, keepdims=True)
    lm_max = jnp.max(lm, axis=-1, keepdims=True)
    inner = jnp.einsum("btv,buv->btu", jnp.exp(am - am_max),
                       jnp.exp(lm - lm_max))
    denom = jnp.log(jnp.maximum(inner, jnp.finfo(jnp.float32).tiny)) \
        + am_max + jnp.swapaxes(lm_max, 1, 2)
    blank_lp = am[:, :, None, blank] + lm[:, None, :, blank] - denom
    u = u1 - 1
    if u > 0:
        # One-hot matmuls, not take_along_axis: the V-gather's backward
        # is an XLA scatter, and the am gather would first materialize a
        # [B,T,U1,V] repeat of am.
        onehot = _label_onehot(labels[:, :u], u1, v, am.dtype)   # [B,U1,V]
        am_y = jnp.einsum("btv,buv->btu", am, onehot,
                          preferred_element_type=jnp.float32)
        lm_y = jnp.einsum("buv,buv->bu", lm, onehot,
                          preferred_element_type=jnp.float32)
        emit_lp = am_y + lm_y[:, None, :] - denom
        emit_lp = emit_lp.at[..., u].set(LOG_ZERO)
    else:
        emit_lp = jnp.full((b, t_max, u1), LOG_ZERO)
    return blank_lp, emit_lp


@partial(jax.jit, static_argnames=("s_range", "blank"))
def get_rnnt_prune_ranges(am: jnp.ndarray, lm: jnp.ndarray,
                          labels: jnp.ndarray, input_lengths: jnp.ndarray,
                          label_lengths: jnp.ndarray,
                          s_range: int, blank: int = 0) -> jnp.ndarray:
    """Per-frame label-window starts for pruned RNN-T training.

    Capability parity with k2's ``get_rnnt_prune_ranges`` (the fork's
    pruned-rnnt direction, reference `wenet/transducer/transducer_k2_loss.py`
    uses the k2 losses): the emit-arc occupancies of the *simple* (factored)
    joint decide, for every frame t, which window of ``s_range`` consecutive
    label positions the expensive full joint needs to be evaluated on.

    Returns: ranges [B, T] int32 — window start u-indices, guaranteed
      - ranges[:, 0] == 0,
      - non-decreasing along t,
      - ranges[t+1] - ranges[t] <= s_range (the windowed lattice connects),
      - window at frame T_b-1 covers U_b (termination cell reachable),
      - ranges + s_range never exceeds U_b + 1.
    """
    b, t_max, _ = am.shape
    u1 = lm.shape[1]
    blank_lp, emit_lp = _factored_planes(am, lm, labels, blank=blank)
    alpha = _alpha_scan(blank_lp, emit_lp)
    beta = _beta_scan(blank_lp, emit_lp, input_lengths, label_lengths)
    log_z = beta[:, 0, 0][:, None, None]

    # Emit-arc occupancy occ_e[t, u] = P(path uses the (t,u)->(t,u+1) arc).
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((b, t_max, 1), LOG_ZERO)], axis=2)
    t_idx = jnp.arange(t_max)[None, :, None]
    u_idx = jnp.arange(u1)[None, None, :]
    t_last = (input_lengths - 1)[:, None, None]
    u_last = label_lengths[:, None, None]
    in_lat = (t_idx <= t_last) & (u_idx < u_last)
    occ_e = jnp.exp(jnp.where(in_lat, alpha + emit_lp + beta_right - log_z,
                              LOG_ZERO))                      # [B, T, U1]

    # Window score: sum of occupancies inside [k, k + s_range).
    csum = jnp.cumsum(occ_e, axis=2)
    pad = jnp.zeros((b, t_max, 1), csum.dtype)
    csum = jnp.concatenate([pad, csum], axis=2)               # [B, T, U1+1]
    num_starts = max(u1 - s_range + 1, 1)
    k = jnp.arange(num_starts)
    win = csum[:, :, jnp.minimum(k + s_range, u1)] - csum[:, :, k]
    start = jnp.argmax(win, axis=2).astype(jnp.int32)         # [B, T]

    # Feasibility constraints (k2 adjust_pruning_lower_bound equivalent).
    u_hi = jnp.maximum(label_lengths[:, None] - s_range + 1, 0)  # max start
    start = jnp.minimum(start, u_hi)
    # Final frame must cover U_b; frames at/after T_b hold that value.
    final_start = u_hi[:, 0]
    at_or_after_end = jnp.arange(t_max)[None, :] >= \
        (input_lengths - 1)[:, None]
    start = jnp.where(at_or_after_end, final_start[:, None], start)
    # Backward: start[t] >= start[t'] - s_range * (t' - t) for all t' > t
    #   <=>  start[t] = max_{t'>=t}(start[t'] - s_range * t') + s_range * t.
    sr_t = s_range * jnp.arange(t_max, dtype=jnp.int32)[None, :]
    y = start - sr_t
    y_rev_cummax = jnp.flip(jax.lax.cummax(jnp.flip(y, axis=1), axis=1),
                            axis=1)
    start = y_rev_cummax + sr_t
    # Forward: non-decreasing.
    start = jax.lax.cummax(start, axis=1)
    start = jnp.clip(start, 0, u_hi)
    start = start.at[:, 0].set(0)
    return start


def rnnt_loss_pruned(logits: jnp.ndarray, ranges: jnp.ndarray,
                     labels: jnp.ndarray, input_lengths: jnp.ndarray,
                     label_lengths: jnp.ndarray,
                     blank: int = 0) -> jnp.ndarray:
    """Transducer NLL over a pruned [B, T, S, V] joint (k2 rnnt_loss_pruned
    equivalent; S = s_range << U+1).

    ``logits[b, t, k]`` are the joint logits for lattice cell
    (t, ranges[b, t] + k). Because windows move monotonically with bounded
    per-frame shift (see get_rnnt_prune_ranges), the full [B,T,U+1,V] joint
    never exists: O(B·T·S·V) memory — the large-vocab training formulation.

    The recursion runs frame-major (`lax.scan` over t) with the in-frame
    emit chain unrolled over the S window positions (S is small/static).
    """
    b, t_max, s, v = logits.shape
    u = labels.shape[1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_w = lp[..., blank]                                  # [B, T, S]
    k_idx = jnp.arange(s)
    abs_u = ranges[:, :, None] + k_idx[None, None, :]         # [B, T, S]
    lab = jnp.take_along_axis(
        jnp.concatenate([labels, jnp.zeros((b, 1), labels.dtype)], axis=1),
        jnp.minimum(abs_u, u).reshape(b, -1), axis=1).reshape(b, t_max, s)
    emit_w = jnp.take_along_axis(lp, lab[..., None], axis=3)[..., 0]
    emit_valid = abs_u < label_lengths[:, None, None]
    emit_w = jnp.where(emit_valid, emit_w, LOG_ZERO)
    cell_valid = abs_u <= label_lengths[:, None, None]

    # Frame 0 (ranges[:, 0] == 0): alpha[0, 0] = 0 then the emit chain.
    def emit_chain(from_below, emit_row):
        """alpha_row[k] = logaddexp(from_below[k], alpha_row[k-1]+emit[k-1])"""
        row = [from_below[:, 0]]
        for kk in range(1, s):
            row.append(jnp.logaddexp(from_below[:, kk],
                                     row[-1] + emit_row[:, kk - 1]))
        return jnp.stack(row, axis=1)

    init_below = jnp.full((b, s), LOG_ZERO).at[:, 0].set(0.0)
    alpha0 = emit_chain(init_below, emit_w[:, 0])
    alpha0 = jnp.where(cell_valid[:, 0], alpha0, LOG_ZERO)

    def step(carry, xs):
        alpha_prev = carry                                    # [B, S]
        blank_prev, emit_row, delta, valid_row = xs
        # Blank move: window-t cell k sources window-(t-1) cell k + delta.
        src = k_idx[None, :] + delta[:, None]                 # [B, S]
        src_c = jnp.minimum(src, s - 1)
        gathered = jnp.take_along_axis(alpha_prev, src_c, axis=1) + \
            jnp.take_along_axis(blank_prev, src_c, axis=1)
        from_below = jnp.where(src < s, gathered, LOG_ZERO)
        alpha_t = emit_chain(from_below, emit_row)
        alpha_t = jnp.where(valid_row, alpha_t, LOG_ZERO)
        return alpha_t, alpha_t

    deltas = ranges[:, 1:] - ranges[:, :-1]                   # [B, T-1]
    xs = (jnp.moveaxis(blank_w[:, :-1], 1, 0),
          jnp.moveaxis(emit_w[:, 1:], 1, 0),
          jnp.moveaxis(deltas, 1, 0),
          jnp.moveaxis(cell_valid[:, 1:], 1, 0))
    if t_max > 1:
        _, alphas = jax.lax.scan(step, alpha0, xs, unroll=8)
        alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
    else:
        alphas = alpha0[None]
    alphas = jnp.moveaxis(alphas, 0, 1)                       # [B, T, S]

    bi = jnp.arange(b)
    t_fin = jnp.maximum(input_lengths - 1, 0)
    k_fin = jnp.clip(label_lengths - ranges[bi, t_fin], 0, s - 1)
    return -(alphas[bi, t_fin, k_fin] + blank_w[bi, t_fin, k_fin])


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
