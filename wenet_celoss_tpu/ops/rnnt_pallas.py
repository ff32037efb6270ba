"""Pallas TPU kernel for the RNN-T lattice forward/backward recursions.

The XLA `lax.scan` wavefront in ops/rnnt_loss.py dispatches T+U steps
through the compiler's loop machinery; this kernel runs the whole
recursion inside ONE Pallas program with the lattice in VMEM.

Key layout — SKEWED + BATCH-MAJOR ROWS: cell (b, t, u) is stored at
[t + u, b, u]. Every anti-diagonal is a contiguous [B, U1] tile (a full
8x128 VPU tile once padded), and both dependencies of row d live in
row d-1:

    alphaS[d, b, u] = logaddexp(alphaS[d-1, b, u]   + blankS[d-1, b, u],
                                alphaS[d-1, b, u-1] + emitS[d-1, b, u-1])

so each diagonal step is two tile adds, one lane roll and a logaddexp —
no gathers, all batches in parallel. beta runs the same loop in reverse
with per-batch lengths carried as broadcast VMEM tiles. The
occupancy-formula gradient (see rnnt_loss.py) consumes alpha/beta
directly, so no backward-through-scan is ever built.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wenet_celoss_tpu.utils.common import LOG_ZERO


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def skew_bm(x: jnp.ndarray, fill: float = LOG_ZERO) -> jnp.ndarray:
    """[B, T, U1] → [D, B, U1] with S[t+u, b, u] = x[b, t, u]."""
    b, t, u1 = x.shape
    d = t + u1 - 1
    rows = jnp.arange(d)[:, None]
    cols = jnp.arange(u1)[None, :]
    t_of = rows - cols                       # [D, U1]
    valid = (t_of >= 0) & (t_of < t)
    gathered = x[:, jnp.clip(t_of, 0, t - 1), cols]   # [B, D, U1]
    out = jnp.where(valid[None], gathered, fill)
    return jnp.moveaxis(out, 0, 1)                     # [D, B, U1]


def unskew_bm(s: jnp.ndarray, t: int) -> jnp.ndarray:
    """[D, B, U1] → [B, T, U1]."""
    d, b, u1 = s.shape
    rows = jnp.arange(t)[:, None] + jnp.arange(u1)[None, :]   # [T, U1]
    sb = jnp.moveaxis(s, 1, 0)                                # [B, D, U1]
    return sb[:, rows, jnp.arange(u1)[None, :]]


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _lattice_kernel(blank_ref, emit_ref, tlen_ref, ulen_ref, alpha_ref,
                    beta_ref, *, t_max, u1, u1p, bp):
    """Computes alpha (ascending) then beta (descending) diagonals."""
    d_total = t_max + u1 - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (bp, u1p), 1)
    t_len = tlen_ref[:]                       # [BP, U1P] broadcast tiles
    u_len = ulen_ref[:]

    # ---------------- alpha (forward) ----------------
    first = jnp.where(col == 0, 0.0, LOG_ZERO)
    alpha_ref[0, :, :] = jnp.where(col < u1, first, LOG_ZERO)

    def fwd(d, _):
        prev = alpha_ref[d - 1, :, :]                       # [BP, U1P]
        via_blank = prev + blank_ref[d - 1, :, :]
        shifted = prev + emit_ref[d - 1, :, :]
        via_emit = jnp.where(col >= 1, pltpu.roll(shifted, 1, 1),
                             LOG_ZERO)
        new = _logaddexp(via_blank, via_emit)
        t_of = d - col
        valid = (t_of >= 0) & (t_of < t_max) & (col < u1)
        alpha_ref[d, :, :] = jnp.where(valid, new, LOG_ZERO)
        return 0

    jax.lax.fori_loop(1, d_total, fwd, 0)

    # ---------------- beta (backward) ----------------
    # Descending loop; the terminal cell (t_len-1, u_len) is overridden to
    # its final blank each time its diagonal is visited, so no separate
    # init pass is needed.
    last = jnp.full((bp, u1p), LOG_ZERO)
    beta_ref[d_total - 1, :, :] = last

    def bwd(i, _):
        d = d_total - 1 - i
        t_of = d - col
        is_term = (t_of == t_len - 1) & (col == u_len)
        blank_here = blank_ref[d, :, :]
        emit_here = emit_ref[d, :, :]

        def with_next():
            nxt = beta_ref[d + 1, :, :]
            via_blank = jnp.where((t_of + 1) < t_len, blank_here + nxt,
                                  LOG_ZERO)
            nxt_left = pltpu.roll(nxt, u1p - 1, 1)   # lane u ← u+1
            via_emit = jnp.where((col + 1) <= u_len, emit_here + nxt_left,
                                 LOG_ZERO)
            return _logaddexp(via_blank, via_emit)

        new = jax.lax.cond(d + 1 < d_total, with_next,
                           lambda: jnp.full((bp, u1p), LOG_ZERO))
        new = jnp.where(is_term, blank_here, new)
        valid = (t_of >= 0) & (t_of < t_len) & (col <= u_len) & (col < u1)
        beta_ref[d, :, :] = jnp.where(valid, new, LOG_ZERO)
        return 0

    jax.lax.fori_loop(0, d_total, bwd, 0)


@partial(jax.jit, static_argnames=("interpret",))
def alpha_beta_pallas(blank_lp, emit_lp, input_lengths, label_lengths,
                      interpret: bool = False):
    """Compute alpha and beta [B, T, U1] with one Pallas program."""
    b, t_max, u1 = blank_lp.shape
    d = t_max + u1 - 1
    u1p = _round_up(u1, 128)
    bp = _round_up(b, 8)

    def prep(x):
        s = skew_bm(x)                                     # [D, B, U1]
        return jnp.pad(s, [(0, 0), (0, bp - b), (0, u1p - u1)],
                       constant_values=LOG_ZERO)

    blank_s = prep(blank_lp)
    emit_s = prep(emit_lp)
    # Per-batch lengths broadcast to full tiles (padded rows get length 0 /
    # -1 so every one of their cells is masked invalid).
    tlen = jnp.pad(input_lengths.astype(jnp.int32), (0, bp - b))
    ulen = jnp.pad(label_lengths.astype(jnp.int32), (0, bp - b),
                   constant_values=-1)
    tlen_tile = jnp.broadcast_to(tlen[:, None], (bp, u1p))
    ulen_tile = jnp.broadcast_to(ulen[:, None], (bp, u1p))

    alpha_s, beta_s = pl.pallas_call(
        partial(_lattice_kernel, t_max=t_max, u1=u1, u1p=u1p, bp=bp),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((d, bp, u1p), jnp.float32),
                   jax.ShapeDtypeStruct((d, bp, u1p), jnp.float32)),
        interpret=interpret,
    )(blank_s, emit_s, tlen_tile, ulen_tile)

    alpha = unskew_bm(alpha_s[:, :b, :u1], t_max)
    beta = unskew_bm(beta_s[:, :b, :u1], t_max)
    return alpha, beta


def _planes(logits, labels, blank):
    from wenet_celoss_tpu.ops.rnnt_loss import _gather_planes
    return _gather_planes(logits, labels, blank)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def rnnt_loss_pallas(logits, labels, input_lengths, label_lengths,
                     blank: int = 0, interpret: bool = False):
    """Transducer loss with the Pallas lattice kernel + occupancy-formula
    gradient. Numerically equivalent to ops.rnnt_loss.rnnt_loss."""
    loss, _ = _pallas_fwd(logits, labels, input_lengths, label_lengths,
                          blank, interpret)
    return loss


def _pallas_fwd(logits, labels, input_lengths, label_lengths, blank,
                interpret):
    blank_lp, emit_lp = _planes(logits, labels, blank)
    alpha, beta = alpha_beta_pallas(blank_lp, emit_lp, input_lengths,
                                    label_lengths, interpret)
    loss = -beta[:, 0, 0]
    return loss, (logits, labels, input_lengths, label_lengths, blank_lp,
                  emit_lp, alpha, beta)


def _pallas_bwd(blank, interpret, res, g):
    (logits, labels, input_lengths, label_lengths, blank_lp, emit_lp,
     alpha, beta) = res
    b, t_max, u1, v = logits.shape
    log_z = beta[:, 0, 0]

    t_idx = jnp.arange(t_max)[None, :, None]
    u_idx = jnp.arange(u1)[None, None, :]
    t_last = (input_lengths - 1)[:, None, None]
    u_last = label_lengths[:, None, None]
    in_lattice = (t_idx <= t_last) & (u_idx <= u_last)

    beta_down = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((b, 1, u1), LOG_ZERO)], axis=1)
    beta_down = jnp.where((t_idx == t_last) & (u_idx == u_last), 0.0,
                          jnp.where(t_idx < t_last, beta_down, LOG_ZERO))
    occ_b = jnp.exp(jnp.where(
        in_lattice, alpha + blank_lp + beta_down - log_z[:, None, None],
        LOG_ZERO))
    beta_right = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((b, t_max, 1), LOG_ZERO)], axis=2)
    occ_e = jnp.exp(jnp.where(
        in_lattice & (u_idx < u_last),
        alpha + emit_lp + beta_right - log_z[:, None, None], LOG_ZERO))

    sm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    grad = sm * (occ_b + occ_e)[..., None]
    grad = grad.at[..., blank].add(-occ_b)
    u = u1 - 1
    if u > 0:
        lab = jnp.concatenate(
            [labels[:, :u], jnp.zeros((b, 1), labels.dtype)], axis=1)
        onehot = jax.nn.one_hot(lab, v, dtype=grad.dtype)
        grad = grad - onehot[:, None, :, :] * occ_e[..., None]
    grad = grad * g[:, None, None, None]
    return (grad.astype(logits.dtype), None, None, None)


rnnt_loss_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Fused streaming-joint kernels: act(enc ⊕ pred) @ W → blank/emit/lse planes
# (forward) and the analytic occupancy-weighted dlogits → (denc, dpred, dW,
# db) (backward) — the [*, U1, V] logits tile lives ONLY in VMEM. Replaces
# the XLA chunk scan inside ops/rnnt_loss.rnnt_loss_streaming on TPU, whose
# fp32 logits/softmax transients cost ~2 GB of HBM traffic per 16-frame
# chunk at B=256.
# ---------------------------------------------------------------------------


def _act_fwd(name, x):
    if name == "tanh":
        return jnp.tanh(x)
    if name == "relu":
        return jnp.maximum(x, 0)
    if name in ("swish", "silu"):
        return x * jax.nn.sigmoid(x)
    raise ValueError(name)


def _act_deriv(name, pre, h):
    if name == "tanh":
        return 1.0 - h * h
    if name == "relu":
        return (pre > 0).astype(h.dtype)
    s = jax.nn.sigmoid(pre)
    return s * (1.0 + pre * (1.0 - s))


def _joint_fwd_kernel(enc_ref, pred_ref, w_ref, oh_ref, b_ref,
                      blank_ref, emit_ref, lse_ref, *, activation, blank,
                      tt, u1, h, v):
    # U-MAJOR: the joint tile is [u1, tt, h] with the REAL u1 (33 at the
    # flagship point), not the 16-aligned block padding (48) — u1 sits on
    # a major axis so only the matmul's row count (u1*tt) needs rounding,
    # vs 45% padded-row FLOP waste when u1 was the sublane dim.
    enc = enc_ref[0]                                   # [TT, H] bf16
    pred = pred_ref[0][:u1]                            # [U1, H]
    hidden = _act_fwd(activation,
                      pred[:, None, :] + enc[None, :, :])   # [U1, TT, H]
    hidden2 = hidden.reshape(u1 * tt, h)
    logits = jax.lax.dot_general(
        hidden2, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0][None, :]
    logits3 = logits.reshape(u1, tt, v)
    m = jnp.max(logits3, axis=-1)
    lse = jnp.log(jnp.sum(jnp.exp(logits3 - m[..., None]), axis=-1)) + m
    blank_lp = logits3[:, :, blank] - lse
    emit_lp = jnp.sum(
        logits3 * oh_ref[0][:u1][:, None, :].astype(jnp.float32),
        axis=-1) - lse
    # Planes leave the kernel T-major (outer contract unchanged); the
    # [U1, TT] → [TT, U1] transposes are single-tile relayouts.
    blank_ref[0, :, :u1] = blank_lp.T                  # lanes u1.. unused
    emit_ref[0, :, :u1] = emit_lp.T
    lse_ref[0, :, :u1] = lse.T


def _joint_bwd_kernel(enc_ref, pred_ref, w_ref, oh_ref, b_ref, gb_ref,
                      ge_ref, lse_ref, denc_ref, dpred_ref, dw_ref, db_ref,
                      *, activation, blank, tt, u1, h, v):
    enc = enc_ref[0]
    pred = pred_ref[0][:u1]                            # [U1, H]
    pre = pred[:, None, :] + enc[None, :, :]           # [U1, TT, H]
    hidden = _act_fwd(activation, pre)
    hidden2 = hidden.reshape(u1 * tt, h)
    w = w_ref[:]
    logits = jax.lax.dot_general(
        hidden2, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0][None, :]
    logits3 = logits.reshape(u1, tt, v)
    p = jnp.exp(logits3 - lse_ref[0][:, :u1].T[..., None])  # [U1,TT,V] f32
    gb = gb_ref[0][:, :u1].T                           # [U1, TT] f32
    ge = ge_ref[0][:, :u1].T
    dlogits = (gb + ge)[..., None] * p \
        - ge[..., None] * oh_ref[0][:u1][:, None, :].astype(jnp.float32)
    # blank column: dlogits[..., blank] -= gb  (blank is static)
    col = jax.lax.broadcasted_iota(jnp.int32, (u1, tt, v), 2)
    dlogits = jnp.where(col == blank, dlogits - gb[..., None], dlogits)
    dlog2 = dlogits.reshape(u1 * tt, v).astype(w.dtype)
    dpre2 = jax.lax.dot_general(
        dlog2, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [U1*TT, H]
    dpre = dpre2.reshape(u1, tt, h) * _act_deriv(
        activation, pre, hidden).astype(jnp.float32)
    denc_ref[0] = jnp.sum(dpre, axis=0)                # [TT, H]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dpred_ref[0] = jnp.zeros_like(dpred_ref[0])

    dpred_ref[0, :u1] += jnp.sum(dpre, axis=1)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros((h, v), jnp.float32)
        db_ref[:] = jnp.zeros((1, v), jnp.float32)

    dw_ref[:] += jax.lax.dot_general(
        hidden2.astype(w.dtype), dlog2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(dlogits, axis=(0, 1))[None, :]


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    p = (-n) % mult
    if p == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, p)
    return jnp.pad(x, pads, constant_values=value)


def streaming_joint_planes_fwd(enc_j, pred_j, w_out, b_out, onehot,
                               activation: str, blank: int, tt: int = 64,
                               interpret: bool = False):
    """(blank_lp, emit_lp, lse) [B, T, U1] f32 via the fused Pallas kernel.

    enc_j [B,T,H], pred_j [B,U1,H] (compute dtype), w_out [H,V] (compute
    dtype), b_out [V] f32, onehot [B,U1,V] (compute dtype, row U all-zero).
    """
    b, t_max, h = enc_j.shape
    u1 = pred_j.shape[1]
    v = w_out.shape[1]
    enc_p = _pad_to(enc_j, 1, tt)
    t_p = enc_p.shape[1]
    pred_p = _pad_to(pred_j, 1, 16)
    oh_p = _pad_to(onehot, 1, 16)
    u1p = pred_p.shape[1]
    grid = (b, t_p // tt)
    kern = partial(_joint_fwd_kernel, activation=activation, blank=blank,
                   tt=tt, u1=u1, h=h, v=v)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, h), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, h), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, v), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_p, u1p), jnp.float32),
            jax.ShapeDtypeStruct((b, t_p, u1p), jnp.float32),
            jax.ShapeDtypeStruct((b, t_p, u1p), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(enc_p, pred_p, w_out, oh_p, b_out.astype(jnp.float32)[None, :])
    blank_lp, emit_lp, lse = (o[:, :t_max, :u1] for o in out)
    return blank_lp, emit_lp, lse


def streaming_joint_planes_bwd(enc_j, pred_j, w_out, b_out, onehot, gb, ge,
                               lse, activation: str, blank: int,
                               tt: int = 64, interpret: bool = False):
    """Backward of the fused joint: returns (denc [B,T,H] f32,
    dpred [B,U1,H] f32, dw [H,V] f32, db [V] f32). gb/ge must already be
    0 on invalid cells; lse is re-padded internally with +1e9 so padded
    rows contribute exactly 0."""
    b, t_max, h = enc_j.shape
    u1 = pred_j.shape[1]
    v = w_out.shape[1]
    enc_p = _pad_to(enc_j, 1, tt)
    t_p = enc_p.shape[1]
    pred_p = _pad_to(pred_j, 1, 16)
    oh_p = _pad_to(onehot, 1, 16)
    u1p = pred_p.shape[1]
    def pad_tu(x, val=0.0):
        x = _pad_to(x, 1, tt, val)
        x = _pad_to(x, 2, 16, val)
        return x
    gb_p, ge_p = pad_tu(gb), pad_tu(ge)
    lse_p = pad_tu(lse, 1e9)
    grid = (b, t_p // tt)
    kern = partial(_joint_bwd_kernel, activation=activation, blank=blank,
                   tt=tt, u1=u1, h=h, v=v)
    denc, dpred, dw, db = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, h), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, h), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, v), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, u1p), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tt, h), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u1p, h), lambda bb, t: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_p, h), jnp.float32),
            jax.ShapeDtypeStruct((b, u1p, h), jnp.float32),
            jax.ShapeDtypeStruct((h, v), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(enc_p, pred_p, w_out, oh_p, b_out.astype(jnp.float32)[None, :],
      gb_p, ge_p, lse_p)
    return (denc[:, :t_max], dpred[:, :u1], dw, db[0])
