"""Fused rel-pos self-attention Pallas kernels (TPU, full-context training).

Computes, per batch element (grid over B, heads looped in-kernel):

    scores_h = ((q_h + u_h) @ k_h^T + (q_h + v_h) @ p_h^T) / sqrt(dk) + bias
    out_h    = dropout(softmax_f32(scores_h)) @ v_h

with the [T, T] scores/attention tiles living only in VMEM and the dropout
mask drawn from the on-core PRNG (regenerated bit-exactly in backward).
This removes the [B, H, T, T] HBM round-trips of the XLA path (scores fp32
write+read, attn write+read, mask bits) — ~1.5 GB/layer-dozen forward at
the flagship operating point.

Matches models.attention.RelPositionMultiHeadedAttention._rel_attend with
an additive float mask bias (the encoder's precomputed one): no rel_shift,
softmax in fp32, matmuls in the compute dtype with fp32 accumulation.

The backward saves only the per-row logsumexp ([B, H, T] fp32) and
recomputes scores/attention per tile (flash-attention style), emitting
dq/dk/dv/dp and the summed d(pos_bias_u/v).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _drop_mask(shape, thresh):
    bits = pltpu.prng_random_bits(shape)
    return (bits & jnp.uint32(0xFFFF)) < jnp.uint32(thresh)


def _thresh(rate):
    if rate <= 0.0:
        return None, 1.0
    keep = 1.0 - rate
    return min(int(round(keep * 65536.0)), 65535), 1.0 / keep


def _attn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref,
                     bias_ref, o_ref, lse_ref, *, heads, t, dk, thresh,
                     keep_inv, scale):
    if thresh is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bias = bias_ref[0].astype(jnp.float32)               # [T, T]
    for h in range(heads):
        q = q_ref[0, h]                                  # [T, dk]
        k = k_ref[0, h]
        vv = v_ref[0, h]
        p = p_ref[h]
        qu = q + u_ref[h][None, :].astype(q.dtype)
        qv = q + vb_ref[h][None, :].astype(q.dtype)
        ac = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        bd = jax.lax.dot_general(qv, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        scores = (ac + bd) * scale + bias                # [T, T] f32
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        lse_ref[0, h] = (jnp.log(s) + m)[:, 0]
        attn = e / s
        if thresh is not None:
            keep = _drop_mask((t, t), thresh)
            attn = jnp.where(keep, attn * keep_inv, 0.0)
        o_ref[0, h] = jax.lax.dot_general(
            attn.astype(q.dtype), vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, p_ref, u_ref, vb_ref,
                     bias_ref, lse_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dp_ref, du_ref, dvb_ref,
                     *, heads, t, dk, thresh, keep_inv, scale):
    if thresh is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bias = bias_ref[0].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dp_ref[:] = jnp.zeros_like(dp_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        dvb_ref[:] = jnp.zeros_like(dvb_ref)

    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        vv = v_ref[0, h]
        p = p_ref[h]
        qu = q + u_ref[h][None, :].astype(q.dtype)
        qv = q + vb_ref[h][None, :].astype(q.dtype)
        ac = jax.lax.dot_general(qu, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        bd = jax.lax.dot_general(qv, p, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        scores = (ac + bd) * scale + bias
        attn = jnp.exp(scores - lse_ref[0, h][:, None])  # softmax [T,T]
        if thresh is not None:
            keep = _drop_mask((t, t), thresh)
            attn_d = jnp.where(keep, attn * keep_inv, 0.0)
        else:
            attn_d = attn
        do = do_ref[0, h].astype(jnp.float32)            # [T, dk]
        dattn = jax.lax.dot_general(
            do.astype(q.dtype), vv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [T, T]
        dv_ref[0, h] = jax.lax.dot_general(
            attn_d.astype(q.dtype), do.astype(q.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        if thresh is not None:
            dattn = jnp.where(keep, dattn * keep_inv, 0.0)
        # softmax VJP: ds = attn * (dattn - sum(dattn * attn, -1))
        dsc = attn * (dattn - jnp.sum(dattn * attn, axis=-1,
                                      keepdims=True))
        dsc = dsc * scale
        dsc_c = dsc.astype(q.dtype)
        dqu = jax.lax.dot_general(dsc_c, k, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqv = jax.lax.dot_general(dsc_c, p, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[0, h] = (dqu + dqv).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            dsc_c, qu, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dp_ref[h] += jax.lax.dot_general(
            dsc_c, qv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        du_ref[h] += jnp.sum(dqu, axis=0)
        dvb_ref[h] += jnp.sum(dqv, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def rel_attention_fused(q, k, v, p, bias_u, bias_v, mask_bias, seed,
                        rate: float, interpret: bool = False):
    """Fused rel-pos attention core.

    q/k/v: [B, H, T, dk] compute dtype; p: [H, T, dk] (projected pos-emb,
    batch-shared); bias_u/bias_v: [H, dk] fp32 params; mask_bias:
    [B, T, T] additive float mask; seed: int32 scalar (dropout stream).
    Returns out [B, H, T, dk] in q.dtype.
    """
    out, _ = _attn_fwd(q, k, v, p, bias_u, bias_v, mask_bias, seed, rate,
                       interpret)
    return out


def _attn_fwd(q, k, v, p, bias_u, bias_v, mask_bias, seed, rate, interpret):
    b, heads, t, dk = q.shape
    thresh, keep_inv = _thresh(rate)
    scale = 1.0 / (dk ** 0.5)
    kern = partial(_attn_fwd_kernel, heads=heads, t=t, dk=dk,
                   thresh=thresh, keep_inv=keep_inv, scale=scale)
    grid = (b,)
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, dk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, heads, t, dk), q.dtype),
            jax.ShapeDtypeStruct((b, heads, t), jnp.float32),
        ),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), q, k, v,
      p.astype(q.dtype), bias_u.astype(jnp.float32),
      bias_v.astype(jnp.float32), mask_bias)
    return out, (q, k, v, p, bias_u, bias_v, mask_bias, seed, lse)


def _attn_bwd_impl(rate, interpret, res, do):
    q, k, v, p, bias_u, bias_v, mask_bias, seed, lse = res
    b, heads, t, dk = q.shape
    thresh, keep_inv = _thresh(rate)
    scale = 1.0 / (dk ** 0.5)
    kern = partial(_attn_bwd_kernel, heads=heads, t=t, dk=dk,
                   thresh=thresh, keep_inv=keep_inv, scale=scale)
    grid = (b,)
    dq, dk_, dv, dp, du, dvb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, dk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, t, dk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, t, dk), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, dk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, heads, t, dk), q.dtype),
            jax.ShapeDtypeStruct((b, heads, t, dk), q.dtype),
            jax.ShapeDtypeStruct((b, heads, t, dk), q.dtype),
            jax.ShapeDtypeStruct((heads, t, dk), jnp.float32),
            jax.ShapeDtypeStruct((heads, dk), jnp.float32),
            jax.ShapeDtypeStruct((heads, dk), jnp.float32),
        ),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), q, k, v, p.astype(q.dtype),
      bias_u.astype(jnp.float32), bias_v.astype(jnp.float32), mask_bias,
      lse, do.astype(q.dtype))
    return (dq, dk_, dv, dp.astype(p.dtype), du.astype(bias_u.dtype),
            dvb.astype(bias_v.dtype), jnp.zeros_like(mask_bias), None)


def _attn_fwd_rule(q, k, v, p, bias_u, bias_v, mask_bias, seed, rate,
                   interpret):
    return _attn_fwd(q, k, v, p, bias_u, bias_v, mask_bias, seed, rate,
                     interpret)


def _attn_bwd_rule(rate, interpret, res, do):
    return _attn_bwd_impl(rate, interpret, res, do)


rel_attention_fused.defvjp(_attn_fwd_rule, _attn_bwd_rule)
