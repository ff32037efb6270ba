"""Fused conformer convolution block Pallas kernel (TPU).

One kernel computes the WHOLE conv block of a conformer layer

    out = x + drop( PW2( swish( LN2( DW( GLU( PW1( mask⊙LN1(x) )))))))⊙mask

per batch-group, with every intermediate — both LayerNorms' statistics,
the [T, 2D] GLU hidden, the depthwise window reads and the dropout mask
(on-core PRNG) — resident in VMEM. The unfused XLA composition reads and
writes [B, T, C]-sized tensors to HBM ~10 times per direction; at the
flagship operating point the conv tower + its pre-norm measured ~2.1 ms
per layer fwd+bwd against a ~0.25 ms HBM/MXU roofline
(tools/profile_layer12.py), which is the gap this kernel closes.

Semantics match models/convolution.py (reference
``wenet/transformer/convolution.py:25-146``): the RAW input to the module
(here: the pre-normed x) is zeroed at padded frames, causal convs left-pad
``K-1`` frames and non-causal convs zero-pad ``(K-1)/2`` on both sides in
the post-GLU domain, and the OUTPUT is re-zeroed at padded frames before
the residual add. Only the ``layer_norm`` cnn-norm variant is fused
(batch_norm needs global batch statistics; callers fall back to XLA).

The backward kernel recomputes everything from x (no saved residuals),
regenerates the dropout mask bit-exactly, and fuses both LayerNorm VJPs,
the GLU VJP and the depthwise-correlation input gradient, accumulating
all eleven weight grads across the sequential grid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _thresh(rate):
    if rate <= 0.0:
        return None, 1.0
    keep = 1.0 - rate
    return min(int(round(keep * 65536.0)), 65535), 1.0 / keep


def _dropmask(shape, thresh):
    bits = pltpu.prng_random_bits(shape)
    return (bits & jnp.uint32(0xFFFF)) < jnp.uint32(thresh)


def _ln(x_f32, g, b, eps):
    """Row-wise LayerNorm over the last axis; returns (xhat, rstd, y)."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    xc = x_f32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat, rstd, xhat * g + b


def _ln_bwd(dxn, xhat, rstd, g):
    """VJP of y = xhat*g + b wrt the LN input; also returns dg, db rows."""
    dxhat = dxn * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dxn * xhat, dxn


def _depthwise(hp, w_dw, t):
    """hp: [G, T+K-1, C] padded hidden; w_dw: [K, C] → [G, T, C]."""
    k = w_dw.shape[0]
    acc = hp[:, 0:t, :] * w_dw[0][None, None, :]
    for i in range(1, k):
        acc = acc + hp[:, i:i + t, :] * w_dw[i][None, None, :]
    return acc


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _silu_deriv(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _fwd_body(x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2, bw2,
              *, lp_raw, hp_pad, eps, cdt):
    """Shared fwd recompute: returns intermediates needed by both.

    Padding matches models/convolution.py exactly: causal convs left-pad
    ``lp_raw = K-1`` frames in the RAW (pre-pointwise1) domain — those
    frames carry GLU(bias), not zero — while non-causal convs zero-pad
    ``hp_pad = (K-1)/2`` per side in the post-GLU domain."""
    g, t, d = x.shape
    k = w_dw.shape[0]
    xf = x.astype(jnp.float32)
    xhat1, rstd1, xn = _ln(xf, g1[None, None, :], b1[None, None, :], eps)
    xn = xn * mask[..., None]
    xn_c = xn.astype(cdt)
    xe = jnp.pad(xn_c, ((0, 0), (lp_raw, 0), (0, 0)))
    t_ext = t + lp_raw
    u = jax.lax.dot_general(
        xe.reshape(g * t_ext, d), w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(g, t_ext, 2 * d) \
        + bw1[None, None, :]
    a, bgate = u[..., :d], u[..., d:]
    s = jax.nn.sigmoid(bgate)
    h = a * s
    hp = jnp.pad(h, ((0, 0), (hp_pad, hp_pad), (0, 0)))
    assert hp.shape[1] == t + k - 1, (hp.shape, t, k)
    y0 = _depthwise(hp, w_dw, t) + b_dw[None, None, :]
    xhat2, rstd2, y1 = _ln(y0, g2[None, None, :], b2[None, None, :], eps)
    z = _silu(y1)
    v = jax.lax.dot_general(
        z.astype(cdt).reshape(g * t, d), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(g, t, d) \
        + bw2[None, None, :]
    return (xf, xhat1, rstd1, xe, a, bgate, s, h, hp, y0, xhat2, rstd2,
            y1, z, v)


def _conv_fwd_kernel(seed_ref, x_ref, m_ref, g1_ref, b1_ref, w1_ref,
                     bw1_ref, wdw_ref, bdw_ref, g2_ref, b2_ref, w2_ref,
                     bw2_ref, y_ref, *, lp_raw, hp_pad, eps, t2, k2, gsz,
                     t, d):
    x = x_ref[:]
    mask = m_ref[:].astype(jnp.float32)[:, :, 0]
    out = _fwd_body(x, mask, g1_ref[0], b1_ref[0], w1_ref[:], bw1_ref[0],
                    wdw_ref[:], bdw_ref[0], g2_ref[0], b2_ref[0],
                    w2_ref[:], bw2_ref[0], lp_raw=lp_raw, hp_pad=hp_pad,
                    eps=eps, cdt=x.dtype)
    xf, v = out[0], out[-1]
    v = v * mask[..., None]
    if t2 is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropmask((gsz * t, d), t2).reshape(gsz, t, d)
        v = jnp.where(keep, v * k2, 0.0)
    y_ref[:] = (xf + v).astype(y_ref.dtype)


def _conv_bwd_kernel(seed_ref, x_ref, m_ref, g1_ref, b1_ref, w1_ref,
                     bw1_ref, wdw_ref, bdw_ref, g2_ref, b2_ref, w2_ref,
                     bw2_ref, dy_ref,
                     dx_ref, dg1_ref, db1_ref, dw1_ref, dbw1_ref,
                     dwdw_ref, dbdw_ref, dg2_ref, db2_ref, dw2_ref,
                     dbw2_ref, *, lp_raw, hp_pad, eps, t2, k2, gsz, t, d):
    x = x_ref[:]
    mask = m_ref[:].astype(jnp.float32)[:, :, 0]
    cdt = x.dtype
    (xf, xhat1, rstd1, xe, a, bgate, s, h, hp, y0, xhat2, rstd2, y1, z,
     v) = _fwd_body(x, mask, g1_ref[0], b1_ref[0], w1_ref[:], bw1_ref[0],
                    wdw_ref[:], bdw_ref[0], g2_ref[0], b2_ref[0],
                    w2_ref[:], bw2_ref[0], lp_raw=lp_raw, hp_pad=hp_pad,
                    eps=eps, cdt=cdt)
    k = wdw_ref.shape[0]
    t_ext = t + lp_raw

    dy = dy_ref[:].astype(jnp.float32)
    dv = dy
    if t2 is not None:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _dropmask((gsz * t, d), t2).reshape(gsz, t, d)
        dv = jnp.where(keep, dv * k2, 0.0)
    dv = dv * mask[..., None]
    dv_c = dv.astype(cdt)
    dz = jax.lax.dot_general(
        dv_c.reshape(gsz * t, d), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(gsz, t, d)
    dy1 = dz * _silu_deriv(y1)
    dy0, dg2_rows, db2_rows = _ln_bwd(dy1, xhat2, rstd2,
                                      g2_ref[0][None, None, :])
    # Depthwise adjoints: dh = correlate(dy0, flipped w) — with hp the
    # symmetric hp_pad-padding of h, dh[τ] = Σ_j dy0p[τ+j]·w[K-1-j]
    # where dy0p pads (K-1-hp_pad) per side; dw[k] = Σ_{g,t} dy0·hp[k:k+T].
    dy0p = jnp.pad(dy0,
                   ((0, 0), (k - 1 - hp_pad, k - 1 - hp_pad), (0, 0)))
    wdw = wdw_ref[:]
    dh = dy0p[:, 0:t_ext, :] * wdw[k - 1][None, None, :]
    for i in range(1, k):
        dh = dh + dy0p[:, i:i + t_ext, :] * wdw[k - 1 - i][None, None, :]
    da = dh * s
    dbg = dh * a * s * (1.0 - s)
    du = jnp.concatenate([da, dbg], axis=-1)
    du_c = du.astype(cdt)
    dxe = jax.lax.dot_general(
        du_c.reshape(gsz * t_ext, 2 * d), w1_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(gsz, t_ext, d)
    dxn = dxe[:, lp_raw:, :] * mask[..., None]
    dx_ln, dg1_rows, db1_rows = _ln_bwd(dxn, xhat1, rstd1,
                                        g1_ref[0][None, None, :])
    dx_ref[:] = (dy + dx_ln).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dg1_ref[:] = jnp.zeros_like(dg1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dbw1_ref[:] = jnp.zeros_like(dbw1_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dbdw_ref[:] = jnp.zeros_like(dbdw_ref)
        dg2_ref[:] = jnp.zeros_like(dg2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dbw2_ref[:] = jnp.zeros_like(dbw2_ref)

    dg1_ref[:] += jnp.sum(dg1_rows, axis=(0, 1))[None, :]
    db1_ref[:] += jnp.sum(db1_rows, axis=(0, 1))[None, :]
    dw1_ref[:] += jax.lax.dot_general(
        xe.reshape(gsz * t_ext, d), du_c.reshape(gsz * t_ext, 2 * d),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbw1_ref[:] += jnp.sum(du, axis=(0, 1))[None, :]
    dwdw_rows = [jnp.sum(dy0 * hp[:, i:i + t, :], axis=(0, 1))
                 for i in range(k)]
    dwdw_ref[:] += jnp.stack(dwdw_rows, axis=0)
    dbdw_ref[:] += jnp.sum(dy0, axis=(0, 1))[None, :]
    dg2_ref[:] += jnp.sum(dg2_rows, axis=(0, 1))[None, :]
    db2_ref[:] += jnp.sum(db2_rows, axis=(0, 1))[None, :]
    dw2_ref[:] += jax.lax.dot_general(
        z.astype(cdt).reshape(gsz * t, d), dv_c.reshape(gsz * t, d),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dbw2_ref[:] += jnp.sum(dv, axis=(0, 1))[None, :]


def _pick_group(b, t, d, arrays=4):
    """Largest batch-group keeping ~``arrays`` live fp32 [G,T,2D]
    intermediates under a 6 MB scoped-VMEM budget (the bwd kernel holds
    ~2.5x the fwd's live set, so it passes a larger ``arrays``)."""
    budget = 6 * 1024 * 1024
    g = max(1, budget // max(1, t * 2 * d * 4 * arrays))
    while b % g:
        g -= 1
    return g


@partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def conv_block_residual(x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2,
                        bw2, seed, causal: bool, rate: float,
                        eps: float = 1e-5, group: int = 0,
                        interpret: bool = False):
    """x + drop(PW2(silu(LN2(DW(GLU(PW1(mask⊙LN1(x))))))))⊙mask.

    x: [B, T, D] compute dtype; mask: [B, T] (1 = valid frame) float;
    g1/b1, g2/b2: LayerNorm scale/bias [D]; w1 [D, 2D], w2 [D, D] compute
    dtype; bw1 [2D], b_dw/bw2 [D] fp32; w_dw [K, D] depthwise taps
    (tap k, channel c); seed: int32 scalar array; rate: output dropout.
    """
    y, _ = _conv_fwd(x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2,
                     bw2, seed, causal, rate, eps, group, interpret)
    return y


def _specs(gsz, t, d, k):
    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return [
        pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((gsz, t, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gsz, t, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const((1, d)), const((1, d)),            # g1, b1
        const((d, 2 * d)), const((1, 2 * d)),    # w1, bw1
        const((k, d)), const((1, d)),            # w_dw, b_dw
        const((1, d)), const((1, d)),            # g2, b2
        const((d, d)), const((1, d)),            # w2, bw2
    ]


def _conv_fwd(x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2, bw2, seed,
              causal, rate, eps, group, interpret):
    b, t, d = x.shape
    k = w_dw.shape[0]
    lp_raw, hp_pad = (k - 1, 0) if causal else (0, (k - 1) // 2)
    t2, k2 = _thresh(rate)
    gsz = group if group > 0 else _pick_group(b, t, d)
    grid = (b // gsz,)
    kern = partial(_conv_fwd_kernel, lp_raw=lp_raw, hp_pad=hp_pad,
                   eps=eps, t2=t2, k2=k2, gsz=gsz, t=t, d=d)
    f32 = jnp.float32
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_specs(gsz, t, d, k),
        out_specs=pl.BlockSpec((gsz, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x,
      mask.astype(f32)[:, :, None],
      g1.astype(f32)[None, :], b1.astype(f32)[None, :], w1,
      bw1.astype(f32)[None, :], w_dw.astype(f32), b_dw.astype(f32)[None, :],
      g2.astype(f32)[None, :], b2.astype(f32)[None, :], w2,
      bw2.astype(f32)[None, :])
    return y, (x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2, bw2, seed)


def _conv_bwd(causal, rate, eps, group, interpret, res, dy):
    x, mask, g1, b1, w1, bw1, w_dw, b_dw, g2, b2, w2, bw2, seed = res
    b, t, d = x.shape
    k = w_dw.shape[0]
    lp_raw, hp_pad = (k - 1, 0) if causal else (0, (k - 1) // 2)
    t2, k2 = _thresh(rate)
    gsz = group if group > 0 else _pick_group(b, t, d, arrays=10)
    grid = (b // gsz,)
    kern = partial(_conv_bwd_kernel, lp_raw=lp_raw, hp_pad=hp_pad,
                   eps=eps, t2=t2, k2=k2, gsz=gsz, t=t, d=d)
    f32 = jnp.float32

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_specs(gsz, t, d, k) + [
            pl.BlockSpec((gsz, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((gsz, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, d)), const((1, d)),
            const((d, 2 * d)), const((1, 2 * d)),
            const((k, d)), const((1, d)),
            const((1, d)), const((1, d)),
            const((d, d)), const((1, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, 2 * d), f32),
            jax.ShapeDtypeStruct((1, 2 * d), f32),
            jax.ShapeDtypeStruct((k, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((d, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), x,
      mask.astype(f32)[:, :, None],
      g1.astype(f32)[None, :], b1.astype(f32)[None, :], w1,
      bw1.astype(f32)[None, :], w_dw.astype(f32), b_dw.astype(f32)[None, :],
      g2.astype(f32)[None, :], b2.astype(f32)[None, :], w2,
      bw2.astype(f32)[None, :], dy.astype(x.dtype))
    (dx, dg1, db1, dw1, dbw1, dwdw, dbdw, dg2, db2, dw2, dbw2) = outs
    return (dx.astype(x.dtype), None, dg1[0].astype(g1.dtype),
            db1[0].astype(b1.dtype), dw1.astype(w1.dtype),
            dbw1[0].astype(bw1.dtype), dwdw.astype(w_dw.dtype),
            dbdw[0].astype(b_dw.dtype), dg2[0].astype(g2.dtype),
            db2[0].astype(b2.dtype), dw2.astype(w2.dtype),
            dbw2[0].astype(bw2.dtype), None)


conv_block_residual.defvjp(_conv_fwd, _conv_bwd)
