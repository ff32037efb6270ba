"""Fused 2-layer LSTM sequence Pallas kernel (TPU).

The RNN-T predictor (reference ``wenet/transducer/predictor.py:58-201``)
is a 2-layer LSTM over the [B, U+1] label history. Its FLOPs are trivial
(~9 GFLOP at the flagship point) but the XLA composition runs 2 layers x
U+1 sequential scan steps forward plus the transposed scan backward, each
step a handful of separately-scheduled tiny fusions — measured 13.8 ms
fwd+bwd at B=256, U+1=33 (tools/profile_step.py), >100x its roofline and
the largest single latency item in the non-encoder tower.

This kernel runs the WHOLE sequence for BOTH layers in one ``pallas_call``:
per batch-block, a ``fori_loop`` over the U+1 steps keeps the recurrent
states, both weight matrices' reads, and the inter-layer dropout (on-core
PRNG, re-seeded per (program, step) so the backward can regenerate any
step's mask in reverse order) resident in VMEM. The input-side gate
projections for layer 1 are hoisted OUTSIDE the kernel into one big MXU
matmul (``x @ Wi1 + bh1``), exactly like the hoisted-input XLA path it
replaces (models/predictor.py _run_layers).

The backward kernel recomputes the forward states into VMEM scratch
(ascending pass) then runs the standard LSTM adjoint recurrence
(descending pass), accumulating all three weight grads across the
sequential grid. Nothing but the hoisted input projections is saved
between forward and backward.

Gate math matches flax.linen.OptimizedLSTMCell (order i, f, g, o; bias on
the hidden-side projections only):

    z  = xw_t + h_{t-1} @ Wh          c_t = s(f)*c_{t-1} + s(i)*tanh(g)
    h_t = s(o) * tanh(c_t)

Training-only: initial states are the zeros ``init_state`` produces; the
single-step decode path (``forward_step``) keeps the XLA cell.
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


def _mask(shape, thresh):
    bits = pltpu.prng_random_bits(shape)
    return (bits & jnp.uint32(0xFFFF)) < jnp.uint32(thresh)


def _gates(z):
    """z: [rows, 4H] fp32 → (si, sf, tg, so) each [rows, H]."""
    h = z.shape[-1] // 4
    i_, f_, g_, o_ = (z[:, :h], z[:, h:2 * h], z[:, 2 * h:3 * h],
                      z[:, 3 * h:])
    return (jax.nn.sigmoid(i_), jax.nn.sigmoid(f_), jnp.tanh(g_),
            jax.nn.sigmoid(o_))


def _seed_step(seed_ref, t):
    # Distinct stream per (program, step) so backward can regenerate any
    # step's mask out of order.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 131071 + t * 7919)


def _lstm2_fwd_kernel(seed_ref, xw1_ref, wh1_ref, wi2_ref, bh2_ref,
                      wh2_ref, out_ref, *, u, rows, h, thresh, keep_inv):
    cdt = xw1_ref.dtype

    def body(t, carry):
        h1, c1, h2, c2 = carry
        z1 = xw1_ref[t].astype(jnp.float32) + jax.lax.dot_general(
            h1, wh1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        si, sf, tg, so = _gates(z1)
        c1n = sf * c1.astype(jnp.float32) + si * tg
        h1n = so * jnp.tanh(c1n)
        h1d = h1n
        if thresh is not None:
            _seed_step(seed_ref, t)
            h1d = jnp.where(_mask((rows, h), thresh), h1n * keep_inv, 0.0)
        h1d_c = h1d.astype(cdt)
        z2 = (bh2_ref[0][None, :] + jax.lax.dot_general(
            h1d_c, wi2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + jax.lax.dot_general(
            h2, wh2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        si2, sf2, tg2, so2 = _gates(z2)
        c2n = sf2 * c2.astype(jnp.float32) + si2 * tg2
        h2n = so2 * jnp.tanh(c2n)
        out_ref[t] = h2n.astype(out_ref.dtype)
        return (h1n.astype(cdt), c1n, h2n.astype(cdt), c2n)

    z = jnp.zeros((rows, h), jnp.float32)
    jax.lax.fori_loop(0, u, body,
                      (z.astype(cdt), z, z.astype(cdt), z))


def _lstm2_bwd_kernel(seed_ref, xw1_ref, wh1_ref, wi2_ref, bh2_ref,
                      wh2_ref, dy_ref, dxw1_ref, dwh1_ref, dwi2_ref,
                      dbh2_ref, dwh2_ref, h1s, c1s, h2s, c2s,
                      *, u, rows, h, thresh, keep_inv):
    cdt = xw1_ref.dtype
    zf = jnp.zeros((rows, h), jnp.float32)

    # Phase 1 — forward recompute: states at index t hold (h_t, c_t);
    # slot u is left unused, index -1 (== zeros) is handled via where.
    def fwd_body(t, carry):
        h1, c1, h2, c2 = carry
        z1 = xw1_ref[t].astype(jnp.float32) + jax.lax.dot_general(
            h1, wh1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        si, sf, tg, so = _gates(z1)
        c1n = sf * c1.astype(jnp.float32) + si * tg
        h1n = so * jnp.tanh(c1n)
        h1d = h1n
        if thresh is not None:
            _seed_step(seed_ref, t)
            h1d = jnp.where(_mask((rows, h), thresh), h1n * keep_inv, 0.0)
        h1d_c = h1d.astype(cdt)
        z2 = (bh2_ref[0][None, :] + jax.lax.dot_general(
            h1d_c, wi2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + jax.lax.dot_general(
            h2, wh2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        si2, sf2, tg2, so2 = _gates(z2)
        c2n = sf2 * c2.astype(jnp.float32) + si2 * tg2
        h2n = so2 * jnp.tanh(c2n)
        h1s[t] = h1n.astype(cdt)
        c1s[t] = c1n.astype(cdt)
        h2s[t] = h2n.astype(cdt)
        c2s[t] = c2n.astype(cdt)
        return (h1n.astype(cdt), c1n, h2n.astype(cdt), c2n)

    jax.lax.fori_loop(0, u, fwd_body,
                      (zf.astype(cdt), zf, zf.astype(cdt), zf))

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwh1_ref[:] = jnp.zeros_like(dwh1_ref)
        dwi2_ref[:] = jnp.zeros_like(dwi2_ref)
        dbh2_ref[:] = jnp.zeros_like(dbh2_ref)
        dwh2_ref[:] = jnp.zeros_like(dwh2_ref)

    # Phase 2 — adjoint recurrence, descending t.
    def bwd_body(k, carry):
        t = u - 1 - k
        dh1, dc1, dh2, dc2 = carry
        prev = t > 0
        h1p = jnp.where(prev, h1s[jnp.maximum(t - 1, 0)],
                        zf.astype(cdt))
        c1p = jnp.where(prev, c1s[jnp.maximum(t - 1, 0)],
                        zf.astype(cdt)).astype(jnp.float32)
        h2p = jnp.where(prev, h2s[jnp.maximum(t - 1, 0)],
                        zf.astype(cdt))
        c2p = jnp.where(prev, c2s[jnp.maximum(t - 1, 0)],
                        zf.astype(cdt)).astype(jnp.float32)

        # Recompute layer-1 gates and mask at t.
        z1 = xw1_ref[t].astype(jnp.float32) + jax.lax.dot_general(
            h1p, wh1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        si, sf, tg, so = _gates(z1)
        c1t = c1s[t].astype(jnp.float32)
        h1t = h1s[t].astype(jnp.float32)
        if thresh is not None:
            _seed_step(seed_ref, t)
            keep = _mask((rows, h), thresh)
            h1d = jnp.where(keep, h1t * keep_inv, 0.0)
        else:
            h1d = h1t
        h1d_c = h1d.astype(cdt)
        # Recompute layer-2 gates at t.
        z2 = (bh2_ref[0][None, :] + jax.lax.dot_general(
            h1d_c, wi2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + jax.lax.dot_general(
            h2p, wh2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        si2, sf2, tg2, so2 = _gates(z2)
        tc2 = jnp.tanh(c2s[t].astype(jnp.float32))

        # Layer-2 adjoint.
        dh2t = dy_ref[t].astype(jnp.float32) + dh2
        do2 = dh2t * tc2 * so2 * (1.0 - so2)
        dc2t = dc2 + dh2t * so2 * (1.0 - tc2 * tc2)
        df2 = dc2t * c2p * sf2 * (1.0 - sf2)
        di2 = dc2t * tg2 * si2 * (1.0 - si2)
        dg2 = dc2t * si2 * (1.0 - tg2 * tg2)
        dz2 = jnp.concatenate([di2, df2, dg2, do2], axis=1)
        dz2_c = dz2.astype(cdt)
        dc2_next = dc2t * sf2
        dh2_next = jax.lax.dot_general(
            dz2_c, wh2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh1d = jax.lax.dot_general(
            dz2_c, wi2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if thresh is not None:
            dh1t_drop = jnp.where(keep, dh1d * keep_inv, 0.0)
        else:
            dh1t_drop = dh1d

        # Layer-1 adjoint.
        dh1t = dh1t_drop + dh1
        tc1 = jnp.tanh(c1t)
        do1 = dh1t * tc1 * so * (1.0 - so)
        dc1t = dc1 + dh1t * so * (1.0 - tc1 * tc1)
        df1 = dc1t * c1p * sf * (1.0 - sf)
        di1 = dc1t * tg * si * (1.0 - si)
        dg1 = dc1t * si * (1.0 - tg * tg)
        dz1 = jnp.concatenate([di1, df1, dg1, do1], axis=1)
        dz1_c = dz1.astype(cdt)
        dc1_next = dc1t * sf
        dh1_next = jax.lax.dot_general(
            dz1_c, wh1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        dxw1_ref[t] = dz1_c
        dwh1_ref[:] += jax.lax.dot_general(
            h1p, dz1_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwi2_ref[:] += jax.lax.dot_general(
            h1d_c, dz2_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbh2_ref[:] += jnp.sum(dz2, axis=0)[None, :]
        dwh2_ref[:] += jax.lax.dot_general(
            h2p, dz2_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (dh1_next, dc1_next, dh2_next, dc2_next)

    jax.lax.fori_loop(0, u, bwd_body, (zf, zf, zf, zf))


def fused_rows_for(u: int, batch: int) -> int | None:
    """Batch-block size keeping the kernel inside its proven VMEM
    budget (u*rows ≈ 33*64 at the flagship point), or None when the
    sequence is too long to fuse (callers fall back to the XLA scan —
    e.g. n-best rescoring feeds beam-expanded batches with U up to the
    hypothesis cap)."""
    budget = 33 * 64
    rows = min(64, (budget // max(u, 1)) // 8 * 8)
    if rows < 8:
        return None
    return rows


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def lstm2_seq(xw1, wh1, wi2, bh2, wh2, seed, rate: float, rows: int = 64,
              interpret: bool = False):
    """Two stacked LSTM layers over a whole sequence, zero initial state.

    Args:
      xw1: [B, U, 4H] hoisted layer-1 input projections ``x @ Wi1 + bh1``
        (compute dtype — bf16 on TPU).
      wh1/wi2/wh2: [H, 4H] recurrent / layer-2 input kernels (compute
        dtype); bh2: [4H] fp32 layer-2 hidden bias.
      seed: int32 scalar array — inter-layer dropout stream.
      rate: inter-layer dropout rate (0 ⇒ no PRNG).
    Returns: [B, U, H] layer-2 hidden sequence in xw1.dtype.
    """
    y, _ = _lstm2_fwd(xw1, wh1, wi2, bh2, wh2, seed, rate, rows, interpret)
    return y


def _pad_rows(a, rows):
    b = a.shape[0]
    pad = (-b) % rows
    if pad:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    return a, b


def _lstm2_fwd(xw1, wh1, wi2, bh2, wh2, seed, rate, rows, interpret):
    thresh, keep_inv = _thresh(rate)
    xw1p, b = _pad_rows(xw1, rows)
    u = xw1.shape[1]
    h = wh1.shape[0]
    xw1t = jnp.swapaxes(xw1p, 0, 1)                       # [U, B, 4H]
    grid = (xw1p.shape[0] // rows,)
    kern = partial(_lstm2_fwd_kernel, u=u, rows=rows, h=h, thresh=thresh,
                   keep_inv=keep_inv)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((u, rows, 4 * h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((u, rows, h), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((u, xw1p.shape[0], h), xw1.dtype),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), xw1t, wh1, wi2,
      bh2.astype(jnp.float32)[None, :], wh2)
    return jnp.swapaxes(y, 0, 1)[:b], (xw1, wh1, wi2, bh2, wh2, seed)


def _lstm2_bwd(rate, rows, interpret, res, dy):
    xw1, wh1, wi2, bh2, wh2, seed = res
    thresh, keep_inv = _thresh(rate)
    xw1p, b = _pad_rows(xw1, rows)
    dyp, _ = _pad_rows(dy.astype(xw1.dtype), rows)
    u = xw1.shape[1]
    h = wh1.shape[0]
    xw1t = jnp.swapaxes(xw1p, 0, 1)
    dyt = jnp.swapaxes(dyp, 0, 1)
    grid = (xw1p.shape[0] // rows,)
    kern = partial(_lstm2_bwd_kernel, u=u, rows=rows, h=h, thresh=thresh,
                   keep_inv=keep_inv)
    cdt = xw1.dtype
    dxw1, dwh1, dwi2, dbh2, dwh2 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((u, rows, 4 * h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((u, rows, h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((u, rows, 4 * h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 4 * h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u, xw1p.shape[0], 4 * h), cdt),
            jax.ShapeDtypeStruct((h, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((h, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((h, 4 * h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u, rows, h), cdt),  # h1s
            pltpu.VMEM((u, rows, h), cdt),  # c1s (compute dtype: rows=32
            pltpu.VMEM((u, rows, h), cdt),  # h2s  bwd was 904KB over the
            pltpu.VMEM((u, rows, h), cdt),  # c2s  16MB scoped-vmem limit)
        ],
        # The dropout-on adjoint peaks ~17.2MB of stack at rows=32; v5e
        # has VMEM headroom beyond the 16MB default scoped limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), xw1t, wh1, wi2,
      bh2.astype(jnp.float32)[None, :], wh2, dyt)
    return (jnp.swapaxes(dxw1, 0, 1)[:b].astype(xw1.dtype),
            dwh1.astype(wh1.dtype), dwi2.astype(wi2.dtype),
            dbh2[0].astype(bh2.dtype), dwh2.astype(wh2.dtype), None)


lstm2_seq.defvjp(_lstm2_fwd, _lstm2_bwd)
