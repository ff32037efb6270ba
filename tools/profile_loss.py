"""Decompose the streaming RNN-T loss cost: lattice recursions vs the
chunked joint (matmul + log-softmax + plane gather), plus CTC loss parts.

Usage: BENCH_BATCH=256 python tools/profile_loss.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=8, windows=3, name=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    print(f"[loss-profile] {name}: compiled in "
          f"{time.perf_counter()-t0:.0f}s", flush=True)
    rates = []
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    print(f"[loss-profile] {name}: {rates[1]*1000:.1f} ms", flush=True)
    return rates[1]


def main():
    from wenet_celoss_tpu.ops.rnnt_loss import (rnnt_loss_planes,
                                                rnnt_loss_streaming)
    from wenet_celoss_tpu.ops.ctc_loss import ctc_loss
    from wenet_celoss_tpu.utils.platform import configure_tpu_runtime

    configure_tpu_runtime()
    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_TSUB", "127"))
    u = int(os.environ.get("BENCH_LABELS", "32"))
    v = int(os.environ.get("BENCH_VOCAB", "1024"))
    h = int(os.environ.get("BENCH_JOINT", "512"))
    rng = np.random.default_rng(0)

    labels = jnp.asarray(rng.integers(1, v - 2, (b, u)), jnp.int32)
    tlens = jnp.full((b,), t, jnp.int32)
    ulens = jnp.full((b,), u, jnp.int32)

    # --- lattice only: planes → loss (custom VJP alpha/beta scans) ---
    blank_lp = jnp.asarray(np.log(np.abs(rng.standard_normal((b, t, u + 1)))
                                  * 0.1 + 1e-3), jnp.float32)
    emit_lp = jnp.asarray(np.log(np.abs(rng.standard_normal((b, t, u + 1)))
                                 * 0.1 + 1e-3), jnp.float32)

    def lat(bp, ep):
        return jnp.mean(rnnt_loss_planes(bp, ep, tlens, ulens))

    timed(jax.jit(jax.grad(lat, argnums=(0, 1))), (blank_lp, emit_lp),
          name="lattice(planes fwd+bwd)")

    def lat_fwd(bp, ep):
        return jnp.mean(rnnt_loss_planes(bp, ep, tlens, ulens))

    timed(jax.jit(lat_fwd), (blank_lp, emit_lp), name="lattice(fwd only)")

    # --- joint chunk scan only (planes computed, lattice replaced by sum)
    enc_j = jnp.asarray(rng.standard_normal((b, t, h)), jnp.bfloat16)
    pred_j = jnp.asarray(rng.standard_normal((b, u + 1, h)), jnp.bfloat16)
    w_out = jnp.asarray(rng.standard_normal((h, v)) * 0.05, jnp.float32)
    b_out = jnp.zeros((v,), jnp.float32)

    from wenet_celoss_tpu.utils.common import LOG_ZERO, get_activation

    def joint_only(ej, pj, w, bb):
        # replicate rnnt_loss_streaming's chunk scan but reduce planes
        # with a sum instead of the lattice (isolates the joint cost).
        act = get_activation("tanh")
        chunk = 16
        bsz, t_max, hh = ej.shape
        u1 = pj.shape[1]
        lab = jnp.concatenate([labels, jnp.zeros((bsz, 1), labels.dtype)],
                              axis=1)
        n_chunks = -(-t_max // chunk)
        t_pad = n_chunks * chunk
        if t_pad != t_max:
            ej = jnp.pad(ej, ((0, 0), (0, t_pad - t_max), (0, 0)))
        chunks = ej.reshape(bsz, n_chunks, chunk, hh).swapaxes(0, 1)
        w_c = w.astype(ej.dtype)
        b_f = bb.astype(jnp.float32)

        @jax.checkpoint
        def step(carry, enc_c):
            hidden = act(enc_c[:, :, None, :]
                         + pj.astype(ej.dtype)[:, None, :, :])
            logits = jnp.einsum("btuh,hv->btuv", hidden, w_c,
                                preferred_element_type=jnp.float32) + b_f
            lp = jax.nn.log_softmax(logits, axis=-1)
            blank_c = lp[..., 0]
            emit_c = jnp.take_along_axis(
                lp, lab[:, None, :, None].repeat(lp.shape[1], 1),
                axis=3)[..., 0]
            return carry, (blank_c, emit_c)

        _, (bc, ec) = jax.lax.scan(step, 0., chunks)
        return jnp.sum(bc) + jnp.sum(ec)

    timed(jax.jit(jax.grad(joint_only, argnums=(0, 1, 2))),
          (enc_j, pred_j, w_out, b_out), name="joint-chunks(fwd+bwd)")

    # --- full streaming loss for reference ---
    def full(ej, pj, w, bb):
        return jnp.mean(rnnt_loss_streaming(ej, pj, w, bb, labels, tlens,
                                            ulens, 0, activation="tanh",
                                            chunk=16))

    timed(jax.jit(jax.grad(full, argnums=(0, 1, 2))),
          (enc_j, pred_j, w_out, b_out), name="streaming-loss(full)")

    # --- CTC parts ---
    logp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32), axis=-1)

    def ctc(lp):
        return jnp.mean(ctc_loss(lp, labels, tlens, ulens, 0))

    timed(jax.jit(jax.grad(ctc)), (logp,), name="ctc(fwd+bwd)")
    timed(jax.jit(ctc), (logp,), name="ctc(fwd only)")


if __name__ == "__main__":
    main()
