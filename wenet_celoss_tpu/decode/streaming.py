"""Simulated / real streaming encode: chunk-by-chunk forward.

Parity with reference ``encoder.forward_chunk_by_chunk``
(`wenet/transformer/encoder.py:270-326`) and the C++ runtime's chunk
arithmetic (`runtime/core/decoder/asr_model.h:41`):

  stride          = subsampling_rate * chunk_size
  decoding_window = (chunk_size - 1) * subsampling_rate + right_context + 1

Each chunk step runs the SAME compiled program (fixed-size cache, traced
offset — see models/encoder.py), so a long stream costs one compile.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def chunk_geometry(subsampling_rate: int, right_context: int,
                   decoding_chunk_size: int) -> Tuple[int, int]:
    stride = subsampling_rate * decoding_chunk_size
    window = (decoding_chunk_size - 1) * subsampling_rate \
        + right_context + 1
    return stride, window


def forward_chunk_by_chunk(forward_chunk_fn: Callable, init_cache,
                           feats: jnp.ndarray,
                           subsampling_rate: int, right_context: int,
                           decoding_chunk_size: int,
                           out_lens: Optional[jnp.ndarray] = None):
    """Encode a full utterance chunk by chunk.

    Args:
      forward_chunk_fn: (xs [B, window, F], cache[, chunk_valid]) ->
        (ys [B, c, D], cache) — typically ``jax.jit(lambda xs, c, v:
        model.apply(params, xs, c, v, method='encoder_forward_chunk'))``.
      init_cache: cache pytree from ``encoder_init_cache``.
      feats: [B, T, F] full features.
      out_lens: optional [B] per-utterance total SUBSAMPLED output frames;
        when given, each call receives chunk_valid [B] = valid output
        frames of that chunk, so shorter utterances in the batch don't
        attend to padding garbage inside their final chunk.
    Returns: (ys [B, T', D] concatenated outputs, final cache)
    """
    b, num_frames, _ = feats.shape
    stride, window = chunk_geometry(subsampling_rate, right_context,
                                    decoding_chunk_size)
    outputs = []
    # (serving keeps this python loop: audio arrives incrementally; the
    # batch-decode path uses forward_chunk_by_chunk_scan below, which
    # compiles the whole chunk sweep into ONE program.)
    cache = init_cache
    cur = 0
    k = 0
    while cur + window <= num_frames:
        chunk = jax.lax.dynamic_slice_in_dim(feats, cur, window, axis=1)
        if out_lens is not None:
            valid = jnp.clip(out_lens - k * decoding_chunk_size, 0,
                             decoding_chunk_size)
            ys, cache = forward_chunk_fn(chunk, cache, valid)
        else:
            ys, cache = forward_chunk_fn(chunk, cache)
        outputs.append(ys)
        cur += stride
        k += 1
    if not outputs:
        raise ValueError(
            f"utterance too short for one chunk: {num_frames} < {window}")
    # ys may be a single array or a pytree of per-chunk arrays (e.g.
    # (encoder_out, ctc_log_probs)); concatenate leaf-wise along time.
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1),
                        *outputs), cache


def forward_chunk_by_chunk_scan(forward_chunk_fn: Callable, init_cache,
                                feats: jnp.ndarray,
                                subsampling_rate: int, right_context: int,
                                decoding_chunk_size: int,
                                out_lens: Optional[jnp.ndarray] = None):
    """`forward_chunk_by_chunk` as ONE `lax.scan` over chunks — for the
    batch decode path, where the whole utterance is available up front.
    The python-loop variant dispatches one program per chunk (a costly
    round trip per chunk on dispatch-latency transports); this compiles
    the full sweep into a single program. Same chunk arithmetic, same
    outputs.
    """
    b, num_frames, _ = feats.shape
    stride, window = chunk_geometry(subsampling_rate, right_context,
                                    decoding_chunk_size)
    n_chunks = (num_frames - window) // stride + 1
    if n_chunks <= 0:
        raise ValueError(
            f"utterance too short for one chunk: {num_frames} < {window}")

    def step(cache, k):
        chunk = jax.lax.dynamic_slice_in_dim(feats, k * stride, window,
                                             axis=1)
        if out_lens is not None:
            valid = jnp.clip(out_lens - k * decoding_chunk_size, 0,
                             decoding_chunk_size)
            out, cache = forward_chunk_fn(chunk, cache, valid)
        else:
            out, cache = forward_chunk_fn(chunk, cache)
        return cache, out

    cache, outs = jax.lax.scan(step, init_cache, jnp.arange(n_chunks))
    # outs leaves are [n_chunks, B, c, ...] → [B, n_chunks*c, ...].
    def merge(x):
        x = jnp.moveaxis(x, 0, 1)                    # [B, n, c, ...]
        return x.reshape((x.shape[0], x.shape[1] * x.shape[2])
                         + x.shape[3:])

    return jax.tree.map(merge, outs), cache
