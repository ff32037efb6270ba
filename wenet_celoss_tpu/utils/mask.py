"""Attention/padding mask construction — all jit-able, shape-static.

Capability parity with reference ``wenet/utils/mask.py:53-298`` (subsequent
mask, chunk masks, dynamic-chunk training mask, pad mask), re-designed for
XLA: dynamic chunk *sizes* are traced values (drawn inside jit from a PRNG
key), never Python ints, so one compiled program covers every chunk
configuration — the reference re-builds masks eagerly per batch on host.

Convention: masks are boolean, True = attend / valid (same polarity as the
reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] True at PADDED positions (reference `mask.py:195-249`)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, T] True at VALID positions."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[size, size] lower-triangular causal mask (reference `mask.py:53-86`)."""
    i = jnp.arange(size)
    return (i[None, :] <= i[:, None]).astype(dtype)


def subsequent_chunk_mask(size: int, chunk_size: jnp.ndarray,
                          num_left_chunks: jnp.ndarray) -> jnp.ndarray:
    """[size, size] chunk-causal mask with traced chunk parameters.

    Position i may attend to j iff j is within the same or an allowed earlier
    chunk (reference `mask.py:89-124`, generalized so chunk_size /
    num_left_chunks may be traced scalars; num_left_chunks < 0 means
    unlimited left context).
    """
    idx = jnp.arange(size)
    chunk_of = idx // jnp.maximum(chunk_size, 1)
    chunk_end = (chunk_of[:, None] + 1) * chunk_size  # exclusive right edge
    right_ok = idx[None, :] < chunk_end
    start = jnp.where(num_left_chunks < 0, 0,
                      jnp.maximum(chunk_of[:, None] - num_left_chunks, 0) * chunk_size)
    left_ok = idx[None, :] >= start
    return right_ok & left_ok


def add_optional_chunk_mask(
    pad_mask: jnp.ndarray,
    *,
    use_dynamic_chunk: bool,
    use_dynamic_left_chunk: bool,
    decoding_chunk_size: int,
    static_chunk_size: int,
    num_decoding_left_chunks: int,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Build the encoder self-attention mask [B, T, T].

    Mirrors the semantics of reference `wenet/utils/mask.py:127-192`
    (dynamic-chunk training draws chunk size 1..25 or full context with 50%
    probability, and optionally a random number of left chunks) but draws the
    randomness from a JAX PRNG key *inside* jit so the train step never
    retraces.

    Args:
      pad_mask: [B, T] True at valid positions (note: NON-pad polarity).
      decoding_chunk_size: <0 full context, 0 use train default, >0 fixed.
      rng: PRNG key; required when use_dynamic_chunk at train time.
    """
    b, t = pad_mask.shape
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            chunk_size = jnp.asarray(t, jnp.int32)
            num_left = jnp.asarray(-1, jnp.int32)
        elif decoding_chunk_size > 0:
            chunk_size = jnp.asarray(decoding_chunk_size, jnp.int32)
            num_left = jnp.asarray(num_decoding_left_chunks, jnp.int32)
        else:
            assert rng is not None, "dynamic chunk training needs a PRNG key"
            k1, k2 = jax.random.split(rng)
            draw = jax.random.randint(k1, (), 1, t + 1)  # 1..T
            # Reference: chunk > T//2 → full context; else 1..25.
            chunk_size = jnp.where(draw > t // 2, t, draw % 25 + 1).astype(jnp.int32)
            if use_dynamic_left_chunk:
                max_left = jnp.maximum((t + chunk_size - 1) // chunk_size - 1, 1)
                num_left = jax.random.randint(k2, (), 0, max_left + 1).astype(jnp.int32)
            else:
                num_left = jnp.asarray(-1, jnp.int32)
        chunk_mask = subsequent_chunk_mask(t, chunk_size, num_left)
        att_mask = pad_mask[:, None, :] & chunk_mask[None, :, :]
    elif static_chunk_size > 0:
        cs = decoding_chunk_size if decoding_chunk_size > 0 else static_chunk_size
        nl = num_decoding_left_chunks if decoding_chunk_size > 0 else -1
        chunk_mask = subsequent_chunk_mask(
            t, jnp.asarray(cs, jnp.int32), jnp.asarray(nl, jnp.int32))
        att_mask = pad_mask[:, None, :] & chunk_mask[None, :, :]
    else:
        att_mask = pad_mask[:, None, :] & pad_mask[:, :, None]
    return att_mask
