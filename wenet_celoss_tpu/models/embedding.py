"""Positional encodings with streaming offset support.

Parity with reference ``wenet/transformer/embedding.py:72-210``
(PositionalEncoding, RelPositionalEncoding, NoPositionalEncoding), including
the streaming ``position_encoding(offset, size)`` path where the offset may
be a per-utterance traced array (reference `embedding.py:124-160`). The
sinusoid table is computed lazily from shapes — no fixed max_len buffer to
save in checkpoints.
"""

from __future__ import annotations

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax.numpy as jnp
import numpy as np


def sinusoid_table(positions: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """positions [...,] → [..., d_model] interleaved sin/cos table."""
    inv = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * -(np.log(10000.0) / d_model))
    ang = positions[..., None].astype(jnp.float32) * inv
    pe = jnp.zeros(positions.shape + (d_model,), jnp.float32)
    pe = pe.at[..., 0::2].set(jnp.sin(ang))
    pe = pe.at[..., 1::2].set(jnp.cos(ang))
    return pe


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal encoding, additive, with xscale = sqrt(d)."""
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size: int) -> jnp.ndarray:
        """offset: python int or [B] array; returns [1|B, size, d]."""
        pos = jnp.asarray(offset)[..., None] + jnp.arange(size)
        if pos.ndim == 1:
            pos = pos[None, :]
        return sinusoid_table(pos, self.d_model)

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset=0, *, deterministic: bool = True):
        pe = self.pos_emb(offset, x.shape[1]).astype(x.dtype)
        x = x * jnp.asarray(self.d_model**0.5, x.dtype) + pe
        x = FastDropout(self.dropout_rate, deterministic=deterministic)(x)
        return x, pe


class RelPositionalEncoding(nn.Module):
    """Relative variant: scales x, returns pos_emb separately
    (reference `embedding.py:162-189`)."""
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size: int) -> jnp.ndarray:
        pos = jnp.asarray(offset)[..., None] + jnp.arange(size)
        if pos.ndim == 1:
            pos = pos[None, :]
        return sinusoid_table(pos, self.d_model)

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset=0, *, deterministic: bool = True):
        pe = self.pos_emb(offset, x.shape[1]).astype(x.dtype)
        x = x * jnp.asarray(self.d_model**0.5, x.dtype)
        x = FastDropout(self.dropout_rate, deterministic=deterministic)(x)
        return x, pe


class NoPositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.1

    def pos_emb(self, offset, size: int) -> jnp.ndarray:
        return jnp.zeros((1, size, self.d_model), jnp.float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, offset=0, *, deterministic: bool = True):
        x = FastDropout(self.dropout_rate, deterministic=deterministic)(x)
        return x, jnp.zeros((1, x.shape[1], self.d_model), x.dtype)
