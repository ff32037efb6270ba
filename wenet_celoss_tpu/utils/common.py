"""Sequence/label helpers shared by models, losses and decoders.

Capability parity with the reference's ``wenet/utils/common.py`` (IGNORE_ID,
pad_list, add_blank, add_sos_eos, reverse_pad_list, th_accuracy, log_add,
remove_duplicates_and_blank — reference `wenet/utils/common.py:23-276`), but
re-designed for XLA: every function here is shape-static and jit-able; the
padded batch is the native representation (no Python lists of tensors inside
jit).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

IGNORE_ID = -1


def pad_list(xs: Sequence[np.ndarray], pad_value: int | float) -> np.ndarray:
    """Host-side: pad a list of 1-D/2-D numpy arrays to a dense batch."""
    n = len(xs)
    max_len = max(int(x.shape[0]) for x in xs)
    rest = xs[0].shape[1:]
    out = np.full((n, max_len) + tuple(rest), pad_value, dtype=xs[0].dtype)
    for i, x in enumerate(xs):
        out[i, : x.shape[0]] = x
    return out


def add_sos_eos(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray, sos: int, eos: int,
                ignore_id: int = IGNORE_ID) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prepend <sos> and append <eos> to padded label sequences.

    Unlike the reference (list-based, `wenet/utils/common.py:122-165`) this is
    a fully batched/jit-able transform: input [B, U] padded with ``ignore_id``,
    output ``ys_in`` [B, U+1] (sos + labels, pad=eos) and ``ys_out`` [B, U+1]
    (labels + eos, pad=ignore_id).
    """
    b, u = ys_pad.shape
    valid = jnp.arange(u)[None, :] < ys_lens[:, None]
    ys = jnp.where(valid, ys_pad, 0)
    ys_in = jnp.concatenate(
        [jnp.full((b, 1), sos, ys_pad.dtype), jnp.where(valid, ys, eos)], axis=1)
    # ys_out: labels then eos at position ys_lens, ignore_id after.
    pos = jnp.arange(u + 1)[None, :]
    ys_ext = jnp.concatenate([ys, jnp.zeros((b, 1), ys_pad.dtype)], axis=1)
    ys_out = jnp.where(pos < ys_lens[:, None], ys_ext,
                       jnp.where(pos == ys_lens[:, None], eos, ignore_id))
    return ys_in, ys_out


def add_blank(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray, blank: int,
              ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Prepend the RNN-T blank to label sequences (predictor input).

    Batched equivalent of reference `wenet/utils/common.py:56-88`: output
    [B, U+1] = [blank, y_1..y_U, pad...] with pad = blank (the predictor
    embeds pads but they are masked downstream).
    """
    b, u = ys_pad.shape
    valid = jnp.arange(u)[None, :] < ys_lens[:, None]
    ys = jnp.where(valid, ys_pad, blank)
    return jnp.concatenate([jnp.full((b, 1), blank, ys_pad.dtype), ys], axis=1)


def reverse_pad_list(ys_pad: jnp.ndarray, ys_lens: jnp.ndarray,
                     pad_value: float = float(IGNORE_ID)) -> jnp.ndarray:
    """Reverse each padded sequence in time (for the R2L decoder).

    Batched equivalent of reference `wenet/utils/common.py:168-193` via a
    length-dependent gather instead of per-sequence flips.
    """
    b, u = ys_pad.shape
    idx = ys_lens[:, None] - 1 - jnp.arange(u)[None, :]
    valid = idx >= 0
    gathered = jnp.take_along_axis(ys_pad, jnp.maximum(idx, 0), axis=1)
    return jnp.where(valid, gathered, jnp.asarray(pad_value, ys_pad.dtype))


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray,
             ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """Token accuracy over non-ignored positions (reference th_accuracy,
    `wenet/utils/common.py:196-225`)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = targets != ignore_id
    correct = jnp.sum((pred == targets) & mask)
    total = jnp.maximum(jnp.sum(mask), 1)
    return correct.astype(jnp.float32) / total.astype(jnp.float32)


def log_add(args: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically stable log-sum-exp (reference log_add,
    `wenet/utils/common.py:268-276`)."""
    return jax.nn.logsumexp(args, axis=axis)


# Log-domain "zero". Deliberately NOT -inf or -1e30: XLA's vectorized exp
# does range reduction with k = round(x / ln2) and k must fit an int32, so
# exp(-1e30) can return garbage (~2e-5 on CPU) instead of 0. -1e6 keeps
# k ≈ -1.4e6 well inside int32 while being unreachable by any legitimate
# accumulated log-probability.
LOG_ZERO = -1.0e6


def remove_duplicates_and_blank(hyp: Sequence[int], blank: int = 0) -> List[int]:
    """Host-side CTC collapse (reference `wenet/utils/common.py:256-265`)."""
    out: List[int] = []
    prev = -1
    for t in hyp:
        t = int(t)
        if t != blank and t != prev:
            out.append(t)
        prev = t
    return out


def get_activation(name: str):
    """Activation registry (reference `wenet/utils/common.py:228-253`)."""
    acts = {
        "hardtanh": lambda x: jnp.clip(x, -1.0, 1.0),
        "tanh": jnp.tanh,
        "relu": jax.nn.relu,
        "selu": jax.nn.selu,
        "gelu": jax.nn.gelu,
        "swish": jax.nn.silu,
    }
    if name not in acts:
        raise ValueError(f"unknown activation: {name}")
    return acts[name]
