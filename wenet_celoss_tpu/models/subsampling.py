"""Convolutional frame-rate subsampling frontends.

Parity with reference ``wenet/transformer/subsampling.py:35-240``
(LinearNoSubsampling, Conv2dSubsampling4/6/8), each exposing
``subsampling_rate`` and ``right_context`` for streaming chunk arithmetic
(4/6, 6/10, 8/14 — consumed by the runtime at
`runtime/core/decoder/asr_model.h:41`).

Each module returns (x, pos_emb, subsampled_lengths). The 2-D convs run in
NHWC with feature-last layout, which is the TPU-native conv layout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax.numpy as jnp


class LinearNoSubsampling(nn.Module):
    odim: int
    dropout_rate: float
    pos_enc: Any
    subsampling_rate: int = 1
    right_context: int = 0
    dtype: Any = None

    def setup(self):
        self.out = nn.Dense(self.odim, dtype=self.dtype)
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.dropout = FastDropout(self.dropout_rate)

    def __call__(self, x, lengths, offset=0, *, deterministic=True):
        x = self.dropout(self.norm(self.out(x)), deterministic=deterministic)
        x, pos_emb = self.pos_enc(x, offset, deterministic=deterministic)
        return x, pos_emb, lengths


def _conv_out_len(n, kernel=3, stride=2):
    return (n - kernel) // stride + 1


def _ref_mask_len(n, stride):
    """Valid length after one of the reference's mask-subsampling slices
    (x_mask[:, :, :-2:2] / [:, :, :-4:3], reference
    `wenet/transformer/subsampling.py:81-240`). The reference derives
    output lengths by STRIDING THE PAD MASK, which counts
    (L-1)//stride + 1 frames valid — slightly MORE than the conv-content
    formula for partially-padded rows (the extra frames are computed from
    zero padding but treated as valid downstream). Decode parity requires
    matching this exactly; callers clip to the actual frame count."""
    return (n - 1) // stride + 1


class Conv2dSubsampling4(nn.Module):
    """Two stride-2 3x3 convs: rate 4, right_context 6."""
    odim: int
    dropout_rate: float
    pos_enc: Any
    subsampling_rate: int = 4
    right_context: int = 6
    dtype: Any = None

    def setup(self):
        self.conv1 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.conv2 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.out = nn.Dense(self.odim, dtype=self.dtype)

    def __call__(self, x, lengths, offset=0, *, deterministic=True):
        # x: [B, T, F] → NHWC [B, T, F, 1]
        h = x[..., None]
        h = nn.relu(self.conv1(h))
        h = nn.relu(self.conv2(h))
        b, t, f, c = h.shape
        h = self.out(h.reshape(b, t, f * c))
        h, pos_emb = self.pos_enc(h, offset, deterministic=deterministic)
        new_len = jnp.minimum(_ref_mask_len(_ref_mask_len(lengths, 2), 2), t)
        return h, pos_emb, new_len


class Conv2dSubsampling6(nn.Module):
    """3x3/2 then 5x5/3 convs: rate 6, right_context 10."""
    odim: int
    dropout_rate: float
    pos_enc: Any
    subsampling_rate: int = 6
    right_context: int = 10
    dtype: Any = None

    def setup(self):
        self.conv1 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.conv2 = nn.Conv(self.odim, (5, 5), strides=(3, 3),
                             padding="VALID", dtype=self.dtype)
        self.out = nn.Dense(self.odim, dtype=self.dtype)

    def __call__(self, x, lengths, offset=0, *, deterministic=True):
        h = x[..., None]
        h = nn.relu(self.conv1(h))
        h = nn.relu(self.conv2(h))
        b, t, f, c = h.shape
        h = self.out(h.reshape(b, t, f * c))
        h, pos_emb = self.pos_enc(h, offset, deterministic=deterministic)
        new_len = jnp.minimum(_ref_mask_len(_ref_mask_len(lengths, 2), 3), t)
        return h, pos_emb, new_len


class Conv2dSubsampling8(nn.Module):
    """Three stride-2 3x3 convs: rate 8, right_context 14."""
    odim: int
    dropout_rate: float
    pos_enc: Any
    subsampling_rate: int = 8
    right_context: int = 14
    dtype: Any = None

    def setup(self):
        self.conv1 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.conv2 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.conv3 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype)
        self.out = nn.Dense(self.odim, dtype=self.dtype)

    def __call__(self, x, lengths, offset=0, *, deterministic=True):
        h = x[..., None]
        h = nn.relu(self.conv1(h))
        h = nn.relu(self.conv2(h))
        h = nn.relu(self.conv3(h))
        b, t, f, c = h.shape
        h = self.out(h.reshape(b, t, f * c))
        h, pos_emb = self.pos_enc(h, offset, deterministic=deterministic)
        new_len = jnp.minimum(
            _ref_mask_len(_ref_mask_len(_ref_mask_len(lengths, 2), 2), 2), t)
        return h, pos_emb, new_len


SUBSAMPLE_CLASSES = {
    "linear": LinearNoSubsampling,
    "conv2d": Conv2dSubsampling4,
    "conv2d6": Conv2dSubsampling6,
    "conv2d8": Conv2dSubsampling8,
}


def subsampled_length(input_layer: str, lengths):
    """Output frame count of the given subsampling frontend (mirrors each
    class's ``__call__`` length arithmetic; usable outside a module)."""
    if input_layer == "linear":
        return lengths
    if input_layer == "conv2d":
        return _ref_mask_len(_ref_mask_len(lengths, 2), 2)
    if input_layer == "conv2d6":
        return _ref_mask_len(_ref_mask_len(lengths, 2), 3)
    if input_layer == "conv2d8":
        return _ref_mask_len(_ref_mask_len(_ref_mask_len(lengths, 2), 2), 2)
    raise ValueError(input_layer)
