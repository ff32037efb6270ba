"""Conformer convolution module with causal-cache streaming.

Parity with reference ``wenet/transformer/convolution.py:25-146``:
pointwise conv ×2 → GLU → depthwise conv (causal with lorder left-pad when
streaming) → norm (batch or layer) → swish → pointwise. The streaming cache
is the last ``lorder`` frames of the pre-depthwise activation
(reference `convolution.py:113-127`).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    norm: str = "batch_norm"   # batch_norm | layer_norm
    causal: bool = False
    use_bias: bool = True
    dtype: object = None

    def setup(self):
        self.pointwise_conv1 = nn.Dense(2 * self.channels,
                                        use_bias=self.use_bias,
                                        dtype=self.dtype)
        # Depthwise conv over time: feature_group_count = channels.
        self.depthwise_conv = nn.Conv(
            features=self.channels, kernel_size=(self.kernel_size,),
            feature_group_count=self.channels, padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype)
        if self.norm == "batch_norm":
            assert not self.causal, \
                "causal streaming requires layer_norm (ref convolution.py:49)"
            self.norm_layer = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        else:
            self.norm_layer = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.pointwise_conv2 = nn.Dense(self.channels,
                                        use_bias=self.use_bias,
                                        dtype=self.dtype)
        self.lorder = self.kernel_size - 1 if self.causal else 0

    def _conv_body(self, x, pad_mask, *, train: bool):
        """x: [B, T_padded, C] already left/right padded for the kernel."""
        y = self.depthwise_conv(x)
        if self.norm == "batch_norm":
            y = self.norm_layer(y, use_running_average=not train)
        else:
            y = self.norm_layer(y)
        y = nn.silu(y)
        return self.pointwise_conv2(y)

    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray | None = None,
                 *, train: bool = False) -> jnp.ndarray:
        """x: [B, T, C]; pad_mask: [B, T] True at valid frames."""
        h = self.pointwise_conv1(x)
        h = nn.glu(h, axis=-1)
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], h, 0.0)
        if self.causal:
            h = jnp.pad(h, ((0, 0), (self.lorder, 0), (0, 0)))
        else:
            pad = (self.kernel_size - 1) // 2
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        return self._conv_body(h, pad_mask, train=train)

    def forward_with_cache(self, x: jnp.ndarray, cnn_cache: jnp.ndarray,
                           *, train: bool = False):
        """Streaming step (causal only).

        Args:
          x: [B, T_chunk, C]; cnn_cache: [B, lorder, C] past activations.
        Returns: (out [B, T_chunk, C], new_cache [B, lorder, C])
        """
        assert self.causal, "cache streaming only defined for causal conv"
        h = self.pointwise_conv1(x)
        h = nn.glu(h, axis=-1)
        h_ext = jnp.concatenate([cnn_cache.astype(h.dtype), h], axis=1)
        new_cache = h_ext[:, -self.lorder:, :] if self.lorder > 0 else \
            jnp.zeros_like(cnn_cache)
        return self._conv_body(h_ext, None, train=train), new_cache
