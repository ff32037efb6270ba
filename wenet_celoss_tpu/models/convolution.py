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

    def _conv_body(self, h, *, train: bool):
        """h: [B, T_padded, C] post-GLU, already padded for the kernel."""
        y = self.depthwise_conv(h)
        if self.norm == "batch_norm":
            y = self.norm_layer(y, use_running_average=not train)
        else:
            y = self.norm_layer(y)
        y = nn.silu(y)
        return self.pointwise_conv2(y)

    def _use_ln_mm(self):
        # Default OFF — measured slower than XLA's composition; see the
        # decision note in models/attention.py _use_ln_mm.
        import os

        import jax
        return (jax.default_backend() == "tpu"
                and os.environ.get("LNMM_PALLAS", "0") in ("1", "conv"))

    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray | None = None,
                 *, train: bool = False, ln=None) -> jnp.ndarray:
        """x: [B, T, C]; pad_mask: [B, T] True at valid frames.

        Masking matches the reference exactly (`convolution.py:111-145`):
        the RAW input is zeroed at padded frames (so after the biased
        pointwise1 + GLU those frames carry GLU(bias), not zero), causal
        left-padding happens in the raw domain, the non-causal depthwise
        conv's own window padding is zero in the post-GLU domain, and the
        OUTPUT is re-zeroed at padded frames.

        With a pre-norm module passed as ``ln`` (the conformer layer's
        norm_conv) the LayerNorm + input masking fuse INTO the
        pointwise-conv1 projection as one Pallas kernel; the causal
        left-pad moves to the pointwise-conv1 OUTPUT as bias rows
        (pointwise_conv1(0) == its bias, so both orders are identical).
        """
        if (ln is not None and not self.is_initializing()
                and self._use_ln_mm()):
            from wenet_celoss_tpu.ops.ffn_pallas import ln_matmul
            pn = ln.variables["params"]
            p1 = self.pointwise_conv1.variables["params"]
            cdt = jnp.dtype(self.dtype) if self.dtype is not None \
                else x.dtype
            b, t, c = x.shape
            bias1 = p1.get("bias", jnp.zeros((2 * c,), jnp.float32))
            rowmask = None
            if pad_mask is not None:
                rowmask = pad_mask.reshape(b * t, 1).astype(jnp.float32)
            h = ln_matmul(x.reshape(b * t, c).astype(cdt), pn["scale"],
                          pn["bias"], p1["kernel"].astype(cdt), bias1,
                          rowmask).reshape(b, t, 2 * c)
            if self.causal and self.lorder > 0:
                padrow = jnp.broadcast_to(bias1.astype(h.dtype),
                                          (b, self.lorder, 2 * c))
                h = jnp.concatenate([padrow, h], axis=1)
            h = nn.glu(h, axis=-1)
            if not self.causal:
                pad = (self.kernel_size - 1) // 2
                h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            y = self._conv_body(h, train=train)
            if pad_mask is not None:
                y = jnp.where(pad_mask[..., None], y, 0.0)
            return y
        if ln is not None:
            x = ln(x)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        if self.causal:
            x = jnp.pad(x, ((0, 0), (self.lorder, 0), (0, 0)))
        h = self.pointwise_conv1(x)
        h = nn.glu(h, axis=-1)
        if not self.causal:
            pad = (self.kernel_size - 1) // 2
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        y = self._conv_body(h, train=train)
        if pad_mask is not None:
            y = jnp.where(pad_mask[..., None], y, 0.0)
        return y

    def forward_with_cache(self, x: jnp.ndarray, cnn_cache: jnp.ndarray,
                           *, train: bool = False):
        """Streaming step (causal only).

        The cache lives in the RAW input domain (last ``lorder`` frames of
        the module input, reference `convolution.py:113-127`), so a zero
        initial cache reproduces the reference's zero left-pad exactly.

        Args:
          x: [B, T_chunk, C]; cnn_cache: [B, lorder, C] raw input frames.
        Returns: (out [B, T_chunk, C], new_cache [B, lorder, C])
        """
        assert self.causal, "cache streaming only defined for causal conv"
        x_ext = jnp.concatenate([cnn_cache.astype(x.dtype), x], axis=1)
        new_cache = x_ext[:, -self.lorder:, :] if self.lorder > 0 else \
            jnp.zeros_like(cnn_cache)
        h = self.pointwise_conv1(x_ext)
        h = nn.glu(h, axis=-1)
        return self._conv_body(h, train=train), new_cache
