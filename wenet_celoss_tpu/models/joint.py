"""Transducer joint network.

Parity with reference ``wenet/transducer/joint.py:9-70``: optional pre-join
linear projections of encoder/predictor streams to join_dim, broadcast add
over [B, T, U, V], activation (tanh), output linear to vocab.

`single` computes one (t, u) cell batch — used by greedy/beam decoding so
the [B, T, U, V] tensor is never materialized at decode time.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import get_activation


class TransducerJoint(nn.Module):
    voca_size: int
    enc_output_size: int
    pred_output_size: int
    join_dim: int
    prejoin_linear: bool = True
    postjoin_linear: bool = False
    joint_mode: str = "add"
    activation: str = "tanh"
    dtype: object = None

    def setup(self):
        assert self.joint_mode == "add"
        if not self.prejoin_linear and not self.postjoin_linear:
            assert self.enc_output_size == self.pred_output_size == \
                self.join_dim
        if self.prejoin_linear:
            self.enc_ffn = nn.Dense(self.join_dim, dtype=self.dtype)
            self.pred_ffn = nn.Dense(self.join_dim, dtype=self.dtype)
        if self.postjoin_linear:
            self.post_ffn = nn.Dense(self.join_dim, dtype=self.dtype)
        self.ffn_out = nn.Dense(self.voca_size, dtype=self.dtype)

    def _combine(self, enc, pred):
        act = get_activation(self.activation)
        out = enc + pred
        if self.postjoin_linear:
            out = self.post_ffn(out)
        return self.ffn_out(act(out))

    def __call__(self, enc_out: jnp.ndarray, pred_out: jnp.ndarray):
        """enc_out [B, T, E], pred_out [B, U, P] → [B, T, U, V]."""
        if self.prejoin_linear:
            enc_out = self.enc_ffn(enc_out)
            pred_out = self.pred_ffn(pred_out)
        return self._combine(enc_out[:, :, None, :], pred_out[:, None, :, :])

    def pruned(self, enc_out: jnp.ndarray, pred_w: jnp.ndarray):
        """enc_out [B, T, E], pred_w [B, T, S, P] (predictor rows gathered
        per pruned window, ops/rnnt_loss.get_rnnt_prune_ranges) →
        [B, T, S, V]. The full [B, T, U+1, V] joint never exists."""
        if self.prejoin_linear:
            enc_out = self.enc_ffn(enc_out)
            pred_w = self.pred_ffn(pred_w)
        return self._combine(enc_out[:, :, None, :], pred_w)

    def project(self, enc_out: jnp.ndarray, pred_out: jnp.ndarray):
        """Pre-join projections only — feeds the streaming-V loss
        (ops/rnnt_loss.rnnt_loss_streaming), which applies act + output
        layer chunk-by-chunk so [B, T, U, V] never materializes."""
        if self.prejoin_linear:
            return self.enc_ffn(enc_out), self.pred_ffn(pred_out)
        return enc_out, pred_out

    def output_params(self):
        """(kernel [H, V], bias [V]) of the output layer, for the
        streaming loss. Touches ffn_out at init so the params exist."""
        assert not self.postjoin_linear, \
            "streaming loss supports prejoin add-joint only"
        if self.is_initializing():
            self.ffn_out(jnp.zeros((1, self.join_dim)))
        params = self.ffn_out.variables["params"]
        return params["kernel"], params["bias"]

    def single(self, enc_t: jnp.ndarray, pred_u: jnp.ndarray):
        """enc_t [B, E], pred_u [B, P] → logits [B, V] (decode hot path)."""
        if self.prejoin_linear:
            enc_t = self.enc_ffn(enc_t)
            pred_u = self.pred_ffn(pred_u)
        return self._combine(enc_t, pred_u)

    def project_enc(self, enc_out: jnp.ndarray):
        """[B, T, E] → pre-joined [B, T, J]; hoisted out of the
        label-synchronous greedy loop (computed once per utterance)."""
        return self.enc_ffn(enc_out) if self.prejoin_linear else enc_out

    def frames(self, enc_j: jnp.ndarray, pred_u: jnp.ndarray):
        """enc_j [B, T, J] (pre-projected), pred_u [B, P] → logits
        [B, T, V]: one predictor state joined against EVERY frame — the
        big MXU-friendly matmul at the heart of label-synchronous greedy
        decoding."""
        p = self.pred_ffn(pred_u) if self.prejoin_linear else pred_u
        return self._combine(enc_j, p[:, None, :])
