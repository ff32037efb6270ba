"""Transducer (RNN-T) model with contextual biasing + hotword CE loss.

Parity with reference ``wenet/transducer/transducer.py:20-331``: conformer
encoder + predictor + additive joint, loss =
``transducer_weight * RNNT + ctc_weight * CTC + attention_weight * AED
+ hw_weight * CE(hotword-gate)`` with the fork's three hotword loss modes
(`transducer.py:170-262`):
- 'pred': classify from the unbiased predictor stream attending over the
  hotword list; targets = hw_label (binary per token).
- 'both': dec-bias queries attend over enc-bias keys in a unified hw
  space; targets = hw_label.
- 'sep': independent dec-side projection classifies per-phrase ids;
  targets = blank-prepended hw_label.

The RNN-T loss is the wavefront-scan implementation in ops/rnnt_loss.py
(replacing torchaudio.functional.rnnt_loss).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wenet_celoss_tpu.models.asr_model import ASRModel
from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_fused
from wenet_celoss_tpu.utils.common import IGNORE_ID, add_blank


def _cross_entropy_mean(logits: jnp.ndarray, targets: jnp.ndarray):
    """Plain CE, mean over ALL positions (the reference's hw criterion uses
    no ignore mask — padding was mapped to class 0/blank first,
    `transducer.py:63-66,175-201`)."""
    logq = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logq, targets[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


class Transducer(ASRModel):
    """Fields beyond ASRModel all carry defaults (dataclass inheritance)."""
    blank: int = 0
    predictor: Optional[nn.Module] = None
    joint: Optional[nn.Module] = None
    context_bias: Optional[nn.Module] = None
    transducer_weight: float = 1.0
    attention_weight: float = 0.0
    hw_weight: float = 0.0
    loss_mode: str = "both"   # pred | both | sep
    # RNN-T loss implementation: "scan" (XLA wavefront + autodiff),
    # "fused" (closed-form-VJP: ~halves peak HBM, softmax recompute in
    # backward), "pallas" (single-kernel lattice + closed-form VJP),
    # "pruned" (k2-style: factored simple loss picks per-frame label
    # windows; the full joint runs only on [B,T,prune_range,V] — the
    # large-vocab formulation, reference direction transducer_k2_loss.py),
    # "streaming" (exact loss; joint applied in T-chunks under remat so
    # [B,T,U,V] never exists — see ops/rnnt_loss.rnnt_loss_streaming).
    rnnt_impl: str = "scan"
    streaming_chunk: int = 16
    prune_range: int = 5
    simple_loss_scale: float = 0.5
    # Back-compat alias for rnnt_impl="fused".
    fused_rnnt_loss: bool = False

    def setup(self):
        if self.rnnt_impl == "pruned":
            self.simple_am_proj = nn.Dense(self.vocab_size)
            self.simple_lm_proj = nn.Dense(self.vocab_size)

    def __call__(self, speech, speech_lengths, text, text_lengths,
                 context_list=None, context_lengths=None, hw_label=None,
                 context_n_valid=None, *,
                 deterministic: bool = True, train: bool = False,
                 chunk_rng: jax.Array | None = None) -> Dict[str, Any]:
        use_bias = self.context_bias is not None and context_list is not None

        bias_hidden = None
        if use_bias:
            bias_hidden = self.context_bias.forward_bias_hidden(
                context_list, context_lengths, context_n_valid)

        encoder_out, enc_pad_mask = self.encoder(
            speech, speech_lengths, deterministic=deterministic, train=train,
            chunk_rng=chunk_rng)
        encoder_lens = jnp.sum(enc_pad_mask.astype(jnp.int32), axis=1)

        enc_bias = pred_bias = None
        if use_bias:
            encoder_out, enc_bias = self.context_bias.forward_encoder_bias(
                bias_hidden, encoder_out, context_n_valid)

        ys_in = add_blank(text, text_lengths, self.blank, self.ignore_id)
        predictor_out = self.predictor(ys_in, deterministic=deterministic)
        predictor_out_unbiased = predictor_out
        if use_bias:
            predictor_out, pred_bias = \
                self.context_bias.forward_predictor_bias(
                    bias_hidden, predictor_out, context_n_valid)

        rnnt_text = jnp.where(text == self.ignore_id, 0, text)
        impl = "fused" if self.fused_rnnt_loss else self.rnnt_impl
        if impl == "pruned":
            from wenet_celoss_tpu.ops.rnnt_loss import (
                get_rnnt_prune_ranges, rnnt_loss_pruned, rnnt_loss_simple)
            am = self.simple_am_proj(encoder_out)            # [B, T, V]
            lm_s = self.simple_lm_proj(predictor_out)        # [B, U+1, V]
            simple = rnnt_loss_simple(am, lm_s, rnnt_text, encoder_lens,
                                      text_lengths, self.blank)
            ranges = get_rnnt_prune_ranges(
                jax.lax.stop_gradient(am), jax.lax.stop_gradient(lm_s),
                rnnt_text, encoder_lens, text_lengths,
                self.prune_range, self.blank)
            b = encoder_out.shape[0]
            u1 = predictor_out.shape[1]
            abs_u = jnp.clip(
                ranges[:, :, None] + jnp.arange(self.prune_range), 0, u1 - 1)
            pred_w = predictor_out[
                jnp.arange(b)[:, None, None], abs_u]         # [B, T, S, P]
            joint_w = self.joint.pruned(encoder_out, pred_w)
            pruned = rnnt_loss_pruned(joint_w, ranges, rnnt_text,
                                      encoder_lens, text_lengths, self.blank)
            losses = self.simple_loss_scale * simple + pruned
        elif impl == "pallas":
            joint_out = self.joint(encoder_out, predictor_out)
            from wenet_celoss_tpu.ops.rnnt_pallas import rnnt_loss_pallas
            losses = rnnt_loss_pallas(joint_out, rnnt_text, encoder_lens,
                                      text_lengths, self.blank)
        elif impl == "streaming":
            from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_streaming
            enc_j, pred_j = self.joint.project(encoder_out, predictor_out)
            w_out, b_out = self.joint.output_params()
            losses = rnnt_loss_streaming(
                enc_j, pred_j, w_out, b_out, rnnt_text, encoder_lens,
                text_lengths, self.blank,
                activation=self.joint.activation,
                chunk=self.streaming_chunk)
        elif impl == "fused":
            joint_out = self.joint(encoder_out, predictor_out)
            losses = rnnt_loss_fused(joint_out, rnnt_text, encoder_lens,
                                     text_lengths, self.blank)
        else:
            joint_out = self.joint(encoder_out, predictor_out)
            losses = rnnt_loss(joint_out, rnnt_text, encoder_lens,
                               text_lengths, blank=self.blank)
        loss_rnnt = jnp.mean(losses)
        loss = self.transducer_weight * loss_rnnt

        loss_att = jnp.zeros((), jnp.float32)
        attention_decoder_weight = 1.0 - self.transducer_weight \
            - self.ctc_weight
        if attention_decoder_weight > 0.0 and self.decoder is not None:
            loss_att, _ = self._calc_att_loss(
                encoder_out, enc_pad_mask, text, text_lengths,
                deterministic=deterministic)
            loss = loss + attention_decoder_weight * loss_att

        loss_ctc = jnp.zeros((), jnp.float32)
        if self.ctc_weight > 0.0 and self.ctc is not None:
            loss_ctc = self.ctc(encoder_out, encoder_lens, text, text_lengths,
                                deterministic=deterministic)
            loss = loss + self.ctc_weight * loss_ctc

        hw_loss = jnp.zeros((), jnp.float32)
        if use_bias and self.hw_weight > 0.0 and hw_label is not None:
            hw_loss = self._calc_hw_loss(
                bias_hidden, predictor_out_unbiased, enc_bias, pred_bias,
                hw_label)
            loss = loss + self.hw_weight * hw_loss

        return {"loss": loss, "loss_att": loss_att, "loss_ctc": loss_ctc,
                "loss_rnnt": loss_rnnt, "hw_loss": hw_loss}

    def _calc_hw_loss(self, bias_hidden, predictor_out_unbiased, enc_bias,
                      pred_bias, hw_label):
        """Reference `transducer.py:170-262`. hw_label: [B, U] (-1 padded)."""
        clean = jnp.where(hw_label == self.ignore_id, 0, hw_label)
        if self.loss_mode == "pred":
            hw_output = self.context_bias.forward_hw_pred(
                bias_hidden, predictor_out_unbiased)     # [B, U+1, num_labels]
            return _cross_entropy_mean(hw_output[:, :-1], clean)
        if self.loss_mode == "both":
            hw_output = self.context_bias.forward_hw_pred_both(
                enc_bias, pred_bias)                     # [B, U+1, num_labels]
            return _cross_entropy_mean(hw_output[:, :-1], clean)
        # 'sep': targets get a prepended blank; dec head classifies
        # per-phrase ids in the unified hw space.
        _, dec_hw = self.context_bias.forward_hw_pred_both_sep(
            enc_bias, pred_bias)                         # [B, U+1, hw_odim]
        target = jnp.concatenate(
            [jnp.zeros((clean.shape[0], 1), clean.dtype), clean], axis=1)
        return _cross_entropy_mean(dec_hw, target)

    # ------------------------------------------------------------------
    # Decode-support methods
    # ------------------------------------------------------------------
    def bias_hidden(self, context_list, context_lengths, context_n_valid=None):
        return self.context_bias.forward_bias_hidden(
            context_list, context_lengths, context_n_valid)

    def encode_transducer(self, speech, speech_lengths, bias_hidden=None,
                          context_n_valid=None):
        """Encode and (optionally) bias; returns both streams for the
        gate-aware greedy search (reference `greedy_search.py:64-89`)."""
        encoder_out, enc_pad_mask = self.encoder(
            speech, speech_lengths, deterministic=True)
        enc_bias = None
        encoder_out_biased = encoder_out
        if bias_hidden is not None:
            encoder_out_biased, enc_bias = \
                self.context_bias.forward_encoder_bias(
                    bias_hidden, encoder_out, context_n_valid)
        return encoder_out, encoder_out_biased, enc_bias, enc_pad_mask

    def predictor_init_state(self, batch_size: int):
        return self.predictor.init_state(batch_size)

    def predictor_step(self, token, state, padding=None):
        return self.predictor.forward_step(token, state, padding)

    def predictor_bias_step(self, bias_hidden, pred_out, context_n_valid=None):
        """Bias a single predictor output [B, P] (as [B, 1, P])."""
        out, pred_bias = self.context_bias.forward_predictor_bias(
            bias_hidden, pred_out[:, None, :], context_n_valid)
        return out[:, 0], pred_bias[:, 0]

    def hw_gate_step(self, enc_bias_t, pred_bias_u):
        """Per-step hotword-gate logits for the gate-aware greedy decode:
        [B, E] enc bias at frame t, [B, E] pred bias at step u → [B, num_labels]."""
        hw = self.context_bias.forward_hw_pred_both(
            enc_bias_t[:, None, :], pred_bias_u[:, None, :])
        return hw[:, 0]

    def joint_step(self, enc_t, pred_u):
        """[B, E] x [B, P] → joint logits [B, V]."""
        return self.joint.single(enc_t, pred_u)

    def hw_gate_frames(self, enc_bias):
        """Per-frame hotword-gate ids [B, T] from the encoder bias
        branch [B, T, E]. Decode-time gating is predictor-independent:
        `hw_gate_step` attends a SINGLETON key (the frame's enc-bias),
        and softmax over one key weights it 1.0 whatever the query — so
        the whole gate map is computable up front (label-synchronous
        gated greedy, decode/rnnt_greedy.py). The query argument is a
        dummy for exactly that reason."""
        b, t, e = enc_bias.shape
        flat = enc_bias.reshape(b * t, 1, e)
        hw = self.context_bias.forward_hw_pred_both(
            flat, jnp.zeros_like(flat))
        return jnp.argmax(hw.reshape(b, t, -1), axis=-1).astype(jnp.int32)

    def joint_enc_proj(self, encoder_out):
        """[B, T, E] → pre-joined [B, T, J] (label-sync greedy hoist)."""
        return self.joint.project_enc(encoder_out)

    def joint_frames_argmax(self, enc_j, pred_u):
        """enc_j [B, T, J] × pred [B, P] → argmax token ids [B, T]."""
        return jnp.argmax(self.joint.frames(enc_j, pred_u),
                          axis=-1).astype(jnp.int32)

    def predictor_forward(self, ys_in):
        """Whole-sequence predictor forward (blank-prepended labels)."""
        return self.predictor(ys_in, deterministic=True)

    def joint_forward(self, encoder_out, predictor_out):
        """Materialized joint [B, T, U+1, V] (small inputs only)."""
        return self.joint(encoder_out, predictor_out)

    def transducer_score(self, encoder_out, enc_pad_mask, hyps, hyps_lens):
        """Per-hypothesis transducer log-probability: −RNNT loss of each
        label sequence given the (plain) encoder output — the scoring
        half of the reference's `_cal_transducer_score`
        (`wenet/transducer/transducer.py:277-302`), batched over the
        whole n-best and computed with the streaming-V loss so the
        [B·N, T, U, V] joint never materializes.

        Args: encoder_out [B, T, E]; enc_pad_mask [B, T];
              hyps [B, N, U] (padding arbitrary); hyps_lens [B, N].
        Returns: scores [B, N].
        """
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_streaming
        b, n, u = hyps.shape
        flat = hyps.reshape(b * n, u)
        flat_lens = hyps_lens.reshape(b * n)
        memory = jnp.repeat(encoder_out, n, axis=0)
        enc_lens = jnp.repeat(
            jnp.sum(enc_pad_mask.astype(jnp.int32), axis=1), n, axis=0)
        valid = jnp.arange(u)[None, :] < flat_lens[:, None]
        toks = jnp.where(valid, flat, 0)
        ys_in = add_blank(flat, flat_lens, self.blank, self.ignore_id)
        predictor_out = self.predictor(ys_in, deterministic=True)
        enc_j, pred_j = self.joint.project(memory, predictor_out)
        w_out, b_out = self.joint.output_params()
        losses = rnnt_loss_streaming(
            enc_j, pred_j, w_out, b_out, toks, enc_lens, flat_lens,
            self.blank, activation=self.joint.activation,
            chunk=self.streaming_chunk)
        return -losses.reshape(b, n)
