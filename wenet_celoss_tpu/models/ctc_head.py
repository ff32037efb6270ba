"""CTC head: projection + loss + activation helpers.

Parity with reference ``wenet/transformer/ctc.py:21-84``. The loss itself is
the scan-based implementation in ops/ctc_loss.py (replacing
torch.nn.CTCLoss).
"""

from __future__ import annotations

import flax.linen as nn

from wenet_celoss_tpu.models.fast_dropout import FastDropout
import jax.numpy as jnp

from wenet_celoss_tpu.ops.ctc_loss import ctc_loss


class CTC(nn.Module):
    vocab_size: int
    dropout_rate: float = 0.0

    def setup(self):
        self.ctc_lo = nn.Dense(self.vocab_size)
        self.dropout = FastDropout(self.dropout_rate)

    def __call__(self, hs_pad, hlens, ys_pad, ys_lens, *, deterministic=True):
        """Batch-mean CTC loss (reference normalizes the summed loss by
        batch size, `ctc.py:60-64`)."""
        logits = self.ctc_lo(self.dropout(hs_pad, deterministic=deterministic))
        log_probs = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        losses = ctc_loss(log_probs, ys_pad, hlens, ys_lens)
        return jnp.sum(losses) / hs_pad.shape[0]

    def log_softmax(self, hs_pad):
        return nn.log_softmax(
            self.ctc_lo(hs_pad).astype(jnp.float32), axis=-1)

    def argmax(self, hs_pad):
        return jnp.argmax(self.ctc_lo(hs_pad), axis=-1)
