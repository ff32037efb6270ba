"""Label-smoothed cross entropy with padding mask.

Parity with reference ``wenet/transformer/label_smoothing_loss.py:22-96``
(KL-divergence against the smoothed distribution, normalized by batch or by
token count). Expressed directly as smoothed CE minus the constant entropy
term — identical gradients and, because the reference's KLDiv also omits
nothing, identical values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import IGNORE_ID


def label_smoothing_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                         smoothing: float = 0.1,
                         normalize_length: bool = False,
                         ignore_id: int = IGNORE_ID) -> jnp.ndarray:
    """logits [B, U, V]; targets [B, U] with ignore_id padding → scalar.

    Matches torch KLDivLoss(reduction='none').sum over the smoothed target
    distribution: sum_v p_v * (log p_v - log q_v), masked, normalized by
    batch size (default) or token count.
    """
    v = logits.shape[-1]
    confidence = 1.0 - smoothing
    low = smoothing / (v - 1)
    logq = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = targets != ignore_id
    tgt = jnp.where(mask, targets, 0)
    # KL(p||q) = sum p log p - sum p log q ; sum p log p is a constant
    # entropy term that the reference INCLUDES (torch kl_div computes it).
    p_logp = (confidence * jnp.log(confidence + 1e-20)
              + (v - 1) * low * jnp.log(low + 1e-20))
    # One-hot matmul instead of take_along_axis: a V-axis gather's
    # backward is an XLA scatter, which is far slower on TPU.
    onehot = jax.nn.one_hot(tgt, v, dtype=logq.dtype)
    logq_tgt = jnp.einsum("buv,buv->bu", logq, onehot,
                          preferred_element_type=jnp.float32)
    ce = -(confidence * logq_tgt
           + low * (jnp.sum(logq, axis=-1) - logq_tgt))
    kl = (ce + p_logp) * mask
    denom = jnp.maximum(
        jnp.sum(mask) if normalize_length else targets.shape[0], 1)
    return jnp.sum(kl) / denom
