"""Batched CTC greedy search.

Parity with reference ``wenet/transformer/asr_model.py:281-324``
(ctc_greedy_search): per-frame argmax, pad masking, blank/duplicate
collapse. Everything except the final ragged-list materialization runs
jitted on device.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.utils.common import remove_duplicates_and_blank


@jax.jit
def ctc_greedy_frames(ctc_log_probs: jnp.ndarray, enc_pad_mask: jnp.ndarray,
                      blank: int = 0):
    """[B, T, V] log-probs → per-frame best ids with pads forced to blank.

    Returns (ids [B, T], frame_scores [B, T])."""
    ids = jnp.argmax(ctc_log_probs, axis=-1)
    scores = jnp.max(ctc_log_probs, axis=-1)
    ids = jnp.where(enc_pad_mask, ids, blank)
    scores = jnp.where(enc_pad_mask, scores, 0.0)
    return ids.astype(jnp.int32), scores


def ctc_greedy_search(ctc_log_probs, enc_pad_mask,
                      blank: int = 0) -> List[List[int]]:
    """Full greedy decode → list of token-id hypotheses (host)."""
    ids, _ = ctc_greedy_frames(ctc_log_probs, enc_pad_mask, blank)
    ids = np.asarray(ids)
    return [remove_duplicates_and_blank(row, blank) for row in ids]
