"""Batched, jit-able RNN-T prefix beam search with CTC shallow fusion.

Parity with reference ``wenet/transducer/search/prefix_beam_search.py:22-148``:
breadth-first beam over frames, at most one emission per frame, shallow
fusion ``log(w_t * e^logp_t + w_ctc * e^ctc_t)`` (`prefix_beam_search.py:
100-103`), prefix merging (:130-141), and per-hypothesis predictor state.

TPU redesign: the per-hypothesis predictor cache shuffling
(batch_to_cache / cache_to_batch, reference `predictor.py:123-158`) becomes
a flat [B*N] predictor step followed by masked selection; prefix merging
uses the same O(C^2) hash-equality log-sum-exp as the CTC prefix beam.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from wenet_celoss_tpu.utils.common import LOG_ZERO

_H1_MULT = 1000003
_H2_MULT = 10007


def rnnt_prefix_beam_search(predictor_step: Callable, joint_step: Callable,
                            init_state, encoder_out, encoder_lens,
                            beam: int = 5, topk: int = 5,
                            ctc_log_probs: Optional[jnp.ndarray] = None,
                            transducer_weight: float = 0.7,
                            ctc_weight: float = 0.3,
                            blank: int = 0, u_max: int = 0,
                            state_gather: Optional[Callable] = None):
    """Run the search.

    Args:
      predictor_step: (token [B*N], state, padding [B*N]) -> (out, state).
      joint_step: (enc [B*N, E], pred [B*N, P]) -> logits [B*N, V].
      init_state: predictor state for batch B*N (flat).
      encoder_out: [B, T, E]; ctc_log_probs: optional [B, T, V] for fusion.
      state_gather: (state, flat_idx [B*N]) -> reindexed state. Defaults to
        batch-first leaf indexing; the RNN predictor (leaves [L, B*N, H])
        must pass a gather over axis 1.
    Returns dict: tokens [B, N, U], lens [B, N], scores [B, N] best-first.
    """
    if state_gather is None:
        state_gather = lambda st, idx: jax.tree_util.tree_map(
            lambda x: x[idx], st)
    b, t_max, e = encoder_out.shape
    n = beam
    if u_max <= 0:
        u_max = t_max
    bn = b * n

    pred0, state0 = predictor_step(jnp.full((bn,), blank, jnp.int32),
                                   init_state, jnp.zeros((bn,), jnp.int32))
    tokens0 = jnp.zeros((b, n, u_max), jnp.int32)
    lens0 = jnp.zeros((b, n), jnp.int32)
    scores0 = jnp.where(jnp.arange(n)[None, :] == 0, 0.0, LOG_ZERO)
    scores0 = jnp.broadcast_to(scores0, (b, n))
    h10 = jnp.full((b, n), 17, jnp.int32)
    h20 = jnp.full((b, n), 29, jnp.int32)

    use_fusion = ctc_log_probs is not None

    def frame(carry, inputs):
        tokens, lens, scores, h1, h2, pred_out, state = carry
        if use_fusion:
            enc_t, ctc_t, t = inputs
        else:
            enc_t, t = inputs
            ctc_t = None
        valid_t = t < encoder_lens                        # [B]

        logits = joint_step(
            jnp.repeat(enc_t, n, axis=0), pred_out)       # [B*N, V]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(b, n, -1)
        if use_fusion:
            fused = jnp.logaddexp(
                jnp.log(transducer_weight) + logp,
                jnp.log(ctc_weight) + ctc_t[:, None, :])
        else:
            fused = logp

        # Candidates: stay (blank) + topk non-blank extensions.
        stay = scores + fused[:, :, blank]                # [B, N]
        # Exclude blank from extension candidates by flooring it.
        fused_nb = fused.at[:, :, blank].set(LOG_ZERO)
        top_lp, top_tok = jax.lax.top_k(fused_nb, topk)   # [B, N, K]
        full = lens >= u_max
        ext = jnp.where(full[..., None], LOG_ZERO,
                        scores[..., None] + top_lp)       # [B, N, K]

        c = n * (topk + 1)
        cand_parent = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(n)[None, :], (b, n)),
            jnp.broadcast_to(jnp.arange(n)[None, :, None],
                             (b, n, topk)).reshape(b, -1)], axis=1)
        cand_is_ext = jnp.concatenate(
            [jnp.zeros((b, n), bool), jnp.ones((b, n * topk), bool)], axis=1)
        cand_tok = jnp.concatenate(
            [jnp.zeros((b, n), jnp.int32), top_tok.reshape(b, -1)], axis=1)
        cand_score = jnp.concatenate([stay, ext.reshape(b, -1)], axis=1)

        par_len = jnp.take_along_axis(lens, cand_parent, axis=1)
        par_h1 = jnp.take_along_axis(h1, cand_parent, axis=1)
        par_h2 = jnp.take_along_axis(h2, cand_parent, axis=1)
        cand_len = jnp.where(cand_is_ext, par_len + 1, par_len)
        cand_h1 = jnp.where(cand_is_ext,
                            par_h1 * _H1_MULT + cand_tok + 1, par_h1)
        cand_h2 = jnp.where(cand_is_ext,
                            par_h2 * _H2_MULT + cand_tok + 1, par_h2)

        # Merge identical prefixes (log-sum-exp, reference :130-141).
        eq = ((cand_h1[:, :, None] == cand_h1[:, None, :])
              & (cand_h2[:, :, None] == cand_h2[:, None, :])
              & (cand_len[:, :, None] == cand_len[:, None, :]))
        m_score = jax.nn.logsumexp(
            jnp.where(eq, cand_score[:, None, :], LOG_ZERO), axis=2)
        idx = jnp.arange(c)
        is_rep = jnp.argmax(eq, axis=2) == idx[None, :]
        m_score = jnp.where(is_rep, m_score, LOG_ZERO)

        top_score, top_idx = jax.lax.top_k(m_score, n)    # [B, N]
        sel = lambda x: jnp.take_along_axis(x, top_idx, axis=1)
        sel_parent = sel(cand_parent)
        sel_is_ext = sel(cand_is_ext)
        sel_tok = sel(cand_tok)
        sel_len = sel(cand_len)

        new_tokens = jnp.take_along_axis(tokens, sel_parent[..., None],
                                         axis=1)
        par_lens2 = jnp.take_along_axis(lens, sel_parent, axis=1)
        onehot = jax.nn.one_hot(jnp.minimum(par_lens2, u_max - 1), u_max,
                                dtype=bool)
        new_tokens = jnp.where(onehot & sel_is_ext[..., None],
                               sel_tok[..., None], new_tokens)

        # Predictor state: gather parents, then step only extended hyps.
        parent_flat = (jnp.arange(b)[:, None] * n + sel_parent).reshape(-1)
        par_pred = pred_out[parent_flat]
        par_state = state_gather(state, parent_flat)
        do = (sel_is_ext & valid_t[:, None]).reshape(-1)
        new_pred, new_state = predictor_step(
            sel_tok.reshape(-1), par_state, (~do).astype(jnp.int32))
        keep = do[:, None].astype(par_pred.dtype)
        new_pred = new_pred * keep + par_pred * (1 - keep)

        # Freeze whole beam for finished utterances.
        keep_b = valid_t[:, None]
        out_tokens = jnp.where(keep_b[..., None], new_tokens, tokens)
        out_lens = jnp.where(keep_b, sel_len, lens)
        out_scores = jnp.where(keep_b, top_score, scores)
        out_h1 = jnp.where(keep_b, sel(cand_h1), h1)
        out_h2 = jnp.where(keep_b, sel(cand_h2), h2)
        return (out_tokens, out_lens, out_scores, out_h1, out_h2,
                new_pred, new_state), None

    ts = jnp.arange(t_max)
    if use_fusion:
        xs = (jnp.moveaxis(encoder_out, 1, 0),
              jnp.moveaxis(ctc_log_probs, 1, 0), ts)
    else:
        xs = (jnp.moveaxis(encoder_out, 1, 0), ts)
    (tokens, lens, scores, _, _, _, _), _ = jax.lax.scan(
        frame, (tokens0, lens0, scores0, h10, h20, pred0, state0), xs)

    order = jnp.argsort(-scores, axis=1)
    return {
        "tokens": jnp.take_along_axis(tokens, order[..., None], axis=1),
        "lens": jnp.take_along_axis(lens, order, axis=1),
        "scores": jnp.take_along_axis(scores, order, axis=1),
    }
