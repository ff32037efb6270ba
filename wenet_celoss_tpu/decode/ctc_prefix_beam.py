"""Batched, jit-able CTC prefix beam search.

Capability parity with the reference's two implementations — the python
dict-based single-utterance search (`wenet/transformer/asr_model.py:326-409`)
and the C++ runtime search with viterbi timestamps
(`runtime/core/decoder/ctc_prefix_beam_search.cc:107-234`) — re-designed as
a TENSORIZED fixed-beam search that runs the whole batch in one `lax.scan`
on TPU:

- The beam is a fixed [B, BEAM] set of prefixes with (log_pb, log_pnb)
  scores, token buffers, and incremental 2x31-bit rolling hashes.
- Each frame expands beam x (topk+1) candidates (the "keep" entry folds the
  blank- and repeat-continuation cases; each top-k token yields an "extend"
  entry), mirroring the blank/repeat/change case analysis of the reference
  (`ctc_prefix_beam_search.cc:130-194`).
- PREFIX MERGING (the hash-map insert in the reference) becomes an
  O(C^2) equality-mask merge: candidates with identical (hash1, hash2, len)
  are log-sum-exp-combined into their first representative. C is ~100, so
  the [C, C] mask is tiny and fully parallel on the VPU.
- Viterbi best-path scores and per-token emission times are carried along
  (merged by max), giving the runtime's timestamp capability.

The first top-k prune matches the reference's ``first_beam_size``
(`ctc_prefix_beam_search.cc:117`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.utils.common import LOG_ZERO

_H1_MULT = 1000003
_H2_MULT = 10007
_H1_INIT = 17
_H2_INIT = 29


class BeamState(NamedTuple):
    tokens: jnp.ndarray    # [B, BM, U] int32
    lens: jnp.ndarray      # [B, BM] int32
    pb: jnp.ndarray        # [B, BM] log p(prefix, ends blank)
    pnb: jnp.ndarray       # [B, BM] log p(prefix, ends non-blank)
    h1: jnp.ndarray        # [B, BM] rolling hash 1
    h2: jnp.ndarray        # [B, BM] rolling hash 2
    vit_b: jnp.ndarray     # [B, BM] best path score, path ends in blank
    vit_nb: jnp.ndarray    # [B, BM] best path score, ends in non-blank
    times_b: jnp.ndarray   # [B, BM, U] emission frames of the vit_b path
    times_nb: jnp.ndarray  # [B, BM, U] emission frames of the vit_nb path
    ctp: jnp.ndarray       # [B, BM] emission prob of the nb path's last
    #                        token (reference cur_token_prob)


def _init_state(b: int, beam: int, u_max: int) -> BeamState:
    zeros_i = jnp.zeros((b, beam, u_max), jnp.int32)
    neg = jnp.full((b, beam), LOG_ZERO)
    pb = neg.at[:, 0].set(0.0)
    return BeamState(
        tokens=zeros_i,
        lens=jnp.zeros((b, beam), jnp.int32),
        pb=pb,
        pnb=jnp.full((b, beam), LOG_ZERO),
        h1=jnp.full((b, beam), _H1_INIT, jnp.int32),
        h2=jnp.full((b, beam), _H2_INIT, jnp.int32),
        vit_b=neg.at[:, 0].set(0.0),
        vit_nb=jnp.full((b, beam), LOG_ZERO),
        times_b=zeros_i,
        times_nb=zeros_i,
        ctp=jnp.full((b, beam), LOG_ZERO),
    )


def _roll_hash(h1, h2, tok):
    return (h1 * _H1_MULT + tok + 1, h2 * _H2_MULT + tok + 1)


@partial(jax.jit, static_argnames=("beam", "first_beam", "u_max", "blank"))
def ctc_prefix_beam_search(ctc_log_probs: jnp.ndarray,
                           input_lengths: jnp.ndarray,
                           beam: int = 10,
                           first_beam: int = 10,
                           u_max: int = 0,
                           blank: int = 0):
    """Run the search.

    Args:
      ctc_log_probs: [B, T, V].
      input_lengths: [B] valid frame counts.
      beam: number of prefixes kept (second_beam_size).
      first_beam: per-frame vocab prune (first_beam_size).
      u_max: max output tokens (0 → T).
    Returns dict with:
      tokens [B, BM, U], lens [B, BM], scores [B, BM] (log p, sorted
      descending), viterbi [B, BM], times [B, BM, U].
    """
    b, t_max, v = ctc_log_probs.shape
    if u_max <= 0:
        u_max = t_max
    first_beam = min(first_beam, v)
    state = _init_state(b, beam, u_max)

    def step(state: BeamState, inputs):
        logp_t, t = inputs                              # [B, V], scalar
        valid_t = t < input_lengths                     # [B]

        topv, topi = jax.lax.top_k(logp_t, first_beam)  # [B, K]
        lp_blank = logp_t[:, blank]                     # [B]

        last_idx = jnp.maximum(state.lens - 1, 0)
        last_tok = jnp.take_along_axis(state.tokens, last_idx[..., None],
                                       axis=2)[..., 0]  # [B, BM]
        has_tok = state.lens > 0
        lp_last = jnp.take_along_axis(
            logp_t[:, None, :].repeat(state.pb.shape[1], 1),
            last_tok[..., None], axis=2)[..., 0]        # [B, BM]

        # ---- "keep" candidates: same prefix continues --------------------
        # Reference semantics: the blank-continue / repeat-continue cases
        # only fire when blank / the prefix's last token survived the
        # first-beam vocabulary prune (`asr_model.py:378-391` iterates the
        # top-k set only). With first_beam >= V this is a no-op.
        blank_in = jnp.any(topi == blank, axis=1)            # [B]
        last_in = jnp.any(topi[:, None, :] == last_tok[..., None],
                          axis=2)                            # [B, BM]
        keep_pb = jnp.where(
            blank_in[:, None],
            jnp.logaddexp(state.pb, state.pnb) + lp_blank[:, None],
            LOG_ZERO)
        keep_pnb = jnp.where(has_tok & last_in, state.pnb + lp_last,
                             LOG_ZERO)
        # Viterbi channels (reference PrefixScore v_b/v_nb,
        # `ctc_prefix_beam_search.h:38-80`): blank continue may come from
        # either channel; a repeat continue only from the non-blank one.
        keep_vit_b = jnp.where(
            blank_in[:, None],
            jnp.maximum(state.vit_b, state.vit_nb) + lp_blank[:, None],
            LOG_ZERO)
        keep_vit_b_from_nb = state.vit_nb > state.vit_b      # [B, BM]
        keep_vit_nb = jnp.where(has_tok & last_in, state.vit_nb + lp_last,
                                LOG_ZERO)

        # ---- "extend" candidates: append top-k token c -------------------
        # [B, BM, K]
        cand_tok = topi[:, None, :].repeat(state.pb.shape[1], 1)
        cand_lp = topv[:, None, :].repeat(state.pb.shape[1], 1)
        is_blank = cand_tok == blank
        is_repeat = cand_tok == last_tok[..., None]
        base = jnp.where(is_repeat & has_tok[..., None],
                         state.pb[..., None],
                         jnp.logaddexp(state.pb, state.pnb)[..., None])
        ext_pnb = jnp.where(is_blank, LOG_ZERO, base + cand_lp)
        ext_pb = jnp.full_like(ext_pnb, LOG_ZERO)
        # Extending ends non-blank; a repeat extension must come via the
        # blank channel, otherwise best of both.
        vit_base = jnp.where(is_repeat & has_tok[..., None],
                             state.vit_b[..., None],
                             jnp.maximum(state.vit_b,
                                         state.vit_nb)[..., None])
        ext_vit_from_nb = jnp.where(
            is_repeat & has_tok[..., None], False,
            (state.vit_nb > state.vit_b)[..., None])
        ext_vit_nb = jnp.where(is_blank, LOG_ZERO, vit_base + cand_lp)
        ext_vit_b = jnp.full_like(ext_vit_nb, LOG_ZERO)
        full_len = state.lens >= u_max
        ext_pnb = jnp.where(full_len[..., None], LOG_ZERO, ext_pnb)
        ext_vit_nb = jnp.where(full_len[..., None], LOG_ZERO, ext_vit_nb)

        bm = state.pb.shape[1]
        c = bm * (first_beam + 1)

        def flat(x):
            return x.reshape(b, -1)

        # Candidate fields, order: [keep(BM), extend(BM*K)]
        cand_parent = jnp.concatenate([
            jnp.broadcast_to(jnp.arange(bm)[None, :], (b, bm)),
            jnp.broadcast_to(
                jnp.arange(bm)[None, :, None], (b, bm, first_beam)
            ).reshape(b, -1)], axis=1)                   # [B, C]
        cand_is_ext = jnp.concatenate([
            jnp.zeros((b, bm), bool),
            jnp.ones((b, bm * first_beam), bool)], axis=1)
        cand_token = jnp.concatenate([
            jnp.zeros((b, bm), jnp.int32), flat(cand_tok)], axis=1)
        cand_pb = jnp.concatenate([keep_pb, flat(ext_pb)], axis=1)
        cand_pnb = jnp.concatenate([keep_pnb, flat(ext_pnb)], axis=1)
        cand_vit_b = jnp.concatenate([keep_vit_b, flat(ext_vit_b)], axis=1)
        cand_vit_nb = jnp.concatenate([keep_vit_nb, flat(ext_vit_nb)],
                                      axis=1)
        # Whether the winning source path for each channel came from the
        # parent's non-blank channel (decides which parent times buffer the
        # new path inherits).
        cand_b_from_nb = jnp.concatenate(
            [keep_vit_b_from_nb, jnp.zeros((b, bm * first_beam), bool)],
            axis=1)
        cand_nb_from_nb = jnp.concatenate(
            [jnp.ones((b, bm), bool), flat(ext_vit_from_nb)], axis=1)
        # cur_token_prob per candidate + whether the nb path refreshes the
        # last token's time this frame (reference
        # `ctc_prefix_beam_search.cc:150-166`: repeat improves emission).
        keep_refresh = has_tok & last_in & (lp_last > state.ctp)
        keep_ctp = jnp.where(last_in, jnp.maximum(state.ctp, lp_last),
                             state.ctp)
        cand_ctp = jnp.concatenate([keep_ctp, flat(cand_lp)], axis=1)
        cand_refresh = jnp.concatenate(
            [keep_refresh, jnp.zeros((b, bm * first_beam), bool)], axis=1)

        par_len = jnp.take_along_axis(state.lens, cand_parent, axis=1)
        par_h1 = jnp.take_along_axis(state.h1, cand_parent, axis=1)
        par_h2 = jnp.take_along_axis(state.h2, cand_parent, axis=1)
        ext_h1, ext_h2 = _roll_hash(par_h1, par_h2, cand_token)
        cand_len = jnp.where(cand_is_ext, par_len + 1, par_len)
        cand_h1 = jnp.where(cand_is_ext, ext_h1, par_h1)
        cand_h2 = jnp.where(cand_is_ext, ext_h2, par_h2)

        # ---- merge identical prefixes (hash-equality mask) ---------------
        eq = ((cand_h1[:, :, None] == cand_h1[:, None, :])
              & (cand_h2[:, :, None] == cand_h2[:, None, :])
              & (cand_len[:, :, None] == cand_len[:, None, :]))  # [B, C, C]
        neg_mask = jnp.where(eq, 0.0, LOG_ZERO)
        m_pb = jax.nn.logsumexp(cand_pb[:, None, :] + neg_mask, axis=2)
        m_pnb = jax.nn.logsumexp(cand_pnb[:, None, :] + neg_mask, axis=2)
        # Viterbi merges take the max per channel, remembering the source
        # candidate so the right times buffer is inherited.
        vit_b_masked = jnp.where(eq, cand_vit_b[:, None, :], LOG_ZERO)
        vit_nb_masked = jnp.where(eq, cand_vit_nb[:, None, :], LOG_ZERO)
        m_vit_b = jnp.max(vit_b_masked, axis=2)
        m_vit_nb = jnp.max(vit_nb_masked, axis=2)
        m_vit_b_src = jnp.argmax(vit_b_masked, axis=2)   # [B, C]
        m_vit_nb_src = jnp.argmax(vit_nb_masked, axis=2)
        # Representative = first index in each equality class. Non-reps
        # must carry NO mass: they can still be topk-selected to fill the
        # beam when there are fewer distinct prefixes than slots, and any
        # retained mass would be double-counted next frame.
        idx = jnp.arange(c)
        first_eq = jnp.argmax(eq, axis=2)                # min j with eq
        is_rep = first_eq == idx[None, :]
        m_pb = jnp.where(is_rep, m_pb, LOG_ZERO)
        m_pnb = jnp.where(is_rep, m_pnb, LOG_ZERO)
        m_vit_b = jnp.where(is_rep, m_vit_b, LOG_ZERO)
        m_vit_nb = jnp.where(is_rep, m_vit_nb, LOG_ZERO)

        score = jnp.logaddexp(m_pb, m_pnb)

        top_score, top_idx = jax.lax.top_k(score, bm)    # [B, BM]

        def sel(x):
            return jnp.take_along_axis(x, top_idx, axis=1)

        sel_parent = sel(cand_parent)
        sel_is_ext = sel(cand_is_ext)
        sel_token = sel(cand_token)

        new_tokens = jnp.take_along_axis(
            state.tokens, sel_parent[..., None], axis=1)
        par_lens = jnp.take_along_axis(state.lens, sel_parent, axis=1)
        write_pos = jnp.minimum(par_lens, u_max - 1)
        onehot = jax.nn.one_hot(write_pos, u_max, dtype=bool)
        new_tokens = jnp.where(onehot & sel_is_ext[..., None],
                               sel_token[..., None], new_tokens)

        def times_for(src_sel, from_nb_flags, allow_refresh):
            """Build the new times buffer for one viterbi channel."""
            par = jnp.take_along_axis(cand_parent, src_sel, axis=1)
            is_ext = jnp.take_along_axis(cand_is_ext, src_sel, axis=1)
            from_nb = jnp.take_along_axis(from_nb_flags, src_sel, axis=1)
            par_tb = jnp.take_along_axis(state.times_b, par[..., None],
                                         axis=1)
            par_tnb = jnp.take_along_axis(state.times_nb, par[..., None],
                                          axis=1)
            times = jnp.where(from_nb[..., None], par_tnb, par_tb)
            plen = jnp.take_along_axis(state.lens, par, axis=1)
            # Extension writes t at the new slot; a repeat-continuation
            # (keep on the nb channel) refreshes the last token's time when
            # this frame improves its emission prob.
            refresh = jnp.take_along_axis(cand_refresh, src_sel, axis=1) \
                if allow_refresh else jnp.zeros_like(is_ext)
            upd_pos = jnp.where(is_ext, jnp.minimum(plen, u_max - 1),
                                jnp.maximum(plen - 1, 0))
            t1h = jax.nn.one_hot(upd_pos, u_max, dtype=bool)
            do = is_ext | refresh
            return jnp.where(t1h & do[..., None],
                             jnp.asarray(t, jnp.int32), times)

        sel_vb_src = sel(m_vit_b_src)
        sel_vnb_src = sel(m_vit_nb_src)
        new_times_b = times_for(sel_vb_src, cand_b_from_nb, False)
        new_times_nb = times_for(sel_vnb_src, cand_nb_from_nb, True)
        new_ctp = jnp.take_along_axis(cand_ctp, sel_vnb_src, axis=1)

        new_state = BeamState(
            tokens=new_tokens,
            lens=sel(cand_len),
            pb=sel(m_pb),
            pnb=sel(m_pnb),
            h1=sel(cand_h1),
            h2=sel(cand_h2),
            vit_b=sel(m_vit_b),
            vit_nb=sel(m_vit_nb),
            times_b=new_times_b,
            times_nb=new_times_nb,
            ctp=new_ctp,
        )
        # Frames past each utterance's length leave the beam unchanged.
        keep = valid_t[:, None]
        merged = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                keep.reshape((b,) + (1,) * (new.ndim - 1)), new, old),
            new_state, state)
        return merged, None

    ts = jnp.arange(t_max)
    logps = jnp.moveaxis(ctc_log_probs, 1, 0)            # [T, B, V]
    state, _ = jax.lax.scan(step, state, (logps, ts))

    score = jnp.logaddexp(state.pb, state.pnb)
    vit = jnp.maximum(state.vit_b, state.vit_nb)
    times = jnp.where((state.vit_nb > state.vit_b)[..., None],
                      state.times_nb, state.times_b)
    order = jnp.argsort(-score, axis=1)
    pick = lambda x: jnp.take_along_axis(
        x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
    return {
        "tokens": pick(state.tokens),
        "lens": jnp.take_along_axis(state.lens, order, axis=1),
        "scores": jnp.take_along_axis(score, order, axis=1),
        "viterbi": jnp.take_along_axis(vit, order, axis=1),
        "times": pick(times),
    }


def nbest_to_lists(result, n: int = 1):
    """Host-side: convert the search result to python lists."""
    tokens = np.asarray(result["tokens"])
    lens = np.asarray(result["lens"])
    out = []
    for bi in range(tokens.shape[0]):
        row = []
        for ni in range(min(n, tokens.shape[1])):
            row.append([int(x) for x in tokens[bi, ni, :lens[bi, ni]]])
        out.append(row)
    return out
