"""High-level decode API: one call per decode mode, given (model, params).

Mirrors the mode dispatch of reference ``wenet/bin/recognize.py:64-72,
259-362`` (attention / ctc_greedy_search / ctc_prefix_beam_search /
attention_rescoring / rnnt_greedy_search / rnnt_beam_search /
rnnt_beam_attn_rescoring) as batched on-device searches.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wenet_celoss_tpu.decode import (
    attention_beam, ctc_greedy, ctc_prefix_beam, rescoring, rnnt_beam,
    rnnt_greedy)
from wenet_celoss_tpu.utils.common import remove_duplicates_and_blank


class _TailStaticJit:
    """jax.jit wrapper whose last N positional args are static (hashable
    python values driving control flow inside the model)."""

    def __init__(self, fn, n_tail: int):
        self._fn = fn
        self._n = n_tail
        self._jitted = {}

    def __call__(self, *args):
        n = self._n
        dyn, tail = args[:-n], tuple(args[-n:])
        fn = self._jitted.get(tail)
        if fn is None:
            fn = jax.jit(lambda *a: self._fn(*a, *tail))
            self._jitted[tail] = fn
        return fn(*dyn)


class Decoder:
    """Stateful wrapper binding a model + params to decode calls."""

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._jits = {}

    def _m(self, method: str, n_static_tail: int = 0):
        """Jitted ``model.apply(params, *args, method=method)``.

        Eager apply dispatches the network op-by-op (hundreds of tiny
        executables per decode on TPU); one jit per method compiles the
        whole tower and hits the persistent compilation cache across
        processes. The last ``n_static_tail`` positional args are static
        (python control flow inside the model: chunk sizes, reverse
        weight)."""
        key = (method, n_static_tail)
        fn = self._jits.get(key)
        if fn is None:
            def apply(params, *args, _method=method):
                return self.model.apply(params, *args, method=_method)

            if n_static_tail:
                # static argnums are counted from the end of the call's
                # actual positional args; resolved at call time below.
                fn = _TailStaticJit(apply, n_static_tail)
            else:
                fn = jax.jit(apply)
            self._jits[key] = fn
        return fn

    # -------------------------------------------------------------- CTC/AED
    def encode_ctc(self, feats, feat_lens, decoding_chunk_size=-1,
                   num_decoding_left_chunks=-1):
        return self._m("encode_ctc", n_static_tail=2)(
            self.params, feats, feat_lens, int(decoding_chunk_size),
            int(num_decoding_left_chunks))

    def encode_ctc_streaming(self, feats, feat_lens, decoding_chunk_size,
                             num_decoding_left_chunks=-1):
        """Simulated streaming encode: true chunk-by-chunk forward with
        bounded att/conv caches (reference ``recognize.py
        --simulate_streaming`` → ``encoder.forward_chunk_by_chunk``,
        `encoder.py:270-326`). Numerically identical to the runtime's
        streaming path, unlike the chunk-masked full forward.

        num_decoding_left_chunks < 0 keeps a generous fixed cache of 16
        chunks (fixed shapes require a bound; the reference grows the cache
        unboundedly)."""
        from wenet_celoss_tpu.decode.streaming import \
            forward_chunk_by_chunk_scan
        from wenet_celoss_tpu.models.subsampling import subsampled_length
        enc = self.model.encoder
        model = self.model
        sub, rctx = enc.subsampling_rate, enc.right_context
        left = num_decoding_left_chunks if num_decoding_left_chunks > 0 \
            else 16
        # ONE jitted program: the chunk sweep is a lax.scan, not a python
        # loop of per-chunk dispatches (a round trip per chunk on the
        # axon transport).
        key = ("encode_ctc_streaming", int(decoding_chunk_size), int(left))
        fn = self._jits.get(key)
        if fn is None:
            def run(params, feats, feat_lens):
                b = feats.shape[0]
                cache = model.apply(params, b,
                                    decoding_chunk_size * left,
                                    method="encoder_init_cache")
                # The scan carry must be dtype-stable: a bf16 encoder
                # writes bf16 caches, so the fp32-initialized cache must
                # start in the compute dtype (float leaves only).
                cdtype = getattr(enc, "compute_dtype", None)
                if cdtype is not None:
                    cache = jax.tree.map(
                        lambda x: x.astype(cdtype)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x,
                        cache)

                def fwd2(xs, c, valid):
                    ys, ctc_lp, new_cache = model.apply(
                        params, xs, c, valid,
                        method="encoder_forward_chunk_ctc")
                    return (ys, ctc_lp), new_cache

                total_out = subsampled_length(enc.input_layer, feat_lens)
                (ys, ctc_lp), _ = forward_chunk_by_chunk_scan(
                    fwd2, cache, feats, sub, rctx, decoding_chunk_size,
                    out_lens=total_out)
                t_out = ys.shape[1]
                out_lens = jnp.minimum(total_out, t_out)
                mask = jnp.arange(t_out)[None, :] < out_lens[:, None]
                return ys, mask, ctc_lp

            fn = jax.jit(run)
            self._jits[key] = fn
        return fn(self.params, feats, feat_lens)

    def _encode(self, feats, feat_lens, simulate_streaming=False,
                decoding_chunk_size=-1, num_decoding_left_chunks=-1):
        if simulate_streaming and decoding_chunk_size > 0:
            return self.encode_ctc_streaming(feats, feat_lens,
                                             decoding_chunk_size,
                                             num_decoding_left_chunks)
        return self.encode_ctc(feats, feat_lens, decoding_chunk_size,
                               num_decoding_left_chunks)

    def ctc_greedy_search(self, feats, feat_lens, **kw) -> List[List[int]]:
        _, mask, ctc_lp = self._encode(feats, feat_lens, **kw)
        return ctc_greedy.ctc_greedy_search(ctc_lp, mask)

    def ctc_prefix_beam_search(self, feats, feat_lens, beam: int = 10,
                               first_beam: Optional[int] = None, **kw):
        """Returns ``(lists, res, enc, mask)``. ``lists`` (host n-best
        token lists) is **None** in a multi-process program where the
        result spans non-addressable devices — host materialization then
        requires ShardedDecoder's collective exchange; rescoring
        consumers use the device-array ``res`` directly either way."""
        enc, mask, ctc_lp = self._encode(feats, feat_lens, **kw)
        lens = jnp.sum(mask.astype(jnp.int32), axis=1)
        # Reference `_ctc_prefix_beam_search` prunes the vocabulary to
        # beam_size each frame (asr_model.py:377); match by default.
        res = ctc_prefix_beam.ctc_prefix_beam_search(
            ctc_lp, lens, beam=beam,
            first_beam=first_beam if first_beam else beam)
        # In a multi-host pod the un-exchanged result spans
        # non-addressable devices — host lists only exist after the
        # ShardedDecoder's collective exchange (which re-materializes
        # them itself); rescoring consumers use `res` directly.
        lists = None
        tok = res["tokens"]
        if not (isinstance(tok, jax.Array)
                and not tok.is_fully_addressable):
            lists = ctc_prefix_beam.nbest_to_lists(res, 1)
        return lists, res, enc, mask

    def attention_arrays(self, feats, feat_lens, beam: int = 10,
                         max_len: int = 0, **kw):
        """Device-array variant (hyps [B, N, L], lens [B, N], best-first)
        — the mesh-sharded decoder exchanges these via collectives before
        the host materializes them."""
        enc, mask, _ = self._encode(feats, feat_lens, **kw)
        if max_len <= 0:
            max_len = int(enc.shape[1])
        model = self.model

        # Whole-search jit (axon: eager glue costs a dispatch round trip
        # per op; the scan body itself was already compiled).
        key = ("attention_beam", int(beam), int(max_len))
        fn = self._jits.get(key)
        if fn is None:
            def run(params, enc, mask):
                def one_step(memory, memory_mask, buf, pos):
                    return model.apply(params, memory, memory_mask, buf,
                                       pos, method="decoder_one_step")

                hyps, lens, _ = attention_beam.attention_beam_search(
                    one_step, enc, mask, model.sos, model.eos, beam,
                    max_len)
                return hyps, lens

            fn = jax.jit(run)
            self._jits[key] = fn
        return fn(self.params, enc, mask)

    def attention(self, feats, feat_lens, beam: int = 10,
                  max_len: int = 0, **kw) -> List[List[int]]:
        hyps, lens = self.attention_arrays(feats, feat_lens, beam=beam,
                                           max_len=max_len, **kw)
        return attention_beam.attention_hyps_to_lists(hyps, lens,
                                                      self.model.eos)

    def attention_rescoring_arrays(self, feats, feat_lens, beam: int = 10,
                                   ctc_weight: float = 0.0,
                                   reverse_weight: float = 0.0, **kw):
        """Device-array variant (best_tokens [B,U], best_lens [B]) — the
        mesh-sharded decoder exchanges these via collectives before the
        host materializes them.

        Deliberately bypasses a subclass's ctc_prefix_beam_search override
        (explicit Decoder call): on a ShardedDecoder the override returns
        the n-best truncated to the real batch size while enc/mask stay
        mesh-padded, and the rescoring matmuls must see consistent batch
        dims; the sharded path exchanges only the FINAL winners."""
        _, res, enc, mask = Decoder.ctc_prefix_beam_search(
            self, feats, feat_lens, beam=beam, **kw)

        def scores_fn(memory, memory_mask, hyps_in, hyps_lens, r_hyps_in,
                      rw):
            return self._m("decoder_scores", n_static_tail=1)(
                self.params, memory, memory_mask, hyps_in, hyps_lens,
                r_hyps_in, float(rw))

        best_tokens, best_lens, _ = rescoring.attention_rescoring(
            scores_fn, enc, mask, res, self.model.sos, self.model.eos,
            ctc_weight, reverse_weight)
        return best_tokens, best_lens

    def attention_rescoring(self, feats, feat_lens, beam: int = 10,
                            ctc_weight: float = 0.0,
                            reverse_weight: float = 0.0,
                            **kw) -> List[List[int]]:
        best_tokens, best_lens = self.attention_rescoring_arrays(
            feats, feat_lens, beam=beam, ctc_weight=ctc_weight,
            reverse_weight=reverse_weight, **kw)
        toks = np.asarray(best_tokens)
        lens = np.asarray(best_lens)
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]

    # ---------------------------------------------------------- Transducer
    def _transducer_fns(self, batch_size: int):
        model, params = self.model, self.params

        def predictor_step(tok, state, padding=None):
            return model.apply(params, tok, state, padding,
                               method="predictor_step")

        def joint_step(enc_t, pred_u):
            return model.apply(params, enc_t, pred_u, method="joint_step")

        init_state = model.apply(params, batch_size,
                                 method="predictor_init_state")
        return predictor_step, joint_step, init_state

    def rnnt_greedy_arrays(self, feats, feat_lens, n_steps: int = 4,
                           context_list=None, context_lengths=None,
                           context_filter_state: str = "off"):
        """Device-array variant: (tokens [B,U], lens [B], gates or None).
        Covers the scan-based paths (``off``/``on``); the host-driven
        ``exact`` backtracking repair loop stays in
        :meth:`rnnt_greedy_search`."""
        b = feats.shape[0]
        model, params = self.model, self.params

        if context_list is None:
            # The WHOLE search is one jitted program: on dispatch-latency
            # transports (the axon tunnel) every eager op outside jit
            # costs a round trip, which used to dominate the decode.
            key = ("rnnt_greedy_plain", int(n_steps))
            fn = self._jits.get(key)
            if fn is None:
                def run(params, feats, feat_lens):
                    enc, _, _, mask = model.apply(
                        params, feats, feat_lens, None,
                        method="encode_transducer")
                    enc_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
                    # Label-synchronous greedy: ~emission-count
                    # sequential iterations of one whole-T joint matmul
                    # instead of T·n_steps tiny per-frame steps
                    # (rnnt_greedy.py).
                    enc_j = model.apply(params, enc,
                                        method="joint_enc_proj")
                    init_state = model.apply(params, feats.shape[0],
                                             method="predictor_init_state")

                    def predictor_step(tok, state, padding=None):
                        return model.apply(params, tok, state, padding,
                                           method="predictor_step")

                    def joint_frames(pred_out):
                        return model.apply(params, enc_j, pred_out,
                                           method="joint_frames_argmax")

                    return rnnt_greedy.rnnt_greedy_search_labelsync(
                        predictor_step, joint_frames, init_state,
                        int(enc.shape[1]), enc_lens, blank=model.blank,
                        n_steps=n_steps)

                fn = jax.jit(run)
                self._jits[key] = fn
            toks, lens = fn(params, feats, feat_lens)
            return toks, lens, None

        if context_filter_state == "exact":
            bias_hidden = self._m("bias_hidden")(params, context_list,
                                                 context_lengths)
            enc, enc_biased, enc_bias, mask = self._m("encode_transducer")(
                params, feats, feat_lens, bias_hidden)
            enc_lens = jnp.sum(mask.astype(jnp.int32), axis=1)

            # The "unbiased" gate-off stream is biased with the EMPTY
            # hotword list (sentinel [0] only) — reference
            # `greedy_search.py:64-73`.
            ctx_empty = jnp.zeros((1, 1), jnp.int32)
            ctx_empty_lens = jnp.ones((1,), jnp.int32)
            bias_hidden_empty = self._m("bias_hidden")(
                params, ctx_empty, ctx_empty_lens)
            _, enc_empty_biased, _, _ = self._m("encode_transducer")(
                params, feats, feat_lens, bias_hidden_empty)

            def predictor_bias_step(pred_out):
                return model.apply(params, bias_hidden, pred_out,
                                   method="predictor_bias_step")

            def predictor_bias_step_empty(pred_out):
                return model.apply(params, bias_hidden_empty, pred_out,
                                   method="predictor_bias_step")

            def gate_step(enc_bias_t, pred_bias_u):
                return model.apply(params, enc_bias_t, pred_bias_u,
                                   method="hw_gate_step")

            # Reference-exact backtracking repair loop (host-driven,
            # per-utterance; greedy_search.py:110-137 semantics incl.
            # crossed stream selection). Ragged host lists, not arrays.
            p_step, j_step, init1 = self._transducer_fns(1)
            all_hyps, all_gates, glens = [], [], []
            for i in range(b):
                hyps_i, gates_i = \
                    rnnt_greedy.rnnt_gated_greedy_search_exact(
                        p_step, predictor_bias_step,
                        predictor_bias_step_empty, j_step, gate_step,
                        init1, enc_empty_biased[i:i + 1],
                        enc_biased[i:i + 1], enc_bias[i:i + 1],
                        int(enc_lens[i]), blank=model.blank,
                        n_steps=n_steps,
                        loss_mode=getattr(model, "loss_mode", "both"))
                all_hyps.append(hyps_i)
                all_gates.append(gates_i)
                glens.append(len(gates_i))
            g_max = max(glens) if glens else 0
            gates_arr = np.zeros((b, max(g_max, 1)), np.int32)
            for i, g in enumerate(all_gates):
                gates_arr[i, :len(g)] = g
            self.last_gates = (gates_arr, np.asarray(glens, np.int32))
            return all_hyps, None, None

        # Whole-program jit (same rationale as the plain path: eager ops
        # cost a dispatch round trip each on the axon tunnel).
        key = ("rnnt_gated", int(n_steps), context_filter_state == "on")
        fn = self._jits.get(key)
        if fn is None:
            gate_on = context_filter_state == "on"

            def run(params, feats, feat_lens, context_list,
                    context_lengths):
                bias_h = model.apply(params, context_list,
                                     context_lengths,
                                     method="bias_hidden")
                _, e_biased, e_bias, mask = model.apply(
                    params, feats, feat_lens, bias_h,
                    method="encode_transducer")
                e_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
                ctx_e = jnp.zeros((1, 1), jnp.int32)
                ctx_e_l = jnp.ones((1,), jnp.int32)
                bias_h_e = model.apply(params, ctx_e, ctx_e_l,
                                       method="bias_hidden")
                _, e_empty, _, _ = model.apply(
                    params, feats, feat_lens, bias_h_e,
                    method="encode_transducer")
                init_st = model.apply(params, feats.shape[0],
                                      method="predictor_init_state")

                # Label-synchronous gated search: the gate map and the
                # gate-selected encoder stream are precomputed; per
                # iteration only the two predictor-stream joints run.
                gate_all = model.apply(params, e_bias,
                                       method="hw_gate_frames")
                use_bias_all = (gate_all > 0) if gate_on else \
                    jnp.ones_like(gate_all, dtype=bool)
                e_sel = jnp.where(use_bias_all[..., None], e_biased,
                                  e_empty)
                e_j_sel = model.apply(params, e_sel,
                                      method="joint_enc_proj")

                def p_step(tok, state, padding=None):
                    return model.apply(params, tok, state, padding,
                                       method="predictor_step")

                def pb_step(pred_out):
                    return model.apply(params, bias_h, pred_out,
                                       method="predictor_bias_step")

                def pb_step_empty(pred_out):
                    return model.apply(params, bias_h_e, pred_out,
                                       method="predictor_bias_step")

                def joint_frames_sel(pred_biased, pred_empty, use_bias):
                    tb = model.apply(params, e_j_sel, pred_biased,
                                     method="joint_frames_argmax")
                    te = model.apply(params, e_j_sel, pred_empty,
                                     method="joint_frames_argmax")
                    return jnp.where(use_bias, tb, te)

                return rnnt_greedy.rnnt_gated_greedy_search_labelsync(
                    p_step, pb_step, joint_frames_sel,
                    lambda: gate_all, init_st, int(e_biased.shape[1]),
                    e_lens, blank=model.blank, n_steps=n_steps,
                    gate_on=gate_on,
                    predictor_bias_step_empty=pb_step_empty)

            fn = jax.jit(run)
            self._jits[key] = fn
        toks, lens, gates = fn(params, feats, feat_lens, context_list,
                               context_lengths)
        return toks, lens, gates

    def rnnt_greedy_search(self, feats, feat_lens, n_steps: int = 4,
                           context_list=None, context_lengths=None,
                           context_filter_state: str = "off",
                           ) -> List[List[int]]:
        toks, lens, gates = self.rnnt_greedy_arrays(
            feats, feat_lens, n_steps=n_steps, context_list=context_list,
            context_lengths=context_lengths,
            context_filter_state=context_filter_state)
        if lens is None:  # exact mode returned ragged host hyps
            return toks
        if gates is not None:
            self.last_gates = (gates, lens)
        return rnnt_greedy.greedy_to_lists(toks, lens)

    def rnnt_beam_search(self, feats, feat_lens, beam: int = 5,
                         ctc_weight: float = 0.0,
                         transducer_weight: float = 1.0,
                         context_list=None, context_lengths=None):
        model = self.model
        # Whole-search jit (see rnnt_greedy_arrays for rationale).
        key = ("rnnt_beam", int(beam), float(ctc_weight),
               float(transducer_weight), context_list is not None)
        fn = self._jits.get(key)
        if fn is None:
            use_bias = context_list is not None
            state_gather = self._state_gather()

            def run(params, feats, feat_lens, context_list,
                    context_lengths):
                b = feats.shape[0]
                bias_hidden = None
                if use_bias:
                    bias_hidden = model.apply(params, context_list,
                                              context_lengths,
                                              method="bias_hidden")
                enc, enc_biased, _, mask = model.apply(
                    params, feats, feat_lens, bias_hidden,
                    method="encode_transducer")
                enc_use = enc_biased if use_bias else enc
                enc_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
                init_state = model.apply(params, b * beam,
                                         method="predictor_init_state")

                def predictor_step(tok, state, padding=None):
                    return model.apply(params, tok, state, padding,
                                       method="predictor_step")

                def joint_step(enc_t, pred_u):
                    return model.apply(params, enc_t, pred_u,
                                       method="joint_step")

                if use_bias:
                    def joint_fn(enc_t, pred_u):
                        pred_b, _ = model.apply(
                            params, bias_hidden, pred_u,
                            method="predictor_bias_step")
                        return model.apply(params, enc_t, pred_b,
                                           method="joint_step")
                else:
                    joint_fn = joint_step

                ctc_lp = None
                if ctc_weight > 0.0:
                    ctc_lp = model.apply(params, enc_use,
                                         method="ctc_logprobs")
                res = rnnt_beam.rnnt_prefix_beam_search(
                    predictor_step, joint_fn, init_state, enc_use,
                    enc_lens, beam=beam, topk=min(beam, 10),
                    ctc_log_probs=ctc_lp,
                    transducer_weight=transducer_weight,
                    ctc_weight=ctc_weight, blank=model.blank,
                    state_gather=state_gather)
                return res, enc_use, mask

            fn = jax.jit(run)
            self._jits[key] = fn
        return fn(self.params, feats, feat_lens, context_list,
                  context_lengths)

    def _state_gather(self):
        pred_type = type(self.model.predictor).__name__
        if pred_type == "RNNPredictor":
            return lambda st, idx: jax.tree_util.tree_map(
                lambda x: x[:, idx], st)
        return None

    def rnnt_beam_to_lists(self, res) -> List[List[int]]:
        toks = np.asarray(res["tokens"][:, 0])
        lens = np.asarray(res["lens"][:, 0])
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]

    def ctc_beam_td_attn_rescoring_arrays(self, feats, feat_lens,
                                          beam: int = 10,
                                          ctc_weight: float = 0.0,
                                          transducer_weight: float = 0.0,
                                          attn_weight: float = 0.0,
                                          reverse_weight: float = 0.0,
                                          **kw):
        """Device-array variant of :meth:`ctc_beam_td_attn_rescoring`:
        (best_tokens [B, U], best_lens [B]). CTC prefix-beam proposals
        re-ranked by ``attn_weight·att + ctc_weight·beam_score +
        transducer_weight·td_score`` — the reference's 8th decode mode
        (`wenet/bin/recognize.py:321`, `transducer_attention_rescoring`
        with ``beam_search_type='ctc'``, `transducer.py:379-513`)."""
        _, res, enc, mask = Decoder.ctc_prefix_beam_search(
            self, feats, feat_lens, beam=beam, **kw)

        def scores_fn(memory, memory_mask, hyps_in, hyps_lens, r_hyps_in,
                      rw):
            return self._m("decoder_scores", n_static_tail=1)(
                self.params, memory, memory_mask, hyps_in, hyps_lens,
                r_hyps_in, float(rw))

        att = rescoring.score_hyps_with_decoder(
            scores_fn, enc, mask, res["tokens"], res["lens"],
            self.model.sos, self.model.eos, reverse_weight)
        td = self._m("transducer_score")(
            self.params, enc, mask, res["tokens"], res["lens"])
        total = (attn_weight * att + ctc_weight * res["scores"]
                 + transducer_weight * td)
        best = jnp.argmax(total, axis=1)
        best_tokens = jnp.take_along_axis(
            res["tokens"], best[:, None, None], axis=1)[:, 0]
        best_lens = jnp.take_along_axis(res["lens"], best[:, None],
                                        axis=1)[:, 0]
        return best_tokens, best_lens

    def ctc_beam_td_attn_rescoring(self, feats, feat_lens, beam: int = 10,
                                   ctc_weight: float = 0.0,
                                   transducer_weight: float = 0.0,
                                   attn_weight: float = 0.0,
                                   reverse_weight: float = 0.0,
                                   **kw) -> List[List[int]]:
        toks, lens = self.ctc_beam_td_attn_rescoring_arrays(
            feats, feat_lens, beam=beam, ctc_weight=ctc_weight,
            transducer_weight=transducer_weight, attn_weight=attn_weight,
            reverse_weight=reverse_weight, **kw)
        toks = np.asarray(toks)
        lens = np.asarray(lens)
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]

    def rnnt_beam_attn_rescoring(self, feats, feat_lens, beam: int = 5,
                                 attn_weight: float = 1.0,
                                 transducer_weight: float = 1.0,
                                 search_ctc_weight: float = 0.0,
                                 reverse_weight: float = 0.0,
                                 context_list=None, context_lengths=None
                                 ) -> List[List[int]]:
        """Transducer n-best re-ranked by the attention decoder
        (reference `transducer.py:379-513`)."""
        res, enc, mask = self.rnnt_beam_search(
            feats, feat_lens, beam=beam, ctc_weight=search_ctc_weight,
            transducer_weight=transducer_weight,
            context_list=context_list, context_lengths=context_lengths)

        def scores_fn(memory, memory_mask, hyps_in, hyps_lens, r_hyps_in,
                      rw):
            return self._m("decoder_scores", n_static_tail=1)(
                self.params, memory, memory_mask, hyps_in, hyps_lens,
                r_hyps_in, float(rw))

        att = rescoring.score_hyps_with_decoder(
            scores_fn, enc, mask, res["tokens"], res["lens"],
            self.model.sos, self.model.eos, reverse_weight)
        total = attn_weight * att + transducer_weight * res["scores"]
        best = jnp.argmax(total, axis=1)
        toks = np.asarray(jnp.take_along_axis(
            res["tokens"], best[:, None, None], axis=1)[:, 0])
        lens = np.asarray(jnp.take_along_axis(res["lens"], best[:, None],
                                              axis=1)[:, 0])
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]
