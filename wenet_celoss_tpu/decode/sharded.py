"""Mesh-sharded batch decode with collective hypothesis exchange.

The reference decodes per-process with independent output files (one
process per GPU, `wenet/bin/recognize.py` driven by the recipe's shell
loop); results are only unified by the filesystem. The TPU-native design
instead runs ONE SPMD program over a `jax.sharding.Mesh`: the utterance
batch is sharded over the ``data`` axis, GSPMD partitions the encoder and
the batched searches, and the final beam hypotheses / rescoring scores are
exchanged with an explicit XLA ``lax.all_gather`` over the ``data`` axis
(riding ICI) so that EVERY device — and therefore every host process in a
multi-host pod — holds the full n-best without any host-side networking
(the BASELINE north star's "beam hypotheses and rescoring scores exchanged
via XLA collectives").

`ShardedDecoder` wraps :class:`~wenet_celoss_tpu.decode.api.Decoder`:
params are placed per the mesh's model-axis rules (tensor-parallel
compatible), inputs are padded to the data-axis size and batch-sharded,
and each decode mode ends with :func:`exchange` before the host
materializes hypotheses.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wenet_celoss_tpu.decode import ctc_greedy, ctc_prefix_beam, rnnt_greedy
from wenet_celoss_tpu.decode.api import Decoder
from wenet_celoss_tpu.parallel.mesh import batch_sharding, shard_state
from wenet_celoss_tpu.utils.common import remove_duplicates_and_blank


import functools


@functools.lru_cache(maxsize=None)
def _gather_fn(mesh, n):
    """Jitted all-gather of n batch-sharded arrays (cached per mesh/arity
    so repeated decode batches reuse the compiled collective)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    in_specs = tuple(P("data") for _ in range(n))
    out_specs = tuple(P() for _ in range(n))

    def gather(*xs):
        return tuple(
            jax.lax.all_gather(x, "data", axis=0, tiled=True) for x in xs)

    # all_gather(tiled) output IS replicated over 'data', but the static
    # varying-mesh-axes check can't infer that; disable it (kwarg name
    # differs across jax versions).
    try:
        fn = shard_map(gather, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    except TypeError:
        fn = shard_map(gather, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_rep=False)
    return jax.jit(fn)


def exchange(mesh, *arrays):
    """All-gather batch-sharded result arrays over the ``data`` axis.

    Each input has its leading (batch) axis sharded over ``data``; the
    outputs are fully replicated: every device receives every shard's rows
    via one `lax.all_gather` per array (an ICI collective inside jit, not
    a host transfer). In a multi-host pod this is what lets every process
    materialize the complete hypothesis set.
    """
    return _gather_fn(mesh, len(arrays))(*arrays)


class ShardedDecoder(Decoder):
    """Decoder running SPMD over a mesh, exchanging results collectively.

    Supported modes: attention, ctc_greedy_search, ctc_prefix_beam_search,
    attention_rescoring, rnnt_greedy_search (scan paths ``off``/``on``),
    rnnt_beam_search, rnnt_beam_attn_rescoring. The host-driven ``exact``
    backtracking mode is inherently per-utterance sequential and falls
    back to the parent.
    """

    #: decode modes that run SPMD with a collective exchange (mirrors the
    #: recognize.py MODES names); anything else falls back to the plain
    #: single-program path.
    SUPPORTED_MODES = frozenset({
        "attention", "ctc_greedy_search", "ctc_prefix_beam_search",
        "attention_rescoring", "rnnt_greedy_search", "rnnt_beam_search",
        "rnnt_beam_attn_rescoring", "ctc_beam_td_attn_rescoring",
    })

    def ctc_beam_td_attn_rescoring(self, feats, feat_lens, beam: int = 10,
                                   ctc_weight: float = 0.0,
                                   transducer_weight: float = 0.0,
                                   attn_weight: float = 0.0,
                                   reverse_weight: float = 0.0,
                                   **kw) -> List[List[int]]:
        feats, feat_lens, take = self._place(feats, feat_lens)
        toks, lens = self.ctc_beam_td_attn_rescoring_arrays(
            feats, feat_lens, beam=beam, ctc_weight=ctc_weight,
            transducer_weight=transducer_weight, attn_weight=attn_weight,
            reverse_weight=reverse_weight, **kw)
        toks, lens = exchange(self.mesh, toks, lens)
        toks = np.asarray(take(toks))
        lens = np.asarray(take(lens))
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]

    def __init__(self, model, variables, mesh):
        super().__init__(model, shard_state(mesh, variables))
        self.mesh = mesh

    # ------------------------------------------------------------- placement
    def _place(self, feats, feat_lens):
        """Pad the batch to the data-axis share and shard it. Returns
        (feats, feat_lens, take) where ``take(arr)`` drops the padding
        rows from an exchanged (replicated) result.

        Single process: the batch is global; pad to the data-axis size.
        Multi-host pod: each process passes its LOCAL utterances (the
        DistributedSampler analog); locals pad to the per-process share
        of the data axis (all hosts must bring the same local count) and
        assemble via `jax.make_array_from_process_local_data` — process
        p's rows land at global rows [p·share, (p+1)·share), so ``take``
        stitches every host's real rows back together after the
        collective exchange."""
        n_real = int(feats.shape[0])
        multi = jax.process_count() > 1
        share = self.mesh.shape["data"]
        if multi:
            assert share % jax.process_count() == 0, \
                (share, jax.process_count())
            share //= jax.process_count()
        pad = (-n_real) % share
        if pad:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)])
            feat_lens = jnp.concatenate(
                [feat_lens,
                 jnp.full((pad,), feats.shape[1], feat_lens.dtype)])
        bsh = batch_sharding(self.mesh)
        if multi:
            from jax.experimental import multihost_utils
            padded = n_real + pad
            counts = multihost_utils.process_allgather(
                np.asarray([n_real, padded], np.int32))
            counts = np.asarray(counts).reshape(jax.process_count(), 2)
            assert (counts[:, 1] == padded).all(), \
                f"hosts brought unequal padded batches: {counts[:, 1]}"
            feats = jax.make_array_from_process_local_data(
                bsh, np.asarray(feats))
            feat_lens = jax.make_array_from_process_local_data(
                bsh, np.asarray(feat_lens))

            def take(arr):
                # The exchanged array is fully replicated, but it spans
                # non-addressable devices, so jax refuses np.asarray on
                # it; any ADDRESSABLE shard already holds the complete
                # value.
                if isinstance(arr, jax.Array) and \
                        not arr.is_fully_addressable:
                    arr = arr.addressable_shards[0].data
                arr = np.asarray(arr)
                return np.concatenate(
                    [arr[p * padded:p * padded + int(counts[p, 0])]
                     for p in range(counts.shape[0])], axis=0)

            return feats, feat_lens, take

        def take(arr):
            return arr[:n_real]

        return (jax.device_put(feats, bsh), jax.device_put(feat_lens, bsh),
                take)

    # ----------------------------------------------------------------- modes
    def ctc_greedy_search(self, feats, feat_lens, **kw) -> List[List[int]]:
        feats, feat_lens, take = self._place(feats, feat_lens)
        _, mask, ctc_lp = self._encode(feats, feat_lens, **kw)
        ids, _ = ctc_greedy.ctc_greedy_frames(ctc_lp, mask)
        (ids,) = exchange(self.mesh, ids)
        ids = np.asarray(take(ids))
        return [remove_duplicates_and_blank(row) for row in ids]

    def ctc_prefix_beam_search(self, feats, feat_lens, beam: int = 10,
                               first_beam: Optional[int] = None, **kw):
        feats, feat_lens, take = self._place(feats, feat_lens)
        enc, mask, ctc_lp = self._encode(feats, feat_lens, **kw)
        lens = jnp.sum(mask.astype(jnp.int32), axis=1)
        res = ctc_prefix_beam.ctc_prefix_beam_search(
            ctc_lp, lens, beam=beam,
            first_beam=first_beam if first_beam else beam)
        # Exchange EVERY result entry (incl. viterbi scores + token times
        # for timestamp consumers) so the returned dict is uniformly
        # replicated and truncated to the real batch.
        tokens, tlens, scores, vit, times = exchange(
            self.mesh, res["tokens"], res["lens"], res["scores"],
            res["viterbi"], res["times"])
        res_full = dict(res, tokens=take(tokens), lens=take(tlens),
                        scores=take(scores), viterbi=take(vit),
                        times=take(times))
        return (ctc_prefix_beam.nbest_to_lists(res_full, 1), res_full,
                enc, mask)

    def attention(self, feats, feat_lens, beam: int = 10,
                  max_len: int = 0, **kw) -> List[List[int]]:
        feats, feat_lens, take = self._place(feats, feat_lens)
        hyps, lens = self.attention_arrays(feats, feat_lens, beam=beam,
                                           max_len=max_len, **kw)
        # Only the per-utterance winners travel the collective.
        best_toks, best_lens = exchange(self.mesh, hyps[:, 0], lens[:, 0])
        toks = np.asarray(take(best_toks))
        tlens = np.asarray(take(best_lens))
        return [[int(x) for x in toks[i, :tlens[i]]]
                for i in range(toks.shape[0])]

    def attention_rescoring(self, feats, feat_lens, beam: int = 10,
                            ctc_weight: float = 0.0,
                            reverse_weight: float = 0.0,
                            **kw) -> List[List[int]]:
        feats, feat_lens, take = self._place(feats, feat_lens)
        # attention_rescoring_arrays already bypasses this class's
        # ctc_prefix_beam_search override (explicit Decoder call): the
        # n-best stays padded + batch-sharded through the rescoring
        # matmuls; only the FINAL winners are exchanged.
        best_tokens, best_lens = self.attention_rescoring_arrays(
            feats, feat_lens, beam=beam, ctc_weight=ctc_weight,
            reverse_weight=reverse_weight, **kw)
        best_tokens, best_lens = exchange(self.mesh, best_tokens, best_lens)
        toks = np.asarray(take(best_tokens))
        lens = np.asarray(take(best_lens))
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]

    def rnnt_greedy_search(self, feats, feat_lens, n_steps: int = 4,
                           context_list=None, context_lengths=None,
                           context_filter_state: str = "off",
                           ) -> List[List[int]]:
        if context_filter_state == "exact":
            # Host-driven per-utterance repair loop: no batched arrays to
            # exchange; run unsharded on the first device's replica.
            return super().rnnt_greedy_search(
                feats, feat_lens, n_steps=n_steps,
                context_list=context_list,
                context_lengths=context_lengths,
                context_filter_state=context_filter_state)
        feats, feat_lens, take = self._place(feats, feat_lens)
        toks, lens, gates = self.rnnt_greedy_arrays(
            feats, feat_lens, n_steps=n_steps, context_list=context_list,
            context_lengths=context_lengths,
            context_filter_state=context_filter_state)
        if gates is not None:
            toks, lens, gates = exchange(self.mesh, toks, lens, gates)
            self.last_gates = (np.asarray(take(gates)),
                               np.asarray(take(lens)))
        else:
            toks, lens = exchange(self.mesh, toks, lens)
        toks = np.asarray(take(toks))
        lens = np.asarray(take(lens))
        return rnnt_greedy.greedy_to_lists(toks, lens)

    def rnnt_beam_search(self, feats, feat_lens, beam: int = 5,
                         ctc_weight: float = 0.0,
                         transducer_weight: float = 1.0,
                         context_list=None, context_lengths=None):
        feats, feat_lens, take = self._place(feats, feat_lens)
        res, enc_use, mask = super().rnnt_beam_search(
            feats, feat_lens, beam=beam, ctc_weight=ctc_weight,
            transducer_weight=transducer_weight,
            context_list=context_list, context_lengths=context_lengths)
        tokens, tlens, scores = exchange(
            self.mesh, res["tokens"], res["lens"], res["scores"])
        res = dict(res, tokens=take(tokens), lens=take(tlens),
                   scores=take(scores))
        return res, enc_use, mask

    def rnnt_beam_attn_rescoring(self, feats, feat_lens, beam: int = 5,
                                 attn_weight: float = 1.0,
                                 transducer_weight: float = 1.0,
                                 search_ctc_weight: float = 0.0,
                                 reverse_weight: float = 0.0,
                                 context_list=None, context_lengths=None
                                 ) -> List[List[int]]:
        from wenet_celoss_tpu.decode import rescoring
        feats, feat_lens, take = self._place(feats, feat_lens)
        # Padded + sharded all the way through the attention re-rank; the
        # per-utterance winners are exchanged at the end.
        res, enc, mask = Decoder.rnnt_beam_search(
            self, feats, feat_lens, beam=beam,
            ctc_weight=search_ctc_weight,
            transducer_weight=transducer_weight,
            context_list=context_list, context_lengths=context_lengths)

        def scores_fn(memory, memory_mask, hyps_in, hyps_lens, r_hyps_in,
                      rw):
            return self.model.apply(
                self.params, memory, memory_mask, hyps_in, hyps_lens,
                r_hyps_in, rw, method="decoder_scores")

        att = rescoring.score_hyps_with_decoder(
            scores_fn, enc, mask, res["tokens"], res["lens"],
            self.model.sos, self.model.eos, reverse_weight)
        total = attn_weight * att + transducer_weight * res["scores"]
        best = jnp.argmax(total, axis=1)
        toks = jnp.take_along_axis(res["tokens"], best[:, None, None],
                                   axis=1)[:, 0]
        lens = jnp.take_along_axis(res["lens"], best[:, None], axis=1)[:, 0]
        toks, lens = exchange(self.mesh, toks, lens)
        toks = np.asarray(take(toks))
        lens = np.asarray(take(lens))
        return [[int(x) for x in toks[i, :lens[i]]]
                for i in range(toks.shape[0])]
