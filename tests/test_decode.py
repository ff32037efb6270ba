"""Decoder algorithm tests: golden values vs reference semantics and
brute-force checks on tiny problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.decode.attention_beam import attention_beam_search
from wenet_celoss_tpu.decode.ctc_greedy import ctc_greedy_search
from wenet_celoss_tpu.decode.ctc_prefix_beam import (
    ctc_prefix_beam_search, nbest_to_lists)
from wenet_celoss_tpu.decode.rnnt_beam import rnnt_prefix_beam_search
from wenet_celoss_tpu.decode.rnnt_greedy import (
    greedy_to_lists, rnnt_greedy_search)


class TestCtcGreedy:
    def test_collapse(self):
        # Frames argmax: [1, 1, 0, 2, 2] → [1, 2]
        lp = jnp.log(jnp.asarray([
            [[0.1, 0.8, 0.1], [0.1, 0.8, 0.1], [0.8, 0.1, 0.1],
             [0.1, 0.1, 0.8], [0.1, 0.1, 0.8]]]))
        mask = jnp.ones((1, 5), bool)
        assert ctc_greedy_search(lp, mask) == [[1, 2]]

    def test_padding_ignored(self):
        lp = jnp.log(jnp.asarray([
            [[0.1, 0.8, 0.1], [0.1, 0.1, 0.8], [0.1, 0.8, 0.1]]]))
        mask = jnp.asarray([[True, True, False]])
        assert ctc_greedy_search(lp, mask) == [[1, 2]]


class TestCtcPrefixBeam:
    def test_golden_3x3(self):
        """The reference runtime's hand-computed golden test
        (`runtime/core/test/ctc_prefix_beam_search_test.cc:26-120`):
        probs over {blank, a, b}, T=3; expected best prefixes and scores."""
        probs = np.array([
            [0.25, 0.40, 0.35],
            [0.40, 0.35, 0.25],
            [0.10, 0.50, 0.40],
        ], dtype=np.float32)
        lp = jnp.asarray(np.log(probs.astype(np.float64)).astype(np.float32))[None]
        res = ctc_prefix_beam_search(lp, jnp.array([3]), beam=3,
                                     first_beam=3)
        hyps = nbest_to_lists(res, 3)[0]
        scores = np.exp(np.asarray(res["scores"][0]))
        viterbi = np.exp(np.asarray(res["viterbi"][0]))
        times = np.asarray(res["times"][0])
        lens = np.asarray(res["lens"][0])
        # Expected table from the reference golden test
        # (`ctc_prefix_beam_search_test.cc:44-49`). rel=1e-3 absorbs XLA
        # CPU's fast-polynomial log (~2e-5 abs error per op).
        assert hyps == [[2, 1], [1, 2], [1]]
        np.testing.assert_allclose(scores, [0.2185, 0.1550, 0.1525],
                                   rtol=1e-3)
        np.testing.assert_allclose(viterbi, [0.07, 0.064, 0.07], rtol=1e-3)
        assert [list(times[i, :lens[i]]) for i in range(3)] == \
            [[0, 2], [0, 2], [2]]

    def test_merge_correctness_random(self):
        """Beam == all prefixes on a tiny vocab must reproduce exact
        marginals (brute force)."""
        rng = np.random.default_rng(0)
        t, v = 4, 3
        x = rng.standard_normal((t, v)).astype(np.float32)
        probs = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
        lp = jnp.asarray(np.log(probs.astype(np.float64)).astype(np.float32))[None]
        res = ctc_prefix_beam_search(lp, jnp.array([t]), beam=15,
                                     first_beam=3)
        from itertools import product
        best = {}
        for path in product(range(v), repeat=t):
            p = np.prod([probs[i, path[i]] for i in range(t)])
            seq, prev = [], -1
            for s in path:
                if s != 0 and s != prev:
                    seq.append(s)
                prev = s
            best[tuple(seq)] = best.get(tuple(seq), 0.0) + p
        expect = sorted(best.items(), key=lambda kv: -kv[1])
        hyps = nbest_to_lists(res, 15)[0]
        scores = np.exp(np.asarray(res["scores"][0]))
        for (eseq, ep), hyp, s in zip(expect[:6], hyps[:6], scores[:6]):
            assert list(eseq) == hyp, (expect[:6], hyps[:6])
            assert s == pytest.approx(ep, rel=1e-3)

    def test_batch_lengths(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5, 4)).astype(np.float32)
        lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(x), axis=-1))
        res2 = ctc_prefix_beam_search(lp, jnp.array([5, 3]), beam=4,
                                      first_beam=4)
        res1 = ctc_prefix_beam_search(lp[1:, :3], jnp.array([3]), beam=4,
                                      first_beam=4)
        np.testing.assert_allclose(np.asarray(res2["scores"][1]),
                                   np.asarray(res1["scores"][0]), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(res2["lens"][1]),
                                      np.asarray(res1["lens"][0]))


class TestAttentionBeam:
    def test_beats_or_matches_greedy_on_toy_lm(self):
        """A fixed stochastic 'decoder' that only looks at the last token:
        beam-1 equals greedy argmax rollout."""
        rng = np.random.default_rng(2)
        v, sos, eos = 6, 5, 5
        table = jnp.asarray(jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((v, v)), jnp.float32), axis=-1))

        def one_step(memory, memory_mask, buf, pos):
            last = jax.lax.dynamic_slice_in_dim(buf, pos, 1, axis=1)[:, 0]
            return table[last]

        enc = jnp.zeros((2, 3, 4))
        mask = jnp.ones((2, 3), bool)
        hyps, lens, scores = attention_beam_search(
            one_step, enc, mask, sos, eos, beam=1, max_len=4)
        # Greedy rollout on host.
        cur, out = sos, []
        for _ in range(4):
            nxt = int(jnp.argmax(table[cur]))
            out.append(nxt)
            cur = nxt
            if nxt == eos:
                break
        got = [int(x) for x in np.asarray(hyps[0, 0, : lens[0, 0]])]
        expect = [t for t in out if t != eos]
        assert got == expect

    def test_beam_finds_higher_score(self):
        """Beam 4 total score ≥ beam 1 on a random table."""
        rng = np.random.default_rng(3)
        v, sos, eos = 6, 5, 5
        table = jnp.asarray(jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((v, v)), jnp.float32), axis=-1))

        def one_step(memory, memory_mask, buf, pos):
            last = jax.lax.dynamic_slice_in_dim(buf, pos, 1, axis=1)[:, 0]
            return table[last]

        enc = jnp.zeros((1, 3, 4))
        mask = jnp.ones((1, 3), bool)
        _, _, s1 = attention_beam_search(one_step, enc, mask, sos, eos,
                                         beam=1, max_len=5)
        _, _, s4 = attention_beam_search(one_step, enc, mask, sos, eos,
                                         beam=4, max_len=5)
        assert float(s4[0, 0]) >= float(s1[0, 0]) - 1e-5


def _toy_w(v=4, p=3):
    rng = np.random.default_rng(4)
    return jnp.asarray(rng.standard_normal((p, v)), jnp.float32)


def _toy_transducer(v=4, p=3):
    """A tiny deterministic 'transducer': pred_out = onehot(last token),
    joint = enc + W @ pred."""
    w = _toy_w(v, p)

    def predictor_step(tok, state, padding):
        onehot = jax.nn.one_hot(tok % p, p)
        frozen = padding[:, None].astype(jnp.float32)
        new = onehot * (1 - frozen) + state * frozen
        return new, new

    def joint_step(enc_t, pred):
        return enc_t + pred @ w

    return predictor_step, joint_step


class TestRnntSearches:
    def test_greedy_runs_and_blank_only_is_empty(self):
        v = 4
        predictor_step, joint_step = _toy_transducer(v)
        # Encoder output that makes blank dominate everywhere.
        enc = jnp.zeros((2, 5, v)).at[:, :, 0].set(50.0)
        toks, lens = rnnt_greedy_search(
            predictor_step, joint_step, jnp.zeros((2, 3)), enc,
            jnp.array([5, 3]))
        assert greedy_to_lists(toks, lens) == [[], []]

    def test_greedy_emits(self):
        v = 4
        predictor_step, joint_step = _toy_transducer(v)
        enc = jnp.zeros((1, 3, v)).at[:, :, 2].set(30.0)
        toks, lens = rnnt_greedy_search(
            predictor_step, joint_step, jnp.zeros((1, 3)), enc,
            jnp.array([3]), n_steps=2)
        hyp = greedy_to_lists(toks, lens)[0]
        assert len(hyp) == 6 and set(hyp) == {2}

    def test_beam_contains_greedy(self):
        v = 4
        rng = np.random.default_rng(5)
        predictor_step, joint_step = _toy_transducer(v)
        enc = jnp.asarray(rng.standard_normal((2, 6, v)) * 2, jnp.float32)
        toks, lens = rnnt_greedy_search(
            predictor_step, joint_step, jnp.zeros((2, 3)), enc,
            jnp.array([6, 6]), n_steps=1)
        res = rnnt_prefix_beam_search(
            predictor_step, joint_step, jnp.zeros((2 * 4, 3)), enc,
            jnp.array([6, 6]), beam=4, topk=3)
        assert res["tokens"].shape[:2] == (2, 4)
        assert np.isfinite(np.asarray(res["scores"][:, 0])).all()
        # Beam best score ≥ score of any single path (sanity).
        assert (np.asarray(res["lens"]) <= 6).all()


class TestLabelSyncGreedy:
    """rnnt_greedy_search_labelsync must be decode-for-decode identical
    to the frame-synchronous scan (same emissions, same per-frame
    n_steps budget), across random joints and ragged lengths."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("n_steps", [1, 2, 4])
    def test_matches_frame_sync(self, seed, n_steps):
        from wenet_celoss_tpu.decode.rnnt_greedy import \
            rnnt_greedy_search_labelsync
        v, p, b, t = 5, 3, 4, 9
        rng = np.random.default_rng(seed)
        predictor_step, joint_step = _toy_transducer(v, p)
        enc = jnp.asarray(rng.standard_normal((b, t, v)) * 2.5,
                          jnp.float32)
        lens = jnp.asarray(rng.integers(1, t + 1, (b,)), jnp.int32)

        ref_t, ref_l = rnnt_greedy_search(
            predictor_step, joint_step, jnp.zeros((b, p)), enc, lens,
            n_steps=n_steps)

        def joint_frames(pred_out):
            return jnp.argmax(enc + (pred_out @ _toy_w(v, p))[:, None, :],
                              axis=-1).astype(jnp.int32)

        got_t, got_l = rnnt_greedy_search_labelsync(
            predictor_step, joint_frames, jnp.zeros((b, p)), t, lens,
            n_steps=n_steps)
        assert greedy_to_lists(got_t, got_l) == \
            greedy_to_lists(ref_t, ref_l)
