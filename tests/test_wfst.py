"""WFST (LG) graph build + beam decode tests.

Covers the reference's TLG capability (tools/fst/make_tlg.sh +
runtime/core/decoder/ctc_wfst_beam_search.cc): n-gram automaton scoring
parity vs the ARPA scorer, CTC-constrained Viterbi decode parity vs
brute-force enumeration, and binary round-trip shared with the C++ runtime.
"""

import itertools
import math

import numpy as np
import pytest

from wenet_celoss_tpu.lm.arpa import ArpaLM
from wenet_celoss_tpu.lm.fst import (LgGraph, NgramGraph, WfstDecodeOptions,
                                     build_lg, wfst_beam_decode)

LOG10 = math.log(10.0)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.8\t<s>\t-0.4
-0.9\t</s>
-0.6\tab\t-0.3
-0.8\tba\t-0.25
-1.5\tb\t-0.1

\\2-grams:
-0.3\t<s> ab
-0.45\tab ba
-0.5\tba ab
-0.35\tab </s>

\\end\\
"""

# units: 0=blank, 1='a', 2='b', 3='c'
LEXICON = [
    ("ab", [1, 2]),
    ("ba", [2, 1]),
    ("b", [2]),
]


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


@pytest.fixture(scope="module")
def lg(lm):
    return build_lg(LEXICON, lm, num_units=4)


class TestNgramGraph:
    def test_advance_matches_arpa(self, lm, lg):
        """Automaton path cost over a word sequence == ARPA backoff score."""
        g = lg.ngram
        word2id = {w: i for i, w in enumerate(lg.words)}
        for seq in [["ab"], ["ab", "ba"], ["ba", "ab"], ["b", "b"],
                    ["ab", "ba", "ab"], ["ba", "b", "ab"]]:
            s, cost = g.start, 0.0
            for w in seq:
                c, s = g.advance(s, word2id[w])
                cost += c
            cost += g.final[s]
            expected = -lm.sentence_loge(seq)
            assert cost == pytest.approx(expected, abs=1e-6), seq

    def test_unknown_word_fails(self, lg):
        g = lg.ngram
        c, _ = g.advance(g.start, 999)
        assert math.isinf(c)


def ctc_collapse(path, blank=0):
    out, last = [], blank
    for u in path:
        if u != blank and u != last:
            out.append(u)
        last = u
    return out


def parse_words(units, lexicon, word2id):
    """All segmentations of a unit sequence into lexicon words."""
    results = []

    def rec(i, acc):
        if i == len(units):
            results.append(list(acc))
            return
        for w, wu in lexicon:
            if units[i:i + len(wu)] == wu:
                acc.append(word2id[w])
                rec(i + len(wu), acc)
                acc.pop()

    rec(0, [])
    return results


def brute_force_best(lg, log_probs, lm_scale=1.0, blank=0):
    """Enumerate every alignment path; score words with the automaton."""
    T, V = log_probs.shape
    word2id = {w: i for i, w in enumerate(lg.words)}
    g = lg.ngram
    best = (math.inf, None)
    for path in itertools.product(range(V), repeat=T):
        acoustic = -sum(log_probs[t, u] for t, u in enumerate(path))
        units = ctc_collapse(path, blank)
        for words in parse_words(units, LEXICON, word2id):
            s, lmcost = g.start, 0.0
            ok = True
            for w in words:
                c, s = g.advance(s, w)
                if math.isinf(c):
                    ok = False
                    break
                lmcost += c
            if not ok:
                continue
            lmcost += g.final[s]
            total = acoustic + lm_scale * lmcost
            if total < best[0]:
                best = (total, tuple(words))
    return best


class TestWfstDecode:
    def _random_logp(self, T, V, seed):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(T, V))
        x = x - np.log(np.exp(x).sum(-1, keepdims=True))
        return x

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_parity_vs_brute_force(self, lg, seed):
        T, V = 5, 4
        logp = self._random_logp(T, V, seed)
        expect_cost, expect_words = brute_force_best(lg, logp)
        opts = WfstDecodeOptions(beam=1e9, max_active=10**9, nbest=4)
        hyps = wfst_beam_decode(lg, logp, opts)
        assert hyps, "no hypothesis"
        assert hyps[0].cost == pytest.approx(expect_cost, abs=1e-6)
        assert tuple(hyps[0].words) == expect_words
        # costs are sorted
        assert all(hyps[i].cost <= hyps[i + 1].cost + 1e-9
                   for i in range(len(hyps) - 1))

    def test_lm_scale(self, lg):
        logp = self._random_logp(6, 4, 7)
        expect_cost, expect_words = brute_force_best(lg, logp, lm_scale=0.5)
        opts = WfstDecodeOptions(beam=1e9, max_active=10**9, lm_scale=0.5)
        hyps = wfst_beam_decode(lg, logp, opts)
        assert hyps[0].cost == pytest.approx(expect_cost, abs=1e-6)
        assert tuple(hyps[0].words) == expect_words

    def test_biased_decode_finds_word(self, lg):
        """Posteriors spelling 'a b' cleanly must decode to word 'ab'."""
        logp = np.full((4, 4), -8.0)
        for t, u in enumerate([1, 0, 2, 0]):
            logp[t, u] = -0.01
        hyps = wfst_beam_decode(lg, logp, WfstDecodeOptions(beam=30.0))
        words = [lg.words[w] for w in hyps[0].words]
        assert words == ["ab"]
        assert hyps[0].units == [1, 2]
        assert hyps[0].times == [0, 2]
        assert hyps[0].word_times == [0]

    def test_repeat_needs_blank(self, lg):
        """'b b' (word b twice) requires a blank between the two 'b's."""
        # frames: b, blank, b  -> words [b, b]
        logp = np.full((3, 4), -9.0)
        logp[0, 2] = -0.01
        logp[1, 0] = -0.01
        logp[2, 2] = -0.01
        hyps = wfst_beam_decode(lg, logp, WfstDecodeOptions(beam=40.0))
        words = [lg.words[w] for w in hyps[0].words]
        assert words == ["b", "b"]
        # without the blank, 'b b' on consecutive frames is one emission
        logp2 = np.full((2, 4), -9.0)
        logp2[0, 2] = logp2[1, 2] = -0.01
        hyps2 = wfst_beam_decode(lg, logp2, WfstDecodeOptions(beam=40.0))
        assert [lg.words[w] for w in hyps2[0].words] == ["b"]

    def test_blank_skip(self, lg):
        """Frame skipping at high blank confidence keeps the transcript."""
        logp = np.full((6, 4), -10.0)
        script = [1, 0, 0, 0, 2, 0]
        for t, u in enumerate(script):
            logp[t, u] = -1e-4
        opts = WfstDecodeOptions(beam=40.0, blank_skip_thresh=0.98)
        hyps = wfst_beam_decode(lg, logp, opts)
        assert [lg.words[w] for w in hyps[0].words] == ["ab"]


class TestSerialization:
    def test_round_trip(self, lg, tmp_path):
        p = tmp_path / "lg.bin"
        lg.write(str(p))
        lg2 = LgGraph.read(str(p))
        assert lg2.words == lg.words
        assert lg2.num_units == lg.num_units
        assert lg2.trie.num_nodes == lg.trie.num_nodes
        assert lg2.ngram.num_states == lg.ngram.num_states
        assert lg2.ngram.start == lg.ngram.start
        logp = np.random.default_rng(5).normal(size=(5, 4))
        logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
        a = wfst_beam_decode(lg, logp, WfstDecodeOptions(beam=1e9))
        b = wfst_beam_decode(lg2, logp, WfstDecodeOptions(beam=1e9))
        assert a[0].words == b[0].words
        assert a[0].cost == pytest.approx(b[0].cost, abs=1e-6)


class TestBuilderTool:
    def test_spell(self):
        import importlib.util
        from pathlib import Path
        spec = importlib.util.spec_from_file_location(
            "build_lg", Path(__file__).resolve().parents[1]
            / "tools" / "fst" / "build_lg.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        unit2id = {"▁a": 1, "b": 2, "c": 3, "▁": 4, "a": 5}
        assert mod.spell("abc", unit2id) == [1, 2, 3]  # ▁a b c
        assert mod.spell("cb", unit2id) == [4, 3, 2]   # ▁ c b
        assert mod.spell("zq", unit2id) is None
