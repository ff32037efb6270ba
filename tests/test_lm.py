"""ARPA LM parser + backoff scoring tests (hand-computed values)."""

import math

import pytest

from wenet_celoss_tpu.lm.arpa import ArpaLM, lm_rescore_nbest

ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.0\t</s>
-0.7\ta\t-0.3
-0.9\tb\t-0.2
-2.0\t<unk>

\\2-grams:
-0.4\t<s> a
-0.5\ta b
-0.6\tb </s>

\\end\\
"""


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


class TestArpa:
    def test_parse(self, lm):
        assert lm.order == 2
        assert lm.ngrams[("a",)] == (-0.7, -0.3)
        assert lm.ngrams[("<s>", "a")][0] == -0.4

    def test_direct_bigram(self, lm):
        assert lm.log10_prob("a", ["<s>"]) == pytest.approx(-0.4)
        assert lm.log10_prob("b", ["a"]) == pytest.approx(-0.5)

    def test_backoff(self, lm):
        # p(a | b) not listed: backoff(b) + p(a) = -0.2 + -0.7
        assert lm.log10_prob("a", ["b"]) == pytest.approx(-0.9)
        # history not listed at all: no backoff weight, unigram only.
        assert lm.log10_prob("a", ["zzz"]) == pytest.approx(-0.7)

    def test_unk(self, lm):
        assert lm.log10_prob("zzz", []) == pytest.approx(-2.0)

    def test_sentence(self, lm):
        # <s> a b </s> = p(a|<s>) + p(b|a) + p(</s>|b)
        assert lm.sentence_log10(["a", "b"]) == pytest.approx(
            -0.4 - 0.5 - 0.6)
        assert lm.sentence_loge(["a", "b"]) == pytest.approx(
            (-1.5) * math.log(10))

    def test_rescore(self, lm):
        scores = lm_rescore_nbest(
            lm, [["a", "b"], ["b", "a"]], [0.0, 0.0], lm_weight=1.0)
        assert scores[0] > scores[1]
