"""Label checker (constrained CTC edit alignment): hand-crafted posterior
tests + the tools/label_checker.py rendering contract (reference
runtime/core/bin/label_checker_main.cc)."""

import numpy as np

from wenet_celoss_tpu.decode.label_check import (check_labels, render,
                                                 DELETION, IS_START, IS_END)


def _logp(frames, v=5, peak=8.0):
    """frames: list of unit ids (0=blank) → [T, V] near-one-hot log
    posteriors."""
    logits = np.full((len(frames), v), 0.0)
    for t, u in enumerate(frames):
        logits[t, u] = peak
    x = logits - logits.max(axis=1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(axis=1, keepdims=True)
    return np.log(p)


class TestCheckLabels:
    def test_perfect_match(self):
        # audio: 1 1 0 2 0 3  → collapsed "1 2 3"
        logp = _logp([1, 1, 0, 2, 0, 3])
        items = check_labels(logp, [1, 2, 3])
        assert [it.kind for it in items] == ["ok", "ok", "ok"]
        assert [it.unit for it in items] == [1, 2, 3]
        # first emission frames
        assert [it.frame for it in items] == [0, 3, 5]

    def test_deletion_detected(self):
        # audio says "1 3" but labels claim "1 2 3"
        logp = _logp([1, 0, 0, 3, 0, 0])
        items = check_labels(logp, [1, 2, 3])
        kinds = [(it.kind, it.unit) for it in items]
        assert ("del", 2) in kinds
        assert ("ok", 1) in kinds and ("ok", 3) in kinds

    def test_insertion_detected(self):
        # audio says "1 4 2" but labels claim "1 2"
        logp = _logp([1, 0, 4, 4, 0, 2])
        items = check_labels(logp, [1, 2])
        kinds = [(it.kind, it.unit) for it in items]
        assert ("ins", 4) in kinds
        assert ("ok", 1) in kinds and ("ok", 2) in kinds

    def test_substitution_is_del_plus_ins(self):
        # audio says "1 4 3" but labels claim "1 2 3"
        logp = _logp([1, 0, 4, 4, 0, 3])
        items = check_labels(logp, [1, 2, 3])
        kinds = [(it.kind, it.unit) for it in items]
        assert ("del", 2) in kinds
        assert ("ins", 4) in kinds

    def test_no_spurious_edits_on_clean_audio(self):
        logp = _logp([1, 0, 2, 0, 3, 0, 4])
        items = check_labels(logp, [1, 2, 3, 4])
        assert all(it.kind == "ok" for it in items)

    def test_repeat_labels_need_blank(self):
        # "1 1" as two tokens: audio 1 0 1 matches; all ok.
        logp = _logp([1, 0, 1])
        items = check_labels(logp, [1, 1])
        assert [it.kind for it in items] == ["ok", "ok"]


class TestRender:
    def test_markers_and_times(self):
        logp = _logp([1, 0, 4, 4, 0, 2])
        items = check_labels(logp, [1, 3, 2])
        id2sym = {1: "a", 2: "b", 3: "c", 4: "d"}
        text, ts = render(items, id2sym, frame_shift_ms=10, subsampling=4)
        assert DELETION + "c" in text
        assert IS_START in text and IS_END in text
        assert (text.index(IS_START) < text.index(" d ")
                < text.index(IS_END))
        # ok units carry frame*shift*subsample times
        assert "a:0" in ts
        assert "b:200" in ts      # frame 5 * 10ms * 4
