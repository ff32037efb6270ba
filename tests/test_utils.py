import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.utils import common, mask, scheduler, wer
from wenet_celoss_tpu.utils.config import override_config


class TestCommon:
    def test_add_sos_eos(self):
        ys = jnp.array([[1, 2, 3], [4, 5, -1]])
        lens = jnp.array([3, 2])
        ys_in, ys_out = common.add_sos_eos(ys, lens, sos=10, eos=11)
        np.testing.assert_array_equal(ys_in, [[10, 1, 2, 3], [10, 4, 5, 11]])
        np.testing.assert_array_equal(ys_out, [[1, 2, 3, 11], [4, 5, 11, -1]])

    def test_add_blank(self):
        ys = jnp.array([[1, 2, -1]])
        out = common.add_blank(ys, jnp.array([2]), blank=0)
        np.testing.assert_array_equal(out, [[0, 1, 2, 0]])

    def test_reverse_pad_list(self):
        ys = jnp.array([[1, 2, 3], [4, 5, 0]])
        out = common.reverse_pad_list(ys, jnp.array([3, 2]), -1.0)
        np.testing.assert_array_equal(out, [[3, 2, 1], [5, 4, -1]])

    def test_remove_duplicates_and_blank(self):
        assert common.remove_duplicates_and_blank(
            [0, 1, 1, 0, 2, 2, 0, 1]) == [1, 2, 1]

    def test_accuracy(self):
        logits = jnp.array([[[0.1, 0.9], [0.9, 0.1], [0.5, 0.5]]])
        targets = jnp.array([[1, 0, -1]])
        acc = common.accuracy(logits, targets)
        assert acc == pytest.approx(1.0)


class TestMask:
    def test_pad_mask(self):
        m = mask.make_pad_mask(jnp.array([2, 3]), 4)
        np.testing.assert_array_equal(
            m, [[False, False, True, True], [False, False, False, True]])

    def test_subsequent_mask(self):
        m = mask.subsequent_mask(3)
        np.testing.assert_array_equal(
            m, [[1, 0, 0], [1, 1, 0], [1, 1, 1]])

    def test_chunk_mask_matches_reference_semantics(self):
        # chunk_size=2, 1 left chunk, size=5 (reference mask.py:89-124 doc).
        m = mask.subsequent_chunk_mask(
            5, jnp.asarray(2), jnp.asarray(1))
        expected = np.array([
            [1, 1, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [1, 1, 1, 1, 0],
            [1, 1, 1, 1, 0],
            [0, 0, 1, 1, 1],
        ], dtype=bool)
        np.testing.assert_array_equal(m, expected)

    def test_chunk_mask_unlimited_left(self):
        m = mask.subsequent_chunk_mask(4, jnp.asarray(2), jnp.asarray(-1))
        expected = np.array([
            [1, 1, 0, 0],
            [1, 1, 0, 0],
            [1, 1, 1, 1],
            [1, 1, 1, 1],
        ], dtype=bool)
        np.testing.assert_array_equal(m, expected)

    def test_dynamic_chunk_mask_jit_no_retrace(self):
        pad = mask.make_non_pad_mask(jnp.array([8, 6]), 8)
        traces = []

        @jax.jit
        def f(pad, key):
            traces.append(1)
            return mask.add_optional_chunk_mask(
                pad, use_dynamic_chunk=True, use_dynamic_left_chunk=True,
                decoding_chunk_size=0, static_chunk_size=0,
                num_decoding_left_chunks=-1, rng=key)

        m1 = f(pad, jax.random.PRNGKey(0))
        m2 = f(pad, jax.random.PRNGKey(1))
        assert m1.shape == (2, 8, 8)
        assert len(traces) == 1  # different keys, same compiled program

    def test_full_context_mask(self):
        pad = mask.make_non_pad_mask(jnp.array([3, 2]), 3)
        m = mask.add_optional_chunk_mask(
            pad, use_dynamic_chunk=False, use_dynamic_left_chunk=False,
            decoding_chunk_size=-1, static_chunk_size=0,
            num_decoding_left_chunks=-1)
        assert m.shape == (2, 3, 3)
        assert bool(m[1, 0, 2]) is False  # padded key masked


class TestScheduler:
    def test_warmup_shape(self):
        sched = scheduler.warmup_lr(0.001, warmup_steps=100)
        assert float(sched(100)) == pytest.approx(0.001, rel=1e-5)
        assert float(sched(50)) == pytest.approx(0.001 * 0.5, rel=1e-5)
        assert float(sched(400)) == pytest.approx(0.001 * 0.5, rel=1e-5)


class TestWer:
    def test_edit_distance(self):
        assert wer.edit_distance("kitten", "sitting") == 3
        assert wer.edit_distance([], [1, 2]) == 2

    def test_align_counts(self):
        a = wer.align("a b c d".split(), "a x c".split())
        assert a.n_cor == 2 and a.n_sub == 1 and a.n_del == 1

    def test_score(self):
        stats = wer.score({"u1": "hello world"}, {"u1": "hello word"})
        assert stats.n_sub == 1 and stats.n_ref == 2
        assert stats.wer == pytest.approx(50.0)

    def test_characterize_mixed(self):
        assert wer.characterize("中文 mixed text") == ["中", "文", "mixed", "text"]


class TestConfig:
    def test_override(self):
        cfg = {"a": {"b": 1, "c": [1, 2]}, "d": True}
        out = override_config(cfg, ["a.b 5", "d false", "a.c 7,8,9"])
        assert out["a"]["b"] == 5 and out["d"] is False
        assert out["a"]["c"] == [7, 8, 9]
        with pytest.raises(KeyError):
            override_config(cfg, ["a.zzz 1"])
