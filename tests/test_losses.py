"""Golden-value tests: CTC loss vs torch.nn.functional.ctc_loss (CPU) and
RNN-T loss vs an independent numpy DP."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wenet_celoss_tpu.ops.ctc_loss import ctc_forced_align, ctc_loss
from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss


def _rand_logprobs(rng, b, t, v):
    x = rng.standard_normal((b, t, v)).astype(np.float32)
    return np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))


class TestCtcLoss:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_torch(self, seed):
        rng = np.random.default_rng(seed)
        b, t, v, u = 3, 11, 7, 4
        logp = _rand_logprobs(rng, b, t, v)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        ilens = np.array([11, 9, 7], np.int32)
        llens = np.array([4, 3, 1], np.int32)

        ours = np.asarray(ctc_loss(
            jnp.asarray(logp), jnp.asarray(labels), jnp.asarray(ilens),
            jnp.asarray(llens)))

        ref = torch.nn.functional.ctc_loss(
            torch.from_numpy(logp).permute(1, 0, 2),
            torch.from_numpy(labels.astype(np.int64)),
            torch.from_numpy(ilens.astype(np.int64)),
            torch.from_numpy(llens.astype(np.int64)),
            blank=0, reduction="none", zero_infinity=False)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_grad_matches_torch(self):
        rng = np.random.default_rng(2)
        b, t, v, u = 2, 8, 5, 3
        logits = rng.standard_normal((b, t, v)).astype(np.float32)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        ilens = np.array([8, 6], np.int32)
        llens = np.array([3, 2], np.int32)

        def loss_fn(lg):
            lp = jax.nn.log_softmax(lg, axis=-1)
            return jnp.sum(ctc_loss(lp, jnp.asarray(labels),
                                    jnp.asarray(ilens), jnp.asarray(llens)))

        g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

        tl = torch.from_numpy(logits).requires_grad_(True)
        lp = torch.log_softmax(tl, dim=-1)
        ref = torch.nn.functional.ctc_loss(
            lp.permute(1, 0, 2), torch.from_numpy(labels.astype(np.int64)),
            torch.from_numpy(ilens.astype(np.int64)),
            torch.from_numpy(llens.astype(np.int64)),
            blank=0, reduction="sum")
        ref.backward()
        np.testing.assert_allclose(g_ours, tl.grad.numpy(), rtol=1e-3,
                                   atol=1e-4)

    def test_empty_label(self):
        rng = np.random.default_rng(3)
        logp = _rand_logprobs(rng, 1, 5, 4)
        ours = float(ctc_loss(jnp.asarray(logp),
                              jnp.zeros((1, 2), jnp.int32),
                              jnp.array([5]), jnp.array([0]))[0])
        # All-blank path likelihood.
        expected = -float(np.sum(logp[0, :, 0]))
        assert ours == pytest.approx(expected, rel=1e-5)

    def test_forced_align_is_valid_path(self):
        rng = np.random.default_rng(4)
        b, t, v, u = 2, 9, 6, 3
        logp = _rand_logprobs(rng, b, t, v)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        ilens = np.array([9, 7], np.int32)
        llens = np.array([3, 2], np.int32)
        path = np.asarray(ctc_forced_align(
            jnp.asarray(logp), jnp.asarray(labels), jnp.asarray(ilens),
            jnp.asarray(llens)))
        for i in range(b):
            collapsed = []
            prev = -1
            for s in path[i, :ilens[i]]:
                if s != 0 and s != prev:
                    collapsed.append(int(s))
                prev = int(s)
            assert collapsed == list(labels[i, :llens[i]])


def _numpy_rnnt_loss(logits, labels, ilens, llens, blank=0):
    """Independent O(T·U) DP in float64."""
    b = logits.shape[0]
    out = np.zeros(b)
    for i in range(b):
        t_len, u_len = int(ilens[i]), int(llens[i])
        x = logits[i].astype(np.float64)
        lp = x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1,
                        keepdims=True)) - x.max(-1, keepdims=True)
        alpha = np.full((t_len, u_len + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(t_len):
            for u in range(u_len + 1):
                if t == 0 and u == 0:
                    continue
                terms = []
                if t > 0:
                    terms.append(alpha[t - 1, u] + lp[t - 1, u, blank])
                if u > 0:
                    terms.append(alpha[t, u - 1] + lp[t, u - 1, labels[i, u - 1]])
                alpha[t, u] = np.logaddexp.reduce(terms)
        out[i] = -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])
    return out


class TestRnntLoss:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_numpy_dp(self, seed):
        rng = np.random.default_rng(seed)
        b, t, u, v = 3, 6, 4, 5
        logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        ilens = np.array([6, 5, 3], np.int32)
        llens = np.array([4, 2, 1], np.int32)
        ours = np.asarray(rnnt_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilens),
            jnp.asarray(llens)))
        ref = _numpy_rnnt_loss(logits, labels, ilens, llens)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_grad_finite_and_descends(self):
        rng = np.random.default_rng(7)
        b, t, u, v = 2, 5, 3, 4
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             dtype=jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), dtype=jnp.int32)
        ilens, llens = jnp.array([5, 4]), jnp.array([3, 2])

        f = lambda x: jnp.sum(rnnt_loss(x, labels, ilens, llens))
        g = jax.grad(f)(logits)
        assert np.all(np.isfinite(np.asarray(g)))
        l0, l1 = float(f(logits)), float(f(logits - 0.01 * g))
        assert l1 < l0

    def test_single_frame(self):
        # T=1, U=0: loss = -log_softmax(logits)[0,0,blank].
        logits = jnp.asarray(np.random.default_rng(0).standard_normal(
            (1, 1, 1, 3)), dtype=jnp.float32)
        loss = float(rnnt_loss(logits, jnp.zeros((1, 0), jnp.int32),
                               jnp.array([1]), jnp.array([0]))[0])
        expected = -float(jax.nn.log_softmax(logits[0, 0, 0])[0])
        assert loss == pytest.approx(expected, rel=1e-5)


class TestRnntLossFused:
    def test_loss_and_grad_match_autodiff(self):
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_fused
        rng = np.random.default_rng(11)
        b, t, u, v = 3, 7, 4, 6
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             dtype=jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), dtype=jnp.int32)
        ilens = jnp.array([7, 5, 4])
        llens = jnp.array([4, 3, 0])

        l_ref = rnnt_loss(logits, labels, ilens, llens)
        l_fused = rnnt_loss_fused(logits, labels, ilens, llens)
        np.testing.assert_allclose(np.asarray(l_fused), np.asarray(l_ref),
                                   rtol=1e-5)

        g_ref = jax.grad(lambda x: jnp.sum(
            rnnt_loss(x, labels, ilens, llens)))(logits)
        g_fused = jax.grad(lambda x: jnp.sum(
            rnnt_loss_fused(x, labels, ilens, llens)))(logits)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-5)

    def test_weighted_grad(self):
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_fused
        rng = np.random.default_rng(12)
        b, t, u, v = 2, 5, 3, 4
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             dtype=jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), dtype=jnp.int32)
        ilens, llens = jnp.array([5, 4]), jnp.array([3, 2])
        w = jnp.array([0.3, 1.7])
        g1 = jax.grad(lambda x: jnp.sum(w * rnnt_loss_fused(
            x, labels, ilens, llens)))(logits)
        g2 = jax.grad(lambda x: jnp.sum(w * rnnt_loss(
            x, labels, ilens, llens)))(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-5)


class TestRnntLossStreaming:
    """Streaming-V loss (joint applied in T-chunks, [B,T,U,V] never
    materialized) vs the materialized scan implementation."""

    def _setup(self, seed=21, b=3, t=11, u=4, h=5, v=6):
        from wenet_celoss_tpu.utils.common import get_activation
        rng = np.random.default_rng(seed)
        enc_j = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
        pred_j = jnp.asarray(rng.standard_normal((b, u + 1, h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((h, v)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens = jnp.array([11, 7, 4])
        llens = jnp.array([4, 3, 0])
        act = get_activation("tanh")
        logits = (jnp.einsum(
            "btuh,hv->btuv",
            act(enc_j[:, :, None, :] + pred_j[:, None, :, :]), w) + bias)
        return enc_j, pred_j, w, bias, labels, ilens, llens, logits

    @pytest.mark.parametrize("chunk", [1, 4, 16])
    def test_loss_matches_materialized(self, chunk):
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_streaming
        enc_j, pred_j, w, bias, labels, ilens, llens, logits = self._setup()
        l_ref = rnnt_loss(logits, labels, ilens, llens)
        l_str = rnnt_loss_streaming(enc_j, pred_j, w, bias, labels,
                                    ilens, llens, chunk=chunk)
        np.testing.assert_allclose(np.asarray(l_str), np.asarray(l_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_match_materialized(self):
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_streaming
        enc_j, pred_j, w, bias, labels, ilens, llens, _ = self._setup()
        weights = jnp.array([0.7, 1.3, 0.2])

        def loss_streaming(e, p, w_, b_):
            return jnp.sum(weights * rnnt_loss_streaming(
                e, p, w_, b_, labels, ilens, llens, chunk=4))

        def loss_materialized(e, p, w_, b_):
            act = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
            logits = jnp.einsum("btuh,hv->btuv", act, w_) + b_
            return jnp.sum(weights * rnnt_loss(logits, labels, ilens, llens))

        g_s = jax.grad(loss_streaming, argnums=(0, 1, 2, 3))(
            enc_j, pred_j, w, bias)
        g_m = jax.grad(loss_materialized, argnums=(0, 1, 2, 3))(
            enc_j, pred_j, w, bias)
        for a, b_ in zip(g_s, g_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-5)

    def test_planes_vjp_matches_autodiff(self):
        from wenet_celoss_tpu.ops.rnnt_loss import (
            _alpha_scan, _gather_planes, rnnt_loss_planes)
        rng = np.random.default_rng(22)
        b, t, u, v = 2, 6, 3, 5
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens, llens = jnp.array([6, 4]), jnp.array([3, 2])
        blank_lp, emit_lp = _gather_planes(logits, labels, 0)

        def autodiff_loss(bl, em):
            alpha = _alpha_scan(bl, em)
            t_lastv = jnp.maximum(ilens - 1, 0)
            a_final = alpha[jnp.arange(b), t_lastv, llens]
            lp_final = bl[jnp.arange(b), t_lastv, llens]
            return jnp.sum(-(a_final + lp_final))

        g_ref = jax.grad(autodiff_loss, argnums=(0, 1))(blank_lp, emit_lp)
        g_cf = jax.grad(lambda bl, em: jnp.sum(rnnt_loss_planes(
            bl, em, ilens, llens)), argnums=(0, 1))(blank_lp, emit_lp)
        for a, b_ in zip(g_cf, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-5)


class TestRnntLossPallas:
    """Pallas lattice kernel vs the scan implementation (interpret mode on
    CPU; the same kernel is validated on TPU hardware by bench runs)."""

    def test_loss_and_grad_match_scan(self):
        from wenet_celoss_tpu.ops.rnnt_pallas import rnnt_loss_pallas
        rng = np.random.default_rng(21)
        b, t, u, v = 3, 7, 4, 6
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             dtype=jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), dtype=jnp.int32)
        ilens = jnp.array([7, 5, 4])
        llens = jnp.array([4, 3, 0])
        ref = rnnt_loss(logits, labels, ilens, llens)
        got = rnnt_loss_pallas(logits, labels, ilens, llens, 0, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)
        g1 = jax.grad(lambda x: jnp.sum(
            rnnt_loss(x, labels, ilens, llens)))(logits)
        g2 = jax.grad(lambda x: jnp.sum(
            rnnt_loss_pallas(x, labels, ilens, llens, 0, True)))(logits)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-3, atol=1e-4)

    def test_alpha_beta_consistency(self):
        """beta[0,0] must equal the terminal alpha likelihood."""
        from wenet_celoss_tpu.ops.rnnt_loss import _gather_planes
        from wenet_celoss_tpu.ops.rnnt_pallas import alpha_beta_pallas
        rng = np.random.default_rng(22)
        b, t, u, v = 2, 6, 3, 5
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v)),
                             dtype=jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), dtype=jnp.int32)
        ilens, llens = jnp.array([6, 5]), jnp.array([3, 2])
        blank_lp, emit_lp = _gather_planes(logits, labels, 0)
        alpha, beta = alpha_beta_pallas(blank_lp, emit_lp, ilens, llens,
                                        True)
        for i in range(b):
            term = float(alpha[i, ilens[i] - 1, llens[i]]
                         + blank_lp[i, ilens[i] - 1, llens[i]])
            assert term == pytest.approx(float(beta[i, 0, 0]), rel=1e-4)


class TestRnntLossSimple:
    def test_matches_full_loss_on_factored_joint(self):
        """With logits = am[:,:,None,:] + lm[:,None,:,:], the simple loss
        must equal the full rnnt_loss on those logits."""
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_simple
        rng = np.random.default_rng(31)
        b, t, u, v = 3, 6, 4, 8
        am = jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32)
        lm = jnp.asarray(rng.standard_normal((b, u + 1, v)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens = jnp.array([6, 5, 4])
        llens = jnp.array([4, 2, 0])
        logits = am[:, :, None, :] + lm[:, None, :, :]
        ref = rnnt_loss(logits, labels, ilens, llens)
        got = rnnt_loss_simple(am, lm, labels, ilens, llens)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4)

    def test_grad_flows(self):
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_simple
        rng = np.random.default_rng(32)
        b, t, u, v = 2, 5, 3, 6
        am = jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32)
        lm = jnp.asarray(rng.standard_normal((b, u + 1, v)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens, llens = jnp.array([5, 4]), jnp.array([3, 2])
        g_am, g_lm = jax.grad(
            lambda a, l: jnp.sum(rnnt_loss_simple(a, l, labels, ilens,
                                                  llens)), argnums=(0, 1))(
            am, lm)
        assert np.isfinite(np.asarray(g_am)).all()
        assert np.isfinite(np.asarray(g_lm)).all()
        assert float(jnp.abs(g_am).sum()) > 0


class TestPrunedRnnt:
    """k2-style pruned transducer: prune ranges + windowed lattice loss."""

    def _setup(self, seed, b=3, t=8, u=5, v=7):
        rng = np.random.default_rng(seed)
        am = jnp.asarray(rng.standard_normal((b, t, v)), jnp.float32)
        lm = jnp.asarray(rng.standard_normal((b, u + 1, v)), jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens = jnp.asarray(rng.integers(t - 2, t + 1, b), jnp.int32)
        llens = jnp.asarray(rng.integers(1, u + 1, b), jnp.int32)
        return am, lm, labels, ilens, llens

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_ranges_properties(self, seed):
        from wenet_celoss_tpu.ops.rnnt_loss import get_rnnt_prune_ranges
        am, lm, labels, ilens, llens = self._setup(seed)
        s = 3
        ranges = np.asarray(get_rnnt_prune_ranges(
            am, lm, labels, ilens, llens, s_range=s))
        b, t = ranges.shape
        for i in range(b):
            ti, ui = int(ilens[i]), int(llens[i])
            assert ranges[i, 0] == 0
            d = np.diff(ranges[i])
            assert (d >= 0).all(), ranges[i]
            assert (d <= s).all(), ranges[i]
            # window bounds and termination coverage
            assert (ranges[i] + s <= max(ui + 1, s)).all() or ui < s
            fin = ranges[i, ti - 1]
            assert fin <= ui <= fin + s - 1

    def test_full_window_equals_full_loss(self):
        """s_range == U+1 => windows cover the whole lattice => pruned loss
        is exactly the full rnnt_loss."""
        from wenet_celoss_tpu.ops.rnnt_loss import rnnt_loss_pruned
        am, lm, labels, ilens, llens = self._setup(5, u=3)
        b, t, v = am.shape[0], am.shape[1], am.shape[2]
        u1 = lm.shape[1]
        logits = am[:, :, None, :] + lm[:, None, :, :]
        ranges = jnp.zeros((b, t), jnp.int32)
        full = rnnt_loss(logits, labels, ilens, llens)
        pruned = rnnt_loss_pruned(logits, ranges, labels, ilens, llens)
        np.testing.assert_allclose(np.asarray(pruned), np.asarray(full),
                                   rtol=1e-4)

    def test_pruned_bounds_full(self):
        """Pruned NLL >= full NLL (pruning removes probability mass) and is
        close for a generous window."""
        from wenet_celoss_tpu.ops.rnnt_loss import (get_rnnt_prune_ranges,
                                                    rnnt_loss_pruned)
        am, lm, labels, ilens, llens = self._setup(6)
        s = 4
        ranges = get_rnnt_prune_ranges(am, lm, labels, ilens, llens, s)
        logits = am[:, :, None, :] + lm[:, None, :, :]
        b, t = ranges.shape
        k = jnp.arange(s)
        abs_u = ranges[:, :, None] + k[None, None, :]
        pruned_logits = jnp.take_along_axis(
            logits, abs_u[..., None].clip(0, lm.shape[1] - 1), axis=2)
        full = np.asarray(rnnt_loss(logits, labels, ilens, llens))
        pruned = np.asarray(rnnt_loss_pruned(
            pruned_logits, ranges, labels, ilens, llens))
        assert (pruned >= full - 1e-3).all(), (pruned, full)
        assert (pruned <= full + 2.5).all(), (pruned, full)

    def test_grad_finite(self):
        from wenet_celoss_tpu.ops.rnnt_loss import (get_rnnt_prune_ranges,
                                                    rnnt_loss_pruned)
        am, lm, labels, ilens, llens = self._setup(7, b=2, t=6, u=4, v=6)
        s = 3
        ranges = get_rnnt_prune_ranges(am, lm, labels, ilens, llens, s)
        k = jnp.arange(s)
        abs_u = ranges[:, :, None] + k[None, None, :]

        def loss_fn(a, l):
            logits = a[:, :, None, :] + l[:, None, :, :]
            pl = jnp.take_along_axis(
                logits, abs_u[..., None].clip(0, l.shape[1] - 1), axis=2)
            return jnp.sum(rnnt_loss_pruned(pl, ranges, labels, ilens,
                                            llens))

        g_am, g_lm = jax.grad(loss_fn, argnums=(0, 1))(am, lm)
        assert np.isfinite(np.asarray(g_am)).all()
        assert np.isfinite(np.asarray(g_lm)).all()
        assert float(jnp.abs(g_am).sum()) > 0


class TestRnntLossStreamingFusedVjp:
    """The production fused custom VJP (backward = beta + occupancies +
    analytic chunked dlogits from the SAVED logsumexp) vs the plain
    autodiff composition `_rnnt_loss_streaming_ad`."""

    @pytest.mark.parametrize("activation", ["tanh", "swish", "relu"])
    @pytest.mark.parametrize("chunk", [3, 16])
    def test_grads_match_autodiff(self, activation, chunk):
        from wenet_celoss_tpu.ops.rnnt_loss import (
            _rnnt_loss_streaming_ad, rnnt_loss_streaming)
        rng = np.random.default_rng(31)
        b, t, u, h, v = 3, 11, 4, 5, 6
        enc_j = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
        pred_j = jnp.asarray(rng.standard_normal((b, u + 1, h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((h, v)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens = jnp.array([11, 7, 4])
        llens = jnp.array([4, 3, 0])
        weights = jnp.array([0.7, 1.3, 0.2])

        def fused(e, p, w_, b_):
            return jnp.sum(weights * rnnt_loss_streaming(
                e, p, w_, b_, labels, ilens, llens, 0, activation, chunk))

        def ad(e, p, w_, b_):
            return jnp.sum(weights * _rnnt_loss_streaming_ad(
                e, p, w_, b_, labels, ilens, llens, 0, activation, chunk))

        lf = fused(enc_j, pred_j, w, bias)
        la = ad(enc_j, pred_j, w, bias)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(la),
                                   rtol=1e-5, atol=1e-5)
        gf = jax.grad(fused, argnums=(0, 1, 2, 3))(enc_j, pred_j, w, bias)
        ga = jax.grad(ad, argnums=(0, 1, 2, 3))(enc_j, pred_j, w, bias)
        for a, b_ in zip(gf, ga):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestStreamingJointPallas:
    """Fused streaming-joint Pallas kernels (interpret mode on CPU) vs the
    XLA chunk-scan planes and autodiff gradients."""

    def _setup(self, seed=41, b=3, t=19, u=4, h=8, v=16):
        rng = np.random.default_rng(seed)
        enc_j = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
        pred_j = jnp.asarray(rng.standard_normal((b, u + 1, h)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((h, v)) * 0.5, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((v,)) * 0.1, jnp.float32)
        labels = jnp.asarray(rng.integers(1, v, (b, u)), jnp.int32)
        ilens = jnp.array([19, 11, 5])
        llens = jnp.array([4, 2, 0])
        return enc_j, pred_j, w, bias, labels, ilens, llens

    def test_fwd_planes_match_scan(self):
        from wenet_celoss_tpu.ops.rnnt_loss import (
            _label_onehot, _streaming_chunked_planes)
        from wenet_celoss_tpu.ops.rnnt_pallas import \
            streaming_joint_planes_fwd
        enc_j, pred_j, w, bias, labels, _, _ = self._setup()
        b, t, _ = enc_j.shape
        u1 = pred_j.shape[1]
        v = w.shape[1]
        ref_b, ref_e, ref_l, _, _, _, _ = _streaming_chunked_planes(
            enc_j, pred_j, w, bias, labels, 0, "tanh", 4)
        onehot = _label_onehot(labels, u1, v, jnp.float32)
        got_b, got_e, got_l = streaming_joint_planes_fwd(
            enc_j, pred_j, w, bias, onehot, "tanh", 0, tt=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got_b),
                                   np.asarray(ref_b[:, :t]), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_e),
                                   np.asarray(ref_e[:, :t]), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_l),
                                   np.asarray(ref_l[:, :t]), rtol=2e-5,
                                   atol=2e-5)

    @pytest.mark.parametrize("activation", ["tanh", "swish"])
    def test_bwd_matches_autodiff(self, activation, monkeypatch):
        from wenet_celoss_tpu.ops import rnnt_loss as RL
        from wenet_celoss_tpu.ops import rnnt_pallas as RP
        enc_j, pred_j, w, bias, labels, ilens, llens = self._setup()
        weights = jnp.array([0.7, 1.3, 0.2])

        def ad(e, p, w_, b_):
            return jnp.sum(weights * RL._rnnt_loss_streaming_ad(
                e, p, w_, b_, labels, ilens, llens, 0, activation, 4))

        ga = jax.grad(ad, argnums=(0, 1, 2, 3))(enc_j, pred_j, w, bias)

        # Route the custom VJP through the pallas kernels in interpret
        # mode (CPU) by patching the gate + kernel entry points.
        monkeypatch.setattr(RL, "_use_streaming_pallas", lambda: True)
        monkeypatch.setattr(
            RP, "streaming_joint_planes_fwd",
            partial(RP.streaming_joint_planes_fwd, tt=8, interpret=True))
        monkeypatch.setattr(
            RP, "streaming_joint_planes_bwd",
            partial(RP.streaming_joint_planes_bwd, tt=8, interpret=True))

        def fused(e, p, w_, b_):
            return jnp.sum(weights * RL.rnnt_loss_streaming(
                e, p, w_, b_, labels, ilens, llens, 0, activation, 4))

        lf = fused(enc_j, pred_j, w, bias)
        la = ad(enc_j, pred_j, w, bias)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(la),
                                   rtol=1e-5, atol=1e-5)
        gf = jax.grad(fused, argnums=(0, 1, 2, 3))(enc_j, pred_j, w, bias)
        for a, b_ in zip(gf, ga):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)
