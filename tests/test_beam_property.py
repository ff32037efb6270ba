"""Property tests: the tensorized beam searches are EXACT when the beam is
wide enough to hold every reachable prefix — verified against brute-force
enumeration + dynamic programming on tiny problems (roadmap follow-up to the
golden-value tests; reference offers only the 3x3 hand-computed C++ test,
`runtime/core/test/ctc_prefix_beam_search_test.cc:26-120`)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.decode.ctc_prefix_beam import (ctc_prefix_beam_search,
                                                     nbest_to_lists)
from wenet_celoss_tpu.decode.rnnt_beam import rnnt_prefix_beam_search


def _logsumexp(a, b):
    return np.logaddexp(a, b)


def ctc_seq_logprob(logp, seq):
    """Exact CTC total log-probability of label sequence `seq` under
    frame posteriors logp [T, V] (sum over all alignments), standard
    blank-interleaved forward algorithm."""
    t_max, _ = logp.shape
    ext = [0]
    for s in seq:
        ext += [s, 0]
    s_len = len(ext)
    neg = -1e30
    f = np.full(s_len, neg)
    f[0] = logp[0, 0]
    if s_len > 1:
        f[1] = logp[0, ext[1]]
    for t in range(1, t_max):
        g = np.full(s_len, neg)
        for s in range(s_len):
            val = f[s]
            if s >= 1:
                val = _logsumexp(val, f[s - 1])
            if s >= 2 and ext[s] != 0 and ext[s] != ext[s - 2]:
                val = _logsumexp(val, f[s - 2])
            g[s] = val + logp[t, ext[s]]
        f = g
    out = f[s_len - 1]
    if s_len > 1:
        out = _logsumexp(out, f[s_len - 2])
    return out


class TestCtcPrefixBeamExhaustive:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_wide_beam_matches_bruteforce(self, seed):
        t_max, v = 4, 3                       # blank + 2 symbols
        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((t_max, v)) * 2.0
        logp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), -1)
        lp = np.asarray(logp)

        # All label sequences of length <= T over {1, 2}.
        brute = {}
        for u in range(t_max + 1):
            for seq in itertools.product([1, 2], repeat=u):
                brute[seq] = ctc_seq_logprob(lp, list(seq))

        n_seqs = len(brute)                   # 31: beam holds everything
        res = ctc_prefix_beam_search(logp[None], jnp.array([t_max]),
                                     beam=n_seqs, first_beam=v)
        scores = np.asarray(res["scores"][0])
        toks = np.asarray(res["tokens"][0])
        lens = np.asarray(res["lens"][0])
        found = {}
        for i in range(n_seqs):
            seq = tuple(toks[i, :lens[i]].tolist())
            if scores[i] > -1e20 and seq not in found:
                found[seq] = scores[i]

        # Every enumerable sequence with non-negligible mass is found with
        # its exact total probability.
        for seq, ref in sorted(brute.items(), key=lambda kv: -kv[1]):
            if ref < -20:                     # negligible / infeasible
                continue
            assert seq in found, (seq, ref)
            np.testing.assert_allclose(found[seq], ref, rtol=1e-3,
                                       atol=1e-4, err_msg=str(seq))
        # Best hypothesis is the true argmax.
        best = max(brute, key=brute.get)
        assert tuple(nbest_to_lists(res, 1)[0][0]) == best


def rnnt_seq_logprob(blank_lp, emit_lp, seq):
    """One-emit-per-frame transducer log-prob of `seq` (exactly the beam's
    lattice): blank_lp[t, u] / emit_lp[t, u] are the log-probs at frame t
    given u tokens already consumed (emit_lp[t, u] is for token seq[u])."""
    t_max = blank_lp.shape[0]
    u_len = len(seq)
    neg = -1e30
    f = np.full(u_len + 1, neg)
    f[0] = 0.0
    for t in range(t_max):
        g = np.full(u_len + 1, neg)
        for u in range(u_len + 1):
            if f[u] > neg:
                g[u] = _logsumexp(g[u], f[u] + blank_lp[t, u])
                if u < u_len:
                    g[u + 1] = _logsumexp(g[u + 1], f[u] + emit_lp[t, u])
        f = g
    return f[u_len]


class TestRnntBeamExhaustive:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_wide_beam_matches_bruteforce(self, seed):
        v, p, t_max = 3, 3, 4                 # blank + 2 symbols
        rng = np.random.default_rng(seed)
        w = jnp.asarray(rng.standard_normal((p, v)), jnp.float32)
        enc = jnp.asarray(rng.standard_normal((1, t_max, v)) * 1.5,
                          jnp.float32)

        def predictor_step(tok, state, padding):
            onehot = jax.nn.one_hot(tok % p, p)
            frozen = padding[:, None].astype(jnp.float32)
            new = onehot * (1 - frozen) + state * frozen
            return new, new

        def joint_step(enc_t, pred):
            return enc_t + pred @ w

        # Per (frame, last-token) log-probs; predictor state is
        # onehot(last token) (blank=0 start), so the lattice factorizes.
        lp_by_last = np.zeros((t_max, v, v))
        for last in range(v):
            pred = jax.nn.one_hot(jnp.array([last]), p)
            for t in range(t_max):
                logits = joint_step(enc[:, t], pred)
                lp_by_last[t, last] = np.asarray(
                    jax.nn.log_softmax(logits, -1)[0])

        brute = {}
        for u in range(t_max + 1):
            for seq in itertools.product([1, 2], repeat=u):
                lasts = [0] + list(seq)
                blank_lp = np.array([[lp_by_last[t, lasts[k], 0]
                                      for k in range(u + 1)]
                                     for t in range(t_max)])
                emit_lp = np.array([[lp_by_last[t, lasts[k],
                                                seq[k] if k < u else 0]
                                     for k in range(u + 1)]
                                    for t in range(t_max)])
                brute[seq] = rnnt_seq_logprob(blank_lp, emit_lp, list(seq))

        n = len(brute)                        # 31 prefixes: exhaustive
        res = rnnt_prefix_beam_search(
            predictor_step, joint_step, jnp.zeros((n, p)), enc,
            jnp.array([t_max]), beam=n, topk=v - 1)
        scores = np.asarray(res["scores"][0])
        toks = np.asarray(res["tokens"][0])
        lens = np.asarray(res["lens"][0])
        found = {}
        for i in range(n):
            seq = tuple(toks[i, :lens[i]].tolist())
            if scores[i] > -1e20 and seq not in found:
                found[seq] = scores[i]

        for seq, ref in sorted(brute.items(), key=lambda kv: -kv[1]):
            if ref < -20:
                continue
            assert seq in found, (seq, ref)
            np.testing.assert_allclose(found[seq], ref, rtol=1e-3,
                                       atol=1e-4, err_msg=str(seq))
        best = max(brute, key=brute.get)
        best_found = tuple(toks[0, :lens[0]].tolist())
        assert best_found == best
