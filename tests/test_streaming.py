"""Streaming parity: chunked forward with fixed-size caches must equal the
full-context forward under the equivalent chunk mask (the contract that
makes U2 unified streaming/non-streaming work — reference
`encoder.py:270-326` docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.decode.streaming import (
    chunk_geometry, forward_chunk_by_chunk)
from wenet_celoss_tpu.models.encoder import (
    ConformerEncoder, TransformerEncoder)

FEAT = 16


def _feats(rng, b=2, t=None, window=None, stride=None, n_chunks=4):
    t = (n_chunks - 1) * stride + window
    return jnp.asarray(rng.standard_normal((b, t, FEAT)) * 0.5, jnp.float32)


class TestStreamingParity:
    @pytest.mark.parametrize("enc_cls,kw", [
        (TransformerEncoder, dict(pos_enc_layer_type="abs_pos")),
        (ConformerEncoder, dict(pos_enc_layer_type="rel_pos", causal=True,
                                cnn_module_kernel=7,
                                cnn_module_norm="layer_norm")),
    ])
    def test_chunked_equals_masked_full(self, enc_cls, kw):
        chunk, left_chunks = 4, 2
        enc = enc_cls(input_size=FEAT, output_size=16, attention_heads=2,
                      linear_units=32, num_blocks=2, dropout_rate=0.0,
                      positional_dropout_rate=0.0,
                      static_chunk_size=chunk, use_dynamic_chunk=False,
                      **kw)
        sub, rctx = enc.subsampling_rate, enc.right_context
        stride, window = chunk_geometry(sub, rctx, chunk)
        rng = np.random.default_rng(0)
        n_chunks = 3
        feats = _feats(rng, b=2, window=window, stride=stride,
                       n_chunks=n_chunks)
        lens = jnp.full((2,), feats.shape[1], jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), feats, lens)

        # Full forward with the matching chunk mask.
        full, mask = enc.apply(params, feats, lens,
                               decoding_chunk_size=chunk,
                               num_decoding_left_chunks=left_chunks)

        # Streaming forward.
        cache = enc.apply(params, 2, chunk * left_chunks,
                          method="init_cache")
        fwd = jax.jit(lambda xs, c: enc.apply(params, xs, c,
                                              method="forward_chunk"))
        ys, _ = forward_chunk_by_chunk(fwd, cache, feats, sub, rctx, chunk)

        t_stream = ys.shape[1]
        np.testing.assert_allclose(
            np.asarray(ys), np.asarray(full[:, :t_stream]),
            rtol=2e-4, atol=2e-4)

    def test_streaming_is_shape_static(self):
        """Every chunk step reuses ONE compiled program."""
        chunk, left_chunks = 4, 1
        enc = TransformerEncoder(
            input_size=FEAT, output_size=16, attention_heads=2,
            linear_units=32, num_blocks=1, dropout_rate=0.0,
            positional_dropout_rate=0.0, static_chunk_size=chunk)
        sub, rctx = enc.subsampling_rate, enc.right_context
        stride, window = chunk_geometry(sub, rctx, chunk)
        rng = np.random.default_rng(1)
        feats = _feats(rng, b=1, window=window, stride=stride, n_chunks=5)
        lens = jnp.full((1,), feats.shape[1], jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), feats, lens)
        cache = enc.apply(params, 1, chunk * left_chunks,
                          method="init_cache")
        traces = []

        @jax.jit
        def fwd(xs, c):
            traces.append(1)
            return enc.apply(params, xs, c, method="forward_chunk")

        forward_chunk_by_chunk(fwd, cache, feats, sub, rctx, chunk)
        assert len(traces) == 1
