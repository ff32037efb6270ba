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


class TestDecoderSimulateStreaming:
    def test_encode_ctc_streaming_matches_masked(self):
        """Decoder.encode_ctc_streaming (the --simulate_streaming path) ==
        chunk-masked full encode on the streamed prefix."""
        from wenet_celoss_tpu.decode.api import Decoder
        from wenet_celoss_tpu.models.factory import init_model
        chunk, left = 4, 2
        mel = 20
        cfg = {
            "input_dim": mel, "output_dim": 7,
            "encoder": "transformer",
            "encoder_conf": {"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 2,
                             "dropout_rate": 0.0,
                             "positional_dropout_rate": 0.0,
                             "input_layer": "conv2d",
                             "pos_enc_layer_type": "abs_pos",
                             "static_chunk_size": chunk},
            "decoder": "bitransformer",
            "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                             "num_blocks": 1, "r_num_blocks": 1,
                             "dropout_rate": 0.0},
            "model_conf": {"ctc_weight": 0.5, "reverse_weight": 0.0},
        }
        model = init_model(cfg)
        sub = model.encoder.subsampling_rate
        rctx = model.encoder.right_context
        stride, window = chunk_geometry(sub, rctx, chunk)
        rng = np.random.default_rng(3)
        t = window + 4 * stride
        feats = jnp.asarray(rng.standard_normal((2, t, mel)), jnp.float32)
        lens = jnp.array([t, t - stride], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens,
                            jnp.ones((2, 3), jnp.int32),
                            jnp.array([3, 3], jnp.int32))
        dec = Decoder(model, params)

        ys, mask, ctc_lp = dec.encode_ctc_streaming(
            feats, lens, decoding_chunk_size=chunk,
            num_decoding_left_chunks=left)
        full, full_mask, full_lp = dec.encode_ctc(
            feats, lens, decoding_chunk_size=chunk,
            num_decoding_left_chunks=left)
        tp = ys.shape[1]
        # Compare per-utterance valid frames only: the full forward masks
        # padding in attention, the streaming path processes whatever is in
        # the buffer (decoders only read frames inside the mask).
        m = np.asarray(mask)
        for i in range(ys.shape[0]):
            v = m[i]
            np.testing.assert_allclose(np.asarray(ys)[i, v],
                                       np.asarray(full)[i, :tp][v],
                                       rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(ctc_lp)[i, v],
                                       np.asarray(full_lp)[i, :tp][v],
                                       rtol=2e-4, atol=2e-4)
        # per-utterance masks agree on the streamed prefix
        np.testing.assert_array_equal(m, np.asarray(full_mask[:, :tp]))

    def test_greedy_search_simulate_streaming_flag(self):
        """ctc_greedy_search(simulate_streaming=True) routes through the
        chunked encoder and returns the same shape of results."""
        from wenet_celoss_tpu.decode.api import Decoder
        from wenet_celoss_tpu.models.factory import init_model
        mel, chunk = 20, 4
        cfg = {
            "input_dim": mel, "output_dim": 7,
            "encoder": "transformer",
            "encoder_conf": {"output_size": 16, "attention_heads": 2,
                             "linear_units": 32, "num_blocks": 1,
                             "dropout_rate": 0.0,
                             "positional_dropout_rate": 0.0,
                             "input_layer": "conv2d",
                             "pos_enc_layer_type": "abs_pos",
                             "static_chunk_size": chunk},
            "decoder": "bitransformer",
            "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                             "num_blocks": 1, "r_num_blocks": 1,
                             "dropout_rate": 0.0},
            "model_conf": {"ctc_weight": 0.5, "reverse_weight": 0.0},
        }
        model = init_model(cfg)
        rng = np.random.default_rng(4)
        feats = jnp.asarray(rng.standard_normal((1, 80, mel)), jnp.float32)
        lens = jnp.array([80], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, lens,
                            jnp.ones((1, 3), jnp.int32),
                            jnp.array([3], jnp.int32))
        dec = Decoder(model, params)
        hyps = dec.ctc_greedy_search(feats, lens, simulate_streaming=True,
                                     decoding_chunk_size=chunk,
                                     num_decoding_left_chunks=2)
        assert len(hyps) == 1
