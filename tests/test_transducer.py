"""Transducer + context-bias model tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.models.predictor import (
    ConvPredictor, EmbeddingPredictor, RNNPredictor)

VOCAB = 12
FEAT = 20


def transducer_configs(predictor="rnn", context=False, loss_mode="both"):
    cfg = {
        "input_dim": FEAT, "output_dim": VOCAB,
        "encoder": "transformer",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 32, "num_blocks": 2,
                         "input_layer": "conv2d",
                         "pos_enc_layer_type": "abs_pos"},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1, "r_num_blocks": 1},
        "predictor": predictor,
        "predictor_conf": ({"embed_size": 16, "output_size": 16,
                            "embed_dropout": 0.1, "hidden_size": 16,
                            "num_layers": 2} if predictor == "rnn" else
                           {"embed_size": 16, "embed_dropout": 0.1,
                            "n_head": 2, "history_size": 2}
                           if predictor == "embedding" else
                           {"embed_size": 16, "embed_dropout": 0.1,
                            "history_size": 2}),
        "joint_conf": {"join_dim": 24},
        "model_conf": {"transducer_weight": 0.75, "ctc_weight": 0.1,
                       "attention_weight": 0.15, "lsm_weight": 0.1,
                       "reverse_weight": 0.3, "loss_mode": loss_mode,
                       "hw_weight": 0.4 if context else 0.0},
    }
    if predictor == "embedding":
        cfg["predictor_conf"]["n_head"] = 2
    if context:
        cfg["context"] = "nnbias_encoder_decoder"
        cfg["context_conf"] = {
            "embedding_size": 16, "num_layers": 1, "attention_heads": 2,
            "linear_units": 32, "num_block": 1, "bias_encoder_type": "linear",
            "context_extractor": "BLSTM", "num_labels": 2,
            "unified_hw_odim": 8, "unified_hw_heads": 2}
    return cfg


def make_batch(rng, b=2, t=40, u=5):
    feats = jnp.asarray(rng.standard_normal((b, t, FEAT)), jnp.float32)
    feat_lens = jnp.array([t, t - 8], jnp.int32)[:b]
    text = jnp.asarray(rng.integers(1, VOCAB - 2, (b, u)), jnp.int32)
    text_lens = jnp.array([u, u - 2], jnp.int32)[:b]
    text = jnp.where(jnp.arange(u)[None, :] < text_lens[:, None], text, -1)
    return feats, feat_lens, text, text_lens


def make_context(rng, n=4, l=3):
    ctx = jnp.asarray(rng.integers(1, VOCAB - 2, (n, l)), jnp.int32)
    ctx_lens = jnp.asarray(rng.integers(1, l + 1, (n,)), jnp.int32)
    return ctx, ctx_lens


class TestPredictors:
    @pytest.mark.parametrize("cls,conf", [
        (RNNPredictor, dict(embed_size=8, output_size=8, hidden_size=8,
                            num_layers=2)),
        (EmbeddingPredictor, dict(embed_size=8, n_head=2, history_size=2)),
        (ConvPredictor, dict(embed_size=8, history_size=2)),
    ])
    def test_forward_matches_stepwise(self, cls, conf):
        """Training forward at position u must equal decode-time
        forward_step after consuming tokens 0..u-1."""
        rng = np.random.default_rng(0)
        pred = cls(voca_size=VOCAB, **conf)
        tokens = jnp.asarray(rng.integers(0, VOCAB, (2, 4)), jnp.int32)
        params = pred.init(jax.random.PRNGKey(0), tokens)
        full = pred.apply(params, tokens)                    # [2, 4, D]

        state = pred.apply(params, 2, method="init_state")
        outs = []
        for u in range(4):
            out, state = pred.apply(params, tokens[:, u], state,
                                    method="forward_step")
            outs.append(out)
        step = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                                   rtol=1e-4, atol=1e-5)

    def test_rnn_step_padding_freezes_state(self):
        pred = RNNPredictor(voca_size=VOCAB, embed_size=8, output_size=8,
                            hidden_size=8, num_layers=1)
        tokens = jnp.array([[1, 2]], jnp.int32)
        params = pred.init(jax.random.PRNGKey(0), tokens)
        state = pred.apply(params, 1, method="init_state")
        _, s1 = pred.apply(params, jnp.array([1]), state,
                           method="forward_step")
        _, s2 = pred.apply(params, jnp.array([2]), s1, jnp.array([1]),
                           method="forward_step")
        np.testing.assert_allclose(np.asarray(s1["h"]), np.asarray(s2["h"]))


class TestTransducer:
    @pytest.mark.parametrize("predictor", ["rnn", "embedding", "conv"])
    def test_loss_finite(self, predictor):
        rng = np.random.default_rng(1)
        model = init_model(transducer_configs(predictor))
        feats, feat_lens, text, text_lens = make_batch(rng)
        params = model.init(jax.random.PRNGKey(0), feats, feat_lens, text,
                            text_lens)
        out = model.apply(params, feats, feat_lens, text, text_lens)
        assert np.isfinite(float(out["loss"]))
        assert float(out["loss_rnnt"]) > 0

    @pytest.mark.parametrize("loss_mode", ["pred", "both", "sep"])
    def test_context_bias_loss_modes(self, loss_mode):
        rng = np.random.default_rng(2)
        model = init_model(transducer_configs("rnn", context=True,
                                              loss_mode=loss_mode))
        feats, feat_lens, text, text_lens = make_batch(rng)
        ctx, ctx_lens = make_context(rng)
        hw_label = jnp.where(text == -1, -1, (text % 2)).astype(jnp.int32)
        params = model.init(jax.random.PRNGKey(0), feats, feat_lens, text,
                            text_lens, ctx, ctx_lens, hw_label)
        out = model.apply(params, feats, feat_lens, text, text_lens, ctx,
                          ctx_lens, hw_label)
        assert np.isfinite(float(out["loss"]))
        assert float(out["hw_loss"]) > 0

        def loss_fn(p):
            return model.apply(
                p, feats, feat_lens, text, text_lens, ctx, ctx_lens, hw_label,
                deterministic=False, train=True,
                chunk_rng=jax.random.PRNGKey(1),
                rngs={"dropout": jax.random.PRNGKey(2)})["loss"]

        grads = jax.jit(jax.grad(loss_fn))(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # Context-bias params receive gradient.
        cb = grads["params"]["context_bias"]
        cb_mass = sum(float(jnp.abs(g).sum())
                      for g in jax.tree_util.tree_leaves(cb))
        assert cb_mass > 0


class TestPrunedTransducer:
    def test_pruned_loss_trains(self):
        """rnnt_impl='pruned': simple+pruned loss is finite, grads flow
        through encoder/predictor/joint, and loss decreases with steps."""
        import optax
        cfg = transducer_configs("rnn")
        cfg["model_conf"]["rnnt_impl"] = "pruned"
        cfg["model_conf"]["prune_range"] = 3
        rng = np.random.default_rng(9)
        model = init_model(cfg)
        feats, feat_lens, text, text_lens = make_batch(rng, t=30, u=4)
        params = model.init(jax.random.PRNGKey(0), feats, feat_lens, text,
                            text_lens)
        out = model.apply(params, feats, feat_lens, text, text_lens)
        assert np.isfinite(float(out["loss"]))
        assert float(out["loss_rnnt"]) > 0

        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(p):
                return model.apply(p, feats, feat_lens, text,
                                   text_lens)["loss"]
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        first = None
        for i in range(30):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert np.isfinite(float(loss))
        assert float(loss) < first, (first, float(loss))


class TestStreamingLossTransducer:
    def test_streaming_impl_matches_scan_loss(self):
        """rnnt_impl='streaming' is numerically the SAME loss as 'scan'
        (exact, not approximated) — same params, same batch, same value
        and gradients."""
        rng = np.random.default_rng(17)
        cfg = transducer_configs("rnn")
        model_scan = init_model(cfg)
        cfg2 = transducer_configs("rnn")
        cfg2["model_conf"]["rnnt_impl"] = "streaming"
        cfg2["model_conf"]["streaming_chunk"] = 4
        model_str = init_model(cfg2)

        feats, feat_lens, text, text_lens = make_batch(rng)
        params = model_scan.init(jax.random.PRNGKey(0), feats, feat_lens,
                                 text, text_lens)
        out_scan = model_scan.apply(params, feats, feat_lens, text,
                                    text_lens)
        out_str = model_str.apply(params, feats, feat_lens, text, text_lens)
        np.testing.assert_allclose(float(out_str["loss_rnnt"]),
                                   float(out_scan["loss_rnnt"]), rtol=1e-5)

        g_scan = jax.grad(lambda p: model_scan.apply(
            p, feats, feat_lens, text, text_lens)["loss"])(params)
        g_str = jax.grad(lambda p: model_str.apply(
            p, feats, feat_lens, text, text_lens)["loss"])(params)
        flat_scan = jax.tree_util.tree_leaves_with_path(g_scan)
        flat_str = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_leaves_with_path(g_str)}
        for k, v in flat_scan:
            np.testing.assert_allclose(
                np.asarray(flat_str[jax.tree_util.keystr(k)]),
                np.asarray(v), rtol=2e-3, atol=1e-5,
                err_msg=jax.tree_util.keystr(k))
