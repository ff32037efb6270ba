"""Model component and end-to-end forward/backward tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.models.asr_model import ASRModel
from wenet_celoss_tpu.models.ctc_head import CTC
from wenet_celoss_tpu.models.decoder import BiTransformerDecoder
from wenet_celoss_tpu.models.encoder import ConformerEncoder, TransformerEncoder
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.models.label_smoothing import label_smoothing_loss

VOCAB = 12
FEAT = 20


def tiny_configs(encoder="transformer", **extra_enc):
    enc_conf = {
        "output_size": 16, "attention_heads": 2, "linear_units": 32,
        "num_blocks": 2, "dropout_rate": 0.1,
        "positional_dropout_rate": 0.1, "attention_dropout_rate": 0.0,
        "input_layer": "conv2d",
        "pos_enc_layer_type": "rel_pos" if encoder == "conformer" else "abs_pos",
        "normalize_before": True,
    }
    enc_conf.update(extra_enc)
    return {
        "input_dim": FEAT, "output_dim": VOCAB,
        "encoder": encoder, "encoder_conf": enc_conf,
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 2, "r_num_blocks": 1,
                         "dropout_rate": 0.1},
        "model_conf": {"ctc_weight": 0.3, "reverse_weight": 0.3,
                       "lsm_weight": 0.1},
    }


def make_batch(rng, b=2, t=40):
    feats = jnp.asarray(rng.standard_normal((b, t, FEAT)), jnp.float32)
    feat_lens = jnp.array([t, t - 8], jnp.int32)[:b]
    text = jnp.asarray(rng.integers(1, VOCAB - 2, (b, 5)), jnp.int32)
    text_lens = jnp.array([5, 3], jnp.int32)[:b]
    text = jnp.where(jnp.arange(5)[None, :] < text_lens[:, None], text, -1)
    return feats, feat_lens, text, text_lens


class TestLabelSmoothing:
    def test_matches_torch_kldiv(self):
        import torch
        rng = np.random.default_rng(0)
        b, u, v = 3, 6, 10
        logits = rng.standard_normal((b, u, v)).astype(np.float32)
        targets = rng.integers(0, v, (b, u))
        targets[1, 4:] = -1
        targets[2, 2:] = -1

        ours = float(label_smoothing_loss(
            jnp.asarray(logits), jnp.asarray(targets), 0.1, False))

        # Reference semantics (label_smoothing_loss.py:22-96).
        t_logits = torch.from_numpy(logits).view(-1, v)
        t_targets = torch.from_numpy(targets).view(-1)
        true_dist = torch.full((b * u, v), 0.1 / (v - 1))
        ignore = t_targets == -1
        masked_t = t_targets.masked_fill(ignore, 0)
        true_dist.scatter_(1, masked_t.unsqueeze(1), 0.9)
        kl = torch.nn.functional.kl_div(
            torch.log_softmax(t_logits, dim=1), true_dist, reduction="none")
        ref = kl.masked_fill(ignore.unsqueeze(1), 0).sum() / b
        assert ours == pytest.approx(float(ref), rel=1e-4)


class TestEncoders:
    def test_transformer_encoder_shapes(self):
        rng = np.random.default_rng(0)
        enc = TransformerEncoder(input_size=FEAT, output_size=16,
                                 attention_heads=2, linear_units=32,
                                 num_blocks=2)
        feats, feat_lens, _, _ = make_batch(rng)
        params = enc.init(jax.random.PRNGKey(0), feats, feat_lens)
        out, mask = enc.apply(params, feats, feat_lens)
        assert out.shape == (2, (40 - 1) // 2 // 2 - 1, 16) or out.shape[2] == 16
        assert mask.shape == out.shape[:2]
        # Padded rows produce masked-out positions.
        assert int(mask[1].sum()) < int(mask[0].sum())

    def test_conformer_encoder_runs(self):
        rng = np.random.default_rng(1)
        enc = ConformerEncoder(
            input_size=FEAT, output_size=16, attention_heads=2,
            linear_units=32, num_blocks=2, pos_enc_layer_type="rel_pos",
            cnn_module_kernel=7, cnn_module_norm="layer_norm",
            use_dynamic_chunk=True)
        feats, feat_lens, _, _ = make_batch(rng)
        params = enc.init(jax.random.PRNGKey(0), feats, feat_lens)
        out, mask = enc.apply(params, feats, feat_lens)
        assert out.shape[-1] == 16
        # Training path with dynamic chunk + dropout rngs.
        out2, _ = enc.apply(
            params, feats, feat_lens, deterministic=False, train=True,
            chunk_rng=jax.random.PRNGKey(3),
            rngs={"dropout": jax.random.PRNGKey(4)})
        assert np.isfinite(np.asarray(out2)).all()

    def test_qkv_merge_ablation_matches(self, monkeypatch):
        """QKV_MERGE=0 (the documented bisect lever) must compute the
        same math as the merged default — including rebinding aliased
        key/value to the pre-norm output when ``ln`` is fused in
        (ADVICE r4: the fallback previously normalized only query)."""
        rng = np.random.default_rng(5)
        enc = ConformerEncoder(
            input_size=FEAT, output_size=16, attention_heads=2,
            linear_units=32, num_blocks=2, pos_enc_layer_type="rel_pos",
            cnn_module_kernel=7, cnn_module_norm="layer_norm")
        feats, feat_lens, _, _ = make_batch(rng)
        params = enc.init(jax.random.PRNGKey(0), feats, feat_lens)
        monkeypatch.setenv("QKV_MERGE", "1")
        out_merged, _ = enc.apply(params, feats, feat_lens)
        monkeypatch.setenv("QKV_MERGE", "0")
        out_split, _ = enc.apply(params, feats, feat_lens)
        np.testing.assert_allclose(np.asarray(out_split),
                                   np.asarray(out_merged),
                                   rtol=2e-5, atol=2e-5)

    def test_cmvn_applied(self):
        rng = np.random.default_rng(2)
        mean = tuple(float(x) for x in np.ones(FEAT) * 5.0)
        istd = tuple(float(x) for x in np.ones(FEAT) * 2.0)
        enc = TransformerEncoder(input_size=FEAT, output_size=16,
                                 attention_heads=2, linear_units=32,
                                 num_blocks=1, cmvn=(mean, istd))
        feats, feat_lens, _, _ = make_batch(rng)
        params = enc.init(jax.random.PRNGKey(0), feats, feat_lens)
        out, _ = enc.apply(params, feats, feat_lens)
        assert np.isfinite(np.asarray(out)).all()


class TestASRModel:
    @pytest.mark.parametrize("encoder", ["transformer", "conformer"])
    def test_forward_loss_and_grad(self, encoder):
        rng = np.random.default_rng(3)
        extra = ({"cnn_module_kernel": 7, "cnn_module_norm": "layer_norm"}
                 if encoder == "conformer" else {})
        model = init_model(tiny_configs(encoder, **extra))
        feats, feat_lens, text, text_lens = make_batch(rng)
        params = model.init(jax.random.PRNGKey(0), feats, feat_lens, text,
                            text_lens)
        out = model.apply(params, feats, feat_lens, text, text_lens)
        assert np.isfinite(float(out["loss"]))
        assert float(out["loss_ctc"]) > 0 and float(out["loss_att"]) > 0

        def loss_fn(p):
            return model.apply(p, feats, feat_lens, text, text_lens,
                               deterministic=False, train=True,
                               chunk_rng=jax.random.PRNGKey(1),
                               rngs={"dropout": jax.random.PRNGKey(2)})["loss"]

        grads = jax.jit(jax.grad(loss_fn))(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # At least some gradient mass reaches the encoder.
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0

    def test_decode_support_methods(self):
        rng = np.random.default_rng(4)
        model = init_model(tiny_configs())
        feats, feat_lens, text, text_lens = make_batch(rng)
        params = model.init(jax.random.PRNGKey(0), feats, feat_lens, text,
                            text_lens)
        enc_out, enc_mask, ctc_lp = model.apply(
            params, feats, feat_lens, method="encode_ctc")
        assert ctc_lp.shape == enc_out.shape[:2] + (VOCAB,)
        np.testing.assert_allclose(
            np.exp(np.asarray(ctc_lp)).sum(-1), 1.0, rtol=1e-4)


class TestFusedFFNPallas:
    """Fused FFN Pallas kernel (interpret mode, CPU) vs the XLA path."""

    def test_fwd_bwd_match(self, monkeypatch):
        from functools import partial as _partial

        import wenet_celoss_tpu.models.encoder_layer as EL
        import wenet_celoss_tpu.ops.ffn_pallas as FP
        from wenet_celoss_tpu.models.encoder_layer import \
            PositionwiseFeedForward

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((3, 17, 32)), jnp.float32)
        ffn = PositionwiseFeedForward(64, 0.0, "swish")
        params = ffn.init({"params": jax.random.PRNGKey(0)}, x)

        def loss(p, use):
            out = ffn.apply(p, x, deterministic=True)
            return jnp.mean(jnp.square(out)), out

        # Reference (XLA path).
        monkeypatch.setattr(EL, "_use_ffn_pallas", lambda: False)
        (l_ref, y_ref), g_ref = jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True)(params)

        # Pallas path in interpret mode.
        monkeypatch.setattr(EL, "_use_ffn_pallas", lambda: True)
        monkeypatch.setattr(FP, "ffn_fused",
                            _partial(FP.ffn_fused, interpret=True))
        (l_got, y_got), g_got = jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True)(params)

        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        flat_g = jax.tree_util.tree_leaves(g_got)
        for a, b in zip(flat_g, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_ln_ffn_residual_matches_reference(self):
        """Fused LN→FFN→residual block kernel (interpret mode) vs the
        plain-JAX composition: forward + every gradient."""
        import jax.numpy as jnp

        from wenet_celoss_tpu.ops.ffn_pallas import ln_ffn_residual

        rng = np.random.default_rng(3)
        n, d, f = 37, 32, 64
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        g = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.float32)
        bl = jnp.asarray(0.1 * rng.standard_normal((d,)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
        seed = jnp.zeros((), jnp.int32)

        def ref(x, g, bl, w1, b1, w2, b2):
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
            xn = (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + bl
            h = xn @ w1 + b1
            h = h * jax.nn.sigmoid(h)
            return x + 0.5 * (h @ w2 + b2)

        def fused(x, g, bl, w1, b1, w2, b2):
            return ln_ffn_residual(x, g, bl, w1, b1, w2, b2, seed,
                                   "swish", 0.0, 0.0, 0.5,
                                   interpret=True)

        args = (x, g, bl, w1, b1, w2, b2)
        y_ref = ref(*args)
        y_got = fused(*args)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        gr = jax.grad(lambda *a: jnp.sum(jnp.square(ref(*a))),
                      argnums=tuple(range(7)))(*args)
        gg = jax.grad(lambda *a: jnp.sum(jnp.square(fused(*a))),
                      argnums=tuple(range(7)))(*args)
        for a, b in zip(gg, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("causal", [False, True])
    def test_conv_block_residual_matches_module(self, causal):
        """Fused conv-block kernel (interpret mode) vs the unfused
        LN → ConvolutionModule → residual composition: forward and every
        gradient, with a partially-padded batch."""
        from functools import partial as _partial

        import flax.linen as nn

        from wenet_celoss_tpu.models.convolution import ConvolutionModule
        from wenet_celoss_tpu.ops.conv_pallas import conv_block_residual

        rng = np.random.default_rng(11)
        b, t, d, k = 3, 21, 16, 7
        x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
        lens = np.array([21, 13, 5])
        mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x, mask):
                ln = nn.LayerNorm(epsilon=1e-5, name="ln")
                cm = ConvolutionModule(d, k, "layer_norm", causal,
                                       name="cm")
                return x + cm(ln(x), mask)

        block = Block()
        params = block.init(jax.random.PRNGKey(0), x, mask)

        def ref_loss(p):
            y = block.apply(p, x, mask)
            return jnp.mean(jnp.square(y)), y

        def fused_loss(p):
            pp = p["params"]
            seed = jnp.zeros((), jnp.int32)
            y = conv_block_residual(
                x, mask.astype(jnp.float32), pp["ln"]["scale"],
                pp["ln"]["bias"], pp["cm"]["pointwise_conv1"]["kernel"],
                pp["cm"]["pointwise_conv1"]["bias"],
                pp["cm"]["depthwise_conv"]["kernel"][:, 0, :],
                pp["cm"]["depthwise_conv"]["bias"],
                pp["cm"]["norm_layer"]["scale"],
                pp["cm"]["norm_layer"]["bias"],
                pp["cm"]["pointwise_conv2"]["kernel"],
                pp["cm"]["pointwise_conv2"]["bias"], seed, causal, 0.0,
                1e-5, 1, True)
            return jnp.mean(jnp.square(y)), y

        (_, y_ref), g_ref = jax.value_and_grad(ref_loss,
                                               has_aux=True)(params)
        (_, y_got), g_got = jax.value_and_grad(fused_loss,
                                               has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        flat_g = jax.tree_util.tree_leaves(g_got)
        assert len(flat_r) == len(flat_g)
        for a, b_ in zip(flat_g, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="pltpu.prng_seed has no CPU interpret "
                               "lowering; run on TPU "
                               "(tools/check_ln_ffn_tpu.py covers it)")
    def test_ln_ffn_residual_dropout_stats(self):
        """With dropout on, the fused block's FFN contribution is zeroed
        at ~rate2 of output positions, scaled 1/keep elsewhere, and the
        same seed reproduces the identical mask stream."""
        import jax.numpy as jnp

        from wenet_celoss_tpu.ops.ffn_pallas import ln_ffn_residual

        rng = np.random.default_rng(5)
        n, d, f = 256, 32, 32
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        g = jnp.ones((d,), jnp.float32)
        bl = jnp.zeros((d,), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
        b1 = jnp.ones((f,), jnp.float32) * 3.0   # keep relu active
        w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
        b2 = jnp.zeros((d,), jnp.float32)
        seed = jnp.asarray(123, jnp.int32)

        y = ln_ffn_residual(x, g, bl, w1, b1, w2, b2, seed, "relu",
                            0.0, 0.5, 1.0, interpret=True)
        contrib = np.asarray(y - x)
        zero_frac = np.mean(np.isclose(contrib, 0.0, atol=1e-7))
        assert 0.4 < zero_frac < 0.6, zero_frac

        # Same seed → identical masks (determinism of the stream).
        y2 = ln_ffn_residual(x, g, bl, w1, b1, w2, b2, seed, "relu",
                             0.0, 0.5, 1.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


class TestFusedLSTMPallas:
    """Fused 2-layer LSTM sequence kernel (interpret mode, CPU) vs an XLA
    scan reference, and the RNNPredictor wiring that feeds it (dropout
    paths need pltpu.prng_seed and are validated on-chip by
    tools/check_lstm_tpu.py)."""

    @staticmethod
    def _ref(xw1, wh1, wi2, bh2, wh2):
        H = wh1.shape[0]

        def layer(xw, wh, extra=None):
            def step(carry, xwt):
                c, h = carry
                z = xwt + h @ wh
                i_, f_, g_, o_ = jnp.split(z, 4, axis=-1)
                c2 = jax.nn.sigmoid(f_) * c + \
                    jax.nn.sigmoid(i_) * jnp.tanh(g_)
                h2 = jax.nn.sigmoid(o_) * jnp.tanh(c2)
                return (c2, h2), h2

            z = jnp.zeros((xw.shape[0], H))
            (_, _), hs = jax.lax.scan(step, (z, z), jnp.swapaxes(xw, 0, 1))
            return jnp.swapaxes(hs, 0, 1)

        h1 = layer(xw1, wh1)
        return layer(h1 @ wi2 + bh2, wh2)

    def test_fwd_bwd_match(self):
        from wenet_celoss_tpu.ops.lstm_pallas import lstm2_seq

        rng = np.random.default_rng(0)
        B, U, H, E = 4, 7, 256, 256
        x = jnp.asarray(rng.standard_normal((B, U, E)) * 0.5, jnp.float32)
        wi1 = jnp.asarray(rng.standard_normal((E, 4 * H)) * 0.05,
                          jnp.float32)
        bh1 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
        mk = lambda: jnp.asarray(
            rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
        wh1, wi2, wh2 = mk(), mk(), mk()
        bh2 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
        xw1 = x @ wi1 + bh1
        seed = jnp.zeros((), jnp.int32)
        g = jnp.asarray(rng.standard_normal((B, U, H)), jnp.float32)

        def loss_k(*a):
            return jnp.sum(lstm2_seq(*a, seed, 0.0, 4, True) * g)

        def loss_r(*a):
            return jnp.sum(self._ref(*a) * g)

        np.testing.assert_allclose(
            np.asarray(lstm2_seq(xw1, wh1, wi2, bh2, wh2, seed, 0.0, 4,
                                 True)),
            np.asarray(self._ref(xw1, wh1, wi2, bh2, wh2)),
            rtol=1e-5, atol=1e-5)
        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(
            xw1, wh1, wi2, bh2, wh2)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(
            xw1, wh1, wi2, bh2, wh2)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_fwd_bwd_bf16_scratch_bound(self):
        """bf16 inputs make the backward recompute store c1/c2 cell
        states in bf16 scratch while the forward carry is fp32 — the
        intentional VMEM tradeoff (ADVICE r4). Bound the resulting
        fwd/bwd gradient inconsistency against the fp32 reference."""
        from wenet_celoss_tpu.ops.lstm_pallas import lstm2_seq

        rng = np.random.default_rng(2)
        B, U, H, E = 4, 7, 256, 256
        x = jnp.asarray(rng.standard_normal((B, U, E)) * 0.5, jnp.float32)
        wi1 = jnp.asarray(rng.standard_normal((E, 4 * H)) * 0.05,
                          jnp.float32)
        bh1 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
        mk = lambda: jnp.asarray(
            rng.standard_normal((H, 4 * H)) * 0.05, jnp.float32)
        wh1, wi2, wh2 = mk(), mk(), mk()
        bh2 = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
        xw1 = x @ wi1 + bh1
        seed = jnp.zeros((), jnp.int32)
        g = jnp.asarray(rng.standard_normal((B, U, H)), jnp.float32)
        args32 = (xw1, wh1, wi2, bh2, wh2)
        args16 = tuple(a.astype(jnp.bfloat16) for a in args32)

        def loss_k(*a):
            return jnp.sum(lstm2_seq(*a, seed, 0.0, 4, True).astype(
                jnp.float32) * g)

        def loss_r(*a):
            return jnp.sum(self._ref(*a) * g)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(*args16)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args32)
        for a, b in zip(gk, gr):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            assert rel < 0.06, rel

    def test_predictor_fused_wiring_matches_scan(self, monkeypatch):
        """RNNPredictor with the fused path (interpret, rate=0 via
        deterministic) == the XLA scan path, including the one-hot embed
        reformulation (exact in fp32)."""
        from functools import partial as _partial

        import wenet_celoss_tpu.models.predictor as P
        import wenet_celoss_tpu.ops.lstm_pallas as LP

        pred = P.RNNPredictor(voca_size=50, embed_size=32, output_size=24,
                              hidden_size=256, num_layers=2,
                              embed_dropout=0.0, dropout=0.0)
        rng = np.random.default_rng(1)
        tokens = jnp.asarray(rng.integers(0, 50, (3, 5)), jnp.int32)
        params = pred.init(jax.random.PRNGKey(0), tokens)

        monkeypatch.setattr(P, "_use_lstm_pallas", lambda: False)
        y_ref = pred.apply(params, tokens, deterministic=True)

        monkeypatch.setattr(P, "_use_lstm_pallas", lambda: True)
        monkeypatch.setattr(LP, "lstm2_seq",
                            _partial(LP.lstm2_seq, interpret=True))
        y_got = pred.apply(params, tokens, deterministic=True)
        # bf16 matmuls in the fused path vs f32 in the scan path.
        np.testing.assert_allclose(np.asarray(y_got), np.asarray(y_ref),
                                   rtol=0.05, atol=0.02)


class TestLnMatmulPallas:
    """Fused LN→(rowmask)→matmul kernel (interpret mode, CPU) vs the XLA
    composition, including the conv module's input-mask semantics."""

    def test_fwd_bwd_match(self):
        from wenet_celoss_tpu.ops.ffn_pallas import ln_matmul

        rng = np.random.default_rng(3)
        n, d, f = 37, 32, 64
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((d,)) * 0.2 + 1.0, jnp.float32)
        bl = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
        mask = jnp.asarray(rng.integers(0, 2, (n, 1)), jnp.float32)
        gy = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)

        def ref(x, g, bl, w, b):
            mu = x.mean(1, keepdims=True)
            var = ((x - mu) ** 2).mean(1, keepdims=True)
            xn = (x - mu) / jnp.sqrt(var + 1e-5) * g + bl
            return (xn * mask) @ w + b

        def loss_k(*a):
            return jnp.sum(ln_matmul(*a, mask, 1e-5, 8, True) * gy)

        def loss_r(*a):
            return jnp.sum(ref(*a) * gy)

        np.testing.assert_allclose(
            np.asarray(ln_matmul(x, g, bl, w, b, mask, 1e-5, 8, True)),
            np.asarray(ref(x, g, bl, w, b)), rtol=2e-5, atol=2e-5)
        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, g, bl, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, g, bl, w, b)
        for a, c in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-5)

    def test_no_mask(self):
        from wenet_celoss_tpu.ops.ffn_pallas import ln_matmul

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((9, 16)), jnp.float32)
        g = jnp.ones((16,))
        bl = jnp.zeros((16,))
        w = jnp.asarray(rng.standard_normal((16, 32)) * 0.1, jnp.float32)
        b = jnp.zeros((32,))
        y = ln_matmul(x, g, bl, w, b, None, 1e-5, 8, True)
        mu = x.mean(1, keepdims=True)
        var = ((x - mu) ** 2).mean(1, keepdims=True)
        ref = ((x - mu) / jnp.sqrt(var + 1e-5)) @ w
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
