"""End-to-end slice: train a tiny model until it overfits a small synthetic
batch, then verify each decode mode recovers the labels (the first
demonstrable milestone of SURVEY.md §7 step 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.decode.api import Decoder
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.parallel import train as T

VOCAB = 8
FEAT = 10


def _configs(transducer=False):
    cfg = {
        "input_dim": FEAT, "output_dim": VOCAB,
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "input_layer": "linear",
                         "pos_enc_layer_type": "abs_pos"},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5, "reverse_weight": 0.3,
                       "lsm_weight": 0.0},
        "grad_clip": 5.0,
        "optim_conf": {"lr": 0.1},
        "scheduler_conf": {"warmup_steps": 30},
    }
    if transducer:
        cfg["predictor"] = "rnn"
        cfg["predictor_conf"] = {"embed_size": 32, "output_size": 32,
                                 "embed_dropout": 0.0, "hidden_size": 32,
                                 "num_layers": 1, "dropout": 0.0}
        cfg["joint_conf"] = {"join_dim": 32}
        cfg["model_conf"] = {"transducer_weight": 0.6, "ctc_weight": 0.2,
                             "attention_weight": 0.2, "lsm_weight": 0.0,
                             "reverse_weight": 0.3, "hw_weight": 0.0}
    return cfg


def _batch():
    """Distinct per-label feature patterns so the mapping is learnable."""
    rng = np.random.default_rng(0)
    b, u = 4, 3
    reps = 4  # frames per label
    # No adjacent repeats: CTC would need a learned blank separator, which
    # makes the tiny overfit test unnecessarily hard.
    labels = np.zeros((b, u), np.int32)
    for i in range(b):
        prev = 0
        for j in range(u):
            c = int(rng.integers(1, VOCAB - 2))
            while c == prev:
                c = int(rng.integers(1, VOCAB - 2))
            labels[i, j] = c
            prev = c
    protos = rng.standard_normal((VOCAB, FEAT)).astype(np.float32) * 2
    feats = np.zeros((b, u * reps, FEAT), np.float32)
    for i in range(b):
        for j in range(u):
            feats[i, j * reps:(j + 1) * reps] = protos[labels[i, j]]
    feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.05
    return {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.full((b,), u * reps, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.full((b,), u, jnp.int32),
    }


def _train(cfg, batch, steps):
    import optax
    model = init_model(cfg)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    # Constant-lr adam: the warmup schedule is right for real training but
    # needlessly slow for a 300-step overfit test.
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(5e-3))
    state = T.create_train_state(model, variables, tx)
    grad_fn = T.make_grad_fn(model)
    apply_fn = T.make_apply_fn(tx)
    key = jax.random.PRNGKey(1)
    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        grads, metrics, _ = grad_fn(state, batch, sub)
        state, _ = apply_fn(state, grads)
        loss = float(metrics["loss"])
    return model, {"params": state.params}, loss


class TestE2E:
    def test_ctc_aed_overfit_and_decode(self):
        cfg = _configs()
        batch = _batch()
        model, params, loss = _train(cfg, batch, 350)
        assert loss < 1.0, f"did not overfit, loss={loss}"
        dec = Decoder(model, params)
        expected = [list(map(int, row)) for row in np.asarray(
            batch["labels"])]

        greedy = dec.ctc_greedy_search(batch["feats"],
                                       batch["feat_lengths"])
        assert greedy == expected

        nbest, _, _, _ = dec.ctc_prefix_beam_search(
            batch["feats"], batch["feat_lengths"], beam=4)
        assert [h[0] for h in nbest] == expected

        att = dec.attention(batch["feats"], batch["feat_lengths"], beam=2,
                            max_len=5)
        assert att == expected

        resc = dec.attention_rescoring(batch["feats"],
                                       batch["feat_lengths"], beam=4,
                                       ctc_weight=0.5, reverse_weight=0.3)
        assert resc == expected

    def test_transducer_overfit_and_decode(self):
        cfg = _configs(transducer=True)
        batch = _batch()
        model, params, loss = _train(cfg, batch, 350)
        assert loss < 1.2, f"did not overfit, loss={loss}"
        dec = Decoder(model, params)
        expected = [list(map(int, row)) for row in np.asarray(
            batch["labels"])]

        greedy = dec.rnnt_greedy_search(batch["feats"],
                                        batch["feat_lengths"])
        assert greedy == expected

        res, _, _ = dec.rnnt_beam_search(batch["feats"],
                                         batch["feat_lengths"], beam=3)
        assert dec.rnnt_beam_to_lists(res) == expected

        resc = dec.rnnt_beam_attn_rescoring(
            batch["feats"], batch["feat_lengths"], beam=3,
            search_ctc_weight=0.0, reverse_weight=0.3)
        assert resc == expected

        td = dec.ctc_beam_td_attn_rescoring(
            batch["feats"], batch["feat_lengths"], beam=3,
            ctc_weight=0.3, transducer_weight=0.7, attn_weight=1.0,
            reverse_weight=0.3)
        assert td == expected
