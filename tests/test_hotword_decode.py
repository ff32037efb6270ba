"""End-to-end fork capability: contextual-bias transducer with hotword CE
loss; gated greedy decode produces hyps + per-token gate predictions that
match the trained hotword labels (reference eval path,
`wenet/bin/recognize.py --mode rnnt_greedy_search --context_filter_state`)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wenet_celoss_tpu.decode.api import Decoder
from wenet_celoss_tpu.models.factory import init_model
from wenet_celoss_tpu.parallel import train as T
from wenet_celoss_tpu.utils.wer import edit_distance

VOCAB, FEAT = 10, 12


def _configs():
    return {
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
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 32, "output_size": 32,
                           "embed_dropout": 0.0, "hidden_size": 32,
                           "num_layers": 1, "dropout": 0.0},
        "joint_conf": {"join_dim": 32},
        "context": "nnbias_encoder_decoder",
        "context_conf": {"embedding_size": 32, "num_layers": 1,
                         "attention_heads": 2, "linear_units": 64,
                         "num_block": 1, "bias_encoder_type": "linear",
                         "context_extractor": "BLSTM", "num_labels": 2,
                         "unified_hw_odim": 16, "unified_hw_heads": 2},
        "model_conf": {"transducer_weight": 0.6, "ctc_weight": 0.2,
                       "attention_weight": 0.2, "lsm_weight": 0.0,
                       "reverse_weight": 0.3, "loss_mode": "both",
                       "hw_weight": 0.5},
    }


def _data():
    """4 utterances; hotword phrase [4, 5] appears in two of them."""
    rng = np.random.default_rng(0)
    reps, u, b = 4, 3, 4
    labels = np.array([[4, 5, 2], [1, 4, 5], [1, 2, 3], [3, 2, 1]],
                      np.int32)
    hw = np.array([[1, 1, 0], [0, 1, 1], [0, 0, 0], [0, 0, 0]], np.int32)
    protos = rng.standard_normal((VOCAB, FEAT)).astype(np.float32) * 2
    feats = np.zeros((b, u * reps, FEAT), np.float32)
    for i in range(b):
        for j in range(u):
            feats[i, j * reps:(j + 1) * reps] = protos[labels[i, j]]
    feats += rng.standard_normal(feats.shape).astype(np.float32) * 0.05
    ctx = np.full((2, 2), -1, np.int32)
    ctx[0, :1] = [0]
    ctx[1, :2] = [4, 5]
    ctx_lens = np.array([1, 2], np.int32)
    return {
        "feats": jnp.asarray(feats),
        "feat_lengths": jnp.full((b,), u * reps, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lengths": jnp.full((b,), u, jnp.int32),
        "context_list": jnp.asarray(ctx),
        "context_lengths": jnp.asarray(ctx_lens),
        "hw_labels": jnp.asarray(hw),
    }


@pytest.mark.slow
def test_gated_greedy_decode_with_hotwords():
    cfg = _configs()
    batch = _data()
    model = init_model(cfg)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(5e-3))
    state = T.create_train_state(model, variables, tx)
    grad_fn = T.make_grad_fn(model)
    apply_fn = T.make_apply_fn(tx)
    # Alternate real-context and sentinel-only-context batches so the
    # empty-biased decode stream is in-distribution (the reference's
    # context_mode=1 training varies the list per batch similarly).
    empty_batch = dict(batch)
    empty_batch["context_list"] = jnp.zeros((1, 1), jnp.int32)
    empty_batch["context_lengths"] = jnp.ones((1,), jnp.int32)
    empty_batch["hw_labels"] = jnp.zeros_like(batch["hw_labels"])
    key = jax.random.PRNGKey(1)
    for i in range(500):
        key, sub = jax.random.split(key)
        cur = batch if i % 2 == 0 else empty_batch
        grads, metrics, _ = grad_fn(state, cur, sub)
        state, _ = apply_fn(state, grads)
    assert float(metrics["loss"]) < 2.5, float(metrics["loss"])

    dec = Decoder(model, {"params": state.params})
    expected = [list(map(int, r)) for r in np.asarray(batch["labels"])]

    # Gate ON: hyps recover labels; gate sequence matches hw labels.
    hyps = dec.rnnt_greedy_search(
        batch["feats"], batch["feat_lengths"],
        context_list=batch["context_list"],
        context_lengths=batch["context_lengths"],
        context_filter_state="on")
    assert hyps == expected
    gates, glens = dec.last_gates
    gates = np.asarray(gates)
    hw_ref = np.asarray(batch["hw_labels"])
    total_dist = sum(
        edit_distance(list(hw_ref[i]), list(gates[i, : int(glens[i])]))
        for i in range(4))
    # The gate sequence should largely agree with the hotword labels
    # (reference writes this same edit distance, recognize.py:374-375).
    assert total_dist <= 2, (gates, hw_ref)

    # Gate OFF (always-biased streams) also recovers the labels.
    hyps_off = dec.rnnt_greedy_search(
        batch["feats"], batch["feat_lengths"],
        context_list=batch["context_list"],
        context_lengths=batch["context_lengths"],
        context_filter_state="off")
    assert hyps_off == expected
