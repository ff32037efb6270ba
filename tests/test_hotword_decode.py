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


@pytest.fixture(scope="module")
def trained():
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
    return model, state, batch


@pytest.mark.slow
def test_gated_greedy_decode_with_hotwords(trained):
    model, state, batch = trained
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


@pytest.mark.slow
def test_exact_backtracking_decode(trained):
    """context_filter_state='exact' on a trained model: runs end to end,
    utterances without hotwords decode exactly as labeled (the crossed
    stream selection only differs when the gate fires)."""
    model, state, batch = trained
    dec = Decoder(model, {"params": state.params})
    hyps = dec.rnnt_greedy_search(
        batch["feats"], batch["feat_lengths"],
        context_list=batch["context_list"],
        context_lengths=batch["context_lengths"],
        context_filter_state="exact")
    assert len(hyps) == 4
    gates, glens = dec.last_gates
    assert all(int(g) > 0 for g in glens)
    expected = [list(map(int, r)) for r in np.asarray(batch["labels"])]
    assert hyps[2] == expected[2]
    assert hyps[3] == expected[3]


def test_exact_backtracking_golden_trace():
    """Golden-value trace of the backtracking repair algorithm
    (reference greedy_search.py:88-176) on scripted step functions.

    Scenario (hand-traced): T=3, n_steps=2. The first frame emits token 1
    under gate 1, the second predictor step gates 0 (recording last_t=0),
    its token 2 is emitted at frame 1, and the next step gates 1 —
    triggering the repair: pop token 2, rewind to frame 0, force gate 1
    until passing frame 1. The replay emits a different token sequence
    because the forced gate selects the other (crossed) stream pair.
    Expected: hyps [1, 2, 1], gate record [1, 1, 1, 1].
    """
    from wenet_celoss_tpu.decode.rnnt_greedy import (
        rnnt_gated_greedy_search_exact)

    G = {(0, 0): 1, (0, 1): 0, (1, 2): 1, (2, 1): 0}
    J = {(10, 200): 1, (0, 101): 0, (1, 101): 2, (10, 201): 2,
         (10, 202): 0, (11, 202): 0, (12, 202): 1, (12, 201): 0}

    def predictor_step(tok, state, pad):
        return jnp.asarray([[float(tok[0])]]), int(tok[0])

    def predictor_bias_step(pred_out):
        return pred_out + 100.0, pred_out

    def predictor_bias_step_empty(pred_out):
        return pred_out + 200.0, pred_out

    def gate_step(bias_t, pred_bias):
        g = G.get((int(bias_t[0, 0]), int(pred_bias[0, 0])), 0)
        return jnp.asarray([[1.0 - g, float(g)]])

    def joint_step(enc_sel, pred_sel):
        tok = J.get((int(enc_sel[0, 0]), int(pred_sel[0, 0])), 0)
        logits = np.zeros((1, 3), np.float32)
        logits[0, tok] = 1.0
        return jnp.asarray(logits)

    enc_empty = jnp.asarray([[[0.0], [1.0], [2.0]]])   # [1, 3, 1]
    enc_biased = enc_empty + 10.0
    enc_bias = enc_empty

    hyps, gates = rnnt_gated_greedy_search_exact(
        predictor_step, predictor_bias_step, predictor_bias_step_empty,
        joint_step, gate_step, init_state=0,
        encoder_out_empty=enc_empty, encoder_out_biased=enc_biased,
        enc_bias=enc_bias, encoder_len=3, blank=0, n_steps=2)
    assert hyps == [1, 2, 1], (hyps, gates)
    assert gates == [1, 1, 1, 1], (hyps, gates)


def test_gated_labelsync_matches_scan_search():
    """The label-synchronous gated greedy (production path) must produce
    identical tokens AND gate records to the frame-synchronous scan
    search, for gate on and off."""
    import jax
    import jax.numpy as jnp
    from wenet_celoss_tpu.decode import rnnt_greedy
    from wenet_celoss_tpu.decode.api import Decoder
    from wenet_celoss_tpu.models.factory import init_model

    cfg = _configs()
    batch = _data()
    model = init_model(cfg)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    dec = Decoder(model, variables)
    feats, lens = batch["feats"], batch["feat_lengths"]
    ctx, ctx_l = batch["context_list"], batch["context_lengths"]

    for state in ("on", "off"):
        toks, tlens, gates = dec.rnnt_greedy_arrays(
            feats, lens, n_steps=3, context_list=ctx,
            context_lengths=ctx_l, context_filter_state=state)

        # Reference: the frame-synchronous scan with eager closures.
        params = variables
        bias_h = model.apply(params, ctx, ctx_l, method="bias_hidden")
        _, e_biased, e_bias, mask = model.apply(
            params, feats, lens, bias_h, method="encode_transducer")
        e_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
        ctx_e = jnp.zeros((1, 1), jnp.int32)
        ctx_e_l = jnp.ones((1,), jnp.int32)
        bias_h_e = model.apply(params, ctx_e, ctx_e_l,
                               method="bias_hidden")
        _, e_empty, _, _ = model.apply(params, feats, lens, bias_h_e,
                                       method="encode_transducer")
        init_st = model.apply(params, feats.shape[0],
                              method="predictor_init_state")
        p_step = lambda tok, st, pad=None: model.apply(
            params, tok, st, pad, method="predictor_step")
        j_step = lambda e, p: model.apply(params, e, p,
                                          method="joint_step")
        pb = lambda p: model.apply(params, bias_h, p,
                                   method="predictor_bias_step")
        pb_e = lambda p: model.apply(params, bias_h_e, p,
                                     method="predictor_bias_step")
        g = lambda eb, pbb: model.apply(params, eb, pbb,
                                        method="hw_gate_step")
        r_toks, r_lens, r_gates = rnnt_greedy.rnnt_gated_greedy_search(
            p_step, pb, j_step, g, init_st, e_empty, e_biased, e_bias,
            e_lens, blank=model.blank, n_steps=3,
            gate_on=(state == "on"), predictor_bias_step_empty=pb_e)

        assert rnnt_greedy.greedy_to_lists(toks, tlens) == \
            rnnt_greedy.greedy_to_lists(r_toks, r_lens), state
        assert rnnt_greedy.greedy_to_lists(gates, tlens) == \
            rnnt_greedy.greedy_to_lists(r_gates, r_lens), state
