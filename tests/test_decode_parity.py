"""Decode parity vs the actual reference implementation.

Builds a SMALL reference torch model (read-only import from
/root/reference), converts its randomly-initialized weights, and checks
that whole decode pipelines produce IDENTICAL hypothesis token sequences:

  - ctc_greedy_search (full-context and chunked)
  - ctc prefix beam search n-best
  - attention_rescoring (ctc weight + reverse weight)
  - rnnt greedy (biased, context_filter_state off and on/exact)

This is the decode-level complement of tests/test_reference_parity.py's
activation-level checks (reference `wenet/bin/recognize.py:259-362`).
"""

import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def pair():
    # torchaudio is not in the image; back the reference's
    # torchaudio.functional.rnnt_loss with the independent numpy DP from
    # test_losses so reference code paths that SCORE with the RNN-T loss
    # (transducer_attention_rescoring → _cal_transducer_score,
    # transducer.py:277-302) run verbatim.
    def _stub_rnnt_loss(logits, targets, logit_lengths, target_lengths,
                        blank=-1, reduction="mean", **kw):
        from tests.test_losses import _numpy_rnnt_loss
        v = logits.shape[-1]
        out = _numpy_rnnt_loss(
            logits.detach().numpy(),
            targets.detach().numpy().astype(np.int64),
            logit_lengths.detach().numpy(),
            target_lengths.detach().numpy(),
            blank=blank if blank >= 0 else v - 1)
        t = torch.from_numpy(out.astype(np.float32))
        if reduction == "mean":
            return t.mean()
        if reduction == "sum":
            return t.sum()
        return t

    # Install the stub ONLY when no real torchaudio provides rnnt_loss —
    # overwriting a real module would leak to every other test in the
    # xdist worker process (advisor r3).
    try:
        import torchaudio.functional  # noqa: F401
    except Exception:
        if "torchaudio" not in sys.modules:
            ta = types.ModuleType("torchaudio")
            ta.functional = types.ModuleType("torchaudio.functional")
            sys.modules["torchaudio"] = ta
            sys.modules["torchaudio.functional"] = ta.functional
            ta.functional = sys.modules["torchaudio.functional"]
    if not hasattr(sys.modules["torchaudio"].functional, "rnnt_loss"):
        sys.modules["torchaudio"].functional.rnnt_loss = _stub_rnnt_loss
    sys.path.insert(0, REF)
    import yaml
    cfg_path = os.path.join(
        REF, "examples/librispeech/s0/conf/"
        "encoder_bias_conformer_rnnt_4_head_bi_1_layer_2_Labels_both.yaml")
    with open(cfg_path) as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["input_dim"] = 20
    ref_cfg["output_dim"] = 50
    ref_cfg["cmvn_file"] = None
    ref_cfg["is_json_cmvn"] = True
    # Shrink every tower so the fixture builds fast on CPU.
    ref_cfg["encoder_conf"].update(
        output_size=64, attention_heads=2, linear_units=128, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0)
    ref_cfg["decoder_conf"].update(
        attention_heads=2, linear_units=64, num_blocks=1, r_num_blocks=1,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0, src_attention_dropout_rate=0.0)
    ref_cfg["predictor_conf"].update(
        embed_size=64, output_size=64, hidden_size=64, num_layers=1,
        embed_dropout=0.0, dropout=0.0)
    ref_cfg["joint_conf"]["join_dim"] = 96
    ref_cfg["context_conf"].update(
        embedding_size=64, num_layers=1, attention_heads=2,
        linear_units=64, num_block=1, dropout_rate=0.0,
        unified_hw_odim=32)
    from wenet.utils.init_model import init_model as ref_init
    torch.manual_seed(7)
    ref_model = ref_init(ref_cfg)
    ref_model.eval()

    enc = dict(ref_cfg["encoder_conf"])
    our_cfg = {
        "input_dim": 20, "output_dim": 50,
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": enc["output_size"],
            "attention_heads": enc["attention_heads"],
            "linear_units": enc["linear_units"],
            "num_blocks": enc["num_blocks"],
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            "attention_dropout_rate": 0.0,
            "input_layer": enc["input_layer"],
            "normalize_before": True,
            "cnn_module_kernel": enc["cnn_module_kernel"],
            "use_cnn_module": True,
            "activation_type": "swish",
            "cnn_module_norm": "batch_norm",
            "pos_enc_layer_type": "rel_pos",
        },
        "decoder": "bitransformer",
        "decoder_conf": {
            "attention_heads": 2, "linear_units": 64,
            "num_blocks": 1, "r_num_blocks": 1,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            "self_attention_dropout_rate": 0.0,
            "src_attention_dropout_rate": 0.0,
        },
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 64, "output_size": 64,
                           "hidden_size": 64, "num_layers": 1,
                           "bias": True, "rnn_type": "lstm",
                           "embed_dropout": 0.0, "dropout": 0.0},
        "joint_conf": {k: ref_cfg["joint_conf"][k] for k in
                       ("join_dim", "prejoin_linear", "postjoin_linear",
                        "joint_mode", "activation")},
        "context": "bias",
        "context_conf": {"embedding_size": 64, "num_layers": 1,
                         "attention_heads": 2, "linear_units": 64,
                         "num_block": 1, "dropout_rate": 0.0,
                         "bias_encoder_type": "linear",
                         "context_extractor": "BLSTM",
                         "num_labels": 2, "unified_hw_odim": 32},
        "model_conf": {"transducer_weight": 0.75, "ctc_weight": 0.1,
                       "attention_weight": 0.15, "lsm_weight": 0.1,
                       "reverse_weight": 0.3,
                       "length_normalized_loss": False},
    }
    from wenet_celoss_tpu.models.factory import init_model as our_init
    model = our_init(our_cfg)
    from tools.convert_reference_checkpoint import convert_state_dict
    params, batch_stats = convert_state_dict(ref_model.state_dict(),
                                             our_cfg)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    from wenet_celoss_tpu.decode.api import Decoder
    dec = Decoder(model, variables)

    rng = np.random.default_rng(11)
    b, t = 2, 67
    feats = rng.standard_normal((b, t, 20)).astype(np.float32)
    lens = np.array([t, t - 13], np.int32)
    return ref_model, dec, feats, lens


def _assert_greedy_match(ours, ref_hyps, eos=49):
    """The reference fills pad frames with eos before dedup
    (`asr_model.py:319-322`), so a padded utterance's hyp may carry ONE
    spurious trailing eos (stripped later by recognize.py:366). Accept
    exact match or match-minus-that-trailing-eos."""
    assert len(ours) == len(ref_hyps)
    for o, r in zip(ours, ref_hyps):
        r = [int(x) for x in r]
        assert o == r or (r and r[-1] == eos and o == r[:-1]), (o, r)


def test_ctc_greedy_decode_parity(pair):
    ref_model, dec, feats, lens = pair
    with torch.no_grad():
        ref_hyps, _ = ref_model.ctc_greedy_search(
            torch.from_numpy(feats), torch.from_numpy(lens).long(),
            decoding_chunk_size=-1)
    ours = dec.ctc_greedy_search(jnp.asarray(feats), jnp.asarray(lens))
    _assert_greedy_match(ours, ref_hyps)


def test_ctc_greedy_decode_parity_chunked(pair):
    ref_model, dec, feats, lens = pair
    with torch.no_grad():
        ref_hyps, _ = ref_model.ctc_greedy_search(
            torch.from_numpy(feats), torch.from_numpy(lens).long(),
            decoding_chunk_size=4, num_decoding_left_chunks=2)
    ours = dec.ctc_greedy_search(jnp.asarray(feats), jnp.asarray(lens),
                                 decoding_chunk_size=4,
                                 num_decoding_left_chunks=2)
    _assert_greedy_match(ours, ref_hyps)


def test_ctc_prefix_beam_nbest_parity(pair):
    ref_model, dec, feats, lens = pair
    with torch.no_grad():
        ref_nbest, _ = ref_model._ctc_prefix_beam_search(
            torch.from_numpy(feats[:1]),
            torch.from_numpy(lens[:1]).long(), beam_size=5)
    _, res, _, _ = dec.ctc_prefix_beam_search(
        jnp.asarray(feats[:1]), jnp.asarray(lens[:1]), beam=5)
    toks = np.asarray(res["tokens"][0])
    tlens = np.asarray(res["lens"][0])
    ours_nbest = [tuple(int(x) for x in toks[i, :tlens[i]])
                  for i in range(toks.shape[0])]
    ref_list = [tuple(h[0]) for h in ref_nbest]
    # reference returns nbest sorted by score; require same top-1 and the
    # same hypothesis SET for the rest (ties may reorder)
    assert ours_nbest[0] == ref_list[0]
    assert set(ours_nbest) == set(ref_list)


def test_attention_rescoring_parity(pair):
    ref_model, dec, feats, lens = pair
    with torch.no_grad():
        ref_hyp, _ = ref_model.attention_rescoring(
            torch.from_numpy(feats[:1]),
            torch.from_numpy(lens[:1]).long(), beam_size=5,
            ctc_weight=0.5, reverse_weight=0.3)
    ours = dec.attention_rescoring(jnp.asarray(feats[:1]),
                                   jnp.asarray(lens[:1]), beam=5,
                                   ctc_weight=0.5, reverse_weight=0.3)
    assert ours[0] == list(ref_hyp)


def _ref_greedy(ref_model, feats, lens, ctx, ctx_lens, state, n_steps=4):
    with torch.no_grad():
        hyps, _ = ref_model.greedy_search(
            torch.from_numpy(feats), torch.from_numpy(lens).long(),
            n_steps=n_steps,
            context_list=torch.from_numpy(ctx).int(),
            context_lengths=torch.from_numpy(ctx_lens).int(),
            context_filter_state=state,
            # 2-d so the reference's squeeze(0) (greedy_search.py:426)
            # yields a 1-d tensor for its edit-distance bookkeeping.
            context_decoder_labels_padded=torch.zeros((1, 2)).int())
    return [int(x) for x in hyps[0]]


def _contexts():
    # first context length 1: the reference computes the "empty" bias with
    # context_lengths[0] (greedy_search.py:331), so keep that equal to 1
    # to match our sentinel-based empty context.
    ctx = np.array([[3, 0, 0], [7, 9, 0], [11, 4, 21]], np.int32)
    ctx_lens = np.array([1, 2, 3], np.int32)
    return ctx, ctx_lens


def test_rnnt_greedy_biased_gate_off_parity(pair):
    ref_model, dec, feats, lens = pair
    ctx, ctx_lens = _contexts()
    ref_hyp = _ref_greedy(ref_model, feats[:1], lens[:1], ctx, ctx_lens,
                          "off")
    ours = dec.rnnt_greedy_search(
        jnp.asarray(feats[:1]), jnp.asarray(lens[:1]), n_steps=4,
        context_list=jnp.asarray(ctx), context_lengths=jnp.asarray(ctx_lens),
        context_filter_state="off")
    assert ours[0] == ref_hyp


def test_rnnt_greedy_gated_exact_parity(pair):
    ref_model, dec, feats, lens = pair
    ctx, ctx_lens = _contexts()
    ref_hyp = _ref_greedy(ref_model, feats[:1], lens[:1], ctx, ctx_lens,
                          "on")
    ours = dec.rnnt_greedy_search(
        jnp.asarray(feats[:1]), jnp.asarray(lens[:1]), n_steps=4,
        context_list=jnp.asarray(ctx), context_lengths=jnp.asarray(ctx_lens),
        context_filter_state="exact")
    assert ours[0] == ref_hyp


def test_ctc_beam_td_attn_rescoring_parity(pair):
    """The reference's 8th decode mode (`wenet/bin/recognize.py:321`):
    CTC prefix-beam proposals re-ranked by attention + transducer score
    (`transducer_attention_rescoring` with beam_search_type='ctc',
    transducer.py:379-513; the torch side's rnnt_loss is the numpy DP
    stub installed by the fixture)."""
    ref_model, dec, feats, lens = pair
    with torch.no_grad():
        ref_hyp, _ = ref_model.transducer_attention_rescoring(
            torch.from_numpy(feats[:1]),
            torch.from_numpy(lens[:1]).long(), beam_size=5,
            ctc_weight=0.3, attn_weight=1.0, transducer_weight=0.7,
            reverse_weight=0.3, beam_search_type="ctc")
    ours = dec.ctc_beam_td_attn_rescoring(
        jnp.asarray(feats[:1]), jnp.asarray(lens[:1]), beam=5,
        ctc_weight=0.3, transducer_weight=0.7, attn_weight=1.0,
        reverse_weight=0.3)
    assert ours[0] == [int(x) for x in ref_hyp]


def test_transducer_score_matches_numpy_dp(pair):
    """model.transducer_score (streaming-V loss, no [B,N,T,U,V]
    materialization) == −numpy-DP RNN-T loss of the same hyps."""
    from tests.test_losses import _numpy_rnnt_loss
    _, dec, feats, lens = pair
    enc, mask, _ = dec.encode_ctc(jnp.asarray(feats), jnp.asarray(lens))
    rng = np.random.default_rng(5)
    b, n, u = enc.shape[0], 3, 6
    hyps = rng.integers(1, 49, (b, n, u)).astype(np.int32)
    hyp_lens = rng.integers(1, u + 1, (b, n)).astype(np.int32)
    scores = np.asarray(dec.model.apply(
        dec.params, enc, mask, jnp.asarray(hyps), jnp.asarray(hyp_lens),
        method="transducer_score"))

    # Independent check: materialize the joint through the model's own
    # projection methods, then run the numpy lattice DP.
    from wenet_celoss_tpu.utils.common import add_blank
    enc_lens = np.asarray(mask.sum(axis=1)).astype(np.int64)
    for i in range(b):
        for j in range(n):
            hl = int(hyp_lens[i, j])
            ys_in = add_blank(jnp.asarray(hyps[i:i + 1, j]),
                              jnp.asarray(hyp_lens[i, j][None]), 0, -1)
            pred = dec.model.apply(dec.params, ys_in,
                                   method="predictor_forward")
            joint = dec.model.apply(dec.params, enc[i:i + 1], pred,
                                    method="joint_forward")
            ref = _numpy_rnnt_loss(
                np.asarray(joint), hyps[i:i + 1, j].astype(np.int64),
                enc_lens[i:i + 1], np.array([hl]), blank=0)
            np.testing.assert_allclose(scores[i, j], -ref[0], rtol=2e-3,
                                       atol=2e-3)
