"""Golden numeric parity vs the actual reference implementation.

Builds the reference torch model (read-only import from /root/reference),
converts its randomly-initialized weights with
tools/convert_reference_checkpoint.py, and checks that our encoder /
predictor / joint reproduce the reference outputs on the same inputs.
This validates both the converter and the model-math parity end-to-end.
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
def ref_and_ours():
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.functional.rnnt_loss = lambda *a, **k: None
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional
    sys.path.insert(0, REF)
    import yaml
    cfg_path = os.path.join(
        REF, "examples/librispeech/s0/conf/"
        "encoder_bias_conformer_rnnt_4_head_bi_1_layer_2_Labels_both.yaml")
    with open(cfg_path) as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["input_dim"] = 80
    ref_cfg["output_dim"] = 100
    ref_cfg["cmvn_file"] = None
    ref_cfg["is_json_cmvn"] = True
    from wenet.utils.init_model import init_model as ref_init
    torch.manual_seed(0)
    ref_model = ref_init(ref_cfg)
    ref_model.eval()

    # Our config mirroring the reference yaml (batch_norm conv, swish,
    # rel_pos, dynamic chunk OFF for eval-parity simplicity).
    enc = dict(ref_cfg["encoder_conf"])
    our_cfg = {
        "input_dim": 80, "output_dim": 100,
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
            "cnn_module_kernel": enc.get("cnn_module_kernel", 15),
            "use_cnn_module": enc.get("use_cnn_module", True),
            "activation_type": enc.get("activation_type", "swish"),
            "cnn_module_norm": enc.get("cnn_module_norm", "batch_norm"),
            "pos_enc_layer_type": enc.get("pos_enc_layer_type", "rel_pos"),
        },
        "decoder": "bitransformer",
        "decoder_conf": {
            "attention_heads":
                ref_cfg["decoder_conf"]["attention_heads"],
            "linear_units": ref_cfg["decoder_conf"]["linear_units"],
            "num_blocks": ref_cfg["decoder_conf"]["num_blocks"],
            "r_num_blocks": ref_cfg["decoder_conf"].get("r_num_blocks", 0),
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            "self_attention_dropout_rate": 0.0,
            "src_attention_dropout_rate": 0.0,
        },
        "predictor": "rnn",
        # NB: the reference init_model MUTATES its config dict (injects
        # derived sizes), so re-filter to the declared keys.
        "predictor_conf": {k: ref_cfg["predictor_conf"][k] for k in
                           ("embed_size", "output_size", "hidden_size",
                            "num_layers", "bias", "rnn_type")} |
                          {"embed_dropout": 0.0, "dropout": 0.0},
        "joint_conf": {k: ref_cfg["joint_conf"][k] for k in
                       ("join_dim", "prejoin_linear", "postjoin_linear",
                        "joint_mode", "activation")},
        "context": "nobias",
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
    # Drop converted modules our nobias test config doesn't instantiate.
    params.pop("context_bias", None)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return ref_model, model, variables


def test_encoder_output_parity(ref_and_ours):
    ref_model, model, variables = ref_and_ours
    rng = np.random.default_rng(3)
    b, t = 2, 67
    feats = rng.standard_normal((b, t, 80)).astype(np.float32)
    lens = np.array([t, t - 13], np.int32)

    with torch.no_grad():
        ref_out, ref_mask = ref_model.encoder(
            torch.from_numpy(feats), torch.from_numpy(lens).long(),
            decoding_chunk_size=-1, num_decoding_left_chunks=-1)
    ref_out = ref_out.numpy()

    def fwd(m, feats, lens):
        return m.encoder(feats, lens, decoding_chunk_size=-1,
                         deterministic=True)

    out, mask = model.apply(variables, jnp.asarray(feats),
                            jnp.asarray(lens), method=fwd)
    out = np.asarray(out)
    valid = np.asarray(mask)[..., None]
    np.testing.assert_allclose(out * valid, ref_out * valid,
                               rtol=5e-4, atol=5e-4)


def test_predictor_and_joint_parity(ref_and_ours):
    ref_model, model, variables = ref_and_ours
    rng = np.random.default_rng(4)
    b, u = 3, 7
    tokens = rng.integers(0, 100, (b, u)).astype(np.int64)

    with torch.no_grad():
        ref_pred = ref_model.predictor(torch.from_numpy(tokens)).numpy()

    def pfwd(m, toks):
        return m.predictor(toks, deterministic=True)

    ours_pred = np.asarray(model.apply(
        variables, jnp.asarray(tokens.astype(np.int32)), method=pfwd))
    np.testing.assert_allclose(ours_pred, ref_pred, rtol=5e-4, atol=5e-4)

    enc = rng.standard_normal((b, 5, 256)).astype(np.float32)
    with torch.no_grad():
        ref_joint = ref_model.joint(torch.from_numpy(enc),
                                    torch.from_numpy(ref_pred)).numpy()

    def jfwd(m, e, p):
        return m.joint(e, p)

    ours_joint = np.asarray(model.apply(
        variables, jnp.asarray(enc), jnp.asarray(ref_pred), method=jfwd))
    np.testing.assert_allclose(ours_joint, ref_joint, rtol=5e-4, atol=5e-4)


def test_attention_decoder_parity(ref_and_ours):
    ref_model, model, variables = ref_and_ours
    if ref_model.decoder is None:
        pytest.skip("no attention decoder in reference config")
    rng = np.random.default_rng(5)
    b, t, u = 2, 9, 5
    enc = rng.standard_normal((b, t, 256)).astype(np.float32)
    enc_mask_np = np.ones((b, 1, t), bool)
    ys = rng.integers(1, 99, (b, u)).astype(np.int64)
    ys_lens = np.array([u, u - 2], np.int64)

    with torch.no_grad():
        ref_l, ref_r, _ = ref_model.decoder(
            torch.from_numpy(enc), torch.from_numpy(enc_mask_np),
            torch.from_numpy(ys), torch.from_numpy(ys_lens),
            torch.from_numpy(ys), 0.3)
    ref_l = ref_l.numpy()

    def dfwd(m, enc, enc_mask, ys, ys_lens, r_ys):
        return m.decoder(enc, enc_mask, ys, ys_lens, r_ys,
                         reverse_weight=0.3, deterministic=True)

    our_l, our_r = model.apply(
        variables, jnp.asarray(enc), jnp.asarray(enc_mask_np[:, 0]),
        jnp.asarray(ys.astype(np.int32)),
        jnp.asarray(ys_lens.astype(np.int32)),
        jnp.asarray(ys.astype(np.int32)), method=dfwd)[:2]
    # compare valid target positions of the L2R stream
    for bi in range(b):
        n = int(ys_lens[bi])
        np.testing.assert_allclose(np.asarray(our_l)[bi, :n],
                                   ref_l[bi, :n], rtol=5e-4, atol=5e-4)
