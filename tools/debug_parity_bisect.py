"""Bisect the encoder parity divergence per layer / per sub-module.

Builds the same pair as tests/test_reference_parity.py, then compares
intermediate activations: after subsampling-embed, after each conformer
layer, and (for the first divergent layer) after each sub-module.
"""
import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch
import yaml

REF = "/root/reference"

if "torchaudio" not in sys.modules:
    ta = types.ModuleType("torchaudio")
    ta.functional = types.ModuleType("torchaudio.functional")
    ta.functional.rnnt_loss = lambda *a, **k: None
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = ta.functional
sys.path.insert(0, REF)
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

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
    "decoder": "none",
    "predictor": "rnn",
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
                   "reverse_weight": 0.0,
                   "length_normalized_loss": False},
}
from wenet_celoss_tpu.models.factory import init_model as our_init
model = our_init(our_cfg)
from tools.convert_reference_checkpoint import convert_state_dict
params, batch_stats = convert_state_dict(ref_model.state_dict(), our_cfg)
params.pop("context_bias", None)
variables = {"params": params}
if batch_stats:
    variables["batch_stats"] = batch_stats

rng = np.random.default_rng(3)
b, t = 2, 67
feats = rng.standard_normal((b, t, 80)).astype(np.float32)
lens = np.array([t, t - 13], np.int32)

# ---- reference: capture intermediates with hooks ----
ref_acts = {}


def hook(name):
    def fn(mod, inp, out):
        o = out[0] if isinstance(out, tuple) else out
        ref_acts[name] = o.detach().numpy()
    return fn


renc = ref_model.encoder
renc.embed.register_forward_hook(hook("embed"))
for i, lyr in enumerate(renc.encoders):
    lyr.register_forward_hook(hook(f"layer{i}"))
    # sub-modules of first few layers
    if i < 2:
        for sub in ("feed_forward_macaron", "self_attn", "conv_module",
                    "feed_forward", "norm_ff", "norm_mha", "norm_conv",
                    "norm_final", "norm_ff_macaron"):
            m = getattr(lyr, sub, None)
            if m is not None:
                m.register_forward_hook(hook(f"layer{i}.{sub}"))

with torch.no_grad():
    ref_out, ref_mask = renc(torch.from_numpy(feats),
                             torch.from_numpy(lens).long(),
                             decoding_chunk_size=-1,
                             num_decoding_left_chunks=-1)
ref_out = ref_out.numpy()

# ---- ours: capture intermediates via flax capture_intermediates ----
def fwd(m, feats, lens):
    return m.encoder(feats, lens, decoding_chunk_size=-1,
                     deterministic=True)

out, inter = model.apply(variables, jnp.asarray(feats), jnp.asarray(lens),
                         method=fwd, capture_intermediates=True,
                         mutable=["intermediates"])
out, mask = out
out = np.asarray(out)
valid = np.asarray(mask)[..., None]

print("final max abs:", np.abs(out * valid - ref_out * valid).max())


def walk(d, prefix=""):
    for k, v in d.items():
        if isinstance(d[k], dict):
            yield from walk(v, prefix + k + "/")
        else:
            yield prefix + k, v


flat = dict(walk(inter["intermediates"]))


def ours(name):
    v = flat[name]
    while isinstance(v, (tuple, list)):
        v = v[0]
    return np.asarray(v)


def cmp(name, ref):
    try:
        o = ours(name)
    except KeyError:
        print(f"  {name}: MISSING on our side")
        return
    d = np.abs(o - ref)
    print(f"  {name}: max={d.max():.3e} mean={d.mean():.3e}")


vmask = np.asarray(mask)[..., None].astype(np.float32)  # [B,T',1]

def cmpm(name, ref):
    try:
        o = ours(name)
    except KeyError:
        print(f"  {name}: MISSING on our side")
        return
    d = np.abs(o - ref) * vmask
    print(f"  {name}: masked max={d.max():.3e} mean={d.mean():.3e}")

print("\n=== per-layer (masked) ===")
cmpm("encoder/embed/__call__", ref_acts["embed"])
for i in range(12):
    cmpm(f"encoder/layer_{i}/__call__", ref_acts[f"layer{i}"])

print("\n=== layer0/1 sub-modules (masked) ===")
for i in range(2):
    for sub in ("norm_ff_macaron", "feed_forward_macaron", "norm_mha",
                "self_attn", "norm_conv", "conv_module", "norm_ff",
                "feed_forward", "norm_final"):
        k = f"layer{i}.{sub}"
        if k in ref_acts:
            cmpm(f"encoder/layer_{i}/{sub}/__call__", ref_acts[k])
