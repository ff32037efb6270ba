"""Convert a reference (torch WeNet-celoss) checkpoint into this
framework's parameter tree.

Enables decode-parity evaluation against reference-trained models: load the
torch ``.pt`` state dict, convert, save with utils.checkpoint.save_checkpoint,
then run recognize/serving as usual.

Layout facts about the reference (verified against an instantiated
reference model's state_dict):
- torch Linear weight [out, in]          → flax Dense kernel [in, out]
- torch Embedding weight                 → flax Embed embedding
- torch LayerNorm weight/bias            → flax scale/bias
- Conv2d [O, I, KH, KW]                  → flax Conv [KH, KW, I, O]
- pointwise Conv1d [O, I, 1]             → Dense kernel [I, O]
- depthwise Conv1d [C, 1, K]             → flax Conv [K, 1, C]
- BatchNorm1d running_mean/var           → batch_stats mean/var
- LSTM weight_ih_l{n} [4H, E] (gate order i,f,g,o; reference
  `wenet/transducer/predictor.py:58-121`) → per-gate kernels ii/if/ig/io;
  hidden-side kernels hi/hf/hg/ho carry bias = bias_ih + bias_hh (flax
  OptimizedLSTMCell puts the single bias on the hidden projections).
- Conv2dSubsampling4 output linear: the reference flattens [B,C,T,F] as
  (c, f) channel-major (`wenet/transformer/subsampling.py:81-135`); our
  NHWC path flattens (f, c) — the kernel's input axis is permuted.
- BLSTM phrase extractor final-state concat order is
  [h_bwd, h_fwd, c_bwd, c_fwd] (`wenet/transformer/context_bias.py:63-66`);
  ours is [h_f, h_b, c_f, c_b] — context_proj's input blocks are permuted.
- The reference's `encdoer_bias_{bias,out}_norm` (sic) map to our
  encoder_bias_{bias,out}_norm; its legacy unused heads (encoder_norm,
  encoder_ffn, ...) have no counterpart and are ignored.

Usage:
  python tools/convert_reference_checkpoint.py \
      --torch_ckpt ref.pt --config train.yaml --out converted.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t(w):
    return np.asarray(w).T


def _ln(prefix, sd):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _dense(prefix, sd, bias=True):
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _conv2d(prefix, sd):
    w = np.asarray(sd[prefix + ".weight"])            # [O, I, KH, KW]
    return {"kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _pconv1d(prefix, sd):
    w = np.asarray(sd[prefix + ".weight"])            # [O, I, 1]
    out = {"kernel": w[:, :, 0].T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _dwconv1d(prefix, sd):
    w = np.asarray(sd[prefix + ".weight"])            # [C, 1, K]
    out = {"kernel": w.transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _lstm(prefix, sd, layer, reverse=False):
    sfx = f"l{layer}" + ("_reverse" if reverse else "")
    wi = np.asarray(sd[f"{prefix}.weight_ih_{sfx}"])  # [4H, E]
    wh = np.asarray(sd[f"{prefix}.weight_hh_{sfx}"])
    b = np.asarray(sd[f"{prefix}.bias_ih_{sfx}"]) + \
        np.asarray(sd[f"{prefix}.bias_hh_{sfx}"])
    h = wi.shape[0] // 4
    gates = ("i", "f", "g", "o")
    out = {}
    for gi, g in enumerate(gates):
        out[f"i{g}"] = {"kernel": wi[gi * h:(gi + 1) * h].T}
        out[f"h{g}"] = {"kernel": wh[gi * h:(gi + 1) * h].T,
                        "bias": b[gi * h:(gi + 1) * h]}
    return out


def _mha(prefix, sd, pos=False, rel_bias=False):
    out = {"linear_q": _dense(prefix + ".linear_q", sd),
           "linear_k": _dense(prefix + ".linear_k", sd),
           "linear_v": _dense(prefix + ".linear_v", sd),
           "linear_out": _dense(prefix + ".linear_out", sd)}
    if pos:
        out["linear_pos"] = _dense(prefix + ".linear_pos", sd, bias=False)
    return out


def convert_state_dict(sd: dict, configs: dict):
    """torch state_dict (tensors or ndarrays) → (params, batch_stats)."""
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}
    enc_conf = configs["encoder_conf"]
    num_blocks = enc_conf["num_blocks"]
    cnn_norm = enc_conf.get("cnn_module_norm", "batch_norm")
    params: dict = {}
    batch_stats: dict = {}

    # ---- encoder ----
    odim = enc_conf["output_size"]
    w_out = np.asarray(sd["encoder.embed.out.0.weight"])  # [O, C*F]
    f_dim = w_out.shape[1] // odim
    # (c, f) channel-major → (f, c): [O, C, F] → [F, C, O] → [F*C, O]
    out_kernel = w_out.reshape(odim, odim, f_dim).transpose(2, 1, 0) \
        .reshape(f_dim * odim, odim)
    enc = {
        "embed": {
            "conv1": _conv2d("encoder.embed.conv.0", sd),
            "conv2": _conv2d("encoder.embed.conv.2", sd),
            "out": {"kernel": out_kernel,
                    "bias": np.asarray(sd["encoder.embed.out.0.bias"])},
        },
        "after_norm": _ln("encoder.after_norm", sd),
    }
    for i in range(num_blocks):
        p = f"encoder.encoders.{i}"
        att = _mha(p + ".self_attn", sd, pos=True)
        att["pos_bias_u"] = np.asarray(sd[p + ".self_attn.pos_bias_u"])
        att["pos_bias_v"] = np.asarray(sd[p + ".self_attn.pos_bias_v"])
        layer = {
            "self_attn": att,
            "feed_forward": {
                "Dense_0": _dense(p + ".feed_forward.w_1", sd),
                "Dense_1": _dense(p + ".feed_forward.w_2", sd)},
            "norm_ff": _ln(p + ".norm_ff", sd),
            "norm_mha": _ln(p + ".norm_mha", sd),
        }
        if p + ".feed_forward_macaron.w_1.weight" in sd:
            layer["feed_forward_macaron"] = {
                "Dense_0": _dense(p + ".feed_forward_macaron.w_1", sd),
                "Dense_1": _dense(p + ".feed_forward_macaron.w_2", sd)}
            layer["norm_ff_macaron"] = _ln(p + ".norm_ff_macaron", sd)
        if p + ".conv_module.pointwise_conv1.weight" in sd:
            conv = {
                "pointwise_conv1": _pconv1d(
                    p + ".conv_module.pointwise_conv1", sd),
                "depthwise_conv": _dwconv1d(
                    p + ".conv_module.depthwise_conv", sd),
                "pointwise_conv2": _pconv1d(
                    p + ".conv_module.pointwise_conv2", sd),
            }
            if cnn_norm == "layer_norm":
                conv["norm_layer"] = _ln(p + ".conv_module.norm", sd)
            else:
                conv["norm_layer"] = _ln(p + ".conv_module.norm", sd)
                batch_stats.setdefault("encoder", {})[f"layer_{i}"] = {
                    "conv_module": {"norm_layer": {
                        "mean": np.asarray(
                            sd[p + ".conv_module.norm.running_mean"]),
                        "var": np.asarray(
                            sd[p + ".conv_module.norm.running_var"]),
                    }}}
            layer["conv_module"] = conv
            layer["norm_conv"] = _ln(p + ".norm_conv", sd)
            layer["norm_final"] = _ln(p + ".norm_final", sd)
        enc[f"layer_{i}"] = layer
    params["encoder"] = enc

    # ---- ctc ----
    if "ctc.ctc_lo.weight" in sd:
        params["ctc"] = {"ctc_lo": _dense("ctc.ctc_lo", sd)}

    # ---- attention decoder (bitransformer) ----
    def conv_decoder(side, ref):
        if f"decoder.{ref}.embed.0.weight" not in sd:
            return None
        dec = {
            "embed_tokens": {"embedding": np.asarray(
                sd[f"decoder.{ref}.embed.0.weight"])},
            "after_norm": _ln(f"decoder.{ref}.after_norm", sd),
            "output_layer": _dense(f"decoder.{ref}.output_layer", sd),
        }
        i = 0
        while f"decoder.{ref}.decoders.{i}.norm1.weight" in sd:
            p = f"decoder.{ref}.decoders.{i}"
            dec[f"layer_{i}"] = {
                "self_attn": _mha(p + ".self_attn", sd),
                "src_attn": _mha(p + ".src_attn", sd),
                "feed_forward": {
                    "Dense_0": _dense(p + ".feed_forward.w_1", sd),
                    "Dense_1": _dense(p + ".feed_forward.w_2", sd)},
                "norm1": _ln(p + ".norm1", sd),
                "norm2": _ln(p + ".norm2", sd),
                "norm3": _ln(p + ".norm3", sd),
            }
            i += 1
        return dec

    left = conv_decoder("left", "left_decoder")
    if left is not None:
        params["decoder"] = {"left": left}
        right = conv_decoder("right", "right_decoder")
        if right is not None:
            params["decoder"]["right"] = right
    elif "decoder.embed.0.weight" in sd:
        params["decoder"] = {"left": conv_decoder("left", "")}

    # ---- transducer predictor / joint ----
    if "predictor.embed.weight" in sd:
        pred = {"embed": {"embedding": np.asarray(
            sd["predictor.embed.weight"])},
            "projection": _dense("predictor.projection", sd)}
        n = 0
        while f"predictor.rnn.weight_ih_l{n}" in sd:
            pred[f"rnn_{n}"] = _lstm("predictor.rnn", sd, n)
            n += 1
        params["predictor"] = pred
    if "joint.enc_ffn.weight" in sd:
        params["joint"] = {
            "enc_ffn": _dense("joint.enc_ffn", sd),
            "pred_ffn": _dense("joint.pred_ffn", sd),
            "ffn_out": _dense("joint.ffn_out", sd)}

    # ---- context bias (fork) ----
    if "context_bias.context_extractor.word_embedding.weight" in sd:
        cb = {"extractor": {
            "embed": {"embedding": np.asarray(
                sd["context_bias.context_extractor.word_embedding.weight"])},
        }}
        n = 0
        while ("context_bias.context_extractor.sen_rnn."
               f"weight_ih_l{n}") in sd:
            cb["extractor"].setdefault("fwd", {})[f"lstm_{n}"] = _lstm(
                "context_bias.context_extractor.sen_rnn", sd, n)
            cb["extractor"].setdefault("bwd", {})[f"lstm_{n}"] = _lstm(
                "context_bias.context_extractor.sen_rnn", sd, n,
                reverse=True)
            n += 1
        # context_encoder.0 input blocks: ref [h_b, h_f, c_b, c_f]
        # (context_bias.py:63-66); ours [h_f, h_b, c_f, c_b].
        w = np.asarray(sd["context_bias.context_encoder.0.weight"])  # [O,4H]
        h4 = w.shape[1] // 4
        blocks = [w[:, 1 * h4:2 * h4], w[:, 0 * h4:1 * h4],
                  w[:, 3 * h4:4 * h4], w[:, 2 * h4:3 * h4]]
        cb["context_proj"] = {
            "kernel": np.concatenate(blocks, axis=1).T,
            "bias": np.asarray(sd["context_bias.context_encoder.0.bias"])}
        cb["context_norm"] = _ln("context_bias.context_encoder.1", sd)
        for ours, ref in [
            ("encoder_bias", "context_bias.encoder_bias"),
            ("predictor_bias", "context_bias.predictor_bias"),
            ("hw_bias", "context_bias.hw_bias"),
        ]:
            cb[ours] = _mha(ref, sd)
        for ours, ref in [
            ("encoder_bias_bias_norm", "context_bias.encdoer_bias_bias_norm"),
            ("encoder_bias_out_norm", "context_bias.encdoer_bias_out_norm"),
            ("predictor_bias_bias_norm",
             "context_bias.predictor_bias_bias_norm"),
            ("predictor_bias_out_norm",
             "context_bias.predictor_bias_out_norm"),
            ("hw_bias_norm", "context_bias.hw_bias_norm"),
        ]:
            if ref + ".weight" in sd:
                cb[ours] = _ln(ref, sd)
        for ours, ref in [
            ("encoder_bias_combine", "context_bias.encoder_bias_combine"),
            ("predictor_bias_combine", "context_bias.predictor_bias_combine"),
            ("hw_output_layer", "context_bias.hw_output_layer"),
            ("hw_output_layer_enc", "context_bias.hw_output_layer_enc"),
            ("hw_output_layer_dec", "context_bias.hw_output_layer_dec"),
        ]:
            if ref + ".weight" in sd:
                cb[ours] = _dense(ref, sd)
        params["context_bias"] = cb

    return params, (batch_stats or None)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import pickle

    import yaml

    with open(args.config) as f:
        configs = yaml.safe_load(f)

    import torch
    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params, batch_stats = convert_state_dict(sd, configs)

    from wenet_celoss_tpu.utils.checkpoint import save_checkpoint
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    save_checkpoint(variables, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
