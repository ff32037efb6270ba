"""Model export CLI.

Parity with the reference's deployment exports — TorchScript
(`wenet/bin/export_jit.py`) and ONNX encoder/ctc/decoder graphs with
streaming cache I/O (`wenet/bin/export_onnx_cpu.py:72-343`) — re-designed
for the XLA ecosystem: each serving entry point is lowered with
``jax.export`` to a portable StableHLO artifact:

  encoder_ctc.stablehlo         full-context encode + ctc log-probs
  encoder_chunk_ctc.stablehlo   streaming chunk step (fixed-size caches)
  decoder_scores.stablehlo      n-best attention rescoring
  params.mspk                   fp32 parameters (flax msgpack)
  manifest.yaml                 shapes, subsampling metadata

StableHLO artifacts run on any XLA backend (TPU/CPU/GPU) and version-stable
IREE/TF tooling; together with the C++ runtime's worker protocol this
covers the reference's runtime deployment surface.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
import yaml


def main():
    from wenet_celoss_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="export your model")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--chunk_size", type=int, default=16)
    parser.add_argument("--num_left_chunks", type=int, default=4)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--max_frames", type=int, default=2000)
    parser.add_argument("--beam", type=int, default=10)
    parser.add_argument("--max_hyp_len", type=int, default=64)
    parser.add_argument("--quantize", default="none",
                        choices=["none", "int8"],
                        help="int8: weight-only per-channel PTQ — the "
                             "exported artifacts embed the quantized "
                             "weights and the param bundle ships as int8 "
                             "(reference export_jit.py:55-69 analog)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.utils import checkpoint as ckpt
    from wenet_celoss_tpu.utils.config import load_config

    configs = load_config(args.config)
    model = init_model(configs)
    feat_dim = configs["input_dim"]

    from wenet_celoss_tpu.models.factory import init_example
    ex = init_example(configs)   # incl. context tower when configured
    variables = model.init(jax.random.PRNGKey(0), *ex)
    variables["params"] = ckpt.load_checkpoint(variables["params"],
                                               args.checkpoint)
    if args.quantize == "int8":
        # Quantize → dequantize BEFORE lowering, so every StableHLO
        # artifact's embedded constants are exactly the weights the int8
        # bundle reconstructs (serving numerics == shipped params).
        from wenet_celoss_tpu.utils.quantize import (dequantize_params,
                                                     quantize_params)
        variables["params"] = dequantize_params(
            quantize_params(variables["params"]))

    os.makedirs(args.output_dir, exist_ok=True)

    b, t = args.batch, args.max_frames
    sub = model.encoder.subsampling_rate
    rctx = model.encoder.right_context
    window = (args.chunk_size - 1) * sub + rctx + 1

    # 1. Full-context encoder + CTC.
    def encode_ctc(feats, feat_lens):
        return model.apply(variables, feats, feat_lens,
                           method="encode_ctc")

    exp = jax_export.export(jax.jit(encode_ctc))(
        jax.ShapeDtypeStruct((b, t, feat_dim), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32))
    with open(os.path.join(args.output_dir, "encoder_ctc.stablehlo"),
              "wb") as f:
        f.write(exp.serialize())

    # 2. Streaming chunk step with caches (only for streamable encoders —
    # a non-causal conformer conv has no cache formulation).
    streamable = not (getattr(model.encoder, "use_cnn_module", False)
                      and not getattr(model.encoder, "causal", False))
    if streamable:
        cache = model.apply(variables, b,
                            args.chunk_size * args.num_left_chunks,
                            method="encoder_init_cache")

        def chunk_step(xs, cache):
            return model.apply(variables, xs, cache,
                               method="encoder_forward_chunk_ctc")

        exp2 = jax_export.export(jax.jit(chunk_step))(
            jax.ShapeDtypeStruct((b, window, feat_dim), jnp.float32),
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), cache))
        with open(os.path.join(args.output_dir,
                               "encoder_chunk_ctc.stablehlo"), "wb") as f:
            f.write(exp2.serialize())
    else:
        logging.warning("encoder is a non-causal conformer: skipping the "
                        "streaming chunk artifact (full-context only)")

    # 3. Attention rescoring scores.
    n, u = args.beam, args.max_hyp_len
    t_sub = (t - 3) // 4 if sub == 4 else t // sub

    def decoder_scores(memory, memory_mask, hyps_in, hyps_lens, r_hyps_in):
        return model.apply(variables, memory, memory_mask, hyps_in,
                           hyps_lens, r_hyps_in, 1.0,
                           method="decoder_scores")

    exp3 = jax_export.export(jax.jit(decoder_scores))(
        jax.ShapeDtypeStruct((n, t_sub, model.encoder.output_size),
                             jnp.float32),
        jax.ShapeDtypeStruct((n, t_sub), jnp.bool_),
        jax.ShapeDtypeStruct((n, u + 1), jnp.int32),
        jax.ShapeDtypeStruct((n,), jnp.int32),
        jax.ShapeDtypeStruct((n, u + 1), jnp.int32))
    with open(os.path.join(args.output_dir,
                           "decoder_scores.stablehlo"), "wb") as f:
        f.write(exp3.serialize())

    if args.quantize == "int8":
        from wenet_celoss_tpu.utils.quantize import save_quantized
        params_name = "params_int8.mspk"
        save_quantized(variables["params"],
                       os.path.join(args.output_dir, params_name))
    else:
        params_name = "params.mspk"
        ckpt.save_checkpoint(variables["params"],
                             os.path.join(args.output_dir, params_name))
    manifest = {
        "subsampling_rate": sub,
        "right_context": rctx,
        "chunk_size": args.chunk_size,
        "num_left_chunks": args.num_left_chunks,
        "window": window,
        "feat_dim": feat_dim,
        "vocab_size": configs["output_dim"],
        "sos": int(model.sos), "eos": int(model.eos),
        "quantize": args.quantize,
        "artifacts": (["encoder_ctc.stablehlo"]
                      + (["encoder_chunk_ctc.stablehlo"] if streamable
                         else [])
                      + ["decoder_scores.stablehlo", params_name]),
    }
    with open(os.path.join(args.output_dir, "manifest.yaml"), "w") as f:
        yaml.dump(manifest, f)
    print(f"exported to {args.output_dir}")


if __name__ == "__main__":
    main()
