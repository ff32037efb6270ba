"""Model factory: YAML config → model (reference ``wenet/utils/init_model.py:29-109``).

Accepts the same config schema as the reference recipes
(`examples/librispeech/s0/conf/*.yaml`): ``encoder``/``encoder_conf``,
``decoder``/``decoder_conf``, ``model_conf``, optional ``cmvn_file``, and —
when ``predictor`` is present — the transducer stack (predictor/joint), with
optional ``context_conf`` for the fork's contextual biasing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from wenet_celoss_tpu.models.asr_model import ASRModel
from wenet_celoss_tpu.models.cmvn import load_cmvn
from wenet_celoss_tpu.models.ctc_head import CTC
from wenet_celoss_tpu.models.decoder import BiTransformerDecoder
from wenet_celoss_tpu.models.encoder import (
    ENCODER_CLASSES, ConformerEncoder, TransformerEncoder)


def _as_cmvn_tuple(mean: np.ndarray, istd: np.ndarray):
    return (tuple(float(x) for x in mean), tuple(float(x) for x in istd))


def build_encoder(input_dim: int, configs: Dict[str, Any],
                  cmvn: Optional[Tuple] = None):
    enc_type = configs.get("encoder", "conformer")
    conf = dict(configs.get("encoder_conf", {}))
    if configs.get("dtype") and "dtype" not in conf:
        conf["dtype"] = configs["dtype"]
    cls = ENCODER_CLASSES[enc_type]
    if enc_type == "transformer":
        # Conformer-only knobs may appear in shared configs; drop them.
        for k in ("positionwise_conv_kernel_size", "macaron_style",
                  "selfattention_layer_type", "activation_type",
                  "use_cnn_module", "cnn_module_kernel", "causal",
                  "cnn_module_norm"):
            conf.pop(k, None)
    return cls(input_size=input_dim, cmvn=cmvn, **conf)


def init_model(configs: Dict[str, Any]):
    """Build the model described by a training config.

    Returns the flax Module. ``configs`` must carry ``input_dim`` and
    ``output_dim`` (the reference writes these into train.yaml at
    `wenet/bin/train.py:183-192`).
    """
    input_dim = configs["input_dim"]
    vocab_size = configs["output_dim"]

    cmvn = None
    if configs.get("cmvn_file"):
        mean, istd = load_cmvn(configs["cmvn_file"],
                               configs.get("is_json_cmvn", True))
        cmvn = _as_cmvn_tuple(mean, istd)

    encoder = build_encoder(input_dim, configs, cmvn)
    dec_conf = dict(configs.get("decoder_conf", {}))
    dec_type = configs.get("decoder", "bitransformer")
    if dec_type == "transformer":
        dec_conf.setdefault("r_num_blocks", 0)
    if configs.get("dtype") and "dtype" not in dec_conf:
        import jax.numpy as jnp
        dec_conf["dtype"] = jnp.dtype(configs["dtype"])
    decoder = BiTransformerDecoder(
        vocab_size=vocab_size,
        encoder_output_size=configs.get("encoder_conf", {}).get(
            "output_size", 256),
        **dec_conf)
    ctc = CTC(vocab_size)

    model_conf = configs.get("model_conf", {})
    if "predictor" in configs:
        return _build_transducer(configs, vocab_size, encoder, decoder, ctc)
    return ASRModel(
        vocab_size=vocab_size,
        encoder=encoder,
        decoder=decoder,
        ctc=ctc,
        ctc_weight=model_conf.get("ctc_weight", 0.5),
        reverse_weight=model_conf.get("reverse_weight", 0.0),
        lsm_weight=model_conf.get("lsm_weight", 0.1),
        length_normalized_loss=model_conf.get("length_normalized_loss",
                                              False))


def _build_transducer(configs, vocab_size, encoder, decoder, ctc):
    """Transducer branch of the factory (reference `init_model.py:72-102`)."""
    from wenet_celoss_tpu.models.context_bias import ContextBias
    from wenet_celoss_tpu.models.joint import TransducerJoint
    from wenet_celoss_tpu.models.predictor import PREDICTOR_CLASSES
    from wenet_celoss_tpu.models.transducer import Transducer

    enc_out = configs.get("encoder_conf", {}).get("output_size", 256)
    predictor_type = configs.get("predictor", "rnn")
    pred_conf = dict(configs.get("predictor_conf", {}))
    if predictor_type != "rnn":
        pred_conf.pop("output_size", None)
        pred_conf.pop("hidden_size", None)
        pred_conf.pop("num_layers", None)
        pred_conf.pop("rnn_type", None)
        pred_conf.pop("dropout", None)
        pred_out_size = pred_conf.get("embed_size", enc_out)
    else:
        pred_out_size = pred_conf.get("output_size", enc_out)
    predictor = PREDICTOR_CLASSES[predictor_type](
        voca_size=vocab_size, **pred_conf)

    joint_conf = dict(configs.get("joint_conf", {}))
    if configs.get("dtype") and "dtype" not in joint_conf:
        import jax.numpy as jnp
        joint_conf["dtype"] = jnp.dtype(configs["dtype"])
    joint = TransducerJoint(
        voca_size=vocab_size, enc_output_size=enc_out,
        pred_output_size=pred_out_size, **joint_conf)

    context_bias = None
    if configs.get("context", "nobias") != "nobias":
        ctx_conf = dict(configs.get("context_conf", {}))
        ctx_conf.pop("bias_encoder", None)  # unused flag in the reference
        context_bias = ContextBias(
            output_size=enc_out, vocab_size=vocab_size, **ctx_conf)

    model_conf = dict(configs.get("model_conf", {}))
    tw = model_conf.get("transducer_weight", 1.0)
    cw = model_conf.get("ctc_weight", 0.0)
    aw = model_conf.get("attention_weight", 1.0 - tw - cw)
    assert abs(tw + cw + aw - 1.0) < 1e-6, \
        "transducer + ctc + attention weights must sum to 1"
    return Transducer(
        vocab_size=vocab_size,
        blank=0,
        encoder=encoder,
        decoder=decoder,
        ctc=ctc,
        predictor=predictor,
        joint=joint,
        context_bias=context_bias,
        ctc_weight=cw,
        transducer_weight=tw,
        attention_weight=aw,
        reverse_weight=model_conf.get("reverse_weight", 0.0),
        lsm_weight=model_conf.get("lsm_weight", 0.0),
        length_normalized_loss=model_conf.get("length_normalized_loss",
                                              False),
        hw_weight=model_conf.get("hw_weight", 0.4),
        loss_mode=model_conf.get("loss_mode", "both"),
        fused_rnnt_loss=model_conf.get("fused_rnnt_loss", False),
        rnnt_impl=model_conf.get("rnnt_impl", "scan"),
        prune_range=model_conf.get("prune_range", 5),
        simple_loss_scale=model_conf.get("simple_loss_scale", 0.5))


def init_example(configs, batch: int = 1, frames: int = 64,
                 labels: int = 4):
    """Synthetic argument tuple for ``model.init`` that matches the
    configured towers — INCLUDING the context-bias tower when the config
    enables biasing. Every CLI that restores a checkpoint must init with
    this shape set: a tower missing from the init tree gives the
    checkpoint's weights no home to restore into, and the model then
    fails at apply time with ScopeParamNotFoundError (caught by the
    recipe-level hotword gate, run.sh --smoke stage 4b)."""
    import numpy as np

    ex = (np.zeros((batch, frames, configs["input_dim"]), np.float32),
          np.full((batch,), frames, np.int32),
          np.ones((batch, labels), np.int32),
          np.full((batch,), labels, np.int32))
    if configs.get("context", "nobias") != "nobias":
        ex = ex + (np.ones((2, 2), np.int32), np.array([1, 2], np.int32),
                   np.zeros((batch, labels), np.int32))
    return ex
