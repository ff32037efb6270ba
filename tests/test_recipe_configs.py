"""The shipped LibriSpeech recipe configs are loadable, build models, and
their dataset_conf drives the input pipeline end to end (shrunk towers so
the test stays fast; catches schema/key drift between the yamls and the
factory/processor)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

CONF_DIR = os.path.join(os.path.dirname(__file__), "..",
                        "examples", "librispeech", "conf")
CONFS = ["conformer_rnnt_bias.yaml", "train_conformer.yaml",
         "train_u2pp_conformer.yaml", "train_unified_conformer.yaml"]


def _load_tiny(name):
    with open(os.path.join(CONF_DIR, name)) as f:
        cfg = yaml.safe_load(f)
    cfg["encoder_conf"].update(output_size=32, attention_heads=2,
                               linear_units=48, num_blocks=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(attention_heads=2, linear_units=48,
                               num_blocks=1)
    if "r_num_blocks" in cfg["decoder_conf"]:
        cfg["decoder_conf"]["r_num_blocks"] = 1
    if "predictor_conf" in cfg:
        cfg["predictor_conf"].update(embed_size=32, output_size=32,
                                     hidden_size=32, num_layers=1)
    if "joint_conf" in cfg:
        cfg["joint_conf"]["join_dim"] = 48
    if "context_conf" in cfg:
        cfg["context_conf"].update(embedding_size=32, attention_heads=2,
                                   linear_units=48, num_block=1,
                                   unified_hw_odim=16)
    cfg["input_dim"] = 80
    cfg["output_dim"] = 40
    cfg.pop("dtype", None)  # fp32 on test CPU
    return cfg


@pytest.mark.parametrize("name", CONFS)
def test_recipe_config_builds_and_runs(name):
    from wenet_celoss_tpu.models.factory import init_model
    cfg = _load_tiny(name)
    model = init_model(cfg)
    rng = np.random.default_rng(0)
    b, t, u = 2, 48, 4
    args = [jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
            jnp.full((b,), t, jnp.int32),
            jnp.asarray(rng.integers(1, 39, (b, u)), jnp.int32),
            jnp.full((b,), u, jnp.int32)]
    if cfg.get("context", "nobias") != "nobias":
        args += [jnp.asarray(rng.integers(1, 39, (3, 2)), jnp.int32),
                 jnp.full((3,), 2, jnp.int32),
                 jnp.asarray(rng.integers(0, 2, (b, u)), jnp.int32)]
    variables = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(variables, *args,
                      rngs={"dropout": jax.random.PRNGKey(1)},
                      mutable=["batch_stats"])
    loss = out[0]["loss"] if isinstance(out, tuple) else out["loss"]
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("name", CONFS)
def test_recipe_dataset_conf_drives_pipeline(name, tmp_path):
    """dataset_conf from each yaml runs the raw-list pipeline (resample,
    speed perturb, fbank, spec_aug incl. warp_for_time, spec_sub, sort,
    batching, hotword generation)."""
    from wenet_celoss_tpu.data.dataset import Dataset
    from wenet_celoss_tpu.data.wav import write_wav
    with open(os.path.join(CONF_DIR, name)) as f:
        cfg = yaml.safe_load(f)
    conf = cfg["dataset_conf"]
    # keep the test snappy but leave every op enabled
    conf["filter_conf"]["min_length"] = 0
    conf["filter_conf"]["max_length"] = 10**6
    conf["filter_conf"].pop("min_output_input_ratio", None)
    conf["filter_conf"].pop("max_output_input_ratio", None)
    conf.setdefault("batch_conf", {})["batch_type"] = "static"
    conf["batch_conf"]["batch_size"] = 2
    rng = np.random.default_rng(3)
    lines = []
    for i in range(4):
        sr = 16000
        wav = (rng.standard_normal(sr) * 500).astype(np.float32)
        path = tmp_path / f"u{i}.wav"
        write_wav(path, wav, sr)
        lines.append(json.dumps({"key": f"u{i}", "wav": str(path),
                                 "txt": "ab ba ab"}))
    lst = tmp_path / "data.list"
    lst.write_text("\n".join(lines))
    symbol_table = {"<blank>": 0, "a": 1, "b": 2, "ab": 3, "ba": 4,
                    "<sos/eos>": 5}
    ds = Dataset("raw", str(lst), symbol_table, conf, partition=False)
    batches = list(ds)
    assert batches, "pipeline yielded no batches"
    feats = batches[0]["feats"]
    assert feats.ndim == 3 and feats.shape[2] == 80
    if conf.get("context_mode", 0) != 0:
        assert "context_list" in batches[0]
