"""CLI integration: bin/train one epoch + bin/recognize over a raw list +
bin/average_model + bin/alignment, all as subprocesses."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _make_data(tmp_path, n=8):
    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(0)
    freqs = {"A": 500.0, "B": 1200.0, "C": 2500.0}
    texts = ["AB", "BA", "CA", "BC", "AC", "CB", "AB", "BC"]
    sr, seg = 16000, 2400
    lines = []
    ref_lines = []
    for i in range(n):
        txt = texts[i % len(texts)]
        wav = np.concatenate([
            6000 * np.sin(2 * np.pi * freqs[c] * np.arange(seg) / sr)
            for c in txt]).astype(np.float32)
        wav += rng.standard_normal(wav.shape).astype(np.float32) * 20
        path = tmp_path / f"u{i}.wav"
        write_wav(path, wav, sr)
        lines.append(json.dumps({"key": f"u{i}", "wav": str(path),
                                 "txt": txt}))
        ref_lines.append(f"u{i} {txt}")
    (tmp_path / "data.list").write_text("\n".join(lines))
    (tmp_path / "ref.text").write_text("\n".join(ref_lines))
    units = {"<blank>": 0, "A": 1, "B": 2, "C": 3, "<unk>": 4,
             "<sos/eos>": 5}
    with open(tmp_path / "units.txt", "w") as f:
        for s, i in units.items():
            f.write(f"{s} {i}\n")
    cfg = {
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "input_layer": "conv2d",
                         "pos_enc_layer_type": "abs_pos"},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.7, "reverse_weight": 0.3,
                       "lsm_weight": 0.0},
        "dataset_conf": {
            "filter": False, "shuffle": True,
            "shuffle_conf": {"shuffle_size": 8},
            "sort": False,
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 8},
        },
        "grad_clip": 5.0, "accum_grad": 1, "max_epoch": 200,
        "log_interval": 10,
        "optim": "adam", "optim_conf": {"lr": 0.005},
        "scheduler_conf": {"warmup_steps": 20},
    }
    with open(tmp_path / "train.yaml", "w") as f:
        yaml.dump(cfg, f)
    return tmp_path


@pytest.mark.slow
def test_train_recognize_average_align(tmp_path):
    data = _make_data(tmp_path)
    model_dir = tmp_path / "exp"

    # Char tokenizer: "AB" with split_with_space=False would char-split;
    # we use char mode (each letter is a symbol).
    train_cmd = [
        sys.executable, "-m", "wenet_celoss_tpu.bin.train",
        "--config", str(data / "train.yaml"),
        "--data_type", "raw",
        "--train_data", str(data / "data.list"),
        "--cv_data", str(data / "data.list"),
        "--symbol_table", str(data / "units.txt"),
        "--model_dir", str(model_dir),
        "--num_epochs", "200",
        "--override_config", "optim_conf.lr 0.005",
    ]
    res = subprocess.run(train_cmd, capture_output=True, text=True, env=ENV,
                         timeout=1200, cwd=REPO)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert (model_dir / "final.ckpt").exists()
    assert (model_dir / "train.yaml").exists()

    # Average last 3 checkpoints.
    res = subprocess.run(
        [sys.executable, "-m", "wenet_celoss_tpu.bin.average_model",
         "--dst_model", str(model_dir / "avg.ckpt"),
         "--src_path", str(model_dir), "--num", "3", "--val_best"],
        capture_output=True, text=True, env=ENV, timeout=300, cwd=REPO)
    assert res.returncode == 0, res.stdout + res.stderr

    # Decode in two modes and score.
    for mode in ("ctc_greedy_search", "attention_rescoring"):
        out = model_dir / f"text_{mode}"
        res = subprocess.run(
            [sys.executable, "-m", "wenet_celoss_tpu.bin.recognize",
             "--config", str(model_dir / "train.yaml"),
             "--data_type", "raw",
             "--test_data", str(data / "data.list"),
             "--checkpoint", str(model_dir / "avg.ckpt"),
             "--symbol_table", str(data / "units.txt"),
             "--mode", mode, "--batch_size", "8",
             "--reverse_weight", "0.3",
             # rescoring pass exercises the mesh-sharded decoder with
             # collective hypothesis exchange (decode/sharded.py)
             *(["--sharded"] if mode == "attention_rescoring" else []),
             "--result_file", str(out)],
            capture_output=True, text=True, env=ENV, timeout=900, cwd=REPO)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        hyps = {}
        for line in open(out):
            parts = line.strip().split(maxsplit=1)
            hyps[parts[0]] = parts[1] if len(parts) > 1 else ""
        refs = {}
        for line in open(data / "ref.text"):
            k, v = line.strip().split(maxsplit=1)
            refs[k] = v
        from wenet_celoss_tpu.utils import wer
        spaced = lambda d: {k: " ".join(v.replace(" ", ""))
                            for k, v in d.items()}
        stats = wer.score(spaced(refs), spaced(hyps))
        assert stats.wer < 30.0, (mode, stats.summary(), hyps)

    # Forced alignment.
    res = subprocess.run(
        [sys.executable, "-m", "wenet_celoss_tpu.bin.alignment",
         "--config", str(model_dir / "train.yaml"),
         "--input_data", str(data / "data.list"),
         "--checkpoint", str(model_dir / "avg.ckpt"),
         "--symbol_table", str(data / "units.txt"),
         "--result_file", str(model_dir / "ali.txt"), "--gen_praat"],
        capture_output=True, text=True, env=ENV, timeout=600, cwd=REPO)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert (model_dir / "ali.txt").exists()
    grids = list(model_dir.glob("*.TextGrid"))
    assert grids, "no TextGrid files produced"
