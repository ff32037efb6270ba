"""FLAC decode path: the real-LibriSpeech data format.

The C++ decoder (runtime/core/frontend/flac.cc, ctypes-bound with an
auto-built .so) is validated against the independent from-scratch Python
encoder (tools/flac_encode.py) over every subframe type and stereo mode,
and the pipeline-level dispatch (read_audio sniffing, parse_raw over a
.flac data.list) is exercised end to end.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from flac_encode import encode_flac  # noqa: E402

from wenet_celoss_tpu.data.flac import read_flac  # noqa: E402
from wenet_celoss_tpu.data.wav import read_audio, write_wav  # noqa: E402


def _tone(n, ch, rng, sr=16000):
    t = np.arange(n)
    base = (8000 * np.sin(2 * np.pi * 440 * t / sr)
            + 50 * rng.standard_normal(n)).astype(np.int32)
    x = np.stack([base, np.roll(base, 3)], 1)[:, :ch]
    return np.clip(x, -32768, 32767)


@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed", "lpc"])
@pytest.mark.parametrize("ch,mid_side", [(1, False), (2, False), (2, True)])
def test_roundtrip_exact(mode, ch, mid_side):
    rng = np.random.default_rng(0)
    n = 9001  # not a multiple of the 4096 blocksize → short last frame
    if mode == "constant":
        x = np.full((n, ch), -321, np.int32)
    else:
        x = _tone(n, ch, rng)
    data = encode_flac(x if ch > 1 else x[:, 0], 16000, mode=mode,
                       mid_side=mid_side)
    y, sr = read_flac(data)
    assert sr == 16000
    y = np.asarray(y, np.int64).reshape(-1, ch) if ch > 1 \
        else np.asarray(y, np.int64)[:, None]
    assert y.shape[0] == n
    np.testing.assert_array_equal(y, x)


def test_read_audio_dispatch(tmp_path):
    rng = np.random.default_rng(1)
    x = _tone(5000, 1, rng)[:, 0]
    wav_p = tmp_path / "a.wav"
    write_wav(wav_p, x.astype(np.float32), 16000)
    flac_p = tmp_path / "a.flac"
    with open(flac_p, "wb") as f:
        f.write(encode_flac(x, 16000))
    yw, srw = read_audio(str(wav_p))
    yf, srf = read_audio(str(flac_p))
    assert srw == srf == 16000
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yf), atol=0.5)


def test_parse_raw_flac_datalist(tmp_path):
    """A .flac entry in a raw data.list flows through parse_raw + fbank —
    the path real LibriSpeech takes (reference run.sh stage 0 lists
    .flac files directly)."""
    from wenet_celoss_tpu.data import processor

    rng = np.random.default_rng(2)
    x = _tone(16000, 1, rng)[:, 0]
    flac_p = tmp_path / "u1.flac"
    with open(flac_p, "wb") as f:
        f.write(encode_flac(x, 16000))
    line = json.dumps({"key": "u1", "wav": str(flac_p), "txt": "HELLO"})
    out = list(processor.parse_raw([{"src": line}]))
    assert len(out) == 1
    assert out[0]["key"] == "u1"
    assert out[0]["sample_rate"] == 16000
    assert len(out[0]["wav"]) == 16000
    feats = list(processor.compute_fbank(iter(out), num_mel_bins=80))
    assert feats[0]["feat"].shape[1] == 80


@pytest.mark.slow
def test_recipe_dryrun_data_prep(tmp_path):
    """run.sh --dryrun stages 0-2: the REAL-data branches (find over a
    .flac LibriSpeech-shaped tree, trans.txt collection, FLAC-decoding
    cmvn, spm training, data.list) execute and produce sane artifacts.
    The full --dryrun (stages 0-6 incl. training and the C++ runtime
    reading FLAC) is a manual/recipe-level check — ~20 min on CPU."""
    import shutil
    import subprocess

    recipe = os.path.join(REPO, "examples", "librispeech")
    work = tmp_path / "recipe"
    shutil.copytree(recipe, work)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO,
               WENET_TPU_REPO=REPO)
    res = subprocess.run(
        ["bash", "run.sh", "--dryrun", "--stop_stage=2"],
        cwd=work, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    scp = work / "data" / "train-clean-100" / "wav.scp"
    lines = scp.read_text().strip().splitlines()
    assert len(lines) == 12 and lines[0].split()[1].endswith(".flac")
    cmvn = json.loads(
        (work / "data" / "train_960" / "global_cmvn").read_text())
    assert cmvn["frame_num"] > 0
    dl = (work / "data" / "train_960" / "data.list").read_text()
    first = json.loads(dl.strip().splitlines()[0])
    assert first["wav"].endswith(".flac") and first["txt"]
