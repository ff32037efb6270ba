"""Data pipeline tests: WAV IO, fbank parity, tokenizer, processor chain,
dataset end-to-end over raw and shard formats."""

import json
import os
import struct
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from wenet_celoss_tpu.data import processor
from wenet_celoss_tpu.data.dataset import Dataset
from wenet_celoss_tpu.data.tokenizer import (
    Tokenizer, UnigramTokenizer, parse_sentencepiece_model)
from wenet_celoss_tpu.data.wav import read_wav, write_wav
from wenet_celoss_tpu.ops.fbank import (
    FbankConfig, compute_fbank, compute_fbank_np, mel_banks)


class TestWav:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(16000) * 1000).astype(np.float32)
        path = tmp_path / "a.wav"
        write_wav(path, x, 16000)
        y, sr = read_wav(str(path))
        assert sr == 16000
        np.testing.assert_allclose(y, np.round(x).clip(-32768, 32767),
                                   atol=0.51)

    def test_read_bytes(self, tmp_path):
        x = np.zeros(100, np.float32)
        path = tmp_path / "b.wav"
        write_wav(path, x, 8000)
        y, sr = read_wav(open(path, "rb").read())
        assert sr == 8000 and len(y) == 100


class TestFbank:
    def test_np_jax_parity(self):
        rng = np.random.default_rng(1)
        wav = (rng.standard_normal(16000) * 8000).astype(np.float32)
        cfg = FbankConfig(num_mel_bins=40)
        np_feat = compute_fbank_np(wav, cfg)
        jax_feat, jax_len = compute_fbank(jnp.asarray(wav), cfg=cfg)
        assert int(jax_len) == np_feat.shape[0]
        np.testing.assert_allclose(np.asarray(jax_feat), np_feat,
                                   rtol=1e-3, atol=1e-3)

    def test_frame_count_kaldi_snip_edges(self):
        # kaldi: num_frames = 1 + (samples - 400) // 160 for 16k/25ms/10ms
        cfg = FbankConfig()
        wav = np.zeros(16000, np.float32)
        feat = compute_fbank_np(wav + 1.0, cfg)
        assert feat.shape == (1 + (16000 - 400) // 160, 80)

    def test_mel_banks_shape_and_partition(self):
        cfg = FbankConfig(num_mel_bins=80)
        m = mel_banks(cfg)
        assert m.shape == (80, 257)
        # Triangles cover mid frequencies (sum close to 1 in the interior).
        interior = m.sum(axis=0)[20:200]
        assert (interior > 0.5).all() and (interior < 1.5).all()

    def test_mfcc_np_jax_parity_and_dct_inverse(self):
        from wenet_celoss_tpu.ops.fbank import (
            MfccConfig, compute_mfcc, compute_mfcc_np)
        rng = np.random.default_rng(3)
        wav = (rng.standard_normal(8000) * 8000).astype(np.float32)
        cfg = MfccConfig(num_mel_bins=23, num_ceps=13)
        np_feat = compute_mfcc_np(wav, cfg)
        assert np_feat.shape[1] == 13
        jax_feat, jax_len = compute_mfcc(jnp.asarray(wav), cfg=cfg)
        assert int(jax_len) == np_feat.shape[0]
        np.testing.assert_allclose(np.asarray(jax_feat), np_feat,
                                   rtol=1e-3, atol=1e-3)
        # Full-rank orthonormal DCT with no lifter reconstructs log-mel
        # energy (Parseval): ||ceps||^2 == ||logmel||^2 per frame.
        full = MfccConfig(num_mel_bins=23, num_ceps=23, cepstral_lifter=0.0)
        ceps = compute_mfcc_np(wav, full)
        logmel = compute_fbank_np(wav, full)
        np.testing.assert_allclose((ceps ** 2).sum(1), (logmel ** 2).sum(1),
                                   rtol=1e-4)

    def test_mfcc_in_dataset_pipeline(self, tmp_path):
        wav_path = tmp_path / "u.wav"
        write_wav(wav_path, np.zeros(4000, np.float32) + 100.0, 16000)
        lst = tmp_path / "data.list"
        lst.write_text(json.dumps(
            {"key": "u", "wav": str(wav_path), "txt": "a"}) + "\n")
        ds = Dataset("raw", str(lst), {"a": 1, "<blank>": 0},
                     {"feats_type": "mfcc",
                      "mfcc_conf": {"num_mel_bins": 23, "num_ceps": 13},
                      "filter": False, "shuffle": False, "sort": False,
                      "batch_conf": {"batch_size": 1}, "prefetch": 0})
        batch = next(iter(ds))
        assert batch["feats"].shape[-1] == 13

    def test_tone_peaks_at_right_mel_bin(self):
        # A 1kHz tone should put its max energy near the mel bin whose
        # center is 1kHz.
        sr = 16000
        t = np.arange(sr) / sr
        wav = (np.sin(2 * np.pi * 1000 * t) * 10000).astype(np.float32)
        cfg = FbankConfig(num_mel_bins=40)
        feat = compute_fbank_np(wav, cfg)
        peak_bin = int(np.argmax(feat.mean(axis=0)))
        centers = mel_banks(cfg).argmax(axis=1) * (sr / cfg.fft_size)
        assert abs(centers[peak_bin] - 1000) < 150


def _write_spm_model(path, pieces):
    """Serialize a minimal sentencepiece ModelProto (field 1 = repeated
    SentencePiece{piece=1:string, score=2:float, type=3:varint})."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    blob = b""
    for piece, score in pieces:
        sub = b"\x0a" + varint(len(piece.encode("utf8"))) \
            + piece.encode("utf8")
        sub += b"\x15" + struct.pack("<f", score)
        sub += b"\x18" + varint(1)
        blob += b"\x0a" + varint(len(sub)) + sub
    with open(path, "wb") as f:
        f.write(blob)


class TestTokenizer:
    def test_spm_parse_and_viterbi(self, tmp_path):
        model = tmp_path / "m.model"
        _write_spm_model(model, [
            ("▁HE", -1.0), ("LLO", -1.5), ("▁HELLO", -2.0),
            ("▁WORLD", -1.2), ("▁", -5.0), ("H", -6.0), ("E", -6.0),
        ])
        pieces = parse_sentencepiece_model(str(model))
        assert pieces["▁HE"] == pytest.approx(-1.0)
        tok = UnigramTokenizer(str(model))
        # ▁HE + LLO = -2.5 beats ▁HELLO = -2.0? No: -2.0 > -2.5, so the
        # single piece wins.
        assert tok.encode("HELLO") == ["▁HELLO"]
        assert tok.encode("HELLO WORLD") == ["▁HELLO", "▁WORLD"]

    def test_char_mode(self):
        table = {"a": 1, "b": 2, "▁": 3, "<unk>": 0}
        tok = Tokenizer(table)
        tokens, ids = tok("ab a")
        assert tokens == ["a", "b", "▁", "a"]
        assert ids == [1, 2, 3, 1]

    def test_non_lang_syms(self):
        table = {"{NOISE}": 7, "a": 1, "<unk>": 0}
        tok = Tokenizer(table, non_lang_syms=["{NOISE}"])
        tokens, ids = tok("a{NOISE}a")
        assert tokens == ["a", "{NOISE}", "a"]
        assert ids == [1, 7, 1]


def _make_raw_dataset(tmp_path, n=8):
    rng = np.random.default_rng(0)
    lines = []
    texts = ["ab", "ba", "aab", "abb", "ab", "ba", "aa", "bb"]
    for i in range(n):
        wav = (rng.standard_normal(8000) * 3000).astype(np.float32)
        path = tmp_path / f"u{i}.wav"
        write_wav(path, wav, 16000)
        lines.append(json.dumps(
            {"key": f"u{i}", "wav": str(path), "txt": texts[i % len(texts)]}))
    list_file = tmp_path / "data.list"
    list_file.write_text("\n".join(lines))
    return str(list_file)


SYMS = {"<blank>": 0, "a": 1, "b": 2, "▁": 3, "<unk>": 4, "<sos/eos>": 5}


class TestDatasetPipeline:
    def test_raw_end_to_end(self, tmp_path):
        list_file = _make_raw_dataset(tmp_path)
        conf = {
            "filter": False, "shuffle": False, "sort": True,
            "sort_conf": {"sort_size": 4},
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 4},
        }
        ds = Dataset("raw", list_file, SYMS, conf)
        batches = list(iter(ds))
        assert len(batches) == 2
        b = batches[0]
        assert b["feats"].shape[0] == 4 and b["feats"].shape[2] == 23
        assert (b["label_lengths"] > 0).all()
        assert b["labels"].max() <= 2

    def test_speed_perturb_and_augment(self, tmp_path):
        list_file = _make_raw_dataset(tmp_path)
        conf = {
            "filter": False, "shuffle": True,
            "shuffle_conf": {"shuffle_size": 4},
            "speed_perturb": True, "spec_aug": True,
            "spec_aug_conf": {"num_t_mask": 1, "num_f_mask": 1,
                              "max_t": 5, "max_f": 3},
            "spec_sub": True, "spec_sub_conf": {"max_t": 5, "num_t_sub": 1},
            "fbank_conf": {"num_mel_bins": 23, "dither": 0.1},
            "batch_conf": {"batch_type": "dynamic",
                           "max_frames_in_batch": 300, "round_to": 2},
        }
        ds = Dataset("raw", list_file, SYMS, conf)
        batches = list(iter(ds))
        assert batches
        for b in batches:
            assert b["feats"].shape[0] % 2 == 0

    def test_context_generation(self, tmp_path):
        list_file = _make_raw_dataset(tmp_path)
        conf = {
            "filter": False, "shuffle": False, "sort": False,
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 4},
            "context_mode": 1,
            "pad_conf": {"bpe_start_ids": {1, 2}, "context_len_min": 1,
                         "context_len_max": 2},
        }
        ds = Dataset("raw", list_file, SYMS, conf)
        b = next(iter(iter(ds)))
        assert "context_list" in b
        assert b["context_list"][0, 0] == 0  # sentinel no-bias entry
        assert b["hw_labels"].shape == b["labels"].shape
        # hw labels only 0/1/-1
        assert set(np.unique(b["hw_labels"])) <= {-1, 0, 1}

    def test_context_mode3_file_list_hw_labels(self, tmp_path):
        """Mode 3 (fixed decode-time list): the processor matches each
        file phrase against the labels and emits per-token hw_labels —
        the gate-eval contract recognize.py --context_mode 3 relies on
        (reference `wenet/bin/recognize.py:374-375`)."""
        list_file = _make_raw_dataset(tmp_path)
        conf = {
            "filter": False, "shuffle": False, "sort": False,
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 8},
            "context_mode": 3,
            "pad_conf": {"file_list": [[1, 2]]},   # phrase "ab"
        }
        ds = Dataset("raw", list_file, SYMS, conf)
        b = next(iter(iter(ds)))
        assert b["context_list"][0, 0] == 0      # sentinel entry
        assert list(b["context_list"][1, :2]) == [1, 2]
        hw = b["hw_labels"]
        lab = b["labels"]
        for i in range(lab.shape[0]):
            toks = [t for t in lab[i] if t >= 0]
            ref = [0] * len(toks)
            for j in range(len(toks) - 1):
                if toks[j] == 1 and toks[j + 1] == 2:
                    ref[j] = ref[j + 1] = 1
            got = [int(x) for x in hw[i, :len(toks)]]
            assert got == ref, (i, toks, got, ref)

    def test_shard_end_to_end(self, tmp_path):
        # Build shard via the tool.
        rng = np.random.default_rng(1)
        wav_scp, text = [], []
        for i in range(4):
            wav = (rng.standard_normal(4000) * 2000).astype(np.float32)
            p = tmp_path / f"s{i}.wav"
            write_wav(p, wav, 16000)
            wav_scp.append(f"s{i} {p}")
            text.append(f"s{i} ab")
        (tmp_path / "wav.scp").write_text("\n".join(wav_scp))
        (tmp_path / "text").write_text("\n".join(text))
        subprocess.run(
            [sys.executable, "tools/make_shard_list.py",
             str(tmp_path / "wav.scp"), str(tmp_path / "text"),
             str(tmp_path / "shards"), str(tmp_path / "shards.list"),
             "--num_utts_per_shard", "2"],
            check=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
        conf = {
            "filter": False, "shuffle": False, "sort": False,
            "fbank_conf": {"num_mel_bins": 23},
            "batch_conf": {"batch_type": "static", "batch_size": 2},
        }
        ds = Dataset("shard", str(tmp_path / "shards.list"), SYMS, conf)
        batches = list(iter(ds))
        assert sum(len(b["keys"]) for b in batches) == 4


class TestHwLabelGenerate:
    def test_binary_labels(self):
        labels = [[5, 6, 7, 8], [7, 8, 5, 5]]
        ctx = [[0], [7, 8]]
        hw, match, dec = processor.hw_label_generate(labels, ctx, 2)
        assert hw == [[0, 0, 1, 1], [1, 1, 0, 0]]
        assert match == [[7, 8], [7, 8]]
        assert dec == [[0, 0, 7, 8], [7, 8, 0, 0]]

    def test_phrase_index_labels(self):
        labels = [[5, 6, 7, 8]]
        ctx = [[0], [5, 6], [7, 8]]
        hw, _, _ = processor.hw_label_generate(labels, ctx, 31)
        assert hw == [[1, 1, 2, 2]]
