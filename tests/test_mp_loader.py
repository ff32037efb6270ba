"""Multi-process sharded loader (data/loader.py): full-chain worker
processes over disjoint list shards, deterministic round-robin merge —
the TPU-host equivalent of the reference's DataLoader workers
(`wenet/dataset/dataset.py:49-98`, `wenet/bin/train.py` num_workers)."""

import json
import os

import numpy as np
import pytest

from wenet_celoss_tpu.data.dataset import Dataset
from wenet_celoss_tpu.data.loader import MultiProcessLoader, make_loader


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_corpus")
    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(0)
    symbol_table = {"<blank>": 0, "<unk>": 1}
    words = [f"w{i}" for i in range(20)]
    for i, w in enumerate(words):
        symbol_table[w] = i + 2
    symbol_table["<sos/eos>"] = len(symbol_table)
    lp = root / "data.list"
    with open(lp, "w") as f:
        for i in range(24):
            n = int(16000 * (0.6 + 0.05 * (i % 5)))
            wav = (rng.standard_normal(n) * 2000).astype(np.int16) \
                .astype(np.float32)
            p = root / f"u{i:03d}.wav"
            write_wav(str(p), wav, 16000)
            txt = " ".join(words[j] for j in rng.integers(0, 20, 4))
            f.write(json.dumps({"key": f"u{i:03d}", "wav": str(p),
                                "txt": txt}) + "\n")
    return str(lp), symbol_table


def _conf():
    return {
        "filter_conf": {"max_length": 2000, "min_length": 1,
                        "token_max_length": 100, "token_min_length": 1},
        "speed_perturb": False, "spec_aug": False,
        "fbank_conf": {"num_mel_bins": 23, "dither": 0.0},
        "shuffle": True, "shuffle_conf": {"shuffle_size": 32},
        "sort": True, "sort_conf": {"sort_size": 8},
        "batch_conf": {"batch_type": "static", "batch_size": 3},
        "split_with_space": True,
    }


def _keys(batches):
    return sorted(k for b in batches for k in b["keys"])


def test_mp_loader_covers_same_samples_as_dataset(corpus):
    lp, symtab = corpus
    base = list(Dataset("raw", lp, symtab, _conf(), partition=False))
    mp = MultiProcessLoader("raw", lp, symtab, _conf(), partition=False,
                            num_workers=2)
    got = list(mp)
    assert _keys(got) == _keys(base)
    b = got[0]
    assert b["feats"].ndim == 3 and b["feats"].dtype == np.float32
    assert len(b["feat_lengths"]) == b["feats"].shape[0]


def test_mp_loader_deterministic_per_epoch(corpus):
    lp, symtab = corpus
    mp = MultiProcessLoader("raw", lp, symtab, _conf(), partition=False,
                            num_workers=2)
    mp.set_epoch(3)
    a = [tuple(b["keys"]) for b in mp]
    b = [tuple(b["keys"]) for b in mp]
    assert a == b
    mp.set_epoch(4)
    c = [tuple(b["keys"]) for b in mp]
    assert a != c  # epoch reshuffles


def test_mp_loader_shards_compose_with_rank(corpus):
    """rank r of world W with n workers sees lists[r*n+w :: W*n] — the
    two ranks' unions must be disjoint and exhaustive."""
    lp, symtab = corpus
    k0 = _keys(list(MultiProcessLoader(
        "raw", lp, symtab, _conf(), partition=True, rank=0, world_size=2,
        num_workers=2)))
    k1 = _keys(list(MultiProcessLoader(
        "raw", lp, symtab, _conf(), partition=True, rank=1, world_size=2,
        num_workers=2)))
    assert not (set(k0) & set(k1))
    assert sorted(k0 + k1) == _keys(
        list(Dataset("raw", lp, symtab, _conf(), partition=False)))


def test_make_loader_factory(corpus):
    lp, symtab = corpus
    conf = _conf()
    assert isinstance(make_loader("raw", lp, symtab, conf), Dataset)
    conf["loader_processes"] = 2
    assert isinstance(make_loader("raw", lp, symtab, conf),
                      MultiProcessLoader)


def test_mp_loader_surfaces_worker_error(corpus):
    lp, symtab = corpus
    conf = _conf()
    conf["fbank_conf"] = {"num_mel_bins": -5}  # breaks fbank in-worker
    mp = MultiProcessLoader("raw", lp, symtab, conf, partition=False,
                            num_workers=2)
    with pytest.raises(RuntimeError, match="loader worker"):
        list(mp)
