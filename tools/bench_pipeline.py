"""End-to-end input-pipeline throughput bench (host side, no device).

Times the FULL training data chain exactly as `bin/train.py` consumes it —
raw-list parse → wav read → tokenize → filter → resample → speed_perturb →
fbank → spec_aug → shuffle → sort → dynamic batch → pad/bucket (+ mode-1
hotword synthesis) → prefetch (data/dataset.py, mirroring reference
`wenet/dataset/dataset.py:119-217`) — on generated speech-length wavs, and
reports audio-seconds/second so it can be compared directly against the
chip's training consumption (BENCH train value, ~7.6k audio-s/s/chip).

Two configurations are timed:
  - "as-shipped": the flagship recipe's dataset_conf (dither 0.1 ⇒ the
    serial fbank path, num_workers 0);
  - "tuned": dither 0 + num_workers=<cpu count> (the thread-parallel
    fbank path) — what a production pod host would run.

Prints one JSON line per configuration:
  {"metric": "pipeline_throughput_<name>", "value": ..., "unit":
   "audio-seconds/s", "vs_train_consumption": ...}

Usage: python tools/bench_pipeline.py [--utts 300] [--train_rate 7610]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n_utts: int, sr: int = 16000,
                mean_s: float = 12.0):
    """Synthetic speech-length wav corpus + raw data.list + symbol table.

    Utterance lengths mimic LibriSpeech (~12 s mean, 5-18 s spread);
    transcripts are random word sequences over a 5k-BPE-sized vocab so
    tokenize/filter/hotword-synthesis do real work.
    """
    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    vocab = [f"▁W{i:04d}" for i in range(5000)]
    symbol_table = {"<blank>": 0, "<unk>": 1}
    for i, w in enumerate(vocab):
        symbol_table[w] = i + 2
    symbol_table["<sos/eos>"] = len(symbol_table)
    list_path = os.path.join(root, "data.list")
    total_audio = 0.0
    with open(list_path, "w") as f:
        for i in range(n_utts):
            dur = float(np.clip(rng.normal(mean_s, 3.0), 5.0, 18.0))
            n = int(dur * sr)
            wav = (rng.standard_normal(n) * 3000).astype(np.int16) \
                .astype(np.float32)
            path = os.path.join(root, "wavs", f"u{i:05d}.wav")
            write_wav(path, wav, sr)
            n_words = max(3, int(dur * 2.5))
            txt = " ".join(
                vocab[j][1:] for j in rng.integers(0, 5000, n_words))
            f.write(json.dumps({"key": f"u{i:05d}", "wav": path,
                                "txt": txt}) + "\n")
            total_audio += dur
    return list_path, symbol_table, total_audio


def flagship_dataset_conf():
    """The recipe's dataset_conf (conformer_rnnt_bias.yaml:80-114)."""
    return {
        "filter_conf": {"max_length": 40960, "min_length": 10,
                        "token_max_length": 200, "token_min_length": 1},
        "resample_conf": {"resample_rate": 16000},
        "speed_perturb": True,
        "fbank_conf": {"num_mel_bins": 80, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.1},
        "spec_aug": True,
        "spec_aug_conf": {"num_t_mask": 2, "num_f_mask": 2, "max_t": 50,
                          "max_f": 10},
        "shuffle": True, "shuffle_conf": {"shuffle_size": 1500},
        "sort": True, "sort_conf": {"sort_size": 500},
        "batch_conf": {"batch_type": "dynamic",
                       "max_frames_in_batch": 6000},
        "context_mode": 1,
        "pad_conf": {"context_len_min": 1, "context_len_max": 3},
    }


def run_one(name, list_path, symbol_table, conf, train_rate, emit=print):
    """Whole-pass throughput (chain construction → exhaustion). The
    sort/shuffle buffers mean there is no per-batch steady state to
    sample — with sort_size=500 the first batch only appears after a
    whole buffer of utterances is featurized — so the honest number is
    total audio over total wall time. For the multi-process loader the
    one-time interpreter spawn+import cost (measured via the workers'
    ready handshake, amortized to ~0 over a real epoch) is subtracted;
    the raw value is reported as startup_s."""
    from wenet_celoss_tpu.data.loader import make_loader
    ds = make_loader("raw", list_path, symbol_table, conf,
                     partition=False)
    t0 = time.perf_counter()
    audio_s = 0.0
    n_batches = 0
    for batch in ds:
        audio_s += float(np.sum(batch["feat_lengths"])) * 0.01
        n_batches += 1
    dt = time.perf_counter() - t0
    startup = getattr(ds, "startup_s", 0.0)
    rate = audio_s / max(dt - startup, 1e-9)
    emit(json.dumps({
        "metric": f"pipeline_throughput_{name}",
        "value": round(rate, 2),
        "unit": "audio-seconds/s",
        "batches": n_batches,
        "startup_s": round(startup, 2),
        "vs_train_consumption": round(rate / train_rate, 3),
    }))
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=300)
    ap.add_argument("--train_rate", type=float, default=7610.0,
                    help="chip train consumption to compare against "
                         "(audio-s/s; BENCH train value)")
    ap.add_argument("--keep", default=None,
                    help="reuse/keep corpus at this dir")
    args = ap.parse_args()

    root = args.keep or tempfile.mkdtemp(prefix="pipe_bench_")
    list_path = os.path.join(root, "data.list")
    if not os.path.exists(list_path):
        print(f"generating {args.utts} utts under {root} ...",
              file=sys.stderr)
        list_path, symbol_table, total = make_corpus(root, args.utts)
        print(f"corpus: {total:.0f} audio-s", file=sys.stderr)
    else:
        symbol_table = {"<blank>": 0, "<unk>": 1}
        for i in range(5000):
            symbol_table[f"▁W{i:04d}"] = i + 2
        symbol_table["<sos/eos>"] = len(symbol_table)

    conf = flagship_dataset_conf()
    rate = run_one("as_shipped", list_path, symbol_table, conf,
                   args.train_rate)

    serial = dict(conf)
    serial["num_workers"] = 0
    rate1 = run_one("serial_1core", list_path, symbol_table, serial,
                    args.train_rate)

    # Sharded multi-process loaders (data/loader.py) — the whole chain
    # parallelized, one full pipeline per core (the reference's
    # DataLoader-worker design). This is the configuration a production
    # TPU host runs.
    ncpu = os.cpu_count() or 1
    mp_conf = dict(conf)
    mp_conf["loader_processes"] = ncpu
    run_one(f"mp_{ncpu}proc", list_path, symbol_table, mp_conf,
            args.train_rate)
    # Host-budget extrapolation: a v5e host pairs ~14 vCPU with each
    # chip (112 vCPU / 8 chips); this container has os.cpu_count().
    ncpu = os.cpu_count() or 1
    print(json.dumps({
        "metric": "pipeline_percore_extrapolation",
        "this_host_cpus": ncpu,
        "audio_s_per_s_per_core": round(rate1, 2),
        "projected_14core_tpu_host": round(rate1 * 14, 2),
        "vs_train_consumption_14core": round(
            rate1 * 14 / args.train_rate, 3),
    }))


if __name__ == "__main__":
    main()
