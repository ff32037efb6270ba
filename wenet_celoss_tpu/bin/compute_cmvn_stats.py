"""Global CMVN statistics tool (reference ``tools/compute_cmvn_stats.py``):
fbank mean/var accumulation over wav.scp → JSON stats file."""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="compute global cmvn")
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--train_config", required=True,
                        help="yaml with dataset_conf.fbank_conf")
    parser.add_argument("--in_scp", required=True, help="wav.scp")
    parser.add_argument("--out_cmvn", default="global_cmvn")
    parser.add_argument("--log_interval", type=int, default=1000)
    args = parser.parse_args()

    import yaml

    from wenet_celoss_tpu.data.wav import read_audio
    from wenet_celoss_tpu.ops.fbank import FbankConfig, compute_fbank_np

    with open(args.train_config) as f:
        configs = yaml.safe_load(f)
    fbank_conf = configs["dataset_conf"]["fbank_conf"]
    mel = fbank_conf.get("num_mel_bins", 80)

    mean_stat = np.zeros(mel, np.float64)
    var_stat = np.zeros(mel, np.float64)
    frames = 0
    with open(args.in_scp) as f:
        for i, line in enumerate(f):
            parts = line.strip().split()
            if len(parts) < 2:
                continue
            path = parts[1]
            try:
                wav, sr = read_audio(path)
            except Exception:
                continue
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            cfg = FbankConfig(
                sample_rate=sr, num_mel_bins=mel,
                frame_length_ms=fbank_conf.get("frame_length", 25),
                frame_shift_ms=fbank_conf.get("frame_shift", 10),
                dither=0.0)
            feat = compute_fbank_np(wav, cfg)
            mean_stat += feat.sum(axis=0)
            var_stat += (feat ** 2).sum(axis=0)
            frames += feat.shape[0]
            if i % args.log_interval == 0:
                print(f"processed {i} utts, {frames} frames")
    # A zero frame count means every utterance failed to read — a
    # silently-NaN global CMVN would poison training; fail loudly.
    assert frames > 0, f"no frames accumulated from {args.in_scp}"
    with open(args.out_cmvn, "w") as f:
        json.dump({"mean_stat": mean_stat.tolist(),
                   "var_stat": var_stat.tolist(),
                   "frame_num": frames}, f)


if __name__ == "__main__":
    main()
