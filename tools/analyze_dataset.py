#!/usr/bin/env python3
"""Dataset statistics: utterance count, duration and label-length
distributions over a data.list (reference tools/analyze_dataset.py
equivalent — reads the raw jsonl list, no torch)."""

import argparse
import json
import sys
import wave
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def wav_duration(path: str) -> float:
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / float(w.getframerate())
    except (OSError, wave.Error):
        return float("nan")


def percentile(sorted_vals, p):
    if not sorted_vals:
        return float("nan")
    k = min(int(len(sorted_vals) * p / 100.0), len(sorted_vals) - 1)
    return sorted_vals[k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_list", required=True, help="raw-mode data.list")
    ap.add_argument("--max_utts", type=int, default=0,
                    help="limit (0 = all)")
    args = ap.parse_args()

    durations, text_lens = [], []
    n = 0
    with open(args.data_list, encoding="utf8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            d = wav_duration(obj["wav"])
            if d == d:  # not NaN
                durations.append(d)
            text_lens.append(len(obj.get("txt", "")))
            n += 1
            if args.max_utts and n >= args.max_utts:
                break

    durations.sort()
    text_lens.sort()
    total = sum(durations)
    print(f"utterances:      {n}")
    print(f"total duration:  {total:.1f} s ({total / 3600:.2f} h)")
    if durations:
        print(f"duration s:      mean {total / len(durations):.2f}  "
              f"min {durations[0]:.2f}  p50 {percentile(durations, 50):.2f} "
              f" p95 {percentile(durations, 95):.2f}  max {durations[-1]:.2f}")
    if text_lens:
        print(f"text chars:      mean {sum(text_lens) / len(text_lens):.1f} "
              f" min {text_lens[0]}  p50 {percentile(text_lens, 50)}  "
              f"p95 {percentile(text_lens, 95)}  max {text_lens[-1]}")


if __name__ == "__main__":
    main()
