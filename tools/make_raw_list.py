#!/usr/bin/env python3
"""wav.scp + text → jsonl data.list (reference ``tools/make_raw_list.py``)."""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("wav_file")
    parser.add_argument("text_file")
    parser.add_argument("output_file")
    parser.add_argument("--segments", default=None)
    args = parser.parse_args()

    wavs = {}
    speeds = {}
    with open(args.wav_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                path = parts[1]
                # "path #speed=0.9" entries from tools/data_dir.py
                # perturb-speed
                if "#speed=" in path:
                    path, _, factor = path.rpartition("#speed=")
                    speeds[parts[0]] = float(factor)
                    path = path.strip()
                wavs[parts[0]] = path
    texts = {}
    with open(args.text_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            texts[parts[0]] = parts[1] if len(parts) > 1 else ""
    segments = None
    if args.segments is not None:
        # kaldi segments: <utt-id> <recording-id> <start-s> <end-s>
        segments = {}
        with open(args.segments, encoding="utf8") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) == 4:
                    segments[parts[0]] = (
                        parts[1], float(parts[2]), float(parts[3]))
    with open(args.output_file, "w", encoding="utf8") as f:
        for key, text in texts.items():
            if segments is not None:
                if key not in segments:
                    continue
                rec, start, end = segments[key]
                if rec not in wavs:
                    continue
                obj = {"key": key, "wav": wavs[rec], "txt": text,
                       "start": start, "end": end}
                if rec in speeds:
                    obj["speed"] = speeds[rec]
            elif key in wavs:
                obj = {"key": key, "wav": wavs[key], "txt": text}
                if key in speeds:
                    obj["speed"] = speeds[key]
            else:
                continue
            f.write(json.dumps(obj, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
