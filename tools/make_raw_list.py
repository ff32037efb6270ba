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
    with open(args.wav_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                wavs[parts[0]] = parts[1]
    texts = {}
    with open(args.text_file, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            texts[parts[0]] = parts[1] if len(parts) > 1 else ""
    with open(args.output_file, "w", encoding="utf8") as f:
        for key, text in texts.items():
            if key in wavs:
                f.write(json.dumps(
                    {"key": key, "wav": wavs[key], "txt": text},
                    ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
