#!/usr/bin/env python3
"""WER/CER scoring CLI (reference ``tools/compute-wer.py`` semantics):
`compute_wer.py [--char] [--v] ref_file hyp_file`."""

import argparse
import sys


def read_trn(path):
    out = {}
    with open(path, encoding="utf8") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if not parts:
                continue
            out[parts[0]] = parts[1] if len(parts) > 1 else ""
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ref")
    parser.add_argument("hyp")
    parser.add_argument("--char", action="store_true",
                        help="CER mode (CJK chars + latin words)")
    parser.add_argument("--v", action="store_true",
                        help="print per-utterance alignments")
    parser.add_argument("--case_sensitive", action="store_true")
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.utils import wer

    stats = wer.score(read_trn(args.ref), read_trn(args.hyp),
                      char_mode=args.char,
                      case_sensitive=args.case_sensitive)
    if args.v:
        for d in stats.details:
            print(d)
            print()
    print("Overall ->", stats.summary())


if __name__ == "__main__":
    main()
