#!/usr/bin/env python3
"""Train a unigram subword model (sentencepiece `spm_train` equivalent,
reference `tools/spm_train`) using the from-scratch trainer in
wenet_celoss_tpu.data.spm_train — no sentencepiece dependency. Output
`<model_prefix>.model` is wire-compatible with sentencepiece and readable
by both this package's tokenizer and real sentencepiece."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True,
                        help="training text, one sentence per line")
    parser.add_argument("--vocab_size", type=int, required=True)
    parser.add_argument("--model_prefix", required=True)
    parser.add_argument("--model_type", default="unigram",
                        choices=["unigram"])
    parser.add_argument("--character_coverage", type=float, default=1.0)
    parser.add_argument("--max_piece_len", type=int, default=16)
    parser.add_argument("--seed_size", type=int, default=0)
    parser.add_argument("--input_sentence_size", type=int, default=0,
                        help="cap on corpus lines (0 = all)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.data import spm_train as S

    with open(args.input, encoding="utf-8") as f:
        lines = f.read().splitlines()
    if args.input_sentence_size > 0:
        lines = lines[:args.input_sentence_size]
    pieces = S.train_unigram(
        lines, args.vocab_size, seed_size=args.seed_size,
        max_piece_len=args.max_piece_len,
        character_coverage=args.character_coverage, verbose=args.verbose)
    S.write_model(args.model_prefix + ".model", pieces)
    S.write_vocab(args.model_prefix + ".vocab", pieces)
    print(f"Trained {len(pieces)} pieces (+3 control) → "
          f"{args.model_prefix}.model")


if __name__ == "__main__":
    main()
