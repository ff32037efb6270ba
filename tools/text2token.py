#!/usr/bin/env python3
"""Text → token sequences (reference ``tools/text2token.py`` semantics):
char-level splitting with CJK handling, optional BPE via the from-scratch
sentencepiece reader, non-linguistic symbol passthrough, skip-ncols."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-ncols", "-s", type=int, default=0)
    parser.add_argument("--bpe_model", default=None)
    parser.add_argument("--non_lang_syms", default=None)
    parser.add_argument("text", nargs="?", default=None)
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.data.tokenizer import Tokenizer
    from wenet_celoss_tpu.utils.file_utils import read_non_lang_symbols

    tok = Tokenizer({}, args.bpe_model,
                    read_non_lang_symbols(args.non_lang_syms))
    f = open(args.text, encoding="utf8") if args.text else sys.stdin
    for line in f:
        parts = line.strip().split()
        prefix = parts[:args.skip_ncols]
        text = " ".join(parts[args.skip_ncols:])
        tokens = tok.text_to_tokens(text)
        print(" ".join(prefix + tokens))


if __name__ == "__main__":
    main()
