#!/usr/bin/env python3
"""Decode subword pieces/ids back to text (sentencepiece `spm_decode`
equivalent, reference `tools/spm_decode`)."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--input_format", default="piece",
                        choices=["piece", "id"])
    parser.add_argument("--input", default=None)
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.data.tokenizer import UnigramTokenizer

    if args.input_format == "id":
        tok = UnigramTokenizer(args.model)
        id2p = {i + 3: p for i, p in enumerate(tok.pieces)}
        id2p.update({0: "<unk>", 1: "<s>", 2: "</s>"})

    fin = open(args.input, encoding="utf-8") if args.input else sys.stdin
    for line in fin:
        toks = line.split()
        if args.input_format == "id":
            toks = [id2p.get(int(t), "<unk>") for t in toks]
        text = "".join(toks).replace("▁", " ").strip()
        print(text)


if __name__ == "__main__":
    main()
