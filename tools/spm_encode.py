#!/usr/bin/env python3
"""Encode text into subword pieces or ids (sentencepiece `spm_encode`
equivalent, reference `tools/spm_encode`) via the from-scratch unigram
segmenter."""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--output_format", default="piece",
                        choices=["piece", "id"])
    parser.add_argument("--inputs", nargs="*", default=None)
    parser.add_argument("--outputs", nargs="*", default=None)
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.data.tokenizer import UnigramTokenizer

    tok = UnigramTokenizer(args.model)
    # id layout: 0=<unk> 1=<s> 2=</s> then normal pieces in model order.
    ids = {p: i + 3 for i, p in enumerate(tok.pieces)}

    ins = ([open(p, encoding="utf-8") for p in args.inputs]
           if args.inputs else [sys.stdin])
    outs = ([open(p, "w", encoding="utf-8") for p in args.outputs]
            if args.outputs else [sys.stdout])
    for fin, fout in zip(ins, outs):
        for line in fin:
            pieces = tok.encode(line.strip())
            if args.output_format == "id":
                fout.write(" ".join(str(ids.get(p, 0))
                                    for p in pieces) + "\n")
            else:
                fout.write(" ".join(pieces) + "\n")


if __name__ == "__main__":
    main()
