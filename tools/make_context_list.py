#!/usr/bin/env python3
"""Tokenize hotword (context-biasing) phrases into the artifacts the decode
CLIs consume.

Replaces the reference's ad-hoc `examples/librispeech/s0/generate_dic_mode3.py`
(hard-coded NFS paths, sentencepiece dependency) with a proper CLI built on
the from-scratch tokenizer:

- default: phrases file (one phrase per line) → id-sequence lines, one
  phrase per line (`--context_list_file` input of recognize.py for
  `--context_mode 2/3`).
- `--per_utt`: TSV `utt_key<TAB>phrase<TAB>phrase...` → pickled
  {key: [[ids...], ...]} dict (`--context_dict` input for
  `--context_mode 4`).
"""

import argparse
import pickle
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--context_file", required=True,
                        help="hotword phrases (one per line; with "
                             "--per_utt: key<TAB>phrase<TAB>phrase...)")
    parser.add_argument("--symbol_table", required=True)
    parser.add_argument("--bpe_model", default=None)
    parser.add_argument("--non_lang_syms", default=None)
    parser.add_argument("--per_utt", action="store_true",
                        help="emit a pickled per-utterance dict "
                             "(context_mode 4) instead of id lines")
    parser.add_argument("--output", required=True)
    parser.add_argument("--drop_empty", action="store_true",
                        help="skip phrases that tokenize to nothing")
    args = parser.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from wenet_celoss_tpu.data.tokenizer import Tokenizer
    from wenet_celoss_tpu.utils.file_utils import (read_non_lang_symbols,
                                                   read_symbol_table)

    table = read_symbol_table(args.symbol_table)
    tok = Tokenizer(table, args.bpe_model,
                    read_non_lang_symbols(args.non_lang_syms))

    n = 0
    if args.per_utt:
        dic = {}
        with open(args.context_file, encoding="utf8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if not parts or not parts[0]:
                    continue
                key, phrases = parts[0], parts[1:]
                rows = []
                for p in phrases:
                    _, ids = tok(p.strip())
                    if ids or not args.drop_empty:
                        rows.append(ids)
                        n += 1
                dic[key] = rows
        with open(args.output, "wb") as f:
            pickle.dump(dic, f)
        print(f"Wrote context dict for {len(dic)} utterances "
              f"({n} phrases) to {args.output}")
    else:
        with open(args.context_file, encoding="utf8") as fin, \
                open(args.output, "w", encoding="utf8") as fout:
            for line in fin:
                phrase = line.strip()
                if not phrase:
                    continue
                _, ids = tok(phrase)
                if not ids and args.drop_empty:
                    continue
                fout.write(" ".join(str(i) for i in ids) + "\n")
                n += 1
        print(f"Total Hot Words: {n}")


if __name__ == "__main__":
    main()
