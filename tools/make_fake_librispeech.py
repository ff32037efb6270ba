"""Fabricate a LibriSpeech-shaped directory tree (FLAC + trans.txt).

`run.sh --dryrun` points LIBRISPEECH_DATA at this tree so the recipe's
REAL-data branches — the `find`-over-.flac wav.scp prep, trans.txt
concatenation, FLAC decode through cmvn/train/decode, and the C++
runtime's FLAC read — all execute end to end without the corpus
(reference layout: ``examples/librispeech/s0/run.sh:47-120`` expects
``<root>/<part>/<spk>/<chap>/<spk>-<chap>-NNNN.flac`` next to
``<spk>-<chap>.trans.txt`` with UPPERCASE transcripts).

Audio reuses the smoke corpus' word→tone synthesis (make_smoke_data.py)
so the mapping stays learnable; files are encoded with the from-scratch
FLAC encoder (tools/flac_encode.py, LPC subframes — the type real
LibriSpeech encodes use).
"""

import argparse
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flac_encode import encode_flac  # noqa: E402
from make_smoke_data import WORDS, utt_wav  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--parts", nargs="+", required=True)
    ap.add_argument("--n_utts", type=int, default=12)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for part in args.parts:
        spk, chap = str(100 + zlib.crc32(part.encode()) % 100), "1001"
        cdir = os.path.join(args.out_dir, part, spk, chap)
        os.makedirs(cdir, exist_ok=True)
        trans = []
        for i in range(args.n_utts):
            key = f"{spk}-{chap}-{i:04d}"
            words = list(rng.choice(WORDS, size=int(rng.integers(3, 7))))
            wav = utt_wav(words, args.sr, rng)
            data = encode_flac(
                np.clip(np.round(wav), -32768, 32767).astype(np.int32),
                args.sr, mode="lpc")
            with open(os.path.join(cdir, key + ".flac"), "wb") as f:
                f.write(data)
            trans.append(f"{key} {' '.join(w.upper() for w in words)}")
        with open(os.path.join(cdir, f"{spk}-{chap}.trans.txt"), "w") as f:
            f.write("\n".join(trans) + "\n")
        print(f"{part}: {args.n_utts} utts under {cdir}")


if __name__ == "__main__":
    main()
