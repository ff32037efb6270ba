"""Generate a tiny synthetic LibriSpeech-like dataset for recipe smoke runs.

Writes data/<part>/{wav.scp,text} with short noise+tone wavs and random
transcripts over a small word list, so examples/librispeech/run.sh --smoke
can drive every stage (cmvn → spm → train → decode → export → runtime)
without the real corpus.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "hello", "world", "speech", "model"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="data")
    ap.add_argument("--parts", nargs="+",
                    default=["train-clean-100", "dev-clean", "test-clean"])
    ap.add_argument("--n_utts", type=int, default=8)
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args()

    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(0)
    for part in args.parts:
        pdir = os.path.join(args.out_dir, part)
        wdir = os.path.join(pdir, "wavs")
        os.makedirs(wdir, exist_ok=True)
        scp, txt = [], []
        for i in range(args.n_utts):
            key = f"{part}-u{i:03d}"
            dur = args.sr + int(rng.integers(0, args.sr // 2))
            t = np.arange(dur) / args.sr
            f0 = 200.0 + 50.0 * float(rng.integers(0, 8))
            wav = (np.sin(2 * np.pi * f0 * t) * 3000
                   + rng.standard_normal(dur) * 300).astype(np.float32)
            path = os.path.abspath(os.path.join(wdir, key + ".wav"))
            write_wav(path, wav, args.sr)
            words = rng.choice(WORDS, size=int(rng.integers(2, 6)))
            scp.append(f"{key} {path}")
            txt.append(f"{key} {' '.join(words).upper()}")
        with open(os.path.join(pdir, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(pdir, "text"), "w") as f:
            f.write("\n".join(txt) + "\n")
        print(f"{part}: {args.n_utts} utts under {pdir}")


if __name__ == "__main__":
    main()
