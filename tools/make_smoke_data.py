"""Generate a tiny synthetic LibriSpeech-like dataset for recipe smoke runs.

Writes data/<part>/{wav.scp,text} so examples/librispeech/run.sh --smoke
can drive every stage (cmvn → spm → train → decode → export → runtime)
without the real corpus — AND gate accuracy: each word maps to a FIXED
pure tone (word i → distinct frequency), a wav is the concatenation of
its words' tones plus light noise, so the acoustic→text mapping is
genuinely learnable. A tiny model trained on the train part must decode
the held-out test part (different word sequences, same word inventory)
to near-zero WER; the recipe asserts that, making the smoke an accuracy
regression gate (the in-image stand-in for the reference's WER-table
recipe checks, examples/librispeech/s0/README.md).

The ``--confuse HOT:COMMON`` variant builds a HOTWORD-BIASING gate corpus
(recipe stage 4b): both words get the IDENTICAL tone, train parts sample
COMMON 3x as often as HOT (so the acoustic prior resolves the ambiguity
toward COMMON), and test parts exclude COMMON while forcing HOT into
every utterance. An unbiased decode of the test set must then transcribe
HOT's tone as COMMON (learned prior), while a decode biased with a
context list containing HOT should recover it — the fork's own success
criterion (reference `wenet/bin/recognize.py:374-375` gate eval), gated
at recipe level instead of only in a unit test.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "hello", "world", "speech", "model"]
# One tone per word, spread across the fbank band (well below nyquist).
FREQS = [300.0 * (1.22 ** i) for i in range(len(WORDS))]


def utt_wav(words, sr, rng, seg_s=0.25, amp=6000.0, noise=60.0):
    segs = []
    for w in words:
        f0 = FREQS[WORDS.index(w)]
        t = np.arange(int(sr * seg_s)) / sr
        segs.append(np.sin(2 * np.pi * f0 * t) * amp)
    wav = np.concatenate(segs)
    return (wav + rng.standard_normal(wav.shape) * noise).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="data")
    ap.add_argument("--parts", nargs="+",
                    default=["train-clean-100", "dev-clean", "test-clean"])
    ap.add_argument("--n_utts", type=int, default=32)
    ap.add_argument("--n_test_utts", type=int, default=8)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--confuse", default=None, metavar="HOT:COMMON",
                    help="hotword-gate corpus: give HOT and COMMON the "
                         "identical tone, oversample COMMON 3x in train "
                         "parts, and make non-train parts hotword-rich "
                         "(COMMON excluded, HOT forced into every utt)")
    args = ap.parse_args()

    hot = common = None
    if args.confuse:
        hot, common = args.confuse.split(":")
        FREQS[WORDS.index(common)] = FREQS[WORDS.index(hot)]

    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(0)
    for part in args.parts:
        n = args.n_utts if part.startswith("train") else args.n_test_utts
        pdir = os.path.join(args.out_dir, part)
        wdir = os.path.join(pdir, "wavs")
        os.makedirs(wdir, exist_ok=True)
        scp, txt = [], []
        for i in range(n):
            key = f"{part}-u{i:03d}"
            if hot and part.startswith("train"):
                w = np.ones(len(WORDS))
                w[WORDS.index(common)] = 3.0
                words = list(rng.choice(WORDS,
                                        size=int(rng.integers(3, 7)),
                                        p=w / w.sum()))
            elif hot:
                pool = [x for x in WORDS if x != common]
                words = list(rng.choice(pool,
                                        size=int(rng.integers(3, 7))))
                if hot not in words:
                    words[int(rng.integers(0, len(words)))] = hot
            else:
                words = list(rng.choice(WORDS,
                                        size=int(rng.integers(3, 7))))
            wav = utt_wav(words, args.sr, rng)
            path = os.path.abspath(os.path.join(wdir, key + ".wav"))
            write_wav(path, wav, args.sr)
            scp.append(f"{key} {path}")
            txt.append(f"{key} {' '.join(words).upper()}")
        with open(os.path.join(pdir, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(pdir, "text"), "w") as f:
            f.write("\n".join(txt) + "\n")
        print(f"{part}: {n} utts")


if __name__ == "__main__":
    main()
