"""CTC forced-alignment CLI (reference ``wenet/bin/alignment.py:37-235``):
per-utterance token timestamps via batched Viterbi over the CTC topology,
written as Praat TextGrid files."""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np


def generator_textgrid(maxtime, lines, output):
    """Write a Praat TextGrid (reference `alignment.py:37-76`)."""
    intervals = []
    for line in lines:
        start, end, label = line.split()
        intervals.append((float(start), float(end), label))
    with open(output, "w", encoding="utf8") as f:
        f.write('File type = "ooTextFile"\nObject class = "TextGrid"\n\n')
        f.write(f"xmin = 0\nxmax = {maxtime}\n")
        f.write("tiers? <exists>\nsize = 1\nitem []:\n")
        f.write('    item [1]:\n        class = "IntervalTier"\n')
        f.write('        name = "token"\n')
        f.write(f"        xmin = 0\n        xmax = {maxtime}\n")
        f.write(f"        intervals: size = {len(intervals)}\n")
        for i, (s, e, lab) in enumerate(intervals, 1):
            f.write(f"        intervals [{i}]:\n")
            f.write(f"            xmin = {s}\n            xmax = {e}\n")
            f.write(f'            text = "{lab}"\n')


def get_frames_timestamp(alignment, blank: int = 0):
    """Frame path → [start, end) frame spans per emitted token
    (reference `alignment.py:79-113` semantics)."""
    spans = []
    t = 0
    n = len(alignment)
    while t < n:
        if alignment[t] == blank:
            t += 1
            continue
        tok = alignment[t]
        start = t
        while t < n and alignment[t] == tok:
            t += 1
        spans.append((start, t, int(tok)))
    return spans


def main():
    from wenet_celoss_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="ctc forced alignment")
    parser.add_argument("--config", required=True)
    parser.add_argument("--data_type", default="raw")
    parser.add_argument("--input_data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--symbol_table", required=True)
    parser.add_argument("--bpe_model", default=None)
    parser.add_argument("--non_lang_syms", default=None)
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--gen_praat", action="store_true")
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    from wenet_celoss_tpu.data.dataset import Dataset
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.ops.ctc_loss import ctc_forced_align
    from wenet_celoss_tpu.utils import checkpoint as ckpt
    from wenet_celoss_tpu.utils.config import load_config
    from wenet_celoss_tpu.utils.file_utils import (
        read_non_lang_symbols, read_symbol_table)

    configs = load_config(args.config)
    symbol_table = read_symbol_table(args.symbol_table)
    id2sym = {v: k for k, v in symbol_table.items()}
    conf = dict(configs["dataset_conf"])
    conf.update(filter=False, speed_perturb=False, spec_aug=False,
                spec_sub=False, shuffle=False, sort=False,
                batch_conf={"batch_type": "static",
                            "batch_size": args.batch_size})
    conf["fbank_conf"] = dict(conf.get("fbank_conf", {}), dither=0.0)
    dataset = Dataset(args.data_type, args.input_data, symbol_table, conf,
                      args.bpe_model,
                      read_non_lang_symbols(args.non_lang_syms),
                      partition=False)

    configs.setdefault("input_dim",
                       conf["fbank_conf"].get("num_mel_bins", 80))
    configs.setdefault("output_dim", len(symbol_table))
    model = init_model(configs)
    from wenet_celoss_tpu.models.factory import init_example
    ex = init_example(configs)   # incl. context tower when configured
    variables = model.init(jax.random.PRNGKey(0), *ex)
    variables["params"] = ckpt.load_checkpoint(variables["params"],
                                               args.checkpoint)

    subsample = model.encoder.subsampling_rate
    frame_shift_s = conf["fbank_conf"].get("frame_shift", 10) / 1000.0
    os.makedirs(os.path.dirname(args.result_file) or ".", exist_ok=True)
    with open(args.result_file, "w", encoding="utf8") as fout:
        for batch in iter(dataset):
            enc, mask, ctc_lp = model.apply(
                variables, jnp.asarray(batch["feats"]),
                jnp.asarray(batch["feat_lengths"]), method="encode_ctc")
            enc_lens = jnp.sum(mask.astype(jnp.int32), axis=1)
            path = np.asarray(ctc_forced_align(
                ctc_lp, jnp.asarray(np.maximum(batch["labels"], 0)),
                enc_lens, jnp.asarray(batch["label_lengths"])))
            for i, key in enumerate(batch["keys"]):
                ali = path[i, :int(enc_lens[i])]
                fout.write(f"{key} {' '.join(str(int(x)) for x in ali)}\n")
                if args.gen_praat:
                    spans = get_frames_timestamp(ali)
                    lines = []
                    for s, e, tok in spans:
                        t0 = s * subsample * frame_shift_s
                        t1 = e * subsample * frame_shift_s
                        lines.append(
                            f"{t0:.3f} {t1:.3f} {id2sym.get(tok, '<unk>')}")
                    maxtime = float(enc_lens[i]) * subsample * frame_shift_s
                    generator_textgrid(
                        maxtime, lines,
                        os.path.join(
                            os.path.dirname(args.result_file) or ".",
                            f"{key}.TextGrid"))


if __name__ == "__main__":
    main()
