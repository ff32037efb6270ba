"""Batch decoding CLI.

Parity with reference ``wenet/bin/recognize.py:35-378``: 8 decode modes,
context modes 0-4 for the fork's hotword decoding, writes `text` hyp file
(and the hotword-gate edit-distance sidecar for rnnt_greedy_search with
context, reference `recognize.py:374-375`).
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import jax.numpy as jnp
import numpy as np

MODES = [
    "attention", "ctc_greedy_search", "ctc_prefix_beam_search",
    "attention_rescoring", "rnnt_greedy_search", "rnnt_beam_search",
    "rnnt_beam_attn_rescoring", "ctc_beam_td_attn_rescoring",
]


def get_args():
    parser = argparse.ArgumentParser(description="recognize with your model")
    parser.add_argument("--config", required=True)
    parser.add_argument("--data_type", default="raw",
                        choices=["raw", "shard"])
    parser.add_argument("--test_data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--symbol_table", required=True)
    parser.add_argument("--bpe_model", default=None)
    parser.add_argument("--non_lang_syms", default=None)
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--mode", default="attention_rescoring",
                        help="decode mode, or a comma-separated list of "
                             "modes decoded in ONE process (shared "
                             "encoder compiles + dataset pass); with a "
                             "list, per-mode files are written at "
                             "<result_file>.<mode>")
    parser.add_argument("--beam_size", type=int, default=10)
    parser.add_argument("--decoding_chunk_size", type=int, default=-1)
    parser.add_argument("--num_decoding_left_chunks", type=int, default=-1)
    parser.add_argument("--simulate_streaming", action="store_true",
                        help="decode chunk-by-chunk with bounded caches "
                             "(true streaming simulation; requires "
                             "--decoding_chunk_size > 0)")
    parser.add_argument("--ctc_weight", type=float, default=0.0)
    parser.add_argument("--transducer_weight", type=float, default=1.0)
    parser.add_argument("--attn_weight", type=float, default=1.0)
    parser.add_argument("--search_ctc_weight", type=float, default=0.3)
    parser.add_argument("--reverse_weight", type=float, default=0.0)
    parser.add_argument("--override_config", action="append", default=[])
    parser.add_argument("--context_mode", type=int, default=0)
    parser.add_argument("--context_list_file", default=None)
    parser.add_argument("--context_dict", default=None,
                        help="pickled per-utterance hotword dict (mode 4)")
    parser.add_argument("--context_filter_state", default="off",
                        choices=["on", "off", "exact"],
                        help="'on': batched jit gate-consistent decode; "
                             "'exact': reference-exact backtracking repair "
                             "loop (greedy_search.py:110-137)")
    parser.add_argument("--sharded", action="store_true",
                        help="SPMD batch decode: shard each batch over "
                             "all devices (data axis); GSPMD partitions "
                             "the encode + batched searches and inserts "
                             "the collectives. Batches are padded to the "
                             "mesh size and the padding rows dropped.")
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from wenet_celoss_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    from wenet_celoss_tpu.data.dataset import Dataset
    from wenet_celoss_tpu.decode.api import Decoder
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.utils import checkpoint as ckpt
    from wenet_celoss_tpu.utils.config import load_config, override_config
    from wenet_celoss_tpu.utils.file_utils import (
        read_non_lang_symbols, read_symbol_table)
    from wenet_celoss_tpu.utils.wer import edit_distance

    configs = load_config(args.config)
    if args.override_config:
        configs = override_config(configs, args.override_config)

    symbol_table = read_symbol_table(args.symbol_table)
    id2sym = {v: k for k, v in symbol_table.items()}
    non_lang_syms = read_non_lang_symbols(args.non_lang_syms)

    test_conf = dict(configs["dataset_conf"])
    test_conf.update(
        filter=False, speed_perturb=False, spec_aug=False, spec_sub=False,
        shuffle=False, sort=False,
        batch_conf={"batch_type": "static",
                    "batch_size": args.batch_size})
    fbank_conf = dict(test_conf.get("fbank_conf", {}))
    fbank_conf["dither"] = 0.0
    test_conf["fbank_conf"] = fbank_conf
    # Context list (decode-time hotwords) — parsed before the dataset so
    # mode 3 can regenerate per-token hotword labels on the eval batches
    # (the reference's gate-eval path, `recognize.py:374-375`): the
    # processor matches each context phrase against the labels and emits
    # hw_labels, which the rnnt_greedy gate sidecar scores against.
    context_list = context_lengths = None
    context_dict = None
    file_rows = []
    if args.context_mode in (2, 3) and args.context_list_file:
        with open(args.context_list_file) as f:
            for line in f:
                ids = [int(x) for x in line.split()]
                if ids:
                    file_rows.append(ids)
        rows = [[0]] + file_rows
        l_max = max(len(r) for r in rows)
        context_list = np.full((len(rows), l_max), -1, np.int32)
        context_lengths = np.zeros((len(rows),), np.int32)
        for i, r in enumerate(rows):
            context_list[i, :len(r)] = r
            context_lengths[i] = len(r)
    elif args.context_mode == 4 and args.context_dict:
        with open(args.context_dict, "rb") as f:
            context_dict = pickle.load(f)
    if args.context_mode == 3 and file_rows:
        test_conf["context_mode"] = 3
        pad_conf = dict(test_conf.get("pad_conf", {}))
        pad_conf["file_list"] = file_rows
        test_conf["pad_conf"] = pad_conf
    else:
        test_conf["context_mode"] = 0   # context handled at decode time

    dataset = Dataset(args.data_type, args.test_data, symbol_table,
                      test_conf, args.bpe_model, non_lang_syms,
                      partition=False)

    configs.setdefault("input_dim",
                       fbank_conf.get("num_mel_bins", 80))
    configs.setdefault("output_dim", len(symbol_table))
    configs.setdefault("cmvn_file", configs.get("cmvn_file"))
    model = init_model(configs)

    from wenet_celoss_tpu.models.factory import init_example
    ex = init_example(configs)
    variables = model.init(__import__("jax").random.PRNGKey(0), *ex)
    params = variables.copy()
    params["params"] = ckpt.load_checkpoint(variables["params"],
                                            args.checkpoint)
    decoder = Decoder(model, params)

    if args.sharded:
        from wenet_celoss_tpu.decode.sharded import ShardedDecoder
        from wenet_celoss_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(model_parallel=1)
        logging.info("sharded decode over %d devices (collective "
                     "hypothesis exchange over the data axis)", mesh.size)
        decoder = ShardedDecoder(model, params, mesh)
        _modes = [m.strip() for m in args.mode.split(",") if m.strip()]
        unsupported = [m for m in _modes
                       if m not in ShardedDecoder.SUPPORTED_MODES]
        if unsupported:
            logging.warning(
                "--sharded has no SPMD path for mode(s) %r; running the "
                "plain single-program decoder instead", unsupported)
        # Independent of the unsupported-mode diagnostic: the exact-mode
        # fallback must always be surfaced (advisor r3).
        if ("rnnt_greedy_search" in _modes
                and args.context_filter_state == "exact"):
            logging.warning(
                "--sharded: context_filter_state=exact is a host-driven "
                "per-utterance repair loop; falling back to the plain "
                "(unsharded) path for it")

    modes = [m.strip() for m in args.mode.split(",") if m.strip()]
    for m in modes:
        if m not in MODES:
            raise SystemExit(f"unknown mode {m!r}; choices: {MODES}")
    os.makedirs(os.path.dirname(args.result_file) or ".", exist_ok=True)
    gate_dists = []

    def decode_batch(mode, feats, feat_lens, ctx, ctx_lens, kw):
        if mode == "attention":
            return decoder.attention(feats, feat_lens,
                                     beam=args.beam_size, **kw)
        if mode == "ctc_greedy_search":
            return decoder.ctc_greedy_search(feats, feat_lens, **kw)
        if mode == "ctc_prefix_beam_search":
            hyps, _, _, _ = decoder.ctc_prefix_beam_search(
                feats, feat_lens, beam=args.beam_size, **kw)
            if hyps is None:
                raise RuntimeError(
                    "ctc_prefix_beam_search results span non-addressable "
                    "devices (multi-process run); the plain Decoder "
                    "cannot materialize them — use --sharded "
                    "(ShardedDecoder's collective exchange)")
            return [h[0] for h in hyps]
        if mode == "attention_rescoring":
            return decoder.attention_rescoring(
                feats, feat_lens, beam=args.beam_size,
                ctc_weight=args.ctc_weight,
                reverse_weight=args.reverse_weight, **kw)
        if mode == "rnnt_greedy_search":
            return decoder.rnnt_greedy_search(
                feats, feat_lens,
                context_list=(jnp.asarray(ctx) if ctx is not None
                              else None),
                context_lengths=(jnp.asarray(ctx_lens)
                                 if ctx_lens is not None else None),
                context_filter_state=args.context_filter_state)
        if mode == "rnnt_beam_search":
            res, _, _ = decoder.rnnt_beam_search(
                feats, feat_lens, beam=args.beam_size,
                ctc_weight=args.search_ctc_weight,
                transducer_weight=args.transducer_weight,
                context_list=(jnp.asarray(ctx) if ctx is not None
                              else None),
                context_lengths=(jnp.asarray(ctx_lens)
                                 if ctx_lens is not None else None))
            return decoder.rnnt_beam_to_lists(res)
        if mode == "ctc_beam_td_attn_rescoring":
            return decoder.ctc_beam_td_attn_rescoring(
                feats, feat_lens, beam=args.beam_size,
                ctc_weight=args.ctc_weight,
                transducer_weight=args.transducer_weight,
                attn_weight=args.attn_weight,
                reverse_weight=args.reverse_weight, **kw)
        if mode == "rnnt_beam_attn_rescoring":
            return decoder.rnnt_beam_attn_rescoring(
                feats, feat_lens, beam=args.beam_size,
                attn_weight=args.attn_weight,
                transducer_weight=args.transducer_weight,
                search_ctc_weight=args.search_ctc_weight,
                reverse_weight=args.reverse_weight,
                context_list=(jnp.asarray(ctx) if ctx is not None
                              else None),
                context_lengths=(jnp.asarray(ctx_lens)
                                 if ctx_lens is not None else None))
        raise ValueError(mode)

    def out_path(mode):
        return args.result_file if len(modes) == 1 \
            else f"{args.result_file}.{mode}"

    fouts = {m: open(out_path(m), "w", encoding="utf8") for m in modes}
    try:
        for batch in iter(dataset):
            feats = jnp.asarray(batch["feats"])
            feat_lens = jnp.asarray(batch["feat_lengths"])
            n_real = feats.shape[0]
            # --sharded: ShardedDecoder pads the batch to the data-axis
            # size, runs SPMD, and exchanges results collectively; no
            # host-side padding plumbing needed here.
            ctx, ctx_lens = context_list, context_lengths
            if context_dict is not None:
                rows = [[0]] + [list(r) for r in
                                context_dict.get(batch["keys"][0], [])]
                l_max = max(len(r) for r in rows)
                ctx = np.full((len(rows), l_max), -1, np.int32)
                ctx_lens = np.zeros((len(rows),), np.int32)
                for i, r in enumerate(rows):
                    ctx[i, :len(r)] = r
                    ctx_lens[i] = len(r)
            kw = {}
            if args.decoding_chunk_size > 0:
                kw = dict(
                    decoding_chunk_size=args.decoding_chunk_size,
                    num_decoding_left_chunks=args.num_decoding_left_chunks,
                    simulate_streaming=args.simulate_streaming)
            for mode in modes:
                hyps = decode_batch(mode, feats, feat_lens, ctx,
                                    ctx_lens, kw)
                hyps = hyps[:n_real]   # drop mesh-evenness padding rows
                for key, hyp in zip(batch["keys"], hyps):
                    content = "".join(id2sym.get(t, "<unk>")
                                      for t in hyp)
                    content = content.replace("▁", " ").strip()
                    logging.info("[%s] %s %s", mode, key, content)
                    fouts[mode].write(f"{key} {content}\n")
                # Hotword-gate edit distance sidecar (reference
                # `recognize.py:374-375`).
                if (mode == "rnnt_greedy_search"
                        and hasattr(decoder, "last_gates")
                        and "hw_labels" in batch):
                    gates, glens = decoder.last_gates
                    gates = np.asarray(gates)
                    for i in range(gates.shape[0]):
                        ref = [x for x in batch["hw_labels"][i] if x >= 0]
                        hyp_g = list(gates[i, :glens[i]])
                        gate_dists.append(edit_distance(ref, hyp_g))
    finally:
        for f in fouts.values():
            f.close()
    if gate_dists:
        with open(args.result_file + ".gate_dist", "w") as f:
            f.write(f"<result>{sum(gate_dists)}\n")


if __name__ == "__main__":
    main()
