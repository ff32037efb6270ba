"""JAX/TPU inference worker for the C++ serving runtime.

Counterpart of ``runtime/core/decoder/subprocess_asr_model.h`` — speaks the
framed protocol over stdin/stdout; holds ONE compiled streaming program
(fixed window, fixed-size caches) and the accumulated encoder outputs for
attention rescoring. This is the TPU-native replacement for the reference's
in-process TorchScript engine (`runtime/core/decoder/torch_asr_model.cc`):
the accelerator math stays in JAX; C++ owns IO/search/serving.

Protocol (little-endian):
  in : 'I' u32(len) cfg_json?   → out: 'M' u32(len) meta_json
  in : 'F' u32(T) u32(D) f32[T*D] → out: 'O' u32(T') u32(V) f32[T'*V]
  in : 'R' u32(N) f32(rw) { u32(L) i32[L] }*N → out: 'S' u32(N) f32[N]
  in : 'B' u32(beam) → out: 'N' u32(n) { u32(L) i32[L] f32(score) }*n
  in : 'Q' → exit
"""

from __future__ import annotations

import argparse
import json
import struct
import sys

import numpy as np


def read_exact(f, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise EOFError
        buf += chunk
    return buf


class Worker:
    def __init__(self, args):
        import jax

        from wenet_celoss_tpu.models.factory import init_model
        from wenet_celoss_tpu.utils import checkpoint as ckpt
        from wenet_celoss_tpu.utils.config import load_config

        self.jax = jax
        configs = load_config(args.config)
        self.configs = configs
        self.chunk_size = args.chunk_size
        self.num_left_chunks = args.num_left_chunks
        self.model = init_model(configs)
        import jax.numpy as jnp
        self.jnp = jnp

        from wenet_celoss_tpu.models.factory import init_example
        ex = init_example(configs)   # incl. context tower if configured
        variables = self.model.init(jax.random.PRNGKey(0), *ex)
        if args.checkpoint:
            variables["params"] = ckpt.load_checkpoint(
                variables["params"], args.checkpoint)
        self.variables = variables

        enc = self.model.encoder
        self.subsampling_rate = enc.subsampling_rate
        self.right_context = enc.right_context
        self.window = (self.chunk_size - 1) * self.subsampling_rate \
            + self.right_context + 1
        self.stride = self.chunk_size * self.subsampling_rate

        # Non-causal conformers have no conv-cache streaming formulation;
        # serve them by recomputing the chunk-masked full prefix each
        # chunk and emitting only the new frames (quadratic in utterance
        # length, exact; the reference's --simulate_streaming analog).
        self.streamable = not (getattr(enc, "use_cnn_module", False)
                               and not getattr(enc, "causal", False))
        if self.streamable:
            self._fwd = jax.jit(lambda xs, cache: self.model.apply(
                self.variables, xs, cache,
                method="encoder_forward_chunk_ctc"))
        else:
            left = self.num_left_chunks if self.num_left_chunks > 0 else -1
            self._fwd_full = jax.jit(
                lambda xs, lens: self.model.apply(
                    self.variables, xs, lens, self.chunk_size, left,
                    method="encode_ctc"))
        self.is_transducer = hasattr(self.model, "predictor") and \
            self.model.predictor is not None
        if self.is_transducer:
            from wenet_celoss_tpu.decode.rnnt_greedy import (
                rnnt_greedy_chunk)

            def predictor_step(tok, state, padding=None):
                return self.model.apply(self.variables, tok, state, padding,
                                        method="predictor_step")

            def joint_step(enc_t, pred_u):
                return self.model.apply(self.variables, enc_t, pred_u,
                                        method="joint_step")

            self._greedy_chunk = jax.jit(
                lambda enc, carry: rnnt_greedy_chunk(
                    predictor_step, joint_step, carry, enc,
                    blank=self.model.blank, n_steps=4))
        self.reset()

    def reset(self):
        self.cache = self.model.apply(
            self.variables, 1, self.chunk_size * max(self.num_left_chunks, 1)
            if self.num_left_chunks > 0 else self.chunk_size * 4,
            method="encoder_init_cache")
        self.feat_buffer = np.zeros((0, self.configs["input_dim"]),
                                    np.float32)
        self.encoder_outs = []
        self.greedy_carry = None
        self.greedy_consumed = 0
        # non-streamable fallback state
        self.full_buffer = np.zeros((0, self.configs["input_dim"]),
                                    np.float32)
        self.emitted = 0

    def meta(self) -> dict:
        return {
            "subsampling_rate": self.subsampling_rate,
            "right_context": self.right_context,
            "sos": self.model.sos,
            "eos": self.model.eos,
        }

    def forward_chunk(self, feats: np.ndarray) -> np.ndarray:
        """Append raw frames; process every complete window; return the new
        subsampled CTC log-probs. A final short tail (signalled by an empty
        feats array) is zero-padded to the window."""
        if not self.streamable:
            return self._forward_chunk_full(feats)
        if feats.shape[0] > 0:
            self.feat_buffer = np.concatenate(
                [self.feat_buffer, feats.reshape(feats.shape[0], -1)],
                axis=0)
        outs = []
        flush = feats.shape[0] == 0
        while self.feat_buffer.shape[0] >= self.window or (
                flush and self.feat_buffer.shape[0] > self.right_context):
            win = self.feat_buffer[:self.window]
            if win.shape[0] < self.window:
                win = np.concatenate(
                    [win, np.zeros((self.window - win.shape[0],
                                    win.shape[1]), np.float32)], axis=0)
            ys, ctc_lp, self.cache = self._fwd(
                self.jnp.asarray(win[None]), self.cache)
            self.encoder_outs.append(np.asarray(ys[0]))
            outs.append(np.asarray(ctc_lp[0]))
            self.feat_buffer = self.feat_buffer[self.stride:]
            if flush and self.feat_buffer.shape[0] == 0:
                break
        if outs:
            return np.concatenate(outs, axis=0)
        dim_v = self.configs["output_dim"]
        return np.zeros((0, dim_v), np.float32)

    def _forward_chunk_full(self, feats: np.ndarray) -> np.ndarray:
        """Non-streamable fallback: chunk-masked full forward over the
        whole accumulated prefix, emitting frames past what was already
        returned. Lengths are padded to stride multiples so jit compiles a
        bounded set of programs."""
        flush = feats.shape[0] == 0
        if not flush:
            self.full_buffer = np.concatenate(
                [self.full_buffer, feats.reshape(feats.shape[0], -1)],
                axis=0)
        n = self.full_buffer.shape[0]
        # frames the subsampler can fully see (right context consumed)
        usable = n if flush else (n - self.right_context)
        ready = (usable - (self.emitted * self.subsampling_rate)) \
            >= self.stride
        if not (ready or (flush and n > self.right_context)):
            return np.zeros((0, self.configs["output_dim"]), np.float32)
        pad_t = -(-n // self.stride) * self.stride
        xs = np.zeros((1, pad_t, self.full_buffer.shape[1]), np.float32)
        xs[0, :n] = self.full_buffer
        ys, mask, ctc_lp = self._fwd_full(
            self.jnp.asarray(xs), self.jnp.asarray([n], np.int32))
        valid = int(np.asarray(mask[0]).sum())
        if not flush:
            # hold back frames whose conv window peeks past the buffer
            full_frames = max(
                (usable - self.right_context) // self.subsampling_rate, 0)
            valid = min(valid, full_frames)
        if valid <= self.emitted:
            return np.zeros((0, self.configs["output_dim"]), np.float32)
        new_lp = np.asarray(ctc_lp[0][self.emitted:valid])
        new_ys = np.asarray(ys[0][self.emitted:valid])
        self.encoder_outs.append(new_ys)
        self.emitted = valid
        return new_lp

    def greedy_new_tokens(self) -> list:
        """Incrementally transducer-greedy-decode encoder frames produced
        since the last call (serving analog of the reference's streaming
        RnntGreedySearch, `runtime/core/decoder/rnnt_greedy_search.cc`)."""
        if not self.is_transducer or not self.encoder_outs:
            return []
        full = np.concatenate(self.encoder_outs, axis=0)
        new = full[self.greedy_consumed:]
        if new.shape[0] == 0:
            return []
        if self.greedy_carry is None:
            import jax.numpy as jnp
            b = 1
            state = self.model.apply(self.variables, b,
                                     method="predictor_init_state")
            pred0, state = self.model.apply(
                self.variables, jnp.full((b,), self.model.blank, jnp.int32),
                state, jnp.zeros((b,), jnp.int32), method="predictor_step")
            self.greedy_carry = (pred0, state)
        toks = []
        # One compiled program per chunk length; serving uses a fixed
        # chunk so this stays at one or two compilations.
        tokens, lens, self.greedy_carry = self._greedy_chunk(
            self.jnp.asarray(new[None]), self.greedy_carry)
        toks = [int(x) for x in np.asarray(tokens[0][: int(lens[0])])]
        self.greedy_consumed = full.shape[0]
        return toks

    def rnnt_beam(self, beam: int):
        """Utterance-final transducer prefix beam over ALL accumulated
        encoder frames → [(tokens, score)] best-first. Completes the
        serving capability the reference left unfinished
        (`runtime/core/decoder/rnnt_prefix_beam_search.cc`): the search
        itself is the batched jit `rnnt_prefix_beam_search`; C++ calls
        this at FinalizeSearch time."""
        if not self.is_transducer or not self.encoder_outs:
            return []
        from wenet_celoss_tpu.decode.rnnt_beam import rnnt_prefix_beam_search
        jnp = self.jnp
        enc = np.concatenate(self.encoder_outs, axis=0)
        t = enc.shape[0]
        # Pad T to a bucket so recompilation is bounded (compile cache
        # keys on shape).
        t_pad = max(64, -(-t // 64) * 64)
        enc = np.pad(enc, ((0, t_pad - t), (0, 0)))

        def predictor_step(tok, state, padding=None):
            return self.model.apply(self.variables, tok, state, padding,
                                    method="predictor_step")

        def joint_step(enc_t, pred_u):
            return self.model.apply(self.variables, enc_t, pred_u,
                                    method="joint_step")

        init_state = self.model.apply(self.variables, beam,
                                      method="predictor_init_state")
        state_gather = None
        if type(self.model.predictor).__name__ == "RNNPredictor":
            state_gather = lambda st, idx: self.jax.tree_util.tree_map(
                lambda x: x[:, idx], st)
        res = rnnt_prefix_beam_search(
            predictor_step, joint_step, init_state,
            jnp.asarray(enc[None]), jnp.asarray([t]), beam=beam,
            topk=min(beam, 10), blank=self.model.blank,
            state_gather=state_gather)
        toks = np.asarray(res["tokens"][0])
        lens = np.asarray(res["lens"][0])
        scores = np.asarray(res["scores"][0])
        out = []
        for i in range(toks.shape[0]):
            if scores[i] < -1e20:
                continue
            out.append(([int(x) for x in toks[i, :lens[i]]],
                        float(scores[i])))
        return out

    def rescore(self, hyps, reverse_weight: float) -> np.ndarray:
        """Attention rescoring of an n-best list — ONE jitted program.

        The first version ran the decoder via eager ``model.apply``:
        per-op dispatch made the finalize cost 5.6 s per 9.6 s utterance
        (99% of the serving stack's offline RTF; r5 stage attribution in
        tools/bench_runtime.py). Shapes are bucketed (T′ to 64 frames,
        U to 8 labels) so the jit compiles a bounded program set, with
        padding masked out exactly as the batched decode path does."""
        if not self.encoder_outs:
            return np.zeros((len(hyps),), np.float32)
        jnp = self.jnp
        enc = np.concatenate(self.encoder_outs, axis=0)
        t = enc.shape[0]
        t_pad = max(64, -(-t // 64) * 64)
        enc = np.pad(enc, ((0, t_pad - t), (0, 0)))
        memory = jnp.asarray(enc[None])
        mask = jnp.asarray((np.arange(t_pad) < t)[None])
        # Coarse buckets (U to 32, N to 16): per-utterance n-best shape
        # wobble otherwise forces a compile-cache load per utterance
        # (~0.9 s each — it, not the math, was 95% of the measured
        # rescore stage; warm same-shape rescore is ~30 ms).
        n = len(hyps)
        n_pad = -(-max(n, 1) // 16) * 16
        u_max = max(max((len(h) for h in hyps), default=1), 1)
        u_pad = -(-u_max // 32) * 32
        toks = np.full((1, n_pad, u_pad), -1, np.int32)
        lens = np.zeros((1, n_pad), np.int32)
        for i, h in enumerate(hyps):
            toks[0, i, :len(h)] = h
            lens[0, i] = len(h)

        if getattr(self, "_rescore_rw", None) != reverse_weight:
            from wenet_celoss_tpu.decode.rescoring import \
                score_hyps_with_decoder

            def fn(memory, mask, toks, lens):
                def scores_fn(mem, m, hin, hlens, rin, rw):
                    return self.model.apply(self.variables, mem, m, hin,
                                            hlens, rin, rw,
                                            method="decoder_scores")
                return score_hyps_with_decoder(
                    scores_fn, memory, mask, toks, lens, self.model.sos,
                    self.model.eos, reverse_weight)

            self._rescore_jit = self.jax.jit(fn)
            self._rescore_rw = reverse_weight
        att = self._rescore_jit(memory, mask, jnp.asarray(toks),
                                jnp.asarray(lens))
        return np.asarray(att[0][:n], np.float32)


def main():
    from wenet_celoss_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--chunk_size", type=int, default=16)
    parser.add_argument("--num_left_chunks", type=int, default=-1)
    args = parser.parse_args()

    worker = Worker(args)
    fin = sys.stdin.buffer
    fout = sys.stdout.buffer

    while True:
        try:
            tag = read_exact(fin, 1)
        except EOFError:
            return
        if tag == b"Q":
            return
        if tag == b"I":
            (cfg_len,) = struct.unpack("<I", read_exact(fin, 4))
            if cfg_len:
                read_exact(fin, cfg_len)
            worker.reset()
            meta = json.dumps(worker.meta()).encode()
            fout.write(b"M" + struct.pack("<I", len(meta)) + meta)
            fout.flush()
        elif tag == b"F":
            t, d = struct.unpack("<II", read_exact(fin, 8))
            data = np.frombuffer(read_exact(fin, 4 * t * d),
                                 np.float32).reshape(t, d)
            out = worker.forward_chunk(data)
            fout.write(b"O" + struct.pack("<II", out.shape[0],
                                          out.shape[1]))
            fout.write(out.astype("<f4").tobytes())
            fout.flush()
        elif tag == b"G":
            toks = worker.greedy_new_tokens()
            fout.write(b"T" + struct.pack("<I", len(toks)))
            fout.write(np.asarray(toks, "<i4").tobytes())
            fout.flush()
        elif tag == b"B":
            (beam,) = struct.unpack("<I", read_exact(fin, 4))
            nbest = worker.rnnt_beam(int(beam))
            fout.write(b"N" + struct.pack("<I", len(nbest)))
            for toks, score in nbest:
                fout.write(struct.pack("<I", len(toks)))
                fout.write(np.asarray(toks, "<i4").tobytes())
                fout.write(struct.pack("<f", score))
            fout.flush()
        elif tag == b"R":
            (n,) = struct.unpack("<I", read_exact(fin, 4))
            (rw,) = struct.unpack("<f", read_exact(fin, 4))
            hyps = []
            for _ in range(n):
                (l,) = struct.unpack("<I", read_exact(fin, 4))
                hyps.append(list(np.frombuffer(read_exact(fin, 4 * l),
                                               "<i4")))
            scores = worker.rescore(hyps, rw)
            fout.write(b"S" + struct.pack("<I", len(scores)))
            fout.write(scores.astype("<f4").tobytes())
            fout.flush()
        else:
            raise RuntimeError(f"unknown tag {tag!r}")


if __name__ == "__main__":
    main()
