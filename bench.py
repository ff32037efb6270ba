"""Benchmark: training + decode throughput of the flagship conformer-RNN-T
+ bias model on one chip, in audio-seconds per second per chip.

Default invocation prints ONE JSON line:
  {"metric": "train_throughput_conformer_rnnt_bias", "value", "unit",
   "vs_baseline", "mfu", "mfu_xla", "decode_ctc_greedy",
   "decode_rnnt_greedy", "decode_streaming_ctc_greedy"}
— the train number is the headline metric; the decode keys are the
batched full-context searches and the chunk-16 simulated-streaming
decode BASELINE.json asks for alongside it.

``mfu`` uses an ANALYTIC model-FLOP count (utils/flops.py): XLA's
cost_analysis cannot see FLOPs inside Pallas custom calls, and the
flagship step runs its FFN tower and the streaming-joint vocab matmul
(the densest matmuls in the program) in Pallas by default — the XLA
figure (kept as ``mfu_xla`` for comparison) is an undercount.

The reference publishes no in-tree throughput numbers (BASELINE.md), so
vs_baseline is against this project's own recorded BENCH_BASELINE.json.

``--decode`` prints the decode benches as separate JSON lines (one per
mode) without running the train bench; ``--train-only`` skips decode.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# bf16 peak matmul throughput per chip, for the MFU estimate.
_PEAK_FLOPS = {"v5e": 197e12, "v5p": 459e12, "v4": 275e12}


def _peak() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return _PEAK_FLOPS.get(gen, 197e12)


def _vs_baseline(value: float, key: str = "value") -> float:
    if os.path.exists("BENCH_BASELINE.json"):
        try:
            with open("BENCH_BASELINE.json") as f:
                base = json.load(f).get(key, 0.0)
            if base > 0:
                return value / base
        except Exception:
            pass
    return 1.0


# The axon tunnel platform throws transient transport errors
# (`remote_compile: read body: response body closed`, UNAVAILABLE, …); one
# such flake during warmup cost round 4 its entire perf record
# (BENCH_r04.json rc=1). Every compile/timing section is wrapped in a
# bounded retry, and the record is emitted incrementally (train headline
# first) so a late crash cannot erase what already succeeded.
_TRANSIENT_MARKERS = (
    "transport", "read body", "remote_compile", "unavailable", "deadline",
    "connection", "socket", "cancelled", "body closed", "internal: ")


def _is_transient(e) -> bool:
    name = type(e).__name__
    if name in ("XlaRuntimeError", "JaxRuntimeError"):
        return True
    s = f"{type(e).__name__}: {e}".lower()
    return any(m in s for m in _TRANSIENT_MARKERS)


def _retry(fn, attempts=3, desc="bench section", is_transient=None,
           sleep=time.sleep):
    """Run fn(), retrying up to `attempts` total tries on transient
    platform failures. Non-transient exceptions propagate immediately."""
    check = is_transient or _is_transient
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if i == attempts - 1 or not check(e):
                raise
            print(f"{desc}: transient failure (attempt {i + 1}/"
                  f"{attempts}): {e!r}; retrying", file=sys.stderr)
            sleep(2.0 * (i + 1))


def _rate_stats(fn, audio_s, iters, windows):
    """{median, min, max} audio-s/s over probe-synced windows. fn() must
    force real completion (host materialisation) — block_until_ready is
    unreliable on the axon platform. The spread makes axon-tunnel noise
    (±20% run-to-run) visible in the recorded artifact."""
    _retry(fn, desc="decode warmup")  # warmup/compile
    rates = []
    for _ in range(windows):
        def _window():
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            return time.perf_counter() - t0
        dt = _retry(_window, desc="decode window")
        rates.append(audio_s * iters / dt)
    rates.sort()
    return {"median": rates[len(rates) // 2],
            "min": rates[0], "max": rates[-1]}


def bench_decode(emit=print):
    """Batched decode throughput on one chip: audio-s/s for ctc_greedy
    (full-context encoder + frame argmax), rnnt_greedy (encoder + the
    frame-scan emit loop), and chunk-16 simulated-streaming ctc_greedy on
    the causal U2++ conformer (the configuration the U2 design exists
    for). Synthetic fbank input; decode math identical to recognize.py's
    batched searches. Returns {name: audio_s/s}."""
    from wenet_celoss_tpu.configs import conformer_rnnt_bias, u2pp_conformer
    from wenet_celoss_tpu.decode.api import Decoder
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.utils.platform import (configure_tpu_runtime,
                                                 enable_compilation_cache)

    configure_tpu_runtime()
    enable_compilation_cache()
    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    cfg = conformer_rnnt_bias(tiny=tiny, vocab_size=1024)
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = init_model(cfg)

    b = int(os.environ.get("BENCH_DECODE_BATCH", "64"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))
    rng = np.random.default_rng(0)
    v = cfg["output_dim"]
    feats = jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32)
    lens = jnp.full((b,), t, jnp.int32)
    init_args = (feats[:2], lens[:2],
                 jnp.asarray(rng.integers(1, v - 2, (2, 8)), jnp.int32),
                 jnp.full((2,), 8, jnp.int32),
                 jnp.asarray(rng.integers(1, v - 2, (4, 3)), jnp.int32),
                 jnp.full((4,), 3, jnp.int32),
                 jnp.asarray(rng.integers(0, 2, (2, 8)), jnp.int32))
    variables = model.init(jax.random.PRNGKey(0), *init_args)
    # A randomly-initialized transducer argmaxes non-blank on ~every
    # frame, driving greedy search down its degenerate worst-case path
    # (u_max emissions); trained ASR models emit ≈ one token per word.
    # Bias the joint's output layer toward blank so the benched emission
    # rate matches production behavior (env BENCH_BLANK_BIAS to vary).
    blank_bias = float(os.environ.get("BENCH_BLANK_BIAS", "4.0"))
    if blank_bias != 0.0:
        p = jax.tree_util.tree_map(lambda x: x, variables["params"])
        bias = p["joint"]["ffn_out"]["bias"]
        p["joint"]["ffn_out"]["bias"] = \
            bias.at[model.blank].add(blank_bias)
        variables = dict(variables, params=p)
    dec = Decoder(model, variables)

    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_DECODE_WINDOWS",
                                 os.environ.get("BENCH_WINDOWS", "5")))
    audio_s = b * t * 0.01
    results = {}
    spreads = {}

    # Per-mode wall budget: a cold decode compile on the axon tunnel can
    # take tens of minutes; the driver must still get the train record.
    # With the persistent compilation cache a warm rerun is fast, so a
    # mode that times out once self-heals on the next invocation.
    budget = int(os.environ.get("BENCH_DECODE_BUDGET", "900"))

    def run(mode, fn):
        import signal

        def _timeout(signum, frame):
            raise TimeoutError(mode)

        old = signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(budget)
        try:
            # hyps come back as host lists — the conversion IS the sync
            # point.
            stats = _rate_stats(fn, audio_s, iters, windows)
        except TimeoutError:
            print(f"decode bench {mode}: exceeded {budget}s budget "
                  f"(cold compile); skipped", file=sys.stderr)
            return
        except Exception as e:  # one broken mode must not lose the rest
            print(f"decode bench {mode} failed: {e!r}", file=sys.stderr)
            return
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
        value = stats["median"]
        results[mode] = round(value, 2)
        spreads[mode] = [round(stats["min"], 2), round(stats["max"], 2)]
        emit(json.dumps({
            "metric": f"decode_throughput_{mode}",
            "value": round(value, 2),
            "unit": "audio-seconds/s/chip",
            "spread": spreads[mode],
            "vs_baseline": round(
                _vs_baseline(value, key=f"decode_{mode}"), 3),
        }))

    run("ctc_greedy", lambda: dec.ctc_greedy_search(feats, lens))
    run("rnnt_greedy",
        lambda: dec.rnnt_greedy_search(feats, lens, n_steps=4))

    # Hotword-GATED greedy — the fork's flagship decode capability
    # (reference greedy_search.py:34-176): decode-time context list on,
    # gate-consistent label-synchronous search. Context layout matches
    # recognize.py: row 0 is the no-bias entry, real hotwords after.
    n_hw, l_hw = 8, 4
    ctx = np.full((n_hw + 1, l_hw), -1, np.int32)
    ctx_lens = np.ones((n_hw + 1,), np.int32)
    ctx[0, 0] = 0
    hw_rows = rng.integers(1, v - 2, (n_hw, l_hw))
    ctx[1:] = hw_rows
    ctx_lens[1:] = l_hw
    ctx = jnp.asarray(ctx)
    ctx_lens = jnp.asarray(ctx_lens)
    run("gated_rnnt_greedy",
        lambda: dec.rnnt_greedy_search(
            feats, lens, n_steps=4, context_list=ctx,
            context_lengths=ctx_lens, context_filter_state="on"))

    # Beam + rescoring modes (reference transducer.py:332-513,
    # asr_model.py:443-539).
    run("attention_rescoring",
        lambda: dec.attention_rescoring(feats, lens, beam=10))
    run("rnnt_beam",
        lambda: dec.rnnt_beam_to_lists(
            dec.rnnt_beam_search(feats, lens, beam=5)[0]))
    run("ctc_beam_td_attn_rescoring",
        lambda: dec.ctc_beam_td_attn_rescoring(feats, lens, beam=10))

    # Chunk-16 streaming decode: causal U2++ conformer, true
    # chunk-by-chunk forward with bounded att/conv caches.
    cfg_s = u2pp_conformer(tiny=tiny, vocab_size=1024)
    cfg_s["dtype"] = cfg["dtype"]
    model_s = init_model(cfg_s)
    vars_s = model_s.init(jax.random.PRNGKey(0), feats[:2], lens[:2],
                          jnp.asarray(rng.integers(1, v - 2, (2, 8)),
                                      jnp.int32),
                          jnp.full((2,), 8, jnp.int32))
    dec_s = Decoder(model_s, vars_s)
    run("streaming_ctc_greedy",
        lambda: dec_s.ctc_greedy_search(
            feats, lens, simulate_streaming=True, decoding_chunk_size=16,
            num_decoding_left_chunks=4))
    return results, spreads


def bench_train(emit=print, decode_results=None):
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils.flops import train_step_flops
    from wenet_celoss_tpu.utils.platform import (configure_tpu_runtime,
                                                 enable_compilation_cache)

    # Hardware RNG for dropout (+106ms/step at B=256 with threefry;
    # see utils/platform.py). Env JAX_DEFAULT_PRNG_IMPL overrides.
    configure_tpu_runtime()
    enable_compilation_cache()

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    cfg = conformer_rnnt_bias(tiny=tiny, vocab_size=1024)
    # bf16 compute with fp32 params is the TPU mixed-precision analog of
    # the reference's AMP training (executor.py:92-122) and the tuned
    # operating point: 3125 (bf16) vs 2802 (fp32) audio-s/s at B=256.
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    rnnt_impl = os.environ.get("BENCH_RNNT")
    if rnnt_impl:
        cfg["model_conf"]["rnnt_impl"] = rnnt_impl
    model = init_model(cfg)

    # Large batch is the TPU-native operating point (SPMD training).
    # With the streaming-V loss (rnnt_impl=streaming, the flagship
    # default) B=512 fits one v5e chip (the materialized-joint paths top
    # out near B=64 at T=512, V=1024: [B,T',U+1,V] is ~70 GB at B=512).
    b = int(os.environ.get("BENCH_BATCH", "256"))
    t = int(os.environ.get("BENCH_FRAMES", "512"))   # 10ms frames
    u = int(os.environ.get("BENCH_LABELS", "32"))
    rng = np.random.default_rng(0)
    v = cfg["output_dim"]
    batch = {
        "feats": jnp.asarray(rng.standard_normal((b, t, 80)), jnp.float32),
        "feat_lengths": jnp.full((b,), t, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, v - 2, (b, u)), jnp.int32),
        "label_lengths": jnp.full((b,), u, jnp.int32),
        "context_list": jnp.asarray(rng.integers(1, v - 2, (8, 4)),
                                    jnp.int32),
        "context_lengths": jnp.full((8,), 4, jnp.int32),
        "hw_labels": jnp.asarray(rng.integers(0, 2, (b, u)), jnp.int32),
    }
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"], batch["context_list"],
            batch["context_lengths"], batch["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    train_step = T.make_train_step(model, tx)

    def step(state, key):
        state, metrics, _ = train_step(state, batch, key)
        return state, metrics

    def sync(state, m):
        """Force REAL completion of the last step. On the experimental
        'axon' platform jax.block_until_ready can return before the
        program finishes (output buffers are marked ready early), which
        silently turns a timing loop into a dispatch-rate measurement.
        A host read of a value computed FROM the final parameters cannot
        lie: it requires the optimizer update to have run."""
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(m["loss"]) + float(jnp.sum(jnp.abs(leaf)))

    # Warmup/compile (incl. the sync probe's reduction). A transient
    # axon transport flake here cost round 4 its record — bounded retry.
    key = jax.random.PRNGKey(1)

    def _warmup():
        s2, m2 = step(state, key)
        sync(s2, m2)
        return s2, m2

    state, m = _retry(_warmup, desc="train warmup/compile")

    # XLA's own FLOP count of the compiled step — kept only as the
    # comparison figure (it is blind to Pallas custom calls).
    xla_flops_per_step = 0.0
    try:
        cost = train_step.lower(state, batch, key).compile() \
            .cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops_per_step = float(cost.get("flops", 0.0))
    except Exception:
        pass

    # Analytic model-FLOP count (utils/flops.py) — the honest MFU
    # numerator; counts the Pallas-fused matmuls XLA cannot see.
    flops_per_step = train_step_flops(
        cfg, b, t, u, n_ctx=int(batch["context_list"].shape[0]),
        l_ctx=int(batch["context_list"].shape[1]))

    # Median of probe-synced windows (never best-of: a window whose
    # block returned early would report impossible FLOP rates).
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    windows = int(os.environ.get("BENCH_WINDOWS", "3"))
    rates = []
    for _ in range(windows):
        def _window():
            nonlocal state, m, key
            t0 = time.perf_counter()
            for i in range(iters):
                key, sub = jax.random.split(key)
                state, m = step(state, sub)
            sync(state, m)
            return time.perf_counter() - t0
        dt = _retry(_window, desc="train timing window")
        rates.append(b * t * 0.01 * iters / dt)
    rates.sort()
    value = rates[len(rates) // 2]

    rec = {
        "metric": "train_throughput_conformer_rnnt_bias",
        "value": round(value, 2),
        "unit": "audio-seconds/s/chip",
        "spread": [round(rates[0], 2), round(rates[-1], 2)],
        "vs_baseline": round(_vs_baseline(value), 3),
    }
    steps_per_s = value / (b * t * 0.01)
    rec["mfu"] = round(flops_per_step * steps_per_s / _peak(), 4)
    if xla_flops_per_step > 0:
        rec["mfu_xla"] = round(
            xla_flops_per_step * steps_per_s / _peak(), 4)
    if decode_results:
        for k, val in decode_results.items():
            rec[f"decode_{k}"] = val
    if emit is None:
        return rec
    emit(json.dumps(rec))
    return rec


def _e2e_corpus(root, n_utts, vocab_words=1000, seed=7):
    """Cached synthetic wav corpus at the flagship operating point:
    utterance lengths chosen so 0.9×-speed perturbation still fits the
    T=512 frame bucket, transcripts over a vocab that fits the bench
    model's 1024-entry output. Returns (list_path, symbol_table)."""
    import numpy as _np
    from wenet_celoss_tpu.data.wav import write_wav
    root = os.path.join(root, str(n_utts))  # size-keyed cache dir
    marker = os.path.join(root, ".done")
    list_path = os.path.join(root, "data.list")
    symbol_table = {"<blank>": 0, "<unk>": 1}
    for i in range(vocab_words):
        symbol_table[f"▁W{i:03d}"] = i + 2
    symbol_table["<sos/eos>"] = len(symbol_table)
    if os.path.exists(marker):
        return list_path, symbol_table
    os.makedirs(os.path.join(root, "wavs"), exist_ok=True)
    rng = _np.random.default_rng(seed)
    with open(list_path, "w") as f:
        for i in range(n_utts):
            dur = float(rng.uniform(4.2, 4.6))
            n = int(dur * 16000)
            wav = (rng.standard_normal(n) * 3000).astype(_np.int16) \
                .astype(_np.float32)
            path = os.path.join(root, "wavs", f"u{i:05d}.wav")
            write_wav(path, wav, 16000)
            words = rng.integers(0, vocab_words, max(3, int(dur * 2.5)))
            txt = " ".join(f"W{j:03d}" for j in words)
            f.write(json.dumps({"key": f"u{i:05d}", "wav": path,
                                "txt": txt}) + "\n")
    with open(marker, "w") as f:
        f.write("ok")
    return list_path, symbol_table


def bench_train_e2e(emit=print, n_batches=6):
    """Sustained train throughput with the REAL host input pipeline
    feeding the REAL train step — wav read → tokenize → speed perturb →
    dithered fbank → spec_aug → shuffle/sort → static batch → pad/bucket
    (+ mode-1 hotword synthesis) running in sharded loader processes
    (data/loader.py) while the chip trains. Shapes match bench_train's
    tuned point (B=256, T=512 bucket, U=32 bucket, 8×4 context) so the
    train-step compile is shared. The number is host-bound whenever
    pipeline throughput × cores < chip consumption; host cpu count is
    recorded beside it."""
    from wenet_celoss_tpu.configs import conformer_rnnt_bias
    from wenet_celoss_tpu.data.loader import MultiProcessLoader
    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils.platform import (configure_tpu_runtime,
                                                 enable_compilation_cache)

    configure_tpu_runtime()
    enable_compilation_cache()
    b = int(os.environ.get("BENCH_BATCH", "256"))
    n_utts = b * (n_batches + 1)  # +1 warmup/compile batch
    root = os.environ.get("BENCH_E2E_DIR", "/tmp/wenet_e2e_corpus")
    list_path, symbol_table = _e2e_corpus(root, n_utts)

    ncpu = os.cpu_count() or 1
    conf = {
        "filter_conf": {"max_length": 40960, "min_length": 10,
                        "token_max_length": 200, "token_min_length": 1},
        "resample_conf": {"resample_rate": 16000},
        "speed_perturb": True,
        "fbank_conf": {"num_mel_bins": 80, "frame_shift": 10,
                       "frame_length": 25, "dither": 0.1},
        "spec_aug": True,
        "spec_aug_conf": {"num_t_mask": 2, "num_f_mask": 2, "max_t": 50,
                          "max_f": 10},
        "shuffle": True, "shuffle_conf": {"shuffle_size": 1500},
        "sort": True, "sort_conf": {"sort_size": 500},
        "batch_conf": {"batch_type": "static", "batch_size": b},
        "feat_buckets": [512], "label_buckets": [32],
        "context_mode": 1,
        "pad_conf": {"context_len_min": 1, "context_len_max": 3,
                     "max_phrases": 8, "phrase_len": 4},
        "split_with_space": True,
    }
    cfg = conformer_rnnt_bias(tiny=os.environ.get("BENCH_TINY") == "1",
                              vocab_size=1024)
    cfg["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = init_model(cfg)
    t_frames, u_lab = 512, 32

    # Warm up / compile on a SYNTHETIC batch with the pipeline's exact
    # output shapes, BEFORE the loader exists: if the pipeline ran
    # during the compile wait it would pre-process the whole corpus into
    # its shuffle/sort buffers and the "timed" phase would only measure
    # the chip draining host work done off the clock. Shapes match
    # bench_train's tuned point, so the step compile is shared with it.
    rng = np.random.default_rng(0)
    v = cfg["output_dim"]
    syn = {
        "feats": jnp.asarray(rng.standard_normal((b, t_frames, 80)),
                             jnp.float32),
        "feat_lengths": jnp.full((b,), t_frames, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, v - 2, (b, u_lab)),
                              jnp.int32),
        "label_lengths": jnp.full((b,), u_lab, jnp.int32),
        "context_list": jnp.asarray(rng.integers(1, v - 2, (8, 4)),
                                    jnp.int32),
        "context_lengths": jnp.full((8,), 4, jnp.int32),
        "hw_labels": jnp.asarray(rng.integers(0, 2, (b, u_lab)),
                                 jnp.int32),
    }
    args = (syn["feats"], syn["feat_lengths"], syn["labels"],
            syn["label_lengths"], syn["context_list"],
            syn["context_lengths"], syn["hw_labels"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx, _ = T.make_optimizer(cfg)
    state = T.create_train_state(model, variables, tx)
    train_step = T.make_train_step(model, tx)

    def _warm():
        # NB: the train step donates the state buffers — the warmup's
        # output state must replace the input or later steps read
        # deleted buffers (the device errors surface as INVALID_ARGUMENT
        # on the next host→device transfer).
        s2, m2, _ = train_step(state, syn, jax.random.PRNGKey(1))
        leaf = jax.tree_util.tree_leaves(s2.params)[0]
        _ = float(m2["loss"]) + float(jnp.sum(jnp.abs(leaf)))
        return s2
    state = _retry(_warm, desc="e2e warmup/compile")

    # Timed phase: the ENTIRE pipeline pass (loader spawn excluded via
    # the ready handshake) feeding real steps. Buffer fill happens
    # inside the window, so sustained throughput = min(host, chip) up
    # to tail effects.
    loader = MultiProcessLoader("raw", list_path, symbol_table, conf,
                                partition=False,
                                num_workers=max(ncpu, 1))
    key = jax.random.PRNGKey(3)
    audio_s = 0.0
    steps = 0
    m = None
    t0 = time.perf_counter()
    for batch in loader:
        if batch["feats"].shape != (b, t_frames, 80) or \
                batch["labels"].shape[1] != u_lab:
            continue  # off-bucket batch would retrace the step
        dev_batch = {
            "feats": jnp.asarray(batch["feats"]),
            "feat_lengths": jnp.asarray(batch["feat_lengths"]),
            "labels": jnp.asarray(batch["labels"]),
            "label_lengths": jnp.asarray(batch["label_lengths"]),
            "context_list": jnp.asarray(batch["context_list"]),
            "context_lengths": jnp.asarray(batch["context_lengths"]),
            "hw_labels": jnp.asarray(batch["hw_labels"]),
        }
        key, sub = jax.random.split(key)
        state, m, _ = train_step(state, dev_batch, sub)
        audio_s += float(np.sum(batch["feat_lengths"])) * 0.01
        steps += 1
    if steps == 0:
        raise RuntimeError("e2e bench produced no full batches")
    # Force completion of the final step (axon block_until_ready can
    # return early; a host read of updated params cannot).
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    _ = float(m["loss"]) + float(jnp.sum(jnp.abs(leaf)))
    dt = time.perf_counter() - t0 - getattr(loader, "startup_s", 0.0)
    rec = {
        "metric": "train_e2e_throughput",
        "value": round(audio_s / dt, 2),
        "unit": "audio-seconds/s",
        "host_cpus": ncpu,
        "steps": steps,
        "loader_startup_s": round(getattr(loader, "startup_s", 0.0), 2),
    }
    if emit is not None:
        emit(json.dumps(rec))
    return rec


def main():
    if "--e2e" in sys.argv:
        bench_train_e2e()
        return 0
    if "--decode" in sys.argv:
        bench_decode()
        return 0
    if "--train-only" in sys.argv:
        bench_train()
        return 0
    # TRAIN FIRST: the headline number is measured on a fresh device
    # state — the decode benches' compiles/allocations must not sit
    # between process start and the train timing windows (r1→r3 the
    # driver-captured train number drifted below the tuned point after
    # decode was folded in front of it).
    #
    # The record is emitted INCREMENTALLY: the train headline line is
    # printed (and flushed) the moment it exists, then decode keys are
    # merged into a final combined line. A crash or transport flake
    # during the decode benches can therefore no longer erase the train
    # number from the round's artifact (the r4 failure mode), and the
    # process exits 0 whenever at least one record line was emitted.
    rec = None
    try:
        rec = bench_train(emit=None)
        print(json.dumps(rec), flush=True)
    except Exception as e:
        print(f"train bench failed: {e!r}", file=sys.stderr)
    decode = None
    try:
        decode = bench_decode(emit=lambda s: None)
    except Exception as e:
        print(f"decode bench failed: {e!r}", file=sys.stderr)
    if decode:
        results, spreads = decode
        if rec is None:
            rec = {"metric": "train_throughput_conformer_rnnt_bias",
                   "value": None, "unit": "audio-seconds/s/chip",
                   "error": "train bench failed; decode keys only"}
        for k, val in results.items():
            rec[f"decode_{k}"] = val
        for k, mm in spreads.items():
            rec[f"decode_{k}_spread"] = mm
        print(json.dumps(rec), flush=True)
    # Sustained train-from-real-pipeline number (host chain feeding the
    # chip; host-bound on small hosts — host_cpus recorded beside it).
    if rec is not None and os.environ.get("BENCH_SKIP_E2E") != "1":
        import signal

        def _t(signum, frame):
            raise TimeoutError("e2e")
        old = signal.signal(signal.SIGALRM, _t)
        signal.alarm(int(os.environ.get("BENCH_E2E_BUDGET", "1500")))
        try:
            e2e = bench_train_e2e(emit=None)
            rec["train_e2e"] = e2e["value"]
            rec["train_e2e_host_cpus"] = e2e["host_cpus"]
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(f"e2e bench failed: {e!r}", file=sys.stderr)
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    return 0 if (rec is not None and rec.get("value") is not None
                 or decode) else 1


if __name__ == "__main__":
    sys.exit(main())
