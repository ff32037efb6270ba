"""Serving-runtime latency benchmark.

Quantifies the C++ serving stack the way the reference treats RTF as its
runtime metric (reference ``runtime/core/bin/decoder_main.cc:182``), plus
the two latency numbers the redesigned subprocess-worker architecture
introduces:

  runtime_offline_rtf        decoder_main steady-state RTF (chunked decode,
                             first utterance excluded: it pays the XLA
                             compile-cache load)
  runtime_rnnt_greedy_rtf    same, over the streaming-transducer serving
                             path (worker 'G': chunk-by-chunk RNN-T greedy
                             — the mode a production U2++ deployment runs)
  runtime_worker_chunk_ms    median per-chunk round trip over the framed
                             pipe to the JAX worker ('F' frame → 'O'
                             posteriors), warm
  runtime_ws_first_partial_ms  WebSocket path: real-time-paced PCM stream,
                             time from first audio frame sent to the first
                             partial result
  runtime_ws_final_ms        time from the "end" signal to the final result

Artifacts (tiny chunked CTC/AED model + tone wavs) are trained once into
--workdir and reused. Speech-length (~9.6 s) eval wavs; CPU JAX by default
(the serving runtime's worker is a host process; see SKILL verify notes).

Usage: python tools/bench_runtime.py [--workdir D] [--n_wavs 4] [--json F]
"""

from __future__ import annotations

import argparse
import base64
import hashlib
import json
import os
import re
import socket
import struct
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
SEG = 3200          # 0.2 s per token (matches the tiny-model trainer)
FREQS = {1: 400.0, 2: 1000.0, 3: 2400.0}


def _env(tpu: bool = False):
    """Serving env: CPU JAX worker by default; tpu=True leaves the
    platform alone so the worker runs on the real chip (axon) — the
    production serving configuration (SURVEY §2.6: model inference
    engine as the serving-side native component)."""
    env = dict(os.environ, PYTHONPATH=REPO)
    if tpu:
        env.pop("JAX_PLATFORMS", None)
    else:
        env["JAX_PLATFORMS"] = "cpu"
    return env


def make_artifacts(workdir: str, transducer: bool = False):
    """Train the tiny streaming model (once) + speech-length eval wavs."""
    import pathlib
    sub = os.path.join(workdir, "transducer") if transducer else workdir
    # the transducer trainer writes its artifacts under tmodel/
    model_dir = os.path.join(sub, "tmodel" if transducer else "model")
    done = os.path.join(model_dir, "final.ckpt")
    if not os.path.exists(done):
        os.makedirs(sub, exist_ok=True)
        sys.path.insert(0, os.path.join(REPO, "tests"))
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        if transducer:
            from test_runtime import _train_tiny_streaming_transducer
            _train_tiny_streaming_transducer(pathlib.Path(sub))
        else:
            from test_runtime import _train_tiny_streaming_model
            _train_tiny_streaming_model(pathlib.Path(workdir))
    with open(os.path.join(model_dir, "train.yaml")) as f:
        import yaml
        cfg = yaml.safe_load(f)
    mel = cfg["dataset_conf"]["fbank_conf"]["num_mel_bins"]
    chunk = cfg["encoder_conf"]["static_chunk_size"]
    return model_dir, mel, chunk


def make_wavs(workdir: str, n: int, tokens_per_wav: int = 48):
    """n tone wavs of tokens_per_wav*0.2 s each + their label strings."""
    import numpy as np

    from wenet_celoss_tpu.data.wav import write_wav
    rng = np.random.default_rng(42)
    paths = []
    for i in range(n):
        seq = rng.integers(1, 4, tokens_per_wav)
        wav = np.concatenate([
            8000 * np.sin(2 * np.pi * FREQS[int(t)] * np.arange(SEG) / SR)
            for t in seq])
        wav += rng.standard_normal(wav.shape) * 30
        p = os.path.join(workdir, f"bench_{i}.wav")
        write_wav(p, wav.astype(np.float32), SR)
        paths.append(p)
    return paths


def worker_cmd(model_dir, chunk):
    return (f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
            f"--config {model_dir}/train.yaml "
            f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")


def bench_offline_rtf(build, model_dir, mel, chunk, wavs, workdir,
                      mode=None, tpu=False):
    """decoder_main over a wav scp; steady RTF excludes utterance 0."""
    scp = os.path.join(workdir, "bench.scp")
    with open(scp, "w") as f:
        for i, p in enumerate(wavs):
            f.write(f"utt{i} {p}\n")
    cmd = [os.path.join(build, "decoder_main"),
           "--wav_scp", scp,
           "--symbol_table", os.path.join(model_dir, "units.txt"),
           "--worker_cmd", worker_cmd(model_dir, chunk),
           "--chunk_size", str(chunk), "--num_bins", str(mel)]
    if mode:
        cmd += ["--mode", mode]
    res = subprocess.run(
        cmd, capture_output=True, text=True, env=_env(tpu),
        timeout=3600 if tpu else 900)
    assert res.returncode == 0, res.stdout + res.stderr
    utts = re.findall(r"UTTMS (\S+) (\d+) (\d+)", res.stderr)
    assert len(utts) == len(wavs), res.stderr
    steady = utts[1:] if len(utts) > 1 else utts
    dec = sum(int(u[1]) for u in steady)
    aud = sum(int(u[2]) for u in steady)
    first_rtf = int(utts[0][1]) / int(utts[0][2])
    # Per-stage attribution (AsrDecoder::StageTimes via UTTSTAGE lines):
    # mean ms per steady utterance for feature wait / worker encoder
    # forward / host search / finalize+rescoring.
    st = re.findall(
        r"UTTSTAGE (\S+) feat ([\d.]+) enc ([\d.]+) search ([\d.]+) "
        r"resc ([\d.]+)", res.stderr)
    stages = None
    if len(st) == len(utts) and steady:
        sk = st[1:] if len(st) > 1 else st
        n = len(sk)
        stages = {
            "feat_ms": round(sum(float(u[1]) for u in sk) / n, 1),
            "encoder_ms": round(sum(float(u[2]) for u in sk) / n, 1),
            "search_ms": round(sum(float(u[3]) for u in sk) / n, 1),
            "rescore_ms": round(sum(float(u[4]) for u in sk) / n, 1),
            "audio_ms": round(aud / n, 0),
        }
    return dec / aud, first_rtf, stages


def bench_worker_chunk(build, model_dir, mel, chunk, iters=60):
    """Median warm per-chunk round trip on the worker's framed pipe."""
    import numpy as np
    proc = subprocess.Popen(
        worker_cmd(model_dir, chunk).split(), stdin=subprocess.PIPE,
        stdout=subprocess.PIPE, env=_env())
    w, r = proc.stdin, proc.stdout

    def read_exact(n):
        buf = b""
        while len(buf) < n:
            c = r.read(n - len(buf))
            if not c:
                raise EOFError
            buf += c
        return buf

    try:
        w.write(b"I" + struct.pack("<I", 0))
        w.flush()
        tag = read_exact(1)
        assert tag == b"M", tag
        (mlen,) = struct.unpack("<I", read_exact(4))
        meta = json.loads(read_exact(mlen))
        sub = meta.get("subsampling_rate", 4)
        rc = meta.get("right_context", 6)
        window = (chunk - 1) * sub + rc + 1      # decoding window frames
        rng = np.random.default_rng(0)
        times = []
        for i in range(iters):
            feat = rng.standard_normal((window, mel)).astype("<f4") * 0.3
            t0 = time.perf_counter()
            w.write(b"F" + struct.pack("<II", window, mel) +
                    feat.tobytes())
            w.flush()
            tag = read_exact(1)
            assert tag == b"O", tag
            t, v = struct.unpack("<II", read_exact(8))
            read_exact(4 * t * v)
            times.append((time.perf_counter() - t0) * 1e3)
        times = sorted(times[10:])               # drop warmup incl. compile
        return times[len(times) // 2]
    finally:
        try:
            w.write(b"Q")
            w.flush()
        except Exception:
            pass
        proc.terminate()
        proc.wait(timeout=10)


def _ws_send(sock, opcode, payload: bytes):
    import numpy as np
    hdr = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        hdr += bytes([0x80 | n])
    elif n < 1 << 16:
        hdr += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        hdr += bytes([0x80 | 127]) + struct.pack(">Q", n)
    mask = b"\x00\x00\x00\x00"
    sock.sendall(hdr + mask + payload)


def _ws_recv(sock):
    def rx(n):
        buf = b""
        while len(buf) < n:
            c = sock.recv(n - len(buf))
            if not c:
                raise EOFError
            buf += c
        return buf

    b0, b1 = rx(2)
    op = b0 & 0x0F
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", rx(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", rx(8))
    return op, rx(n)


def bench_websocket(build, model_dir, mel, chunk, wav_path):
    """Real-time-paced stream; first-partial + final latency."""
    import numpy as np

    from wenet_celoss_tpu.data.wav import read_wav
    pcm_f, _ = read_wav(wav_path)
    pcm = (np.clip(pcm_f, -32768, 32767).astype("<i2")).tobytes()

    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [os.path.join(build, "websocket_server_main"),
         "--port", str(port),
         "--symbol_table", os.path.join(model_dir, "units.txt"),
         "--worker_cmd", worker_cmd(model_dir, chunk),
         "--chunk_size", str(chunk), "--num_bins", str(mel),
         "--max_connections", "2"], env=_env(),
        stderr=subprocess.DEVNULL)
    try:
        def connect():
            for _ in range(150):
                try:
                    s = socket.create_connection(("127.0.0.1", port),
                                                 timeout=1)
                    break
                except OSError:
                    time.sleep(0.2)
            else:
                raise RuntimeError("server never came up")
            s.settimeout(300)
            key = base64.b64encode(b"0123456789abcdef").decode()
            s.sendall((f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: "
                       f"websocket\r\nConnection: Upgrade\r\n"
                       f"Sec-WebSocket-Key: {key}\r\n"
                       f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
            resp = b""
            while b"\r\n\r\n" not in resp:
                resp += s.recv(4096)
            assert b"101" in resp, resp
            return s

        import threading

        def run_once():
            # One utterance per connection (server closes after
            # speech_end).
            sock = connect()
            _ws_send(sock, 0x1, b'{"signal":"start"}')
            op, payload = _ws_recv(sock)            # server ack
            events = []                              # (t, type) appended
            done = threading.Event()

            def reader():
                while not done.is_set():
                    try:
                        op, payload = _ws_recv(sock)
                    except (EOFError, OSError):
                        return
                    try:
                        msg = json.loads(payload)
                    except (json.JSONDecodeError, UnicodeDecodeError):
                        continue
                    events.append((time.perf_counter(), msg.get("type")))
                    if msg.get("type") == "speech_end":
                        return

            th = threading.Thread(target=reader, daemon=True)
            th.start()
            frame_bytes = int(0.4 * SR) * 2          # 0.4 s PCM frames
            t_start = time.perf_counter()
            for sent in range(0, len(pcm), frame_bytes):
                _t0 = time.perf_counter()
                _ws_send(sock, 0x2, pcm[sent:sent + frame_bytes])
                rest = 0.4 - (time.perf_counter() - _t0)
                if rest > 0:
                    time.sleep(rest)                 # real-time pacing
            t_end = time.perf_counter()
            _ws_send(sock, 0x1, b'{"signal":"end"}')
            th.join(timeout=300)
            done.set()
            first_partial = next((t for t, k in events
                                  if k == "partial_result"), None)
            final_t = next((t for t, k in events if k == "final_result"),
                           None)
            return (None if first_partial is None
                    else (first_partial - t_start) * 1e3,
                    None if final_t is None else (final_t - t_end) * 1e3)

        run_once()                                   # warm (compile)
        fp, fin = run_once()                         # measured
        return fp, fin
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/wenet_tpu_runtime_bench")
    ap.add_argument("--build", default=os.path.join(REPO, "runtime",
                                                    "build"))
    ap.add_argument("--n_wavs", type=int, default=4)
    ap.add_argument("--json", default=None,
                    help="also append JSON records to this file")
    ap.add_argument("--tpu", action="store_true",
                    help="also bench the serving stack with the JAX "
                         "worker on the real TPU chip")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    model_dir, mel, chunk = make_artifacts(args.workdir)
    wavs = make_wavs(args.workdir, args.n_wavs)

    records = []
    rtf, first_rtf, stages = bench_offline_rtf(args.build, model_dir, mel,
                                               chunk, wavs, args.workdir)
    records.append({"metric": "runtime_offline_rtf",
                    "value": round(rtf, 4), "unit": "decode-s/audio-s",
                    "first_utt_rtf": round(first_rtf, 4),
                    "stages": stages})

    td_dir, td_mel, td_chunk = make_artifacts(args.workdir,
                                              transducer=True)
    rtf_g, first_g, stages_g = bench_offline_rtf(
        args.build, td_dir, td_mel, td_chunk, wavs, args.workdir,
        mode="rnnt_greedy_search")
    records.append({"metric": "runtime_rnnt_greedy_rtf",
                    "value": round(rtf_g, 4), "unit": "decode-s/audio-s",
                    "first_utt_rtf": round(first_g, 4),
                    "stages": stages_g})

    chunk_ms = bench_worker_chunk(args.build, model_dir, mel, chunk)
    audio_ms_per_chunk = chunk * 4 * 10.0            # subsampling 4, 10 ms
    records.append({"metric": "runtime_worker_chunk_ms",
                    "value": round(chunk_ms, 2), "unit": "ms/chunk",
                    "audio_ms_per_chunk": audio_ms_per_chunk})

    if args.tpu:
        # Production configuration: the SAME serving stack with the JAX
        # worker on the real chip (persistent compile cache; first
        # utterance carries any residual compile, steady RTF excludes
        # it). Records land beside the CPU figures.
        try:
            rtf_t, first_t, st_t = bench_offline_rtf(
                args.build, model_dir, mel, chunk, wavs, args.workdir,
                tpu=True)
            records.append({"metric": "runtime_offline_rtf_tpu",
                            "value": round(rtf_t, 4),
                            "unit": "decode-s/audio-s",
                            "first_utt_rtf": round(first_t, 4),
                            "stages": st_t})
            rtf_gt, first_gt, st_gt = bench_offline_rtf(
                args.build, td_dir, td_mel, td_chunk, wavs,
                args.workdir, mode="rnnt_greedy_search", tpu=True)
            records.append({"metric": "runtime_rnnt_greedy_rtf_tpu",
                            "value": round(rtf_gt, 4),
                            "unit": "decode-s/audio-s",
                            "first_utt_rtf": round(first_gt, 4),
                            "stages": st_gt})
        except Exception as e:
            print(f"tpu-worker bench failed: {e!r}", file=sys.stderr)

    fp_ms, fin_ms = bench_websocket(args.build, model_dir, mel, chunk,
                                    wavs[0])
    records.append({"metric": "runtime_ws_first_partial_ms",
                    "value": None if fp_ms is None else round(fp_ms, 1),
                    "unit": "ms"})
    records.append({"metric": "runtime_ws_final_ms",
                    "value": None if fin_ms is None else round(fin_ms, 1),
                    "unit": "ms"})

    for r in records:
        print(json.dumps(r))
    if args.json:
        with open(args.json, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
