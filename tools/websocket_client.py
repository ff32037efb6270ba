#!/usr/bin/env python3
"""Streaming WebSocket ASR client (dependency-free).

Capability parity with the reference's websocket client binary
(`runtime/core/websocket/websocket_client.{h,cc}`, driven by
`websocket_client_main.cc`) and its load-test script
(`tools/websocket/performance-ws.py`): streams PCM16 from a wav file (or
wav.scp) to the websocket server in real-time-sized chunks, prints
partial/final results, reports latency + RTF, and supports --concurrency
for load testing.

Protocol (matches runtime/core/websocket/websocket_server.h):
  text  {"signal":"start"}          → server starts a decode stream
  binary <pcm16le chunks>           → audio
  text  {"signal":"end"}            → finish; server replies with
  text  {"type":"partial_result"|"final_result", ...} frames
"""

import argparse
import base64
import hashlib
import json
import os
import socket
import struct
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wenet_celoss_tpu.data.wav import read_wav  # noqa: E402


def ws_connect(host: str, port: int) -> socket.socket:
    sock = socket.create_connection((host, port), timeout=30)
    key = base64.b64encode(os.urandom(16)).decode()
    req = (f"GET / HTTP/1.1\r\nHost: {host}\r\nUpgrade: websocket\r\n"
           f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
           f"Sec-WebSocket-Version: 13\r\n\r\n")
    sock.sendall(req.encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("handshake failed: connection closed")
        resp += chunk
    if b"101" not in resp.split(b"\r\n", 1)[0]:
        raise ConnectionError(f"handshake rejected: {resp[:100]!r}")
    accept = base64.b64encode(hashlib.sha1(
        key.encode() + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest())
    if accept not in resp:
        raise ConnectionError("bad Sec-WebSocket-Accept")
    return sock


def ws_send(sock: socket.socket, opcode: int, payload: bytes):
    """Client frames must be masked (RFC6455 §5.3)."""
    mask = os.urandom(4)
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([0x80 | n])
    elif n < 1 << 16:
        header += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        header += bytes([0x80 | 127]) + struct.pack(">Q", n)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    sock.sendall(header + mask + masked)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed")
        buf += chunk
    return buf


def ws_recv(sock: socket.socket):
    b0, b1 = _recv_exact(sock, 2)
    opcode = b0 & 0x0F
    n = b1 & 0x7F
    if n == 126:
        n = struct.unpack(">H", _recv_exact(sock, 2))[0]
    elif n == 127:
        n = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    if b1 & 0x80:
        mask = _recv_exact(sock, 4)
        data = _recv_exact(sock, n)
        return opcode, bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, _recv_exact(sock, n)


def decode_one(host, port, wav_path, chunk_ms=400, simulate_streaming=False,
               print_partial=True, tag=""):
    wav, sr = read_wav(wav_path)
    pcm = wav.astype("<i2").tobytes()
    audio_s = len(wav) / sr
    chunk_bytes = max(2, int(sr * chunk_ms / 1000) * 2)

    sock = ws_connect(host, port)
    t0 = time.time()
    ws_send(sock, 0x1, json.dumps({"signal": "start"}).encode())
    results = {"final": "", "partials": 0}
    done = threading.Event()

    def reader():
        try:
            while True:
                op, payload = ws_recv(sock)
                if op == 0x8:
                    break
                if op != 0x1:
                    continue
                msg = json.loads(payload.decode("utf-8", "replace"))
                if msg.get("type") == "partial_result":
                    results["partials"] += 1
                    if print_partial:
                        print(f"{tag}partial: {msg.get('nbest', '')}",
                              flush=True)
                elif msg.get("type") == "final_result":
                    results["final"] = msg.get("nbest", "")
                elif msg.get("type") == "speech_end":
                    break
        except (ConnectionError, OSError):
            pass
        done.set()

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    for i in range(0, len(pcm), chunk_bytes):
        ws_send(sock, 0x2, pcm[i:i + chunk_bytes])
        if simulate_streaming:
            time.sleep(chunk_ms / 1000)
    ws_send(sock, 0x1, json.dumps({"signal": "end"}).encode())
    done.wait(timeout=300)
    elapsed = time.time() - t0
    sock.close()
    print(f"{tag}final: {results['final']}", flush=True)
    print(f"{tag}audio={audio_s:.2f}s wall={elapsed:.2f}s "
          f"RTF={elapsed / max(audio_s, 1e-9):.4f} "
          f"partials={results['partials']}", flush=True)
    return results["final"], elapsed, audio_s


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--wav_path", help="single wav file")
    parser.add_argument("--wav_scp", help="kaldi wav.scp (key path) for "
                        "batch/load testing")
    parser.add_argument("--chunk_ms", type=int, default=400)
    parser.add_argument("--simulate_streaming", action="store_true",
                        help="sleep chunk_ms between chunks (real-time)")
    parser.add_argument("--concurrency", type=int, default=1,
                        help="parallel connections over wav_scp entries")
    parser.add_argument("--no_partial", action="store_true")
    args = parser.parse_args()

    if args.wav_path:
        decode_one(args.host, args.port, args.wav_path, args.chunk_ms,
                   args.simulate_streaming, not args.no_partial)
        return
    if not args.wav_scp:
        parser.error("need --wav_path or --wav_scp")

    jobs = []
    with open(args.wav_scp) as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                jobs.append(parts)
    stats = {"wall": 0.0, "audio": 0.0}
    lock = threading.Lock()

    def worker(chunk):
        for key, path in chunk:
            _, wall, audio = decode_one(
                args.host, args.port, path, args.chunk_ms,
                args.simulate_streaming, not args.no_partial, tag=f"{key} ")
            with lock:
                stats["wall"] += wall
                stats["audio"] += audio

    t0 = time.time()
    threads = [threading.Thread(
        target=worker, args=(jobs[i::args.concurrency],))
        for i in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total_wall = time.time() - t0
    if stats["audio"]:
        print(f"TOTAL: {len(jobs)} utts audio={stats['audio']:.1f}s "
              f"wall={total_wall:.1f}s concurrency={args.concurrency} "
              f"aggregate-RTF={total_wall / stats['audio']:.4f}")


if __name__ == "__main__":
    main()
