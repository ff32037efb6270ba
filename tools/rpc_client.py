#!/usr/bin/env python3
"""Streaming RPC ASR client for rpc_server_main (dependency-free).

Capability parity with the reference's gRPC client
(`runtime/core/grpc/grpc_client.{h,cc}` + `grpc_client_main.cc`): opens a
bidirectional stream, sends DecodeConfig then PCM16 audio chunks, prints
server_ready / partial_result / final_result responses.

Wire format (see runtime/core/grpc/wenet_rpc.proto): length-prefixed
proto3 messages over plain TCP — [u32 big-endian length][Request|Response].
The proto3 encoding is hand-rolled here so the client needs no protobuf
runtime.
"""

import argparse
import os
import socket
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wenet_celoss_tpu.data.wav import read_wav  # noqa: E402


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _read_varint(buf: bytes, i: int):
    val, shift = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def request_config(nbest: int = 1, continuous: bool = False) -> bytes:
    """Request{decode_config{nbest_config, continuous_decoding_config}}."""
    inner = b"\x08" + _varint(nbest)
    if continuous:
        inner += b"\x10\x01"
    return b"\x0a" + _varint(len(inner)) + inner


def request_audio(pcm: bytes) -> bytes:
    """Request{audio_data}; empty audio_data signals end of input."""
    return b"\x12" + _varint(len(pcm)) + pcm


def parse_response(buf: bytes):
    """Response{status=1, type=2, nbest=3 [OneBest{sentence=1}]}."""
    status = rtype = 0
    sentences = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
            if field == 1:
                status = val
            elif field == 2:
                rtype = val
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            sub = buf[i:i + ln]
            i += ln
            if field == 3:
                j = 0
                while j < len(sub):
                    t2, j = _read_varint(sub, j)
                    if t2 & 7 == 2:
                        l2, j = _read_varint(sub, j)
                        if t2 >> 3 == 1:
                            sentences.append(
                                sub[j:j + l2].decode("utf-8", "replace"))
                        j += l2
                    else:
                        _, j = _read_varint(sub, j)
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return status, rtype, sentences


def send_frame(sock: socket.socket, payload: bytes):
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def recv_frame(sock: socket.socket) -> bytes:
    header = b""
    while len(header) < 4:
        chunk = sock.recv(4 - len(header))
        if not chunk:
            raise ConnectionError("connection closed")
        header += chunk
    n = struct.unpack(">I", header)[0]
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed")
        buf += chunk
    return buf


TYPE_NAMES = {0: "server_ready", 1: "partial_result", 2: "final_result",
              3: "speech_end"}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--wav_path", required=True)
    parser.add_argument("--nbest", type=int, default=1)
    parser.add_argument("--continuous_decoding", action="store_true")
    parser.add_argument("--chunk_ms", type=int, default=400)
    parser.add_argument("--simulate_streaming", action="store_true")
    args = parser.parse_args()

    wav, sr = read_wav(args.wav_path)
    pcm = wav.astype("<i2").tobytes()
    audio_s = len(wav) / sr
    chunk_bytes = max(2, int(sr * args.chunk_ms / 1000) * 2)

    sock = socket.create_connection((args.host, args.port), timeout=30)
    t0 = time.time()
    send_frame(sock, request_config(args.nbest, args.continuous_decoding))
    status, rtype, _ = parse_response(recv_frame(sock))
    assert status == 0 and rtype == 0, "server not ready"
    print("server_ready", flush=True)

    for i in range(0, len(pcm), chunk_bytes):
        send_frame(sock, request_audio(pcm[i:i + chunk_bytes]))
        if args.simulate_streaming:
            time.sleep(args.chunk_ms / 1000)
    send_frame(sock, request_audio(b""))

    final = ""
    while True:
        status, rtype, sentences = parse_response(recv_frame(sock))
        if status != 0:
            print("ERROR from server", file=sys.stderr)
            break
        name = TYPE_NAMES.get(rtype, str(rtype))
        if sentences:
            print(f"{name}: {' | '.join(sentences)}", flush=True)
            if rtype == 2:
                final = sentences[0]
        if rtype == 3:
            break
    sock.close()
    elapsed = time.time() - t0
    print(f"final: {final}")
    print(f"audio={audio_s:.2f}s wall={elapsed:.2f}s "
          f"RTF={elapsed / max(audio_s, 1e-9):.4f}")


if __name__ == "__main__":
    main()
