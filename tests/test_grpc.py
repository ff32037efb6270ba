"""gRPC serving surface: a REAL grpc client (grpcio) against
bin/grpc_server.py speaking the reference's exact wire contract
(/wenet.ASR/Recognize bidi stream, runtime/core/grpc/wenet.proto —
reference runtime/core/grpc/wenet.proto:21-64). Closes the one serving
surface a stock reference client previously could not reach."""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "runtime", "build")


@pytest.fixture(scope="session")
def runtime_build():
    import fcntl
    os.makedirs(BUILD, exist_ok=True)
    with open(os.path.join(BUILD, ".build_lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        subprocess.run(["cmake", "../core", "-G", "Ninja"], cwd=BUILD,
                       check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=BUILD, check=True,
                       capture_output=True)
    return BUILD


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_grpc_stream_recognize(runtime_build, tmp_path):
    grpc = pytest.importorskip("grpc")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_runtime import _train_tiny_streaming_model

    from wenet_celoss_tpu.bin.grpc_server import load_wenet_pb2
    from wenet_celoss_tpu.data.wav import read_wav

    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    with open(model_dir / "worker_cmd.txt", "w") as f:
        f.write(f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
                f"--config {model_dir}/train.yaml "
                f"--checkpoint {model_dir}/final.ckpt "
                f"--chunk_size {chunk}\n")
    pb2 = load_wenet_pb2()

    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, "-m", "wenet_celoss_tpu.bin.grpc_server",
         "--model_dir", str(model_dir),
         "--port", str(port),
         "--lib_path", os.path.join(runtime_build,
                                    "libwenet_tpu_api.so"),
         "--chunk_size", str(chunk)],
        env=env, stderr=subprocess.PIPE)
    try:
        chan = grpc.insecure_channel(f"127.0.0.1:{port}")
        grpc.channel_ready_future(chan).result(timeout=60)
        stub = chan.stream_stream(
            "/wenet.ASR/Recognize",
            request_serializer=pb2.Request.SerializeToString,
            response_deserializer=pb2.Response.FromString)

        wav, sr = read_wav(str(wav_path))
        pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()

        def requests():
            yield pb2.Request(decode_config=pb2.Request.DecodeConfig(
                nbest_config=1))
            step = int(0.5 * sr) * 2
            for i in range(0, len(pcm), step):
                yield pb2.Request(audio_data=pcm[i:i + step])

        types = []
        final_sentences = []
        for resp in stub(requests(), timeout=300):
            types.append(resp.type)
            assert resp.status == pb2.Response.ok
            if resp.type == pb2.Response.final_result and resp.nbest:
                final_sentences.append(resp.nbest[0].sentence)
        assert types[0] == pb2.Response.server_ready
        assert types[-1] == pb2.Response.speech_end
        assert pb2.Response.final_result in types
        assert final_sentences, types
        got = final_sentences[-1].replace(" ", "").upper()
        assert expected in got, (final_sentences, types)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
