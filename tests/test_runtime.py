"""C++ runtime integration tests: build, unit tests, cross-language fbank
parity, and the full serving stack (C++ decoder_main ↔ JAX worker)."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "runtime", "build")


def _free_port() -> int:
    """OS-assigned free TCP port (bind 0, read, close). Unlike pid-derived
    offsets this cannot collide across xdist workers or with unrelated
    processes already listening (modulo the tiny close→reuse window)."""
    import socket
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="session")
def runtime_build():
    import fcntl
    os.makedirs(BUILD, exist_ok=True)
    # xdist: workers configure/build the shared tree one at a time.
    with open(os.path.join(BUILD, ".build_lock"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        subprocess.run(["cmake", "../core", "-G", "Ninja"], cwd=BUILD,
                       check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=BUILD, check=True,
                       capture_output=True)
    return BUILD


def test_cpp_unit_tests(runtime_build):
    res = subprocess.run([os.path.join(runtime_build, "runtime_test")],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "0 failed" in res.stdout


def test_fbank_cross_language_parity(runtime_build, tmp_path):
    """C++ serving fbank must match the training-side numpy/JAX fbank."""
    from wenet_celoss_tpu.data.wav import write_wav
    from wenet_celoss_tpu.ops.fbank import FbankConfig, compute_fbank_np

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 8000).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, wav, 16000)
    # Read back (quantized to int16) for an apples-to-apples comparison.
    from wenet_celoss_tpu.data.wav import read_wav
    wav_q, _ = read_wav(str(path))

    res = subprocess.run(
        [os.path.join(runtime_build, "fbank_main"), str(path), "40"],
        capture_output=True)
    assert res.returncode == 0, res.stderr
    t, d = struct.unpack("<II", res.stdout[:8])
    cpp_feat = np.frombuffer(res.stdout[8:], "<f4").reshape(t, d)

    py_feat = compute_fbank_np(wav_q, FbankConfig(num_mel_bins=40))
    assert cpp_feat.shape == py_feat.shape
    np.testing.assert_allclose(cpp_feat, py_feat, rtol=1e-3, atol=2e-3)


def _train_tiny_streaming_model(tmp_path):
    """Train a tiny chunked transformer CTC/AED model and save artifacts."""
    import jax
    import jax.numpy as jnp
    import optax

    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.ops.fbank import FbankConfig, compute_fbank_np
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils import checkpoint as ckpt

    mel = 23
    chunk = 4
    configs = {
        "input_dim": mel, "output_dim": 8,
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "input_layer": "conv2d",
                         "pos_enc_layer_type": "abs_pos",
                         "static_chunk_size": chunk},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.7, "reverse_weight": 0.3,
                       "lsm_weight": 0.0},
        "dataset_conf": {"fbank_conf": {"num_mel_bins": mel}},
    }
    # Synthetic "speech": tones per label over raw audio → real fbank.
    rng = np.random.default_rng(0)
    freqs = {1: 400.0, 2: 1000.0, 3: 2400.0}
    sr = 16000
    seg = 3200  # 0.2s per token
    b = 4
    label_seqs = [[1, 2, 3], [3, 1, 2], [2, 3, 1], [1, 3, 2]]
    feats, labels = [], []
    for seq in label_seqs:
        wav = np.concatenate([
            8000 * np.sin(2 * np.pi * freqs[t]
                          * np.arange(seg) / sr) for t in seq])
        wav += rng.standard_normal(wav.shape) * 30
        feats.append(compute_fbank_np(wav.astype(np.float32),
                                      FbankConfig(num_mel_bins=mel)))
        labels.append(seq)
    t_max = max(f.shape[0] for f in feats)
    feats_pad = np.zeros((b, t_max, mel), np.float32)
    for i, f in enumerate(feats):
        feats_pad[i, :f.shape[0]] = f
    batch = {
        "feats": jnp.asarray(feats_pad),
        "feat_lengths": jnp.asarray([f.shape[0] for f in feats],
                                    dtype=jnp.int32),
        "labels": jnp.asarray(labels, dtype=jnp.int32),
        "label_lengths": jnp.full((b,), 3, jnp.int32),
    }
    model = init_model(configs)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(5e-3))
    state = T.create_train_state(model, variables, tx)
    grad_fn = T.make_grad_fn(model)
    apply_fn = T.make_apply_fn(tx)
    key = jax.random.PRNGKey(1)
    for _ in range(250):
        key, sub = jax.random.split(key)
        grads, metrics, _ = grad_fn(state, batch, sub)
        state, _ = apply_fn(state, grads)
    loss = float(metrics["loss"])
    assert loss < 1.5, f"tiny streaming model did not converge: {loss}"

    model_dir = tmp_path / "model"
    os.makedirs(model_dir, exist_ok=True)
    ckpt.save_checkpoint(state.params, str(model_dir / "final.ckpt"), {})
    with open(model_dir / "train.yaml", "w") as f:
        yaml.dump(configs, f)
    syms = {"<blank>": 0, "A": 1, "B": 2, "C": 3, "d": 4, "e": 5,
            "f": 6, "<sos/eos>": 7}
    with open(model_dir / "units.txt", "w") as f:
        for s, i in syms.items():
            f.write(f"{s} {i}\n")
    # One eval wav: labels 2 1 3.
    eval_seq = [2, 1, 3]
    wav = np.concatenate([
        8000 * np.sin(2 * np.pi * freqs[t] * np.arange(seg) / sr)
        for t in eval_seq]).astype(np.float32)
    from wenet_celoss_tpu.data.wav import write_wav
    wav_path = tmp_path / "eval.wav"
    write_wav(wav_path, wav, sr)
    return model_dir, wav_path, "BAC", chunk, mel


@pytest.mark.slow
def test_serving_stack_end_to_end(runtime_build, tmp_path):
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [os.path.join(runtime_build, "decoder_main"),
         "--wav_path", str(wav_path),
         "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd,
         "--chunk_size", str(chunk),
         "--num_bins", str(mel)],
        capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    line = res.stdout.strip().splitlines()[-1]
    hyp = line.split(maxsplit=1)[1] if " " in line else ""
    assert hyp.replace(" ", "").upper() == expected, res.stdout + res.stderr


@pytest.mark.slow
def test_c_api_binding(runtime_build, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "runtime", "binding", "python"))
    from wenet_tpu_runtime import Decoder

    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    # The C API reads the mel-bin count from the model dir's train.yaml.
    with open(model_dir / "worker_cmd.txt", "w") as f:
        f.write(f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
                f"--config {model_dir}/train.yaml "
                f"--checkpoint {model_dir}/final.ckpt "
                f"--chunk_size {chunk}\n")
    os.environ.setdefault("PYTHONPATH", REPO)
    dec = Decoder(str(model_dir),
                  lib_path=os.path.join(runtime_build,
                                        "libwenet_tpu_api.so"),
                  chunk_size=chunk)
    assert dec._handle
    result = dec.decode_wav(str(wav_path))
    sentence = result["nbest"][0]["sentence"]
    assert expected.lower() in sentence.replace(" ", "").lower(), result


def _train_tiny_streaming_transducer(tmp_path):
    """Tiny streaming transducer for the rnnt_greedy serving path."""
    import jax
    import jax.numpy as jnp
    import optax

    from wenet_celoss_tpu.models.factory import init_model
    from wenet_celoss_tpu.ops.fbank import FbankConfig, compute_fbank_np
    from wenet_celoss_tpu.parallel import train as T
    from wenet_celoss_tpu.utils import checkpoint as ckpt

    mel, chunk = 23, 4
    configs = {
        "input_dim": mel, "output_dim": 8,
        "encoder": "transformer",
        "encoder_conf": {"output_size": 32, "attention_heads": 2,
                         "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0,
                         "positional_dropout_rate": 0.0,
                         "input_layer": "conv2d",
                         "pos_enc_layer_type": "abs_pos",
                         "static_chunk_size": chunk},
        "decoder": "bitransformer",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64,
                         "num_blocks": 1, "r_num_blocks": 1,
                         "dropout_rate": 0.0},
        "predictor": "rnn",
        "predictor_conf": {"embed_size": 32, "output_size": 32,
                           "embed_dropout": 0.0, "hidden_size": 32,
                           "num_layers": 1, "dropout": 0.0},
        "joint_conf": {"join_dim": 32},
        "model_conf": {"transducer_weight": 0.6, "ctc_weight": 0.2,
                       "attention_weight": 0.2, "lsm_weight": 0.0,
                       "reverse_weight": 0.3},
        "dataset_conf": {"fbank_conf": {"num_mel_bins": mel}},
    }
    rng = np.random.default_rng(0)
    freqs = {1: 400.0, 2: 1000.0, 3: 2400.0}
    sr, seg, b = 16000, 3200, 4
    label_seqs = [[1, 2, 3], [3, 1, 2], [2, 3, 1], [1, 3, 2]]
    import jax.numpy as jnp
    feats, labels = [], []
    for seq in label_seqs:
        wav = np.concatenate([
            8000 * np.sin(2 * np.pi * freqs[t] * np.arange(seg) / sr)
            for t in seq])
        wav += rng.standard_normal(wav.shape) * 30
        feats.append(compute_fbank_np(wav.astype(np.float32),
                                      FbankConfig(num_mel_bins=mel)))
        labels.append(seq)
    t_max = max(f.shape[0] for f in feats)
    feats_pad = np.zeros((b, t_max, mel), np.float32)
    for i, f in enumerate(feats):
        feats_pad[i, :f.shape[0]] = f
    batch = {
        "feats": jnp.asarray(feats_pad),
        "feat_lengths": jnp.asarray([f.shape[0] for f in feats],
                                    dtype=jnp.int32),
        "labels": jnp.asarray(labels, dtype=jnp.int32),
        "label_lengths": jnp.full((b,), 3, jnp.int32),
    }
    model = init_model(configs)
    args = (batch["feats"], batch["feat_lengths"], batch["labels"],
            batch["label_lengths"])
    variables = model.init(jax.random.PRNGKey(0), *args)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(5e-3))
    state = T.create_train_state(model, variables, tx)
    train_step = T.make_train_step(model, tx)
    key = jax.random.PRNGKey(1)
    from wenet_celoss_tpu.decode.api import Decoder
    expected_train = [list(map(int, r)) for r in np.asarray(batch["labels"])]
    ok = False
    for i in range(1000):
        key, sub = jax.random.split(key)
        state, metrics, _ = train_step(state, batch, sub)
        if i >= 200 and i % 100 == 99:
            dec = Decoder(model, {"params": state.params})
            hyp = dec.rnnt_greedy_search(batch["feats"],
                                         batch["feat_lengths"])
            if hyp == expected_train:
                ok = True
                break
    assert ok, f"tiny transducer never fit the train set: {hyp}"

    model_dir = tmp_path / "tmodel"
    os.makedirs(model_dir, exist_ok=True)
    ckpt.save_checkpoint(state.params, str(model_dir / "final.ckpt"), {})
    with open(model_dir / "train.yaml", "w") as f:
        yaml.dump(configs, f)
    with open(model_dir / "units.txt", "w") as f:
        for s, i in {"<blank>": 0, "A": 1, "B": 2, "C": 3, "d": 4,
                     "e": 5, "f": 6, "<sos/eos>": 7}.items():
            f.write(f"{s} {i}\n")
    # The tiny predictor LM memorizes training label orders, so evaluate
    # on a TRAINING sequence — this test validates the serving plumbing
    # (pipeline ↔ worker ↔ incremental greedy), not generalization.
    eval_seq = [3, 1, 2]
    wav = np.concatenate([
        8000 * np.sin(2 * np.pi * freqs[t] * np.arange(seg) / sr)
        for t in eval_seq]).astype(np.float32)
    wav += np.random.default_rng(5).standard_normal(wav.shape) * 30
    from wenet_celoss_tpu.data.wav import write_wav
    wav_path = tmp_path / "teval.wav"
    write_wav(wav_path, wav, sr)
    return model_dir, wav_path, "CAB", chunk, mel


@pytest.mark.slow
def test_serving_transducer_greedy(runtime_build, tmp_path):
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_transducer(tmp_path)
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [os.path.join(runtime_build, "decoder_main"),
         "--wav_path", str(wav_path),
         "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd,
         "--chunk_size", str(chunk),
         "--num_bins", str(mel),
         "--mode", "rnnt_greedy_search"],
        capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    line = res.stdout.strip().splitlines()[-1]
    hyp = line.split(maxsplit=1)[1] if " " in line else ""
    assert hyp.replace(" ", "").upper() == expected, res.stdout + res.stderr


@pytest.mark.slow
def test_serving_transducer_beam(runtime_build, tmp_path):
    """decoder_main --mode rnnt_beam_search: streaming greedy partials +
    utterance-final JAX prefix-beam n-best (+ attention re-rank), i.e. the
    serving capability the reference's rnnt_prefix_beam_search.cc left
    unfinished."""
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_transducer(tmp_path)
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [os.path.join(runtime_build, "decoder_main"),
         "--wav_path", str(wav_path),
         "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd,
         "--chunk_size", str(chunk),
         "--num_bins", str(mel),
         "--mode", "rnnt_beam_search", "--beam", "4"],
        capture_output=True, text=True, env=env, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    line = res.stdout.strip().splitlines()[-1]
    hyp = line.split(maxsplit=1)[1] if " " in line else ""
    assert hyp.replace(" ", "").upper() == expected, res.stdout + res.stderr


def _ws_client_send(sock, opcode, payload: bytes):
    import struct as st
    hdr = bytes([0x80 | opcode])
    n = len(payload)
    # Client frames are masked per RFC 6455.
    mask = b"\x12\x34\x56\x78"
    if n < 126:
        hdr += bytes([0x80 | n])
    elif n < 65536:
        hdr += bytes([0x80 | 126]) + st.pack(">H", n)
    else:
        hdr += bytes([0x80 | 127]) + st.pack(">Q", n)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    sock.sendall(hdr + mask + masked)


def _ws_client_recv(sock):
    import struct as st

    def read_exact(n):
        buf = b""
        while len(buf) < n:
            c = sock.recv(n - len(buf))
            if not c:
                raise EOFError
            buf += c
        return buf

    hdr = read_exact(2)
    op = hdr[0] & 0x0F
    n = hdr[1] & 0x7F
    if n == 126:
        n = st.unpack(">H", read_exact(2))[0]
    elif n == 127:
        n = st.unpack(">Q", read_exact(8))[0]
    return op, read_exact(n)


@pytest.mark.slow
def test_websocket_server_end_to_end(runtime_build, tmp_path):
    import base64
    import hashlib
    import socket
    import time

    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    # NOTE: server's feature pipeline is 80-bin/16k; retrain won't match a
    # 23-bin model, so run the server with a worker on the same config but
    # accept that this test validates the PROTOCOL + pipeline plumbing:
    # handshake, signaling, PCM framing, partial/final results.
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [os.path.join(runtime_build, "websocket_server_main"),
         "--port", str(port),
         "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd,
         "--chunk_size", str(chunk),
         "--num_bins", str(mel),
         "--max_connections", "1"],
        env=env, stderr=subprocess.PIPE)
    try:
        # Wait for the listener.
        for _ in range(100):
            try:
                sock = socket.create_connection(("127.0.0.1", port),
                                                timeout=1)
                sock.settimeout(180)  # first decode includes jit compile
                break
            except OSError:
                time.sleep(0.2)
        else:
            raise RuntimeError("server never came up")
        # Handshake.
        key = base64.b64encode(b"0123456789abcdef").decode()
        req = (f"GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
               f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
               f"Sec-WebSocket-Version: 13\r\n\r\n")
        sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            resp += sock.recv(4096)
        assert b"101" in resp
        accept = base64.b64encode(hashlib.sha1(
            (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
        ).digest()).decode()
        assert accept.encode() in resp

        # Signal start, stream PCM from the eval wav, signal end.
        from wenet_celoss_tpu.data.wav import read_wav
        wav, sr = read_wav(str(wav_path))
        pcm = np.clip(wav, -32768, 32767).astype("<i2").tobytes()
        _ws_client_send(sock, 0x1, b'{"signal":"start"}')
        op, payload = _ws_client_recv(sock)
        assert b"server_ready" in payload
        for i in range(0, len(pcm), 6400):
            _ws_client_send(sock, 0x2, pcm[i:i + 6400])
        _ws_client_send(sock, 0x1, b'{"signal":"end"}')
        messages = []
        while True:
            op, payload = _ws_client_recv(sock)
            messages.append(payload.decode())
            if "speech_end" in payload.decode():
                break
        finals = [m for m in messages if "final_result" in m]
        assert finals, messages
        assert expected.lower().replace(" ", "") in \
            finals[-1].replace(" ", ""), messages
        sock.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


# ---------------------------------------------------------------------------
# WFST (LG) beam search: C++ ↔ Python parity + e2e TLG-style decode
# ---------------------------------------------------------------------------

WFST_ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.8\t<s>\t-0.4
-0.9\t</s>
-0.6\tab\t-0.3
-0.8\tba\t-0.25
-1.5\tb\t-0.1

\\2-grams:
-0.3\t<s> ab
-0.45\tab ba
-0.5\tba ab
-0.35\tab </s>

\\end\\
"""

WFST_LEXICON = [("ab", [1, 2]), ("ba", [2, 1]), ("b", [2])]


def _build_test_lg(tmp_path):
    from wenet_celoss_tpu.lm.arpa import ArpaLM
    from wenet_celoss_tpu.lm.fst import build_lg
    arpa_path = tmp_path / "lm.arpa"
    arpa_path.write_text(WFST_ARPA)
    lg = build_lg(WFST_LEXICON, ArpaLM(str(arpa_path)), num_units=4)
    lg.write(str(tmp_path / "lg.bin"))
    return lg, tmp_path / "lg.bin"


@pytest.mark.parametrize("blank_skip", [1.1, 0.98])
def test_wfst_cross_language_parity(runtime_build, tmp_path, blank_skip):
    from wenet_celoss_tpu.lm.fst import WfstDecodeOptions, wfst_beam_decode
    lg, lg_bin = _build_test_lg(tmp_path)
    rng = np.random.default_rng(42)
    logp = rng.normal(size=(12, 4))
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    logp_path = tmp_path / "logp.txt"
    np.savetxt(logp_path, logp, fmt="%.8f")

    opts = WfstDecodeOptions(beam=1e8, max_active=10**9, nbest=3,
                             blank_skip_thresh=blank_skip)
    py_hyps = wfst_beam_decode(lg, logp, opts)

    res = subprocess.run(
        [os.path.join(runtime_build, "wfst_main"), str(lg_bin),
         str(logp_path), "1e8", "1.0", "1.0", str(blank_skip), "3"],
        capture_output=True, text=True, timeout=60)
    assert res.returncode == 0, res.stderr
    lines = [l for l in res.stdout.strip().splitlines() if l]
    assert lines, res.stdout
    cpp = []
    for line in lines:
        cost_s, words_s, units_s, times_s = line.split("|")
        cpp.append((float(cost_s),
                    [int(x) for x in words_s.split()],
                    [int(x) for x in units_s.split()],
                    [int(x) for x in times_s.split()]))
    assert cpp[0][0] == pytest.approx(py_hyps[0].cost, abs=1e-3)
    assert cpp[0][1] == py_hyps[0].words
    assert cpp[0][2] == py_hyps[0].units
    assert cpp[0][3] == py_hyps[0].word_times
    # Full n-best word sequences agree (float32 vs float64 ties aside).
    assert {tuple(h[1]) for h in cpp} == \
        {tuple(h.words) for h in py_hyps[:len(cpp)]}


@pytest.mark.slow
def test_serving_wfst_decode(runtime_build, tmp_path):
    """decoder_main --fst_path: word-level TLG-style decode through the
    full serving stack (JAX worker CTC posteriors -> LG beam search)."""
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    # Words over units A/B/C; the eval wav is "BAC" -> words "BA C".
    from wenet_celoss_tpu.lm.arpa import ArpaLM
    from wenet_celoss_tpu.lm.fst import build_lg
    arpa_path = tmp_path / "words.arpa"
    arpa_path.write_text(
        "\\data\\\nngram 1=5\n\n\\1-grams:\n"
        "-0.5\t<s>\n-0.5\t</s>\n-0.5\tBA\n-0.5\tC\n-0.9\tAB\n\n\\end\\\n")
    lexicon = [("BA", [2, 1]), ("C", [3]), ("AB", [1, 2])]
    lg = build_lg(lexicon, ArpaLM(str(arpa_path)), num_units=8)
    lg_bin = tmp_path / "lg.bin"
    lg.write(str(lg_bin))
    words_txt = tmp_path / "words.txt"
    with open(words_txt, "w") as f:
        for i, w in enumerate(lg.words):
            f.write(f"{w} {i}\n")

    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    res = subprocess.run(
        [os.path.join(runtime_build, "decoder_main"),
         "--wav_path", str(wav_path),
         "--symbol_table", str(words_txt),
         "--fst_path", str(lg_bin),
         "--worker_cmd", worker_cmd,
         "--chunk_size", str(chunk),
         "--num_bins", str(mel),
         "--blank_skip_thresh", "1.1"],
        capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    line = res.stdout.strip().splitlines()[-1]
    hyp = line.split(maxsplit=1)[1] if " " in line else ""
    # post-processor lowercases (reference post_processor.cc behavior)
    assert hyp.strip().lower() == "ba c", res.stdout + res.stderr


# ---------------------------------------------------------------------------
# RPC server (gRPC-surface equivalent over protobuf/TCP frames)
# ---------------------------------------------------------------------------

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


def _rpc_request_config(nbest: int = 1, continuous: bool = False) -> bytes:
    inner = b"\x08" + _varint(nbest)
    if continuous:
        inner += b"\x10\x01"
    return b"\x0a" + _varint(len(inner)) + inner


def _rpc_request_audio(pcm: bytes) -> bytes:
    return b"\x12" + _varint(len(pcm)) + pcm


def _rpc_parse_response(buf: bytes):
    """Minimal proto3 wire parse of Response: {status, type, [sentences]}."""
    status = rtype = 0
    sentences = []
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
            if field == 1:
                status = val
            elif field == 2:
                rtype = val
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            sub = buf[i:i + ln]
            i += ln
            if field == 3:  # OneBest
                j = 0
                while j < len(sub):
                    t2, j = _read_varint(sub, j)
                    f2, w2 = t2 >> 3, t2 & 7
                    if w2 == 2:
                        l2, j = _read_varint(sub, j)
                        if f2 == 1:
                            sentences.append(sub[j:j + l2].decode())
                        j += l2
                    else:
                        _, j = _read_varint(sub, j)
        else:
            raise ValueError(f"wire type {wt}")
    return status, rtype, sentences


def _rpc_send_frame(sock, payload: bytes):
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _rpc_recv_frame(sock) -> bytes:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        assert chunk, "connection closed"
        hdr += chunk
    (ln,) = struct.unpack(">I", hdr)
    buf = b""
    while len(buf) < ln:
        chunk = sock.recv(ln - len(buf))
        assert chunk, "connection closed mid-frame"
        buf += chunk
    return buf


@pytest.mark.slow
def test_rpc_server_end_to_end(runtime_build, tmp_path):
    """rpc_server_main: protobuf-framed streaming recognition (the gRPC
    serving surface) — config frame, PCM streaming, partial/final results,
    speech_end."""
    import socket
    import time
    if not os.path.exists(os.path.join(runtime_build, "rpc_server_main")):
        pytest.skip("protobuf not available; rpc server not built")
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [os.path.join(runtime_build, "rpc_server_main"),
         "--port", str(port), "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd, "--chunk_size", str(chunk),
         "--num_bins", str(mel), "--max_connections", "1"],
        env=env, stderr=subprocess.PIPE)
    try:
        sock = None
        for _ in range(120):
            try:
                sock = socket.create_connection(("127.0.0.1", port),
                                                timeout=5)
                break
            except OSError:
                time.sleep(0.5)
        assert sock is not None, "server never came up"
        sock.settimeout(120)

        from wenet_celoss_tpu.data.wav import read_wav
        wav, sr = read_wav(str(wav_path))
        pcm = np.asarray(wav, np.int16).tobytes()

        _rpc_send_frame(sock, _rpc_request_config(nbest=1))
        status, rtype, _ = _rpc_parse_response(_rpc_recv_frame(sock))
        assert (status, rtype) == (0, 0)  # ok, server_ready

        for i in range(0, len(pcm), 6400):
            _rpc_send_frame(sock, _rpc_request_audio(pcm[i:i + 6400]))
        _rpc_send_frame(sock, _rpc_request_audio(b""))  # end of input

        finals, done = [], False
        while not done:
            status, rtype, sentences = \
                _rpc_parse_response(_rpc_recv_frame(sock))
            assert status == 0
            if rtype == 2:
                finals.append(sentences)
            elif rtype == 3:
                done = True
        assert finals and finals[-1], finals
        assert expected.lower().replace(" ", "") in \
            finals[-1][0].replace(" ", "").lower(), finals
        sock.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


# ---------------------------------------------------------------------------
# Client CLI tools (tools/websocket_client.py, tools/rpc_client.py)
# ---------------------------------------------------------------------------


def _start_server(runtime_build, binary, model_dir, chunk, mel, port):
    worker_cmd = (
        f"{sys.executable} -m wenet_celoss_tpu.bin.runtime_worker "
        f"--config {model_dir}/train.yaml "
        f"--checkpoint {model_dir}/final.ckpt --chunk_size {chunk}")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.Popen(
        [os.path.join(runtime_build, binary),
         "--port", str(port), "--symbol_table", str(model_dir / "units.txt"),
         "--worker_cmd", worker_cmd, "--chunk_size", str(chunk),
         "--num_bins", str(mel), "--max_connections", "2"],
        env=env, stderr=subprocess.PIPE)


def _wait_port(port, timeout_s=60):
    import socket
    import time
    for _ in range(int(timeout_s / 0.5)):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=1).close()
            return
        except OSError:
            time.sleep(0.5)
    raise RuntimeError("server never came up")


@pytest.mark.slow
def test_websocket_client_tool(runtime_build, tmp_path):
    """tools/websocket_client.py end-to-end against websocket_server_main
    (parity surface: reference websocket_client_main + performance-ws.py)."""
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    port = _free_port()
    proc = _start_server(runtime_build, "websocket_server_main",
                         model_dir, chunk, mel, port)
    try:
        _wait_port(port)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "websocket_client.py"),
             "--port", str(port), "--wav_path", str(wav_path)],
            capture_output=True, text=True, timeout=300,
            env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO))
        assert res.returncode == 0, res.stderr
        assert expected.lower().replace(" ", "") in \
            res.stdout.replace(" ", "").lower(), res.stdout
        assert "RTF=" in res.stdout
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_rpc_client_tool(runtime_build, tmp_path):
    """tools/rpc_client.py end-to-end against rpc_server_main (parity
    surface: reference grpc_client_main)."""
    if not os.path.exists(os.path.join(runtime_build, "rpc_server_main")):
        pytest.skip("protobuf not available; rpc server not built")
    model_dir, wav_path, expected, chunk, mel = \
        _train_tiny_streaming_model(tmp_path)
    port = _free_port()
    proc = _start_server(runtime_build, "rpc_server_main",
                         model_dir, chunk, mel, port)
    try:
        _wait_port(port)
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "rpc_client.py"),
             "--port", str(port), "--wav_path", str(wav_path)],
            capture_output=True, text=True, timeout=300,
            env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO))
        assert res.returncode == 0, res.stderr
        assert "server_ready" in res.stdout
        assert expected.lower().replace(" ", "") in \
            res.stdout.replace(" ", "").lower(), res.stdout
    finally:
        proc.terminate()
        proc.wait(timeout=30)


class TestWebDemo:
    """runtime/web/app.py — static mic-demo page server (reference
    runtime/web gradio demo equivalent)."""

    def test_serves_page_with_injected_ws_port(self):
        import urllib.request
        port = _free_port()
        proc = subprocess.Popen(
            [sys.executable, "runtime/web/app.py", "--port", str(port),
             "--ws_port", "12345"], cwd=REPO)
        try:
            _wait_port(port)
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10).read().decode()
            assert "window.WS_PORT=12345" in body
            assert "WebSocket" in body and "getUserMedia" in body
            # protocol parity with the websocket server
            assert '"start"' in body.replace("signal: ", '"signal": ') \
                or 'signal: "start"' in body
        finally:
            proc.terminate()
            proc.wait(timeout=10)


def test_hub_load_model(tmp_path):
    """Python-binding model hub (parity with the reference's
    runtime/binding/python/py/hub.py): name/URL/path → cached local model
    dir, sha256 pinning, traversal-safe extraction."""
    import hashlib
    import io
    import tarfile

    sys.path.insert(0, os.path.join(REPO, "runtime", "binding", "python"))
    import hub

    bundle_dir = tmp_path / "m"
    bundle_dir.mkdir()
    (bundle_dir / "train.yaml").write_text("input_dim: 23\n")
    (bundle_dir / "units.txt").write_text("<blank> 0\n")
    archive = tmp_path / "model.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(bundle_dir, arcname="m")
    digest = hashlib.sha256(archive.read_bytes()).hexdigest()

    os.environ["WENET_TPU_HUB_CACHE"] = str(tmp_path / "cache")
    # file:// URL with sha pin
    d1 = hub.load_model(f"file://{archive}", sha256=digest)
    assert os.path.exists(os.path.join(d1, "train.yaml"))
    # cached: second call returns without re-downloading
    d2 = hub.load_model(f"file://{archive}")
    assert d1 == d2
    # registry name
    hub.register_model("tiny", f"file://{archive}", sha256=digest)
    d3 = hub.load_model("tiny")
    assert os.path.exists(os.path.join(d3, "units.txt"))
    # wrong sha rejected
    try:
        hub.load_model(f"file://{archive}", sha256="0" * 64, force=True)
        raise AssertionError("sha mismatch not detected")
    except ValueError:
        pass
    # traversal rejected
    evil = tmp_path / "evil.tar.gz"
    with tarfile.open(evil, "w:gz") as tar:
        info = tarfile.TarInfo("../escape.txt")
        data = b"x"
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    try:
        hub.load_model(str(evil), force=True)
        raise AssertionError("traversal not detected")
    except ValueError:
        pass
