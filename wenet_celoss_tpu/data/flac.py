"""FLAC decoding for the data pipeline (ctypes over the C++ decoder).

LibriSpeech — the corpus the reference recipe trains on
(reference ``examples/librispeech/s0/run.sh:47-120``) — is distributed as
.flac; this image has no codec library or flac/ffmpeg binary, so the
framework carries its own decoder: ``runtime/core/frontend/flac.cc``
(from scratch, see its header for scope). This module binds it via
ctypes, building a small shared object on first use with the system g++
(cached under ~/.cache/wenet_tpu, keyed by a source hash) — no
pip/cmake step required for the Python pipeline; the CMake build also
compiles the same source into the serving runtime.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Tuple

import numpy as np

_LIB = None


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "runtime", "core", "frontend", "flac.cc")


def _include_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "runtime", "core")


def _build_lib() -> str:
    src = _source_path()
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "WENET_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wenet_tpu"))
    os.makedirs(cache, exist_ok=True)
    lib = os.path.join(cache, f"libflacdec_{digest}.so")
    if not os.path.exists(lib):
        tmp = lib + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-I", _include_dir(), src, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, lib)  # atomic under concurrent workers
    return lib


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.flac_decode.restype = ctypes.c_int
        lib.flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.flac_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
    return _LIB


def read_flac(source) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file/bytes.

    Returns (samples float32 scaled to int16 range, sample_rate);
    samples are [n] for mono, [n, channels] otherwise — the same contract
    as data.wav.read_wav.
    """
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as f:
            data = f.read()
    lib = _lib()
    out = ctypes.POINTER(ctypes.c_int32)()
    channels = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.flac_decode(data, len(data), ctypes.byref(out),
                         ctypes.byref(channels), ctypes.byref(rate),
                         ctypes.byref(bits), ctypes.byref(frames))
    if rc != 0:
        raise ValueError(f"flac decode failed (rc={rc})")
    try:
        n = frames.value * channels.value
        arr = np.ctypeslib.as_array(out, shape=(n,)).astype(np.float32)
    finally:
        lib.flac_free(out)
    # Scale to int16 range like read_wav (24-bit → /256, 8-bit → *256).
    shift = bits.value - 16
    if shift > 0:
        arr /= float(1 << shift)
    elif shift < 0:
        arr *= float(1 << (-shift))
    if channels.value > 1:
        arr = arr.reshape(frames.value, channels.value)
    return arr, rate.value
