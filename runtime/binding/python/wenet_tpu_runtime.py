"""Python binding over the C API via ctypes.

Capability parity with the reference's pybind11 ``wenetruntime`` package
(`runtime/binding/python/py/decoder.py:22-113`) without requiring pybind11:
ctypes over libwenet_tpu_api.so.
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import List, Optional


def _find_library(hint: Optional[str] = None) -> str:
    candidates = []
    if hint:
        candidates.append(hint)
    here = os.path.dirname(os.path.abspath(__file__))
    candidates += [
        os.path.join(here, "libwenet_tpu_api.so"),
        os.path.join(here, "../../build/libwenet_tpu_api.so"),
        "libwenet_tpu_api.so",
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return candidates[-1]


class Decoder:
    def __init__(self, model_dir: str, lib_path: Optional[str] = None,
                 nbest: int = 1, enable_timestamp: bool = False,
                 context: Optional[List[str]] = None,
                 context_score: float = 3.0,
                 continuous_decoding: bool = False,
                 chunk_size: int = 16):
        self._lib = ctypes.CDLL(_find_library(lib_path))
        self._lib.wenet_init.restype = ctypes.c_void_p
        self._lib.wenet_init.argtypes = [ctypes.c_char_p]
        self._lib.wenet_decode.restype = ctypes.c_char_p
        self._lib.wenet_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        self._lib.wenet_get_result.restype = ctypes.c_char_p
        self._lib.wenet_get_result.argtypes = [ctypes.c_void_p]
        for name, argtypes in [
            ("wenet_free", [ctypes.c_void_p]),
            ("wenet_reset", [ctypes.c_void_p]),
            ("wenet_set_nbest", [ctypes.c_void_p, ctypes.c_int]),
            ("wenet_set_timestamp", [ctypes.c_void_p, ctypes.c_int]),
            ("wenet_add_context", [ctypes.c_void_p, ctypes.c_char_p]),
            ("wenet_set_context_score",
             [ctypes.c_void_p, ctypes.c_float]),
            ("wenet_set_continuous_decoding",
             [ctypes.c_void_p, ctypes.c_int]),
            ("wenet_set_chunk_size", [ctypes.c_void_p, ctypes.c_int]),
        ]:
            getattr(self._lib, name).argtypes = argtypes
            getattr(self._lib, name).restype = None

        self._handle = self._lib.wenet_init(model_dir.encode())
        if not self._handle:
            raise RuntimeError(f"wenet_init failed for {model_dir}")
        self._lib.wenet_set_nbest(self._handle, nbest)
        self._lib.wenet_set_timestamp(self._handle,
                                      1 if enable_timestamp else 0)
        for w in context or []:
            self._lib.wenet_add_context(self._handle, w.encode())
        self._lib.wenet_set_context_score(self._handle, context_score)
        self._lib.wenet_set_continuous_decoding(
            self._handle, 1 if continuous_decoding else 0)
        self._lib.wenet_set_chunk_size(self._handle, chunk_size)

    def decode(self, pcm: bytes, last: bool = True) -> dict:
        res = self._lib.wenet_decode(self._handle, pcm, len(pcm),
                                     1 if last else 0)
        return json.loads(res.decode()) if res else {}

    def decode_wav(self, wav_path: str) -> dict:
        with open(wav_path, "rb") as f:
            data = f.read()
        # Assume PCM16 mono WAV with a 44-byte canonical header.
        return self.decode(data[44:], True)

    def reset(self):
        self._lib.wenet_reset(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.wenet_free(self._handle)
