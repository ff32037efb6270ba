"""Kaldi ark/scp matrix and vector IO (pure numpy).

Parity with reference ``wenet/dataset/kaldi_io.py`` for the formats the
toolkit actually uses: binary float/double matrices and vectors ("BFM",
"BDM", "BFV", "BDV"), text-mode matrices, scp offset indexing, and
write_mat/write_vec_flt.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Tuple

import numpy as np


def _read_token(f) -> str:
    tok = b""
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return tok.decode()


def read_mat(f_or_path) -> np.ndarray:
    """Read one matrix at the current position (after the key)."""
    f = open(f_or_path, "rb") if isinstance(f_or_path, str) else f_or_path
    binary = f.read(2)
    if binary == b"\x00B":
        return _read_mat_binary(f)
    # Text mode: rewind those two bytes into the parse.
    rest = binary + f.read()
    return _read_mat_text(rest.decode())


def _read_mat_binary(f) -> np.ndarray:
    header = _read_token(f)
    if header in ("CM", "CM2", "CM3"):
        raise NotImplementedError("compressed matrices not supported")
    dtype = {"FM": "<f4", "DM": "<f8"}.get(header)
    if dtype is None:
        raise ValueError(f"unknown matrix header {header!r}")
    assert f.read(1) == b"\x04"
    rows = struct.unpack("<i", f.read(4))[0]
    assert f.read(1) == b"\x04"
    cols = struct.unpack("<i", f.read(4))[0]
    data = np.frombuffer(f.read(rows * cols * int(dtype[2])), dtype)
    return data.reshape(rows, cols).astype(np.float32)


def _read_mat_text(text: str) -> np.ndarray:
    body = text[text.index("[") + 1: text.index("]")]
    rows = [r for r in body.strip().split("\n") if r.strip()]
    return np.array([[float(v) for v in r.split()] for r in rows],
                    np.float32)


def read_vec_flt(f) -> np.ndarray:
    binary = f.read(2)
    if binary == b"\x00B":
        header = _read_token(f)
        dtype = {"FV": "<f4", "DV": "<f8"}.get(header)
        if dtype is None:
            raise ValueError(f"unknown vector header {header!r}")
        assert f.read(1) == b"\x04"
        n = struct.unpack("<i", f.read(4))[0]
        return np.frombuffer(f.read(n * int(dtype[2])),
                             dtype).astype(np.float32)
    rest = (binary + f.read()).decode()
    body = rest[rest.index("[") + 1: rest.index("]")]
    return np.array([float(v) for v in body.split()], np.float32)


def read_ark(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) over a binary/text ark file."""
    with open(path, "rb") as f:
        while True:
            key = b""
            while True:
                c = f.read(1)
                if not c:
                    return
                if c == b" ":
                    break
                key += c
            yield key.decode(), read_mat(f)


def read_scp(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Iterate (key, matrix) via an scp of `key ark_path:offset` lines."""
    with open(path, "r") as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) != 2:
                continue
            key, target = parts
            ark_path, offset = target.rsplit(":", 1)
            with open(ark_path, "rb") as ark:
                ark.seek(int(offset))
                yield key, read_mat(ark)


def write_mat(f, mat: np.ndarray, key: str = "") -> int:
    """Write a binary float matrix; returns the value offset (for scp)."""
    if key:
        f.write((key + " ").encode())
    offset = f.tell()
    f.write(b"\x00BFM ")
    rows, cols = mat.shape
    f.write(b"\x04" + struct.pack("<i", rows))
    f.write(b"\x04" + struct.pack("<i", cols))
    f.write(np.ascontiguousarray(mat, "<f4").tobytes())
    return offset


def write_vec_flt(f, vec: np.ndarray, key: str = "") -> int:
    if key:
        f.write((key + " ").encode())
    offset = f.tell()
    f.write(b"\x00BFV ")
    f.write(b"\x04" + struct.pack("<i", len(vec)))
    f.write(np.ascontiguousarray(vec, "<f4").tobytes())
    return offset
