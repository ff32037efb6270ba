"""RIFF WAV reading/writing in pure numpy.

Parity with the reference C++ ``WavReader``/``WavWriter``
(`runtime/core/frontend/wav.h:60-241`): PCM16/PCM32/float chunks, header
scan that skips non-data chunks, and int16-range float output (kaldi
convention). No torchaudio/soundfile dependency.
"""

from __future__ import annotations

import io
import struct
from typing import Tuple

import numpy as np


def read_wav(source) -> Tuple[np.ndarray, int]:
    """Read a WAV file.

    Args:
      source: path or file-like object or bytes.
    Returns: (samples [num_samples] or [num_samples, channels] float32 in
      int16 range, sample_rate)
    """
    if isinstance(source, (bytes, bytearray)):
        f = io.BytesIO(source)
    elif hasattr(source, "read"):
        f = source
    else:
        f = open(source, "rb")
    try:
        riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            chunk_id, chunk_size = struct.unpack("<4sI", hdr)
            if chunk_id == b"fmt ":
                fmt = f.read(chunk_size)
            elif chunk_id == b"data":
                data = f.read(chunk_size)
                break
            else:
                f.seek(chunk_size + (chunk_size & 1), 1)
        if fmt is None or data is None:
            raise ValueError("missing fmt or data chunk")
        (audio_format, channels, sample_rate, _br, _ba,
         bits) = struct.unpack("<HHIIHH", fmt[:16])
        if audio_format == 1:  # PCM
            if bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float32)
            elif bits == 32:
                x = np.frombuffer(data, "<i4").astype(np.float32) / 65536.0
            elif bits == 8:
                x = (np.frombuffer(data, "u1").astype(np.float32)
                     - 128.0) * 256.0
            else:
                raise ValueError(f"unsupported PCM bits: {bits}")
        elif audio_format == 3:  # IEEE float
            x = np.frombuffer(data, "<f4").astype(np.float32) * 32768.0
        else:
            raise ValueError(f"unsupported format code: {audio_format}")
        if channels > 1:
            x = x.reshape(-1, channels)
        return x, sample_rate
    finally:
        if f is not source and not isinstance(source, (bytes, bytearray)):
            f.close()
        elif isinstance(source, (bytes, bytearray)):
            f.close()


def write_wav(path, samples: np.ndarray, sample_rate: int):
    """Write PCM16 WAV; samples float in int16 range."""
    x = np.clip(np.round(np.asarray(samples)), -32768, 32767).astype("<i2")
    channels = 1 if x.ndim == 1 else x.shape[1]
    data = x.tobytes()
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE"))
        f.write(struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, channels,
                            sample_rate, sample_rate * channels * 2,
                            channels * 2, 16))
        f.write(struct.pack("<4sI", b"data", len(data)))
        f.write(data)


def read_audio(source) -> Tuple[np.ndarray, int]:
    """Format-sniffing audio reader: RIFF/WAVE or FLAC.

    The reference pipeline delegates format handling to torchaudio
    (reference `wenet/dataset/processor.py:115-153`); here the two
    formats speech corpora actually use (LibriSpeech ships .flac,
    `examples/librispeech/s0/run.sh:47-120`) are read by the in-tree
    decoders. Same return contract as read_wav.
    """
    if isinstance(source, (bytes, bytearray)):
        head = bytes(source[:4])
        data = source
    elif hasattr(source, "read"):
        data = source.read()
        head = data[:4]
    else:
        with open(source, "rb") as f:
            data = f.read()
        head = data[:4]
    if head == b"fLaC":
        from wenet_celoss_tpu.data.flac import read_flac
        return read_flac(data)
    return read_wav(data)
