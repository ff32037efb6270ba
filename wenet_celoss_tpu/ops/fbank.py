"""Kaldi-compatible log-mel filterbank frontend, TPU-native.

Replaces the reference's two fbank implementations — torchaudio
``kaldi.fbank`` on the training side (`wenet/dataset/processor.py:256-287`)
and the hand-rolled C++ ``Fbank`` in the serving runtime
(`runtime/core/frontend/fbank.h:31-218`, `fft.cc`) — with ONE jit-able JAX
implementation usable in both training input pipelines and on-device batch
decoding. The DSP chain matches kaldi exactly (snip_edges framing, dither,
DC removal, 0.97 preemphasis, povey window, pow2 rFFT, power spectrum,
triangular mel bins with low=20Hz/high=nyquist, natural log with eps floor).

Everything is batched and shape-static: waveforms come in as a padded
[B, S] array with lengths; outputs are [B, T, M] with frame lengths. The
heavy ops (rFFT, mel matmul) map directly onto XLA's TPU FFT and the MXU;
framing is a strided gather that XLA fuses with the window arithmetic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np

# jax is imported lazily (inside the device-path functions): the host
# input-pipeline workers (data/loader.py processes, data/processor.py)
# only use the numpy fbank, and a spawned loader worker that pulls in
# jax (+ the axon PJRT registration in sitecustomize) pays ~4 s of
# interpreter startup for nothing. With the lazy import a worker boots
# in well under a second.


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    dither: float = 0.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0  # <=0: offset from nyquist
    window_type: str = "povey"
    snip_edges: bool = True
    energy_floor: float = 0.0

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def num_frames(num_samples, cfg: FbankConfig):
    """Kaldi snip_edges frame count; works on ints or traced arrays.

    Concrete python/numpy inputs MUST stay off the jnp path: a
    ``jnp.maximum`` on an int creates a device scalar, and ``int()`` of
    it is a device→host sync — ~32 ms per call over the axon tunnel,
    which made the HOST fbank 50 ms/utterance (tools/bench_pipeline.py
    found the input pipeline at 168 audio-s/s because of it)."""
    if cfg.snip_edges:
        n = (num_samples - cfg.frame_length) // cfg.frame_shift + 1
        if isinstance(num_samples, (int, np.integer)) or \
                isinstance(num_samples, np.ndarray):
            return np.maximum(n, 0)
        import jax.numpy as jnp
        return jnp.maximum(n, 0)
    return (num_samples + cfg.frame_shift // 2) // cfg.frame_shift


@lru_cache(maxsize=16)
def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {cfg.window_type!r}")
    return w.astype(np.float32)


@lru_cache(maxsize=16)
def mel_banks(cfg: FbankConfig) -> np.ndarray:
    """[num_bins, fft/2+1] triangular mel weights, kaldi-style
    (reference `runtime/core/frontend/fbank.h:52-90`)."""
    nfft = cfg.fft_size
    nyquist = 0.5 * cfg.sample_rate
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_low, mel_high = mel(cfg.low_freq), mel(high)
    delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)
    bins = np.zeros((cfg.num_mel_bins, nfft // 2 + 1), dtype=np.float32)
    fft_freqs = np.arange(nfft // 2 + 1) * (cfg.sample_rate / nfft)
    mel_freqs = mel(fft_freqs)
    for m in range(cfg.num_mel_bins):
        left = mel_low + m * delta
        center = mel_low + (m + 1) * delta
        right = mel_low + (m + 2) * delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[m] = np.maximum(0.0, np.minimum(up, down))
    return bins


def frame_signal(wav, max_frames: int, cfg: FbankConfig):
    """[..., S] → [..., max_frames, frame_length] strided framing.

    TPU-friendly formulation: overlapping frames are assembled from K
    shifted SLICES of a [..., R, shift] reshape (frame t = rows
    t..t+K-1), not a [T, frame_len] gather — gathers serialize on the
    TPU while slices+concat are pure layout copies. 5.75× fbank
    throughput at B=256 (5.3k → 30.5k audio-s/s on one v5e; ROADMAP)."""
    import jax.numpy as jnp
    shift, flen = cfg.frame_shift, cfg.frame_length
    k = -(-flen // shift)                      # rows per frame
    # Samples needed: row index max = (max_frames-1) + (k-1) rows.
    rows = max_frames + k - 1
    need = rows * shift
    s = wav.shape[-1]
    if need > s:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, need - s)],
                      mode="edge")
    else:
        wav = wav[..., :need]
    tiles = wav.reshape(wav.shape[:-1] + (rows, shift))
    parts = [tiles[..., i:i + max_frames, :] for i in range(k)]
    frames = jnp.concatenate(parts, axis=-1)   # [..., T, k*shift]
    return frames[..., :flen]


def _fbank_impl(wav, lengths, cfg: FbankConfig, max_frames: int,
                dither_key):
    import jax
    import jax.numpy as jnp
    window = jnp.asarray(_window(cfg))
    mels = jnp.asarray(mel_banks(cfg))

    frames = frame_signal(wav.astype(jnp.float32), max_frames, cfg)
    if cfg.dither > 0.0 and dither_key is not None:
        frames = frames + cfg.dither * jax.random.normal(
            dither_key, frames.shape, jnp.float32)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis > 0.0:
        shifted = jnp.concatenate(
            [frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * shifted
    frames = frames * window

    nfft = cfg.fft_size
    pad = nfft - cfg.frame_length
    if pad:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad)])
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel_energy = jnp.einsum("...tf,mf->...tm", power, mels)
    feats = jnp.log(jnp.maximum(mel_energy, jnp.finfo(jnp.float32).tiny))

    feat_lens = num_frames(lengths, cfg)
    valid = jnp.arange(max_frames)[None, :] < feat_lens[..., None]
    feats = jnp.where(valid[..., None], feats, 0.0)
    return feats, feat_lens


# scipy's pocketfft computes rfft natively in float32 (3.5× the
# throughput of np.fft, which always promotes to float64); numpy remains
# the fallback so the pipeline runs on a scipy-less host.
try:
    from scipy.fft import rfft as _rfft_f32
except ImportError:  # pragma: no cover - image always has scipy
    _rfft_f32 = None


_NOISE_TABLE_BITS = 22  # 4M floats, 16 MB, built once per process


@lru_cache(maxsize=1)
def _noise_table() -> np.ndarray:
    """Shared gaussian table for dither noise.

    Drawing fresh N(0,1) per frame sample is the single most expensive
    op in the host fbank (ziggurat ≈ 4.5 ms per 12 s utterance — more
    than the FFT). Dither only needs to decorrelate quantization, so the
    pipeline slices a 4M-entry gaussian table at an rng-chosen offset
    instead: marginally N(0,1), deterministic per (epoch, sample) via
    the caller's counter-based rng, ~0 cost. The table seed is fixed so
    runs are reproducible; cross-utterance noise correlations exist only
    between random table offsets and are irrelevant at dither scale
    (≈ -90 dBFS vs int16-range speech)."""
    return np.random.default_rng(0x5EED_D17E).standard_normal(
        1 << _NOISE_TABLE_BITS, dtype=np.float32)


def _dither_noise(shape, rng: np.random.Generator) -> np.ndarray:
    count = int(np.prod(shape))
    table = _noise_table()
    if count > table.size:  # absurdly long utterance: fall back
        return rng.standard_normal(shape, dtype=np.float32)
    off = int(rng.integers(0, table.size - count + 1))
    return table[off:off + count].reshape(shape)


def compute_fbank_np(wav: np.ndarray, cfg: FbankConfig = FbankConfig(),
                     rng: np.random.Generator | None = None) -> np.ndarray:
    """Host-side (numpy) fbank for the input pipeline workers — identical
    DSP chain to the JAX path (shared window/mel tables). [S] → [T, M].

    Hot-path notes (tools/bench_pipeline.py): framing is one
    sliding-window view + copy (no per-call index matrix), the dc/
    preemphasis/window chain runs in place on that copy, dither comes
    from the shared noise table, and the FFT is scipy's float32 rfft.
    Together ≈ 17.6 → ≈ 4 ms per 12 s utterance on one core."""
    wav = np.asarray(wav, np.float32)
    n = int(num_frames(len(wav), cfg))
    if n <= 0:
        return np.zeros((0, cfg.num_mel_bins), np.float32)
    shift, length = cfg.frame_shift, cfg.frame_length
    frames = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(wav, length)[::shift][:n])
    if cfg.dither > 0.0 and rng is not None:
        frames += cfg.dither * _dither_noise(frames.shape, rng)
    if cfg.remove_dc_offset:
        frames -= frames.mean(axis=1, keepdims=True)
    if cfg.preemphasis > 0.0:
        # In place: columns 1.. use the ORIGINAL left neighbor (the RHS
        # temporary is materialized before the subtraction lands), then
        # column 0 scales itself (kaldi convention).
        frames[:, 1:] -= cfg.preemphasis * frames[:, :-1]
        frames[:, 0] *= 1.0 - cfg.preemphasis
    frames *= _window(cfg)
    if _rfft_f32 is not None:
        spec = _rfft_f32(frames, n=cfg.fft_size, axis=1)
    else:
        spec = np.fft.rfft(frames, n=cfg.fft_size, axis=1)
    power = np.square(spec.real) + np.square(spec.imag)
    mel = power @ mel_banks(cfg).T
    return np.log(np.maximum(mel, np.finfo(np.float32).tiny)).astype(
        np.float32)


@dataclass(frozen=True)
class MfccConfig(FbankConfig):
    """Kaldi MFCC on top of the mel chain (reference training-side op
    `wenet/dataset/processor.py:288-324` via torchaudio kaldi.mfcc).

    MFCC = DCT-II of the log-mel energies, keeping ``num_ceps``
    coefficients, then cepstral liftering. torchaudio's kaldi.mfcc
    defaults to use_energy=False (c0 is the DCT coefficient, not log
    energy), which is what the reference uses; we match that.
    """
    num_ceps: int = 13
    cepstral_lifter: float = 22.0


def _dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """Kaldi-style (orthonormal) DCT-II matrix [num_ceps, num_bins]."""
    n = np.arange(num_bins)
    mat = np.zeros((num_ceps, num_bins), dtype=np.float64)
    mat[0] = math.sqrt(1.0 / num_bins)
    for k in range(1, num_ceps):
        mat[k] = math.sqrt(2.0 / num_bins) * np.cos(
            math.pi / num_bins * (n + 0.5) * k)
    return mat.astype(np.float32)


def _lifter(cfg: MfccConfig) -> np.ndarray:
    if cfg.cepstral_lifter == 0.0:
        return np.ones(cfg.num_ceps, np.float32)
    i = np.arange(cfg.num_ceps)
    return (1.0 + 0.5 * cfg.cepstral_lifter * np.sin(
        math.pi * i / cfg.cepstral_lifter)).astype(np.float32)


def compute_mfcc_np(wav: np.ndarray, cfg: MfccConfig = MfccConfig(),
                    rng: np.random.Generator | None = None) -> np.ndarray:
    """Host-side MFCC: log-mel (shared chain) → DCT → lifter. [S] → [T, C]."""
    logmel = compute_fbank_np(wav, cfg, rng)
    ceps = logmel @ _dct_matrix(cfg.num_ceps, cfg.num_mel_bins).T
    return (ceps * _lifter(cfg)).astype(np.float32)


def compute_mfcc(wav, lengths=None, cfg: MfccConfig = MfccConfig(),
                 dither_key=None):
    """Batched jit-able MFCC. Same I/O contract as :func:`compute_fbank`
    with M = cfg.num_ceps output coefficients."""
    import jax.numpy as jnp
    feats, feat_lens = compute_fbank(wav, lengths, cfg, dither_key)
    dct = jnp.asarray(_dct_matrix(cfg.num_ceps, cfg.num_mel_bins))
    ceps = jnp.einsum("...tm,cm->...tc", feats, dct) * jnp.asarray(
        _lifter(cfg))
    return ceps, feat_lens


@lru_cache(maxsize=1)
def _jitted_fbank_impl():
    import jax
    return jax.jit(_fbank_impl, static_argnames=("cfg", "max_frames"))


def compute_fbank(wav, lengths=None, cfg: FbankConfig = FbankConfig(),
                  dither_key=None):
    """Compute log-mel features (jit-compiled device path).

    Args:
      wav: [S] or [B, S] PCM waveform scaled to int16 range (kaldi
        convention: values in [-32768, 32767], not [-1, 1]).
      lengths: [B] valid sample counts (defaults to full length).
      dither_key: PRNG key enabling dither when cfg.dither > 0.

    Returns:
      (feats [B, T, M] or [T, M], feat_lengths)
    """
    import jax.numpy as jnp
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if lengths is None:
        lengths = jnp.full((wav.shape[0],), wav.shape[-1], jnp.int32)
    max_frames = max(int(num_frames(wav.shape[-1], cfg)), 1)
    feats, feat_lens = _jitted_fbank_impl()(wav, lengths, cfg, max_frames,
                                            dither_key)
    if squeeze:
        return feats[0], feat_lens[0]
    return feats, feat_lens
