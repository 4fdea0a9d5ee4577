"""Inverse DSP: iSTFT, Griffin-Lim phase recovery, mel inversion.

Reference capabilities being matched (script/utilities/audio/):
- ``STFT.inverse``: conv_transpose overlap-add with window-sumsquare
  modulation correction (stft.py:91-130);
- ``griffin_lim``: iterative phase recovery (audio_processing.py:66-82);
- ``window_sumsquare``: librosa-0.6 envelope (audio_processing.py:7-63);
- ``inv_mel_spec``: mel -> linear magnitude via the mel-basis pseudo-inverse
  -> griffin-lim -> wav (script/utilities/audio/tools.py:22-38).

TPU-native form: overlap-add is a static scatter-add; the Griffin-Lim loop
is a ``lax.fori_loop`` of (framed rFFT <-> irFFT) — fully jittable, batched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.ops.mel import hann_window, mel_filterbank, stft_magnitude


@functools.lru_cache(maxsize=None)
def window_sumsquare(n_frames: int, hop_length: int, win_length: int, n_fft: int) -> np.ndarray:
    """Sum-square Hann envelope over the overlap-add grid."""
    n = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(n, np.float64)
    win_sq = hann_window(win_length).astype(np.float64) ** 2
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win_sq = np.pad(win_sq, (pad, n_fft - win_length - pad))
    for i in range(n_frames):
        s = i * hop_length
        x[s : min(n, s + n_fft)] += win_sq[: max(0, min(n_fft, n - s))]
    return x.astype(np.float32)


def stft_complex(y: jnp.ndarray, n_fft: int = 1024, hop_length: int = 160, win_length: int = 1024) -> jnp.ndarray:
    """Complex STFT (center=True reflect padding) -> ``[..., frames, bins]``."""
    pad = n_fft // 2
    padding = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    y = jnp.pad(y, padding, mode="reflect")
    total = y.shape[-1]
    n_frames = 1 + (total - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = y[..., idx] * jnp.asarray(hann_window(win_length))
    return jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)


def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse of :func:`stft_complex` (center=True semantics): windowed
    overlap-add with sum-square normalization. ``spec``: complex
    ``[..., frames, bins]``."""
    n_frames = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * jnp.asarray(hann_window(win_length))
    total = n_fft + hop_length * (n_frames - 1)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    out = jnp.zeros((flat.shape[0], total), jnp.float32)
    out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))
    wss = window_sumsquare(n_frames, hop_length, win_length, n_fft)
    wss = np.where(wss > 1e-10, wss, 1.0)
    out = out / jnp.asarray(wss)
    pad = n_fft // 2
    out = out[:, pad : total - pad]
    if length is not None:
        out = out[:, :length]
    return out.reshape(batch_shape + (out.shape[-1],))


def griffin_lim(
    magnitude: jnp.ndarray,
    rng: jax.Array,
    n_iters: int = 30,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    length: int | None = None,
) -> jnp.ndarray:
    """Phase recovery from a magnitude STFT ``[..., frames, bins]``.

    Explicit ``jax.random`` phase init (the reference seeds from global
    numpy RNG, audio_processing.py:74 — documented deviation)."""
    phase = jax.random.uniform(rng, magnitude.shape, jnp.float32, -np.pi, np.pi)
    spec = magnitude * jnp.exp(1j * phase)

    def body(_, spec):
        signal = istft(spec, n_fft, hop_length, win_length)
        new = stft_complex(signal, n_fft, hop_length, win_length)
        new = new[..., : magnitude.shape[-2], :]
        angles = new / jnp.maximum(jnp.abs(new), 1e-16)
        return magnitude * angles

    spec = jax.lax.fori_loop(0, n_iters, body, spec)
    return istft(spec, n_fft, hop_length, win_length, length=length)


def inv_mel_spec(
    log_mel: jnp.ndarray,
    rng: jax.Array,
    sampling_rate: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    n_mel: int = 64,
    mel_fmin: float = 0.0,
    mel_fmax: float = 8000.0,
    n_iters: int = 32,
) -> jnp.ndarray:
    """Log-mel ``[..., frames, n_mel]`` -> waveform via mel pseudo-inverse +
    Griffin-Lim (reference: tools.py:22-38)."""
    basis = mel_filterbank(sampling_rate, n_fft, n_mel, mel_fmin, mel_fmax)  # [mel, bins]
    pinv = jnp.asarray(np.linalg.pinv(basis))  # [bins, mel]
    mel = jnp.exp(log_mel)
    mag = jnp.maximum(jnp.einsum("...tm,bm->...tb", mel, pinv), 0.0)
    return griffin_lim(mag, rng, n_iters, n_fft, hop_length, win_length)
