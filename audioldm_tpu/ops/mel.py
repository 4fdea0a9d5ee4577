"""DSP core: STFT + Slaney mel filterbank + log compression.

TPU-native re-design of the reference's two mel paths:

- the *actually used* path ``HfAudioDataset.mel_spectrogram_train``
  (reference: script/data/datasets.py:301-354): manual reflect-pad of
  (filter_length - hop_length)/2 per side, ``torch.stft(center=False)`` with a
  periodic Hann window, magnitude, ``librosa.filters.mel(16000,1024,64,0,8000)``
  matmul, then ``log(clamp(x, 1e-5))`` (datasets.py:19-27);
- the conv1d-FFT ``STFT``/``TacotronSTFT`` path
  (reference: script/utilities/audio/stft.py) is subsumed: on TPU the framed
  rFFT form compiles to XLA's native FFT and the mel projection is a single
  MXU matmul — there is no reason to emulate FFT-as-conv1d.

Everything here is pure ``jnp``, batched, and jit-friendly (static shapes).
The mel basis is built host-side in float64 numpy (it is a compile-time
constant) and closed over as a device constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import MelConfig

# ---------------------------------------------------------------------------
# Mel filterbank — exact port of librosa.filters.mel(sr, n_fft, n_mels, fmin,
# fmax) with the librosa defaults htk=False, norm="slaney" used by the
# reference (datasets.py:308-314, stft.py:153-155). Parity-critical.
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(frequencies: np.ndarray) -> np.ndarray:
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    safe = np.maximum(frequencies, 1e-12)
    mels = np.where(log_region, min_log_mel + np.log(safe / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sampling_rate: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 64,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    mel_scale: str = "slaney",
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank: ``mel_scale``/``norm`` in {"slaney","htk"}
    x {"slaney", None} cover both the librosa default the reference's data
    path uses (datasets.py:308-314) and the torchaudio-default HTK bank the
    CLAP 48 kHz feature extractor uses (SURVEY.md §2b, laion CLAP).

    Returns float32 ``[n_mels, n_fft // 2 + 1]`` (librosa layout).
    """
    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2, dtype=np.float64)
    to_mel = _hz_to_mel_htk if mel_scale == "htk" else _hz_to_mel_slaney
    to_hz = _mel_to_hz_htk if mel_scale == "htk" else _mel_to_hz_slaney
    mel_min = to_mel(np.array(fmin))
    mel_max = to_mel(np.array(fmax))
    mel_f = to_hz(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        # Slaney normalization: equal-area triangles.
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int = 1024) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``
    (reference: datasets.py:318)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Slice ``y[..., T]`` into overlapping frames ``[..., n_frames, n_fft]``.

    Static-shape gather — XLA lowers this to an efficient strided load; no
    dynamic shapes, so it tiles onto the MXU-fed pipeline under jit.
    """
    total = y.shape[-1]
    n_frames = 1 + (total - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 160,
    win_length: int = 1024,
    window: np.ndarray | None = None,
    center: bool = False,
) -> jnp.ndarray:
    """Magnitude STFT matching ``torch.stft(..., center=False, onesided=True,
    normalized=False)`` as called at reference datasets.py:333-346.

    Input ``[..., T]`` (already padded by the caller when center=False),
    output ``[..., n_frames, n_fft//2 + 1]`` — note the transposed-from-torch
    (time-major) layout, which is the layout the model stack consumes
    (datasets.py:364 transposes immediately after the torch stft).
    """
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        padding = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
        y = jnp.pad(y, padding, mode="reflect")
    frames = frame_signal(y, n_fft, hop_length) * jnp.asarray(window)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return jnp.abs(spec)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5) -> jnp.ndarray:
    """``log(clamp(x, min=clip_val) * C)`` (reference: datasets.py:19-20,
    script/utilities/audio/audio_processing.py:85-91)."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x: jnp.ndarray, C: float = 1.0) -> jnp.ndarray:
    """``exp(x) / C`` (reference: datasets.py:22-23, audio_processing.py:94-100)."""
    return jnp.exp(x) / C


def pad_spec(spec: jnp.ndarray, target_length: int) -> jnp.ndarray:
    """Pad/crop the time axis to ``target_length`` frames and force an even
    frequency dim (reference: datasets.py:385-398). ``spec`` is
    ``[..., n_frames, n_bins]``."""
    n_frames = spec.shape[-2]
    if n_frames < target_length:
        padding = [(0, 0)] * (spec.ndim - 2) + [(0, target_length - n_frames), (0, 0)]
        spec = jnp.pad(spec, padding)
    elif n_frames > target_length:
        spec = spec[..., :target_length, :]
    if spec.shape[-1] % 2 != 0:
        spec = spec[..., :-1]
    return spec


def log_mel_spectrogram(
    wav: jnp.ndarray,
    cfg: MelConfig = MelConfig(),
    return_stft: bool = False,
):
    """Full reference feature path (datasets.py:301-367): reflect-pad by
    ``(filter_length - hop_length)//2`` per side, framed rFFT magnitude, mel
    projection, log-clamp compression, pad/crop to ``cfg.target_length``.

    ``wav``: ``[..., num_samples]`` float32 in [-1, 1].
    Returns ``[..., target_length, n_mel]`` log-mel (and optionally the
    ``[..., target_length, n_fft//2]`` magnitude STFT — the reference's
    ``pad_spec`` drops the odd 513th bin, datasets.py:395-396).
    """
    pad = int((cfg.filter_length - cfg.hop_length) / 2)
    padding = [(0, 0)] * (wav.ndim - 1) + [(pad, pad)]
    y = jnp.pad(wav, padding, mode="reflect")
    mag = stft_magnitude(
        y,
        n_fft=cfg.filter_length,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        center=False,
    )
    basis = jnp.asarray(
        mel_filterbank(cfg.sampling_rate, cfg.filter_length, cfg.n_mel, cfg.mel_fmin, cfg.mel_fmax)
    )
    mel = jnp.einsum("...tf,mf->...tm", mag, basis, preferred_element_type=jnp.float32)
    log_mel = dynamic_range_compression(mel)
    log_mel = pad_spec(log_mel, cfg.target_length)
    if return_stft:
        return log_mel, pad_spec(mag, cfg.target_length)
    return log_mel


def get_mel_from_wav(wav: jnp.ndarray, cfg: MelConfig = MelConfig()):
    """Reference ``tools.get_mel_from_wav`` (script/utilities/audio/
    tools.py:13-24): returns ``(log_mel, magnitudes, energy)`` where energy
    is the per-frame L2 norm of the magnitude STFT (TacotronSTFT's energy
    output, stft.py:174-176)."""
    log_mel, mag = log_mel_spectrogram(wav, cfg, return_stft=True)
    energy = jnp.linalg.norm(mag, axis=-1)
    return log_mel, mag, energy


def normalize_wav(waveform: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Mean-center, peak-normalize, scale to max amplitude 0.5
    (reference: datasets.py:174-177). Host-side numpy (data prep)."""
    waveform = waveform - np.mean(waveform)
    waveform = waveform / (np.max(np.abs(waveform)) + eps)
    return (waveform * 0.5).astype(np.float32)


def pad_wav(waveform: np.ndarray, target_length: int) -> np.ndarray:
    """Zero-pad to exactly ``target_length`` samples, content at the start
    (reference: datasets.py:197-212 with pad_wav_start_sample=0)."""
    length = waveform.shape[-1]
    if length == target_length:
        return waveform
    if length > target_length:
        return waveform[..., :target_length]
    out = np.zeros(waveform.shape[:-1] + (target_length,), dtype=np.float32)
    out[..., :length] = waveform
    return out
