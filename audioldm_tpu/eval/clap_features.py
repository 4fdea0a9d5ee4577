"""CLAP 48 kHz feature extraction (fused log-mel input).

Parity target: ``transformers.ClapFeatureExtractor`` as driven by the
reference's eval path (``clap_processor(audios=..., sampling_rate=48000)``,
train_audioldm_lora.py:129,304-305): power-2 STFT (center, reflect pad,
periodic Hann, n_fft 1024, hop 480), HTK-scale unnormalized mel bank
(0-14000 Hz, 64 bins), power_to_db, then the "fusion" packing: <=10 s audio
is repeat-padded and stacked 4x (is_longer=False); >10 s audio contributes
3 random crops + a bilinear-shrunk full mel (is_longer=True).

Host-side numpy for the irregular packing; the mel math itself reuses the
jnp DSP core (batched on device for the common fixed-length case).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.ops.mel import hann_window, mel_filterbank

SR = 48000
N_FFT = 1024
HOP = 480
N_MELS = 64
FMIN, FMAX = 0.0, 14000.0
MAX_SAMPLES = 10 * SR  # 480000
CHUNK_FRAMES = MAX_SAMPLES // HOP + 1  # 1001


@functools.lru_cache(maxsize=1)
def _mel_bank_htk() -> np.ndarray:
    return mel_filterbank(SR, N_FFT, N_MELS, FMIN, FMAX, mel_scale="htk", norm=None)


def power_to_db(x: np.ndarray, min_value: float = 1e-10) -> np.ndarray:
    return 10.0 * np.log10(np.clip(x, min_value, None))


def clap_log_mel(waveform: np.ndarray) -> np.ndarray:
    """[T] float -> [frames, 64] dB log-mel (torch.stft center=True semantics)."""
    pad = N_FFT // 2
    y = np.pad(waveform.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - N_FFT) // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = y[idx] * hann_window(N_FFT).astype(np.float64)
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = power @ _mel_bank_htk().astype(np.float64).T
    return power_to_db(mel).astype(np.float32)


def _linear_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Bilinear (align_corners=False) 1-D interpolation matrix [n_out, n_in]."""
    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) * n_in / n_out - 0.5
        f = int(np.floor(src))
        t = src - f
        W[i, min(max(f, 0), n_in - 1)] += 1 - t
        W[i, min(max(f + 1, 0), n_in - 1)] += t
    return W.astype(np.float32)


def extract_fused_features(
    waveform: np.ndarray,
    rng: Optional[np.random.Generator] = None,
) -> tuple[np.ndarray, bool]:
    """One 48 kHz waveform -> (input_features [4, 1001, 64], is_longer)."""
    rng = rng or np.random.default_rng(0)
    n = waveform.shape[0]
    if n > MAX_SAMPLES:
        mel = clap_log_mel(waveform)
        total = mel.shape[0]
        if total == CHUNK_FRAMES:
            return np.stack([mel] * 4), False
        # 3 random crops from the front/middle/back thirds + shrunk overview
        ranges = np.array_split(np.arange(0, total - CHUNK_FRAMES + 1), 3)
        idxs = [int(rng.choice(r)) if len(r) else 0 for r in ranges]
        crops = [mel[i : i + CHUNK_FRAMES] for i in idxs]
        shrink = _linear_interp_matrix(total, CHUNK_FRAMES) @ mel
        return np.stack([shrink] + crops).astype(np.float32), True
    if n < MAX_SAMPLES:
        # repeatpad: tile whole copies then zero-pad
        n_repeat = int(MAX_SAMPLES / n)
        waveform = np.tile(waveform, n_repeat)
        waveform = np.pad(waveform, (0, MAX_SAMPLES - waveform.shape[0]))
    mel = clap_log_mel(waveform)
    return np.stack([mel] * 4), False


def batch_fused_features(
    waveforms: list[np.ndarray],
    rng: Optional[np.random.Generator] = None,
    per_clip_batches: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``per_clip_batches=True`` replicates the reference's eval usage for
    score parity: transformers' ClapFeatureExtractor (truncation="fusion")
    forces one random sample per batch to ``is_longer=True`` even when
    nothing exceeds 10 s, and the reference calls the processor once per clip
    (train_audioldm_lora.py:129,304-305) — so every reference eval clip goes
    through the fusion path. With ``False``, only genuinely-long clips do."""
    feats, longer = [], []
    for w in waveforms:
        f, l = extract_fused_features(np.asarray(w, np.float32), rng)
        feats.append(f)
        longer.append(True if per_clip_batches else l)
    return jnp.asarray(np.stack(feats)), jnp.asarray(np.asarray(longer))
