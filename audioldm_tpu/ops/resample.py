"""Polyphase windowed-sinc resampler.

Parity target: ``torchaudio.functional.resample`` with its defaults
(``lowpass_filter_width=6``, ``rolloff=0.99``, ``sinc_interp_hann``), which is
what the reference uses for all waveform resampling
(reference: script/data/datasets.py:170-172 ``torchaudio.functional.resample``)
and what the eval path approximates with ``librosa.resample``
(reference: script/train/train_audioldm_lora.py:155,301-302).

TPU-first design: the kernel bank is a host-computed float64->float32
constant ``[new_freq, 1, width]``; resampling is one strided conv
(``lax.conv_general_dilated``) — a single fused XLA op, batched over clips.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> tuple[np.ndarray, int, int, int]:
    """Build the polyphase kernel bank. Returns (kernels, width, up, down)
    where kernels is ``[up, 1, 2*width + down]`` float32."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    down = int(orig_freq) // gcd
    up = int(new_freq) // gcd

    base_freq = min(down, up) * rolloff
    width = int(math.ceil(lowpass_filter_width * down / base_freq))

    idx = np.arange(-width, width + down, dtype=np.float64)[None, :] / down
    t = np.arange(0, -up, -1, dtype=np.float64)[:, None] / up + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    scale = base_freq / down
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale
    return kernels[:, None, :].astype(np.float32), width, up, down


def resample(
    waveform: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Resample ``[..., T]`` from ``orig_freq`` to ``new_freq``."""
    if orig_freq == new_freq:
        return waveform
    kernels, width, up, down = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, 1, length).astype(jnp.float32)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + down)))
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels),
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # [B, up, frames] -> interleave phases -> [B, frames * up]
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)
    target_length = int(math.ceil(new_freq * length / orig_freq))
    y = y[:, :target_length]
    return y.reshape(shape[:-1] + (target_length,))


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int, **kw) -> np.ndarray:
    """Host-side numpy variant for the data-prep path (off the hot path)."""
    if orig_freq == new_freq:
        return waveform
    return np.asarray(resample(jnp.asarray(waveform), orig_freq, new_freq, **kw))
