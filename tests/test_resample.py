"""Tests for the polyphase sinc resampler (parity target:
torchaudio.functional.resample defaults, reference datasets.py:170-172)."""

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.ops import resample
import pytest

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def test_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1000).astype(np.float32))
    y = resample(x, 16000, 16000)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_output_length():
    x = jnp.zeros(44100)
    y = resample(x, 44100, 16000)
    assert y.shape == (16000,)
    y = resample(jnp.zeros((3, 32000)), 32000, 16000)
    assert y.shape == (3, 16000)
    # 16k -> 48k used on the CLAP eval path (train_audioldm_lora.py:155)
    y = resample(jnp.zeros(16000), 16000, 48000)
    assert y.shape == (48000,)


def test_sine_preserved():
    sr_in, sr_out, f = 44100, 16000, 440.0
    t = np.arange(sr_in, dtype=np.float64) / sr_in
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    t_out = np.arange(len(y), dtype=np.float64) / sr_out
    expected = np.sin(2 * np.pi * f * t_out).astype(np.float32)
    # interior samples (edges have filter transients)
    sl = slice(100, -100)
    assert np.max(np.abs(y[sl] - expected[sl])) < 5e-3


def test_dc_preserved():
    x = np.full(8000, 0.25, dtype=np.float32)
    y = np.asarray(resample(jnp.asarray(x), 16000, 48000))
    assert abs(np.mean(y[200:-200]) - 0.25) < 1e-3


def test_upsample_downsample_roundtrip():
    rng = np.random.default_rng(1)
    # band-limited signal: smooth noise
    x = rng.standard_normal(4096).astype(np.float32)
    k = np.hanning(65).astype(np.float32)
    x = np.convolve(x, k / k.sum(), mode="same")
    up = resample(jnp.asarray(x), 16000, 48000)
    back = np.asarray(resample(up, 48000, 16000))
    sl = slice(64, -64)
    assert np.max(np.abs(back[sl] - x[sl])) < 2e-2
