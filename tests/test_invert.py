"""Inverse-DSP tests: iSTFT round-trip, Griffin-Lim convergence, mel
inversion (reference capabilities: stft.py:91-130, audio_processing.py:66-82,
tools.py:22-38)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from audioldm_tpu.ops.invert import griffin_lim, inv_mel_spec, istft, stft_complex
import pytest

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def test_istft_roundtrip(rng):
    n = 7936  # hop-aligned: center-pad 256x2, 63 frames, exact reconstruction
    x = (rng.standard_normal(n) * 0.4).astype(np.float32)
    spec = stft_complex(jnp.asarray(x)[None], 512, 128, 512)
    back = np.asarray(istft(spec, 512, 128, 512, length=n))[0]
    assert back.shape == (n,)
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_istft_matches_torch(rng):
    x = (rng.standard_normal(4000) * 0.4).astype(np.float32)
    n_fft, hop = 512, 128
    spec = stft_complex(jnp.asarray(x)[None], n_fft, hop, n_fft)
    ours = np.asarray(istft(spec, n_fft, hop, n_fft))[0]
    spec_t = torch.stft(
        torch.from_numpy(x)[None], n_fft, hop, n_fft,
        window=torch.hann_window(n_fft), center=True, return_complex=True,
    )
    theirs = torch.istft(
        spec_t, n_fft, hop, n_fft, window=torch.hann_window(n_fft), center=True
    )[0].numpy()
    n = min(len(ours), len(theirs))
    np.testing.assert_allclose(ours[:n], theirs[:n], atol=1e-4)


def test_griffin_lim_recovers_sine():
    sr, f = 16000, 440.0
    t = np.arange(8000) / sr
    x = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    mag = jnp.abs(stft_complex(jnp.asarray(x)[None], 512, 128, 512))

    def spectral_err(n_iters):
        rec = np.asarray(
            griffin_lim(mag, jax.random.PRNGKey(0), n_iters=n_iters, n_fft=512, hop_length=128, win_length=512)
        )[0]
        mag_rec = np.abs(np.asarray(stft_complex(jnp.asarray(rec)[None], 512, 128, 512)))
        m = np.asarray(mag)[:, : mag_rec.shape[1]]
        return np.linalg.norm(mag_rec[:, : m.shape[1]] - m) / np.linalg.norm(m)

    e5, e40 = spectral_err(5), spectral_err(40)
    assert e40 < e5  # iterations improve the estimate
    assert e40 < 0.2  # vanilla Griffin-Lim plateau for a windowed sine


def test_inv_mel_spec_shape_and_energy(rng):
    from audioldm_tpu.config import MelConfig
    from audioldm_tpu.ops import log_mel_spectrogram

    cfg = MelConfig(duration=0.32)
    wav = (0.4 * np.sin(2 * np.pi * 440 * np.arange(cfg.num_samples) / 16000)).astype(np.float32)
    logmel = log_mel_spectrogram(jnp.asarray(wav)[None], cfg)
    rec = np.asarray(inv_mel_spec(logmel, jax.random.PRNGKey(0), n_iters=16))
    assert rec.shape[0] == 1 and rec.shape[1] > 0
    assert np.all(np.isfinite(rec))
    assert np.std(rec) > 1e-3  # produced actual audio energy
