"""Golden-parity tests for the DSP core against the PyTorch ops the reference
calls (torch.stft at datasets.py:333-346, torch.hann_window at datasets.py:318,
the Slaney mel filterbank at datasets.py:308-314)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audioldm_tpu.config import MelConfig
from audioldm_tpu.ops import (
    dynamic_range_compression,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    pad_spec,
    stft_magnitude,
)

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def test_hann_window_matches_torch():
    ours = hann_window(1024)
    theirs = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mel_filterbank_matches_transformers_slaney():
    # transformers.audio_utils.mel_filter_bank(norm="slaney", mel_scale="slaney")
    # is the same algorithm as librosa.filters.mel(htk=False, norm="slaney")
    # that the reference uses (datasets.py:308-314).
    from transformers.audio_utils import mel_filter_bank

    theirs = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=64,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns [freq, mel]
    ours = mel_filterbank(16000, 1024, 64, 0.0, 8000.0)
    assert ours.shape == (64, 513)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_stft_magnitude_matches_torch_stft(rng):
    wav = rng.standard_normal(4000).astype(np.float32) * 0.4
    n_fft, hop = 512, 128
    pad = (n_fft - hop) // 2
    y = np.pad(wav, (pad, pad), mode="reflect")

    ours = np.asarray(stft_magnitude(jnp.asarray(y)[None], n_fft=n_fft, hop_length=hop, win_length=n_fft))

    t = torch.from_numpy(y)[None]
    theirs = torch.stft(
        t,
        n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hann_window(n_fft),
        center=False,
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs().numpy()  # [1, freq, frames]

    assert ours.shape == (1, theirs.shape[2], theirs.shape[1])
    np.testing.assert_allclose(ours[0], theirs[0].T, atol=2e-4)


def _torch_reference_logmel(wav: np.ndarray, cfg: MelConfig):
    """Literal re-derivation of HfAudioDataset.mel_spectrogram_train
    (datasets.py:301-354) + pad_spec (datasets.py:385-398)."""
    from transformers.audio_utils import mel_filter_bank

    mel_np = mel_filter_bank(
        num_frequency_bins=1 + cfg.filter_length // 2,
        num_mel_filters=cfg.n_mel,
        min_frequency=cfg.mel_fmin,
        max_frequency=cfg.mel_fmax,
        sampling_rate=cfg.sampling_rate,
        norm="slaney",
        mel_scale="slaney",
    ).T
    mel_basis = torch.from_numpy(mel_np).float()
    y = torch.from_numpy(wav)[None]
    pad = int((cfg.filter_length - cfg.hop_length) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y,
        cfg.filter_length,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hann_window(cfg.win_length),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).abs()
    mel = torch.log(torch.clamp(torch.matmul(mel_basis, spec), min=1e-5))
    logmel = mel[0].T  # [frames, n_mel]
    n_frames = logmel.shape[0]
    p = cfg.target_length - n_frames
    if p > 0:
        logmel = torch.nn.functional.pad(logmel, (0, 0, 0, p))
    elif p < 0:
        logmel = logmel[: cfg.target_length]
    return logmel.numpy()


def test_log_mel_pipeline_matches_reference_math(rng):
    cfg = MelConfig()
    wav = (rng.standard_normal(cfg.num_samples).astype(np.float32)) * 0.5
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav)[None], cfg))[0]
    theirs = _torch_reference_logmel(wav, cfg)
    assert ours.shape == (cfg.target_length, cfg.n_mel)
    assert theirs.shape == (cfg.target_length, cfg.n_mel)
    # Log-space diffs are dominated by float32 reduction-order noise in the
    # mel matmul amplified by log() near the 1e-5 clip; linear-space energy
    # matches to ~1e-5. Bound both.
    np.testing.assert_allclose(np.exp(ours), np.exp(theirs), atol=1e-4, rtol=1e-3)
    assert np.max(np.abs(ours - theirs)) < 2e-2
    assert np.mean(np.abs(ours - theirs)) < 1e-3


def test_log_mel_frame_count_is_1024():
    cfg = MelConfig()
    assert cfg.num_samples == 163840
    assert cfg.target_length == 1024
    wav = jnp.zeros((2, cfg.num_samples))
    out = log_mel_spectrogram(wav, cfg)
    assert out.shape == (2, 1024, 64)
    # log(clamp(0, 1e-5)) == log(1e-5)
    np.testing.assert_allclose(np.asarray(out), np.log(1e-5), atol=1e-5)


def test_pad_spec_crops_and_pads():
    x = jnp.ones((10, 64))
    assert pad_spec(x, 16).shape == (16, 64)
    assert pad_spec(x, 4).shape == (4, 64)
    x_odd = jnp.ones((10, 65))
    assert pad_spec(x_odd, 10).shape == (10, 64)


def test_dynamic_range_compression_matches_reference():
    x = jnp.asarray([0.0, 1e-6, 1e-5, 0.5, 3.0])
    out = np.asarray(dynamic_range_compression(x))
    expected = np.log(np.clip(np.asarray(x), 1e-5, None))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_get_mel_from_wav_energy():
    """tools.get_mel_from_wav parity surface (reference tools.py:13-24):
    (log_mel, magnitudes, energy) with energy = per-frame L2 of |STFT|."""
    import numpy as np

    from audioldm_tpu.config import MelConfig
    from audioldm_tpu.ops import get_mel_from_wav

    cfg = MelConfig(duration=1.024)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(cfg.num_samples) * 0.3).astype(np.float32)
    mel, mag, energy = get_mel_from_wav(wav, cfg)
    assert mel.shape == (cfg.target_length, cfg.n_mel)
    assert mag.shape[0] == cfg.target_length
    assert energy.shape == (cfg.target_length,)
    np.testing.assert_allclose(
        np.asarray(energy), np.linalg.norm(np.asarray(mag), axis=-1), rtol=1e-6
    )
