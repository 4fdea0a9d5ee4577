"""Kaldi-fbank oracle: torchaudio is not installed, so the published
torchaudio.compliance.kaldi algorithm is re-derived independently in torch
here (the tests/test_torch_oracle.py technique) and our numpy implementation
(ops/kaldi.py) is checked against it. Behavior pinned by the reference's
plugin call (script/data/dataset_plugin.py:362-370)."""

import math

import numpy as np
import pytest
import torch

from audioldm_tpu.ops.kaldi import kaldi_fbank, mel_banks

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def torch_kaldi_fbank(wav: torch.Tensor, sf: int, num_bins: int = 128) -> torch.Tensor:
    """Independent torch re-derivation of torchaudio.compliance.kaldi.fbank
    (htk_compat=True, use_energy=False, window_type='hanning', dither=0,
    frame_shift=10, defaults otherwise)."""
    window_size = int(sf * 0.025)
    shift = int(sf * 0.010)
    padded = 2 ** math.ceil(math.log2(window_size))
    n = wav.numel()
    m = 1 + (n - window_size) // shift  # snip_edges
    frames = torch.stack([wav[i * shift : i * shift + window_size] for i in range(m)])
    frames = frames - frames.mean(dim=1, keepdim=True)  # remove_dc_offset
    prev = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)  # replicate pad
    frames = frames - 0.97 * prev  # preemphasis
    win = torch.hann_window(window_size, periodic=False)
    frames = frames * win
    frames = torch.nn.functional.pad(frames, (0, padded - window_size))
    spec = torch.fft.rfft(frames).abs().pow(2.0)  # use_power

    # Kaldi mel banks (low 20, high = nyquist), triangular in mel domain
    def mel(f):
        return 1127.0 * torch.log1p(torch.as_tensor(f, dtype=torch.float64) / 700.0)

    nyq = sf / 2.0
    mlo, mhi = mel(20.0), mel(nyq)
    delta = (mhi - mlo) / (num_bins + 1)
    fft_freqs = torch.arange(padded // 2, dtype=torch.float64) * (sf / padded)
    mf = mel(fft_freqs)[None, :]
    i = torch.arange(num_bins, dtype=torch.float64)[:, None]
    left, center, right = mlo + i * delta, mlo + (i + 1) * delta, mlo + (i + 2) * delta
    banks = torch.clamp(torch.minimum((mf - left) / (center - left), (right - mf) / (right - center)), min=0.0)
    banks = torch.nn.functional.pad(banks.float(), (0, 1))  # zero nyquist col
    mel_e = spec @ banks.T
    return torch.log(torch.clamp(mel_e, min=torch.finfo(torch.float32).eps))


@pytest.mark.parametrize("sf", [16000, 32000])
def test_kaldi_fbank_parity(sf, rng):
    wav = (rng.standard_normal(sf) * 0.3).astype(np.float32)  # 1 s
    ours = kaldi_fbank(wav, sample_frequency=float(sf), num_mel_bins=128)
    ref = torch_kaldi_fbank(torch.from_numpy(wav), sf).numpy()
    assert ours.shape == ref.shape == (1 + (sf - int(sf * 0.025)) // int(sf * 0.010), 128)
    # log-domain: a handful of near-zero mel energies differ at ~1e-3 from
    # numpy-vs-torch fp32 fft rounding; 99.99% of elements match to 2e-4
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    assert np.mean(np.abs(ours - ref) < 2e-4) > 0.999


def test_kaldi_frame_geometry():
    """10.24 s at 16 kHz -> 1022 snip-edges frames; the plugin pads to the
    1024-frame mel target (reference: dataset_plugin.py:372-382)."""
    wav = np.zeros(163840, np.float32)
    fb = kaldi_fbank(wav, 16000.0)
    assert fb.shape == (1022, 128)


def test_kaldi_plugin_normalization(rng):
    from audioldm_tpu.config import MelConfig
    from audioldm_tpu.data.dataset import PLUGINS

    cfg = MelConfig()
    wav = (rng.standard_normal(cfg.num_samples) * 0.3).astype(np.float32)
    out = PLUGINS["extract_kaldi_fbank_feature"]({"waveform": wav}, cfg)
    fb = out["ta_kaldi_fbank"]
    assert fb.shape == (1024, 128)
    # last two frames are the zero-pad, already normalized
    np.testing.assert_allclose(
        fb[-2:], (0.0 - (-4.2677393)) / (4.5689974 * 2), atol=1e-6
    )
    raw = kaldi_fbank(wav - wav.mean(), 16000.0)
    np.testing.assert_allclose(fb[:1022] * (4.5689974 * 2) + (-4.2677393), raw, atol=1e-4)


def test_kaldi_32k_plugin_resamples(rng):
    from audioldm_tpu.config import MelConfig
    from audioldm_tpu.data.dataset import PLUGINS

    cfg = MelConfig(duration=1.0)
    wav = (rng.standard_normal(cfg.num_samples) * 0.3).astype(np.float32)
    out = PLUGINS["extract_kaldi_fbank_feature_32k"]({"waveform": wav}, cfg)
    assert out["ta_kaldi_fbank"].shape == (cfg.target_length, 128)
    assert np.all(np.isfinite(out["ta_kaldi_fbank"]))


def test_mel_banks_shape_and_partition():
    banks = mel_banks(128, 512, 16000.0)
    assert banks.shape == (128, 256)
    assert np.all(banks >= 0)
    # each interior fft bin above low_freq is covered by <= 2 triangles
    assert np.all((banks > 0).sum(axis=0) <= 2 + (banks.shape[1] > 0))
