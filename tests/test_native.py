"""Native C++ host-DSP parity vs the jnp/numpy reference implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.data import native
from audioldm_tpu.ops import resample
from audioldm_tpu.ops.mel import normalize_wav


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("g++ unavailable; native library not built")


def test_native_resample_matches_xla(rng):
    x = (rng.standard_normal(24000) * 0.4).astype(np.float32)
    ours = native.resample_native(x, 24000, 16000)
    ref = np.asarray(resample(jnp.asarray(x), 24000, 16000))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_native_resample_upsample(rng):
    x = (rng.standard_normal(16000) * 0.4).astype(np.float32)
    ours = native.resample_native(x, 16000, 48000)
    ref = np.asarray(resample(jnp.asarray(x), 16000, 48000))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_native_normalize(rng):
    x = (rng.standard_normal(5000) * 3 + 0.7).astype(np.float32)
    ours = native.normalize_native(x)
    ref = normalize_wav(x)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    assert abs(np.max(np.abs(ours)) - 0.5) < 1e-4


def test_peak_abs(rng):
    x = (rng.standard_normal(1000) * 0.2).astype(np.float32)
    assert abs(native.peak_abs(x) - np.max(np.abs(x))) < 1e-7
