"""Native C++ host-DSP parity vs the jnp/numpy reference implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.data import native
from audioldm_tpu.ops import resample
from audioldm_tpu.ops.mel import normalize_wav

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


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


def test_native_pcm16_decode_matches_numpy(rng):
    """C++ decode_pcm16_f32 == numpy decode (mono + stereo downmix), and
    read_wav round-trips through it."""
    import os
    import tempfile

    from audioldm_tpu.data.wavio import read_wav, write_wav

    raw = (rng.integers(-32768, 32768, size=4096)).astype("<i2")
    mono = native.decode_pcm16(raw.tobytes(), 1)
    np.testing.assert_allclose(mono, raw.astype(np.float32) / 32768.0, atol=0)

    stereo = native.decode_pcm16(raw.tobytes(), 2)
    want = (raw.astype(np.float32) / 32768.0).reshape(-1, 2).mean(axis=1)
    np.testing.assert_allclose(stereo, want, atol=1e-7)

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.wav")
        wav = (rng.uniform(-0.9, 0.9, 1000)).astype(np.float32)
        write_wav(p, wav, 16000)
        back, sr = read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(back, np.round(wav * 32767) / 32768.0, atol=1.0 / 32768)


def test_wave_format_extensible_subformat(tmp_path, rng):
    """0xFFFE extensible wavs resolve the REAL format from the SubFormat
    GUID: 32-bit integer PCM must not be misread as float32."""
    import struct

    from audioldm_tpu.data.wavio import read_wav

    def write_extensible(path, data_bytes, sub_code, bits, sr=16000, ch=1):
        # fmt payload: base 16 + cbSize(2) + validbits(2) + mask(4) + GUID(16)
        guid = struct.pack("<H", sub_code) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack("<HHIIHH", 0xFFFE, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits)
        fmt += struct.pack("<HHI", 22, bits, 0x4) + guid
        riff = b"WAVE"
        riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(data_bytes)) + data_bytes
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)

    x = (rng.uniform(-0.5, 0.5, 256)).astype(np.float32)

    # int32 PCM via extensible header
    p1 = str(tmp_path / "i32.wav")
    write_extensible(p1, (x * 2147483647).astype("<i4").tobytes(), sub_code=1, bits=32)
    back, sr = read_wav(p1)
    assert sr == 16000
    np.testing.assert_allclose(back, x, atol=2e-6)

    # float32 via extensible header
    p2 = str(tmp_path / "f32.wav")
    write_extensible(p2, x.astype("<f4").tobytes(), sub_code=3, bits=32)
    back2, _ = read_wav(p2)
    np.testing.assert_allclose(back2, x, atol=0)
