"""ctypes bindings for the native host-DSP library (cpp/audioprep.cpp).

Build-on-first-use with g++ (no pybind11 in this image); every function has
a numpy/jnp fallback so the framework works without a compiler. The
polyphase kernel bank comes from audioldm_tpu.ops.resample — one source of
truth for the filter math, two executors (XLA on device, C++ on host).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "cpp", "audioprep.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libaudioprep.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.resample_poly_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.normalize_wav_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float]
            lib.peak_abs_f32.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.peak_abs_f32.restype = ctypes.c_float
            lib.decode_pcm16_f32.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB = lib
        except Exception:
            _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_native(waveform: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Host polyphase resample; exact same kernel bank as ops.resample."""
    lib = _load()
    if not lib:
        from audioldm_tpu.ops.resample import resample_np

        return resample_np(waveform, orig_freq, new_freq)
    from audioldm_tpu.ops.resample import _sinc_resample_kernel

    kernels, width, up, down = _sinc_resample_kernel(orig_freq, new_freq)
    k = np.ascontiguousarray(kernels[:, 0, :], np.float32)  # [up, kw]
    x = np.ascontiguousarray(waveform, np.float32)
    n_out = int(math.ceil(new_freq * x.shape[-1] / orig_freq))
    out = np.empty(n_out, np.float32)
    lib.resample_poly_f32(_fptr(x), x.shape[-1], _fptr(out), n_out, _fptr(k), up, down, width, k.shape[1])
    return out


def normalize_native(waveform: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(waveform, np.float32).copy()
    if not lib:
        from audioldm_tpu.ops.mel import normalize_wav

        return normalize_wav(x, eps)
    lib.normalize_wav_f32(_fptr(x), x.shape[-1], eps)
    return x


def peak_abs(waveform: np.ndarray) -> float:
    lib = _load()
    x = np.ascontiguousarray(waveform, np.float32)
    if not lib:
        return float(np.max(np.abs(x))) if x.size else 0.0
    return float(lib.peak_abs_f32(_fptr(x), x.shape[-1]))


def decode_pcm16(data: bytes, channels: int) -> np.ndarray:
    """PCM16 bytes -> float32 mono in [-1, 1) (channel-averaged) — the wav
    decoder's hot loop in C++ (cpp/audioprep.cpp decode_pcm16_f32); numpy
    fallback matches bit-for-bit."""
    raw = np.frombuffer(data, dtype="<i2")
    n_frames = raw.shape[0] // channels
    raw = raw[: n_frames * channels]  # drop a truncated trailing frame
    lib = _load()
    if not lib:
        x = raw.astype(np.float32) / 32768.0
        return x.reshape(-1, channels).mean(axis=1) if channels > 1 else x
    raw = np.ascontiguousarray(raw)
    out = np.empty(n_frames, np.float32)
    lib.decode_pcm16_f32(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n_frames, channels, _fptr(out)
    )
    return out
