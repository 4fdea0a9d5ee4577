"""Proximity gauges between sampling paths' outputs.

PROXIMITY, NOT QUALITY (VERDICT round-4 #4): the fast sampling paths —
limited-interval guidance, DPM-Solver++ few-step, LCM, MultiDiffusion
windowing — change the sampling math, and their claims of preserved
*quality* come from their papers; validating them on THIS model needs the
real `cvssp/audioldm-s-full-v2` weights (env-blocked, NOTES standing
queue). What CAN be measured today is how close each fast path's output
stays to the 50-step DDIM output under fixed seeds and fixed (random,
calibrated) weights — a regression tripwire: a change that silently wrecks
a fast path's output moves these numbers even though latency stays flat.

Two gauges:
- ``mel_correlation``: Pearson correlation of host-side log-mel matrices —
  cheap enough for the driver bench (no extra compiles; the waveforms are
  already generated there).
- CLAP-embedding cosine (tools/quality_proximity.py): the reference's own
  scoring space (train_audioldm_lora.py:128-137 uses CLAP embeddings),
  requiring a CLAP audio-tower forward — the once-per-round tool, recorded
  in PERF.md.
"""

from __future__ import annotations

import numpy as np

from audioldm_tpu.ops.mel import hann_window, mel_filterbank


def log_mel_host(
    wav: np.ndarray,
    sr: int = 16000,
    n_fft: int = 1024,
    hop: int = 160,
    n_mels: int = 64,
) -> np.ndarray:
    """Host-side numpy log-mel ``[frames, n_mels]`` for the correlation
    gauge. NOT the model's mel space: this uses a POWER spectrum with
    ``n_fft//2`` reflect padding (librosa-style), while ``ops/mel.py``
    computes the AudioLDM convention — magnitude STFT with
    ``(filter_length - hop)//2`` padding (torch.stft parity). The gauge
    only ever correlates two outputs of THIS function, so the numbers are
    self-consistent; just don't compare them against real-mel analyses
    (round-5 review finding). Shares the Slaney bank, hann window, and
    the 1e-5 log floor with ops/mel.py."""
    wav = np.asarray(wav, np.float64)
    pad = n_fft // 2
    y = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = y[idx] * hann_window(n_fft).astype(np.float64)
    power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    mel = power @ mel_filterbank(sr, n_fft, n_mels).astype(np.float64).T
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


def mel_correlation(wav_a: np.ndarray, wav_b: np.ndarray, sr: int = 16000) -> float:
    """Pearson correlation of the two waveforms' log-mels (flattened,
    trimmed to the common length). 1.0 = identical spectro-temporal
    content; uncorrelated random audio sits near 0."""
    n = min(len(wav_a), len(wav_b))
    a = log_mel_host(np.asarray(wav_a)[:n], sr=sr).ravel()
    b = log_mel_host(np.asarray(wav_b)[:n], sr=sr).ravel()
    a = a - a.mean()
    b = b - b.mean()
    denom = float(np.sqrt((a * a).sum() * (b * b).sum()))
    if denom < 1e-12:
        return 0.0
    return float((a * b).sum() / denom)


def embedding_cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Plain cosine between two embedding vectors."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))


def calibrate_vocoder_gain(
    modules, voc_fn, mel_aval, target: float = 0.3, iters: int = 4
) -> float:
    """Scale ``modules.vocoder``'s conv_post (last layer, pre-tanh) so a
    unit-normal mel probe lands at ~``target`` post-tanh amplitude; returns
    the total applied scale. Random-init vocoders defeat proximity gauges in
    BOTH directions: ~1e-4 amplitudes ride the log-mel 1e-5 floor (parity
    on silence — the ckpt_drill lesson), and large inits rail tanh to ±1 so
    every input collapses onto the same square wave (round-5 bench lesson:
    ``prox_mel_*`` read exactly 1.0 for all paths). The atanh inversion
    clamps at 0.999, so the railed case converges over ``iters`` passes.
    ``mel_aval`` needs ``.shape``/``.dtype`` (matched exactly, so ``voc_fn``
    may be an AOT-compiled executable)."""
    import math

    import jax

    total = 1.0
    cp0 = modules.vocoder["conv_post"]  # restored on any failure below
    probe = jax.random.normal(jax.random.PRNGKey(7), mel_aval.shape, mel_aval.dtype)

    def _fail(msg):
        # fail LOUD and leave the bundle unmutated: returning a bogus
        # "gain" (or leaving a ~3e11/NaN scale applied in place) makes the
        # downstream gauges record garbage instead of an error — the exact
        # vacuous-readings failure this function exists to prevent
        # (round-5 review findings). The caller's best-effort wrapper
        # (bench.py secondary block) surfaces this in stderr.
        modules.vocoder = {**modules.vocoder, "conv_post": cp0}
        raise RuntimeError(msg)

    m = None
    for _ in range(iters):
        wav = np.asarray(jax.device_get(voc_fn(modules, probe)))
        m = float(np.abs(wav).max())
        if not math.isfinite(m) or m <= 1e-8:
            _fail(f"vocoder probe amplitude {m!r} is unusable for gain "
                  "calibration (dead or non-finite conv_post output)")
        scale = math.atanh(target) / max(math.atanh(min(m, 0.999)), 1e-12)
        if abs(scale - 1.0) < 0.05:
            return total
        cp = modules.vocoder["conv_post"]
        modules.vocoder = {**modules.vocoder, "conv_post": {
            "kernel": cp["kernel"] * scale, "bias": cp["bias"] * scale,
        }}
        total *= scale
    # iters exhausted without the convergence break: VERIFY instead of
    # trusting — a strongly railed vocoder attenuates only ~0.08x per pass
    # and used to exit still railed, quietly re-enabling the vacuous
    # prox_mel_* = 1.0 readings (round-5 review finding)
    wav = np.asarray(jax.device_get(voc_fn(modules, probe)))
    m = float(np.abs(wav).max())
    if not (0.02 <= m <= 0.98):
        _fail(f"vocoder gain calibration did not converge in {iters} passes "
              f"(final probe amplitude {m:.3g}, target {target})")
    return total
