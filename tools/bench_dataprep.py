"""BASELINE config-3 bench: batch data prep throughput on one TPU chip.

Workload (BASELINE.json configs[2], reference script/data path —
datasets.py:301-367 + train_audioldm_lora.py:495-496): waveform ->
reflect-pad framed-rFFT STFT -> Slaney mel -> log compression -> pad to
1024 frames -> VAE latent encode (x scaling_factor).  The reference runs
the DSP per-item on CPU inside 4 DataLoader workers and the VAE encode on
GPU per train step; here the whole batch path is ONE jit on the TPU.

Also times the host-side C++ prep (resample 22.05k->16k + normalize;
cpp/audioprep.cpp) that feeds the device path, to show it is not the
bottleneck at the measured device rate.

Usage: python tools/bench_dataprep.py [--batches 8] [--batch 64]
Prints one JSON line per stage.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audioldm_tpu.config import MelConfig, VAEConfig
from audioldm_tpu.models.vae import encode, init_vae
from audioldm_tpu.ops.mel import log_mel_spectrogram
from audioldm_tpu.utils.fastinit import random_params_like, shapes_of

SAMPLES = 163840  # 10.24 s @ 16 kHz (datasets.py pad_wav target)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()

    mel_cfg = MelConfig()
    vae_cfg = VAEConfig()
    sh = shapes_of(init_vae, vae_cfg)
    vae_p = jax.jit(lambda k: random_params_like(k, sh, dtype=jnp.bfloat16))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(vae_p)

    @jax.jit
    def prep_mel(wav):
        return log_mel_spectrogram(wav, mel_cfg)

    @jax.jit
    def prep_full(params, wav, key):
        mel = log_mel_spectrogram(wav, mel_cfg)
        dist = encode(params, vae_cfg, mel[..., None].astype(jnp.bfloat16))
        return dist.sample(key) * vae_cfg.scaling_factor

    rng = np.random.default_rng(0)
    b = args.batch
    wavs = [
        jnp.asarray(rng.standard_normal((b, SAMPLES), dtype=np.float32) * 0.1)
        for _ in range(2)
    ]
    keys = [jax.random.PRNGKey(i) for i in range(args.batches)]

    results = {}
    for name, run in [
        ("mel_only", lambda i: prep_mel(wavs[i % 2])),
        ("mel_plus_vae_encode", lambda i: prep_full(vae_p, wavs[i % 2], keys[i])),
    ]:
        out = run(0)
        _ = jax.device_get(jax.tree.leaves(out)[0][0, :2])  # compile+fence
        t0 = time.perf_counter()
        outs = [run(i) for i in range(args.batches)]  # async dispatch
        for o in outs:
            _ = jax.device_get(jax.tree.leaves(o)[0][0, :2])
        dt = time.perf_counter() - t0
        clips_s = args.batches * b / dt
        results[name] = round(clips_s, 1)
        print(json.dumps({
            "metric": f"dataprep_{name}_clips_per_s",
            "value": round(clips_s, 1), "unit": "clips/s",
            "batch": b, "batches": args.batches,
            "audio_s_per_s": round(clips_s * 10.24, 0),
        }))

    if not args.skip_host:
        from audioldm_tpu.data import native

        if native.available():
            src = rng.standard_normal((b, int(SAMPLES * 22050 / 16000)),
                                      dtype=np.float32) * 0.1
            t0 = time.perf_counter()
            for row in src:
                w = native.resample_native(row, 22050, 16000)
                native.normalize_native(w)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "dataprep_host_cpp_resample_normalize_clips_per_s",
                "value": round(b / dt, 1), "unit": "clips/s",
            }))
        else:
            print(json.dumps({"metric": "dataprep_host_cpp", "value": None,
                              "note": "libaudioprep.so not built"}))


if __name__ == "__main__":
    main()
