"""CLAP-space proximity of the fast sampling paths vs 50-step DDIM
(VERDICT round-4 #4).

PROXIMITY, NOT QUALITY: guidance-interval (Kynkäänniemi et al. 2024),
DPM-Solver++ 25-step, LCM 4-step, and MultiDiffusion windowing all change
the sampling math; their quality-preservation claims are paper results and
validating them on THIS model needs the real ``cvssp/audioldm-s-full-v2``
weights (env-blocked — NOTES standing queue). What this tool pins instead:
with fixed seeds and fixed (random, vocoder-gain-calibrated) full-geometry
weights, how close each fast path's output stays to the 50-step-DDIM
output, measured as

- cosine in CLAP-embedding space — the space the reference scores in
  (/root/reference/script/train/train_audioldm_lora.py:128-137): 48 kHz
  fused features through the full-geometry HTSAT tower;
- log-mel correlation (the cheap gauge the driver bench also tracks as
  ``prox_mel_*`` — eval/proximity.py).

The numbers are a REGRESSION TRIPWIRE: a change that silently wrecks a
fast path's output moves them even when its latency stays flat. Run once
per round on the chip (full geometry; ~6-10 min of compiles) and record in
PERF.md; ``--width tiny`` is the CPU-sized variant the test tier runs.

Stage structure mirrors bench.py: text/VAE/vocoder compile once, the five
scan programs (ddim50 reference + four fast paths) compile in parallel
threads. ``windowed`` runs 50-step DDIM with 5 s MultiDiffusion windows at
the same clip length, so its distance to plain ddim50 isolates the
windowing math alone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--width", choices=["full", "tiny"], default="full")
    ap.add_argument("--seconds", type=float, default=None,
                    help="clip length (default 10.24 full / 0.08 tiny)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audioldm_tpu.config import ClapAudioConfig, DDIMConfig
    from audioldm_tpu.eval.clap_features import batch_fused_features
    from audioldm_tpu.eval.proximity import (
        calibrate_vocoder_gain,
        embedding_cosine,
        mel_correlation,
    )
    from audioldm_tpu.models.clap_audio import apply_clap_audio, init_clap_audio
    from audioldm_tpu.ops.resample import resample_np
    from audioldm_tpu.pipeline.generate import (
        decode_latents,
        encode_stage,
        make_scan_fn,
        random_modules,
        vocode,
    )

    if args.width == "full":
        modules = random_modules(jax.random.PRNGKey(args.seed), ddim_cfg=DDIMConfig())
        clap_cfg = ClapAudioConfig()
        seconds = args.seconds or 10.24
        steps, dpm_steps, lcm_steps, window_s = 50, 25, 4, 5.0
        dtype = jnp.bfloat16
    else:
        from test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC

        modules = random_modules(
            jax.random.PRNGKey(args.seed), unet_cfg=TINY_UNET, vae_cfg=TINY_VAE,
            text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC, ddim_cfg=DDIMConfig(),
        )
        # must accept the REAL 48 kHz fused-feature geometry (4x1001x64 ->
        # spec 256), so tiny means narrow channels, not a smaller spec
        # (the tests/test_cli.py tiny-CLAP rationale)
        clap_cfg = ClapAudioConfig(
            window_size=4, num_mel_bins=64, spec_size=256, patch_size=4,
            patch_stride=(4, 4), patch_embeds_hidden_size=4, depths=(1, 1),
            num_attention_heads=(1, 2), hidden_size=8, projection_dim=8,
            enable_fusion=True, aff_block_r=4,
        )
        seconds = args.seconds or 0.08
        steps, dpm_steps, lcm_steps, window_s = 6, 3, 2, 0.04
        dtype = jnp.float32

    sr = modules.vocoder_cfg.sampling_rate
    voc_samples = int(seconds * sr)
    b, L = 1, 16
    ids = jnp.full((b, L), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((b, L), jnp.int32)
    u_ids = jnp.full((b, L), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((b, L), jnp.int32).at[:, 0].set(1)

    fn_text = jax.jit(lambda mods, *a: encode_stage(mods, *a))
    fn_vae = jax.jit(lambda mods, lat: decode_latents(mods, lat, dtype))
    fn_voc = jax.jit(lambda mods, mel: vocode(mods, mel, voc_samples))

    def mk_scan(n, sched, gi=None, win=None):
        # the pipeline's own scan-stage factory (shared with the fine
        # split and bench.py — one copy by construction)
        return make_scan_fn(n, seconds, 2.5, dtype=dtype, scheduler=sched,
                            guidance_interval=gi, window_seconds=win)

    paths = {
        "ddim50": mk_scan(steps, "ddim"),
        "gi50": mk_scan(steps, "ddim", gi=(0.05, 0.65)),
        f"dpmpp{dpm_steps}": mk_scan(dpm_steps, "dpm++"),
        f"lcm{lcm_steps}": mk_scan(lcm_steps, "lcm"),
        "windowed": mk_scan(steps, "ddim", win=window_s),
    }

    t0 = time.time()
    cond, uncond = fn_text(modules, ids, mask, u_ids, u_mask)
    lat_aval = jax.eval_shape(paths["ddim50"], modules, cond, uncond,
                              jax.random.PRNGKey(0))
    mel_aval = jax.eval_shape(fn_vae, modules, lat_aval)
    gain = calibrate_vocoder_gain(modules, fn_voc, mel_aval)
    print(f"# text+voc compiled, vocoder gain x{gain:.1f} in {time.time() - t0:.1f}s",
          file=sys.stderr)

    # the five scan programs compile concurrently (bench.py pattern)
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    with ThreadPoolExecutor(len(paths)) as ex:
        futs = {k: ex.submit(lambda f=f: f.lower(modules, cond, uncond, rng).compile())
                for k, f in paths.items()}
        compiled = {k: f.result() for k, f in futs.items()}
    print(f"# {len(paths)} scan programs compiled in {time.time() - t0:.1f}s",
          file=sys.stderr)

    wavs = {}
    for k, c in compiled.items():
        t0 = time.time()
        wav = fn_voc(modules, fn_vae(modules, c(modules, cond, uncond, rng)))
        wavs[k] = np.asarray(jax.device_get(wav))[0].astype(np.float32)
        print(f"# {k}: {time.time() - t0:.1f}s  max|w|={np.abs(wavs[k]).max():.3f}",
              file=sys.stderr)
    # dynamic-range anchor: a DIFFERENT-seed ddim50 output. The proximity
    # numbers only mean something relative to what an unrelated output
    # scores — a random-weight CLAP tower is strongly contracting, so
    # absolute cosines crowd toward 1.0 and the anchor calibrates the scale.
    wav_anchor = np.asarray(jax.device_get(fn_voc(modules, fn_vae(
        modules, compiled["ddim50"](modules, cond, uncond,
                                    jax.random.PRNGKey(args.seed + 1000))))))[0].astype(np.float32)
    wavs["anchor_diffseed"] = wav_anchor

    # anti-vacuity: calibrated audio must be live, and the paths distinct
    assert all(np.abs(w).max() > 0.02 for w in wavs.values()), "near-silent output"

    # CLAP embeddings (full HTSAT geometry; random weights — a fixed
    # deterministic feature map, NOT a trained judge)
    t0 = time.time()
    clap_params = init_clap_audio(jax.random.PRNGKey(args.seed + 1), clap_cfg)
    # params as a jit ARGUMENT, not a closure: closed-over weights are
    # baked into the lowered program as constants and shipped over the
    # slow tunnel inside the serialized executable (the repo-wide rule,
    # pipeline/generate.py; round-5 review finding)
    clap_fn = jax.jit(lambda p, f, l: apply_clap_audio(p, clap_cfg, f, l)["audio_embeds"])
    order = list(wavs)
    feats, longer = batch_fused_features(
        [resample_np(wavs[k], sr, 48000) for k in order])
    emb = np.asarray(jax.device_get(clap_fn(clap_params, feats, longer)))
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    print(f"# CLAP tower: {time.time() - t0:.1f}s", file=sys.stderr)

    ref = order.index("ddim50")
    result = {"gauge": "proximity-vs-ddim50 (NOT quality)", "width": args.width,
              "seconds": seconds, "vocoder_gain": round(gain, 2)}
    for i, k in enumerate(order):
        if k == "ddim50":
            continue
        result[f"clap_cos_{k}"] = round(embedding_cosine(emb[ref], emb[i]), 6)
        result[f"mel_corr_{k}"] = round(mel_correlation(wavs["ddim50"], wavs[k]), 6)
    # self-check: the gauge itself is exact on identical input
    assert embedding_cosine(emb[ref], emb[ref]) > 0.999999
    print(json.dumps(result))


if __name__ == "__main__":
    main()
