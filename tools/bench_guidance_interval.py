"""On-chip limited-interval guidance latency: s/clip vs guidance interval.

Standard CFG runs the batch-2 UNet on every step; with guidance_interval
(lo, hi) the steps whose timestep falls outside the interval run the
conditional-only batch-1 UNet instead (pipeline/generate.py denoise
docstring — Kynkäänniemi et al. 2024). At the flagship geometry (10.24 s
clip, 50 DDIM steps, bf16, flash attention + fused MRF) this measures the
real latency curve as the interval narrows.

Usage: python tools/bench_guidance_interval.py \
           [--intervals full,0.05:0.65,0.1:0.5] [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--intervals", default="full,0.05:0.65,0.1:0.5")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--scheduler", default="ddim", choices=["ddim", "dpm++"])
    args = ap.parse_args()

    from audioldm_tpu.config import ClapTextConfig, DDIMConfig, UNetConfig, VAEConfig, VocoderConfig
    from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
    from audioldm_tpu.models.clap_text import init_clap_text
    from audioldm_tpu.models.scheduler import inference_timesteps
    from audioldm_tpu.models.unet import init_unet
    from audioldm_tpu.models.vae import init_vae
    from audioldm_tpu.models.vocoder import init_vocoder
    from audioldm_tpu.pipeline.generate import AudioLDMModules, make_generate_fn
    from audioldm_tpu.utils.fastinit import random_params_like, shapes_of

    use_flash_attention(True)
    use_fused_mrf(True)

    def _init(key):
        ks = jax.random.split(key, 4)
        return (
            random_params_like(ks[0], shapes_of(init_unet, UNetConfig()), dtype=jnp.bfloat16),
            random_params_like(ks[1], shapes_of(init_vae, VAEConfig()), dtype=jnp.bfloat16),
            random_params_like(ks[2], shapes_of(init_clap_text, ClapTextConfig())),
            random_params_like(ks[3], shapes_of(init_vocoder, VocoderConfig())),
        )

    unet_p, vae_p, text_p, voc_p = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready(unet_p)
    ddim_cfg = DDIMConfig()
    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=ddim_cfg,
    )

    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)

    ts = inference_timesteps(ddim_cfg, args.steps)
    n = ddim_cfg.num_train_timesteps

    for spec in args.intervals.split(","):
        if spec == "full":
            gi = None
            cfg_steps = len(ts)
        else:
            lo, hi = (float(x) for x in spec.split(":"))
            gi = (lo, hi)
            cfg_steps = int(np.sum((ts >= lo * (n - 1)) & (ts <= hi * (n - 1))))
        fn = make_generate_fn(
            modules, num_inference_steps=args.steps, audio_length_in_s=10.24,
            guidance_scale=2.5, dtype=jnp.bfloat16, guidance_interval=gi,
            scheduler=args.scheduler,
        )

        def run(seed):
            wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
            return jax.device_get(wav[0, :8])  # tunnel: device_get as fence

        t0 = time.perf_counter()
        run(0)
        compile_s = time.perf_counter() - t0
        run(1)
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(2 + i)
        dt = (time.perf_counter() - t0) / args.iters
        label = "full (every-step CFG)" if gi is None else f"({gi[0]}, {gi[1]})"
        print(f"interval {label:>22}: {dt:.3f} s/clip  "
              f"({cfg_steps}/{len(ts)} CFG steps; compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
