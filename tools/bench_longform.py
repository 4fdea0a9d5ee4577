"""Long-form generation A/B: full-length attention vs MultiDiffusion windowed
denoising (pipeline/generate.py ``window_seconds``).

The level-0 UNet attention is N^2 in latent frames: a 30 s clip runs 12,000
tokens per level-0 call (vs 4096 at the 10.24 s flagship), so cost grows
quadratically with clip length (PERF.md: 5.92 s/clip at 30 s = 0.20 s per
audio-second vs 0.073 at 10.24 s). Windowed denoising stacks K overlapping
10.24 s windows into ONE batched UNet call per step and averages the overlap
regions — linear cost in clip length, every window at the 4096-token flash
sweet spot.

Usage (on the TPU chip):
  python tools/bench_longform.py --seconds 30 --steps 50 --iters 3
  python tools/bench_longform.py --seconds 30 --overlap 0.25
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--window-seconds", type=float, default=10.24)
    ap.add_argument("--overlap", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="full,windowed")
    ap.add_argument("--scheduler", default="ddim", choices=["ddim", "dpm++", "lcm"])
    args = ap.parse_args()

    from audioldm_tpu.config import (
        ClapTextConfig, DDIMConfig, UNetConfig, VAEConfig, VocoderConfig,
    )
    from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
    from audioldm_tpu.models.clap_text import init_clap_text
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

    t0 = time.perf_counter()
    unet_p, vae_p, text_p, voc_p = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready(unet_p)
    print(f"# init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )

    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)

    for mode in args.modes.split(","):
        ws = None if mode == "full" else args.window_seconds
        fn = make_generate_fn(
            modules, num_inference_steps=args.steps, audio_length_in_s=args.seconds,
            guidance_scale=2.5, dtype=jnp.bfloat16, window_seconds=ws,
            window_overlap=args.overlap, scheduler=args.scheduler,
        )

        def run(seed):
            wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
            return jax.device_get(wav[0, :8])

        t0 = time.perf_counter()
        run(0)
        print(f"# {mode}: compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        run(1)
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(2 + i)
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"{mode:9s} {args.scheduler} seconds={args.seconds} steps={args.steps} "
            f"window={ws} overlap={args.overlap if ws else '-'}: "
            f"{dt:.3f} s/clip ({dt / args.seconds:.4f} s per audio-second)"
        )


if __name__ == "__main__":
    main()
