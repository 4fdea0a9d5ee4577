"""On-chip audio-to-audio (SDEdit) latency: s/clip vs strength.

Style transfer runs only the final ``int(50 * strength)`` DDIM steps, so the
denoise cost scales linearly with strength while the text/VAE/vocoder tail
is constant — this measures the real end-to-end curve at the flagship
geometry (10.24 s clip, bf16, flash attention + fused MRF on).

Usage: python tools/bench_a2a.py [--strengths 1.0,0.75,0.5] [--iters 5]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strengths", default="1.0,0.75,0.5")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from audioldm_tpu.config import ClapTextConfig, DDIMConfig, UNetConfig, VAEConfig, VocoderConfig
    from audioldm_tpu.kernels import use_flash_attention, use_fused_mrf
    from audioldm_tpu.models.clap_text import init_clap_text
    from audioldm_tpu.models.unet import init_unet
    from audioldm_tpu.models.vae import init_vae
    from audioldm_tpu.models.vocoder import init_vocoder
    from audioldm_tpu.pipeline.audio2audio import make_a2a_fn
    from audioldm_tpu.pipeline.generate import AudioLDMModules
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
    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )

    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)
    mel_init = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 64, 1), jnp.float32)

    for s in (float(x) for x in args.strengths.split(",")):
        fn = make_a2a_fn(
            modules, num_inference_steps=args.steps, audio_length_in_s=10.24,
            strength=s, guidance_scale=2.5, dtype=jnp.bfloat16,
        )

        def run(seed):
            wav = fn(mel_init, ids, mask, u_ids, u_mask, jax.random.PRNGKey(seed))
            return jax.device_get(wav[0, :8])  # tunnel: device_get as fence

        t0 = time.perf_counter()
        run(0)
        compile_s = time.perf_counter() - t0
        run(1)
        t0 = time.perf_counter()
        for i in range(args.iters):
            run(2 + i)
        dt = (time.perf_counter() - t0) / args.iters
        n_run = args.steps - max(args.steps - min(int(args.steps * s), args.steps), 0)
        print(f"strength {s:4.2f}: {dt:.3f} s/clip  ({n_run} steps; compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
