"""Capture a jax.profiler trace of the full-size generate pipeline on the real
chip and rank device-plane ops with tools/read_xplane.py — the in-image
replacement for the xprof UI (tensorboard-plugin-profile is not installed).

Reuses bench.py's geometry (10.24 s clip, 50 DDIM steps, bf16, flash attn) so
the ranked fusions map 1:1 onto the headline number's step anatomy.

Usage: python tools/profile_pipeline.py [--out /tmp/pipe_prof] [--steps 50] [--top 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pipe_prof")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from audioldm_tpu.config import (ClapTextConfig, DDIMConfig, UNetConfig,
                                     VAEConfig, VocoderConfig)
    from audioldm_tpu.kernels import use_flash_attention
    from audioldm_tpu.models.clap_text import init_clap_text
    from audioldm_tpu.models.unet import init_unet
    from audioldm_tpu.models.vae import init_vae
    from audioldm_tpu.models.vocoder import init_vocoder
    from audioldm_tpu.pipeline.generate import AudioLDMModules, make_generate_fn

    use_flash_attention(True)
    from audioldm_tpu.kernels import use_fused_mrf

    use_fused_mrf(True)

    def _init(key):
        ks = jax.random.split(key, 4)
        bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
        return (bf16(init_unet(ks[0], UNetConfig())),
                bf16(init_vae(ks[1], VAEConfig())),
                init_clap_text(ks[2], ClapTextConfig()),
                init_vocoder(ks[3], VocoderConfig()))

    unet_p, vae_p, text_p, voc_p = jax.jit(_init)(jax.random.PRNGKey(0))
    jax.block_until_ready(unet_p)

    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )
    fn = make_generate_fn(modules, num_inference_steps=args.steps,
                          audio_length_in_s=10.24, guidance_scale=2.5,
                          dtype=jnp.bfloat16)

    ids = jnp.full((1, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 512), jnp.int32)
    u_ids = jnp.full((1, 512), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 512), jnp.int32).at[:, 0].set(1)

    def run(seed):
        return jax.device_get(fn(ids, mask, u_ids, u_mask,
                                 jax.random.PRNGKey(seed))[0, :8])

    t0 = time.perf_counter()
    run(0)
    print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(args.out):
        run(1)

    import read_xplane
    read_xplane.summarize(args.out, top=args.top, plane_filter="TPU")


if __name__ == "__main__":
    main()
