"""Per-stage compile-time diagnosis for the generation pipeline.

VERDICT round-2 weak #1: the driver's bench paid a 740 s cold compile
(round 1: 30.8 s) and nothing tracked it. This tool compiles each pipeline
stage separately (text encode / single UNet step / 50-step denoise scan /
VAE decode / vocoder / full generate fn) with the persistent cache pointed
at a throwaway dir, and prints per-stage wall-clock compile times — so a
regression can be attributed to a stage instead of guessed at.

Usage:  python tools/bench_compile.py [--cache DIR] [--steps 50] [--flash/--no-flash]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=None, help="persistent cache dir (default: fresh tmp)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--no-flash", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only-full", action="store_true",
                    help="skip the per-stage section; just time the split vs monolithic generate fns")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = args.cache or f"/tmp/jax_nocache_{os.getpid()}"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass

    from audioldm_tpu.config import (
        ClapTextConfig, DDIMConfig, UNetConfig, VAEConfig, VocoderConfig,
    )
    from audioldm_tpu.kernels import use_flash_attention
    from audioldm_tpu.models import vae as vae_lib
    from audioldm_tpu.models.clap_text import init_clap_text
    from audioldm_tpu.models.unet import apply_unet, init_unet
    from audioldm_tpu.models.vae import init_vae
    from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder
    from audioldm_tpu.pipeline.generate import (
        AudioLDMModules, denoise, encode_prompt, make_generate_fn,
    )

    use_flash_attention(not args.no_flash)
    dtype = jnp.bfloat16

    def timed(name, build):
        t0 = time.perf_counter()
        build()
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt:8.1f}s", flush=True)
        return dt

    # deliberately NOT tools.bench_serving.full_modules (one fused init jit):
    # this tool times init compile per-module, so the 4 jits stay separate
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    t0 = time.perf_counter()
    unet_p = jax.jit(lambda k: bf16(init_unet(k, UNetConfig())))(ks[0])
    vae_p = jax.jit(lambda k: bf16(init_vae(k, VAEConfig())))(ks[1])
    text_p = jax.jit(lambda k: init_clap_text(k, ClapTextConfig()))(ks[2])
    voc_p = jax.jit(lambda k: init_vocoder(k, VocoderConfig()))(ks[3])
    jax.block_until_ready((unet_p, vae_p, text_p, voc_p))
    print(f"{'init (4 jits)':28s} {time.perf_counter() - t0:8.1f}s", flush=True)

    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=ClapTextConfig(),
        vocoder_cfg=VocoderConfig(), ddim_cfg=DDIMConfig(),
    )

    ids = jnp.full((1, 512), 5, jnp.int32)
    mask = jnp.ones((1, 512), jnp.int32)
    emb = jnp.zeros((1, 512), jnp.float32)
    lat = jnp.zeros((1, 256, 16, 8), jnp.float32)
    lat2 = jnp.zeros((2, 256, 16, 8), dtype)
    t = jnp.zeros((2,), jnp.int32)
    emb2 = jnp.zeros((2, 512), dtype)
    mel = jnp.zeros((1, 1024, 64), jnp.float32)

    total = 0.0
    if args.only_full:
        total = float("nan")
    else:
        total += timed("text_encode", lambda: jax.jit(encode_prompt).lower(modules, ids, mask).compile())
        total += timed("unet_step (CFG batch 2)", lambda: jax.jit(
            lambda m, x, tt, e: apply_unet(m.unet, m.unet_cfg, x, tt, class_labels=e)
        ).lower(modules, lat2, t, emb2).compile())
        total += timed(f"denoise scan x{args.steps}", lambda: jax.jit(
            lambda m, l, c, u: denoise(m, l, c, u, args.steps, 2.5, dtype=dtype)
        ).lower(modules, lat, emb, emb).compile())
        total += timed("vae_decode", lambda: jax.jit(
            lambda m, z: vae_lib.decode(m.vae, m.vae_cfg, z.astype(dtype))
        ).lower(modules, lat).compile())
        total += timed("vocoder", lambda: jax.jit(
            lambda m, s: apply_vocoder(m.vocoder, m.vocoder_cfg, s)
        ).lower(modules, mel).compile())
        print(f"{'sum of stages':28s} {total:8.1f}s")

    u_ids = jnp.full((1, 512), 1, jnp.int32)
    u_mask = jnp.zeros((1, 512), jnp.int32)

    fn_split = make_generate_fn(modules, num_inference_steps=args.steps,
                                audio_length_in_s=10.24, dtype=dtype, split_compile=True)
    timed("generate fn (split)", lambda: jax.device_get(
        fn_split(ids, mask, u_ids, u_mask, jax.random.PRNGKey(0))[0, :8]
    ))
    fn_mono = make_generate_fn(modules, num_inference_steps=args.steps,
                               audio_length_in_s=10.24, dtype=dtype, split_compile=False)
    timed("generate fn (monolithic)", lambda: jax.device_get(
        fn_mono(ids, mask, u_ids, u_mask, jax.random.PRNGKey(0))[0, :8]
    ))


if __name__ == "__main__":
    main()
