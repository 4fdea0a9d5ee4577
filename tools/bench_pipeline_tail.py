"""Decompose the generate pipeline's non-UNet tail on TPU: text encode,
VAE decode, vocoder — each timed device-pure with in-jit loops (params are
jit ARGUMENTS — closing them in trips the remote-compile size limit)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from tools.bench_serving import full_modules
from audioldm_tpu.kernels import use_flash_attention
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.clap_text import apply_clap_text
from audioldm_tpu.models.vocoder import apply_vocoder


def timed(fn, params, *xs, iters=12):
    """fn(params, *xs) -> array; slope-timed with a data dependency chained
    through a zero-scaled mean so the loop can't be collapsed."""

    def make_loop(n):
        @jax.jit
        def loop(p, *a):
            def body(i, carry):
                out = fn(p, *carry)
                eps = (jnp.mean(out.astype(jnp.float32)) * 0).astype(carry[0].dtype)
                return (carry[0] + eps,) + carry[1:]

            r = jax.lax.fori_loop(0, n, body, a)
            return fn(p, *r)

        return loop

    lo, hi = make_loop(iters), make_loop(iters * 3)

    def run(loop):
        out = loop(params, *xs)
        _ = jax.device_get(out.reshape(-1)[:4])

    for _ in range(2):
        run(lo); run(hi)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(lo)
        t1 = time.perf_counter(); run(hi)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * iters))
    return best


def main():
    use_flash_attention(True)
    modules = full_modules()

    ids = jnp.full((2, 512), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((2, 512), jnp.int32)
    t = timed(
        lambda p, idsf: apply_clap_text(p, modules.text_cfg, idsf.astype(jnp.int32), mask)["text_embeds"].astype(jnp.float32),
        modules.text_encoder, ids.astype(jnp.float32),
    )
    print(f"text encode (2x512 tok): {t*1e3:.2f} ms", flush=True)

    latents = jnp.zeros((1, 256, 16, 8), jnp.bfloat16)
    t = timed(
        lambda p, z: vae_lib.decode(p, modules.vae_cfg, z).astype(jnp.float32),
        modules.vae, latents,
    )
    print(f"vae decode (256x16x8 -> 1024x64 mel): {t*1e3:.2f} ms", flush=True)

    mel = jnp.zeros((1, 1024, 64), jnp.bfloat16)
    t = timed(
        lambda p, m: apply_vocoder(p, modules.vocoder_cfg, m).astype(jnp.float32),
        modules.vocoder, mel,
    )
    print(f"vocoder fp32 (1024x64 -> 163840 samples): {t*1e3:.2f} ms", flush=True)

    t = timed(
        lambda p, m: apply_vocoder(p, modules.vocoder_cfg, m, dtype=jnp.bfloat16).astype(jnp.float32),
        modules.vocoder, mel,
    )
    print(f"vocoder bf16 (1024x64 -> 163840 samples): {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
