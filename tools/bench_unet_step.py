"""UNet ε-step ablation profile on TPU: full step vs attention-ablated vs
flash on/off — tells us how the ~16 ms step splits between attention and
everything else (convs/norms/FF/projections/transposes)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from audioldm_tpu.config import UNetConfig
from audioldm_tpu.kernels import use_flash_attention
from audioldm_tpu.models import nn as nn_mod
from audioldm_tpu.models.unet import apply_unet, init_unet


def timed_step(params, x, t, lbl, cfg, iters=20):
    """Slope timing with params as a jit ARGUMENT (device buffers — closing
    GB-scale weights into the HLO trips the remote-compile size limit) and
    the UNet output fed back into x for sequential iterations."""

    def make_loop(n):
        @jax.jit
        def loop(p, x0):
            def body(i, xc):
                out = apply_unet(p, cfg, xc, t, class_labels=lbl)
                return out.astype(xc.dtype)

            return jax.lax.fori_loop(0, n, body, x0)

        return loop

    lo, hi = make_loop(iters), make_loop(iters * 3)

    def run(loop):
        r = loop(params, x)
        _ = jax.device_get(r[:, :2, :2, 0])

    for _ in range(2):
        run(lo)
        run(hi)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run(lo)
        t1 = time.perf_counter()
        run(hi)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (2 * iters))
    return best


def main():
    cfg = UNetConfig()
    params = jax.jit(lambda k: jax.tree.map(lambda x: x.astype(jnp.bfloat16), init_unet(k, cfg)))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    x = jnp.zeros((2, 256, 16, cfg.in_channels), jnp.bfloat16)
    t = jnp.asarray([981, 981], jnp.int32)
    lbl = jnp.ones((2, cfg.projection_class_embeddings_input_dim), jnp.bfloat16)

    real_sdpa = nn_mod.sdpa

    def run(tag):
        dt = timed_step(params, x, t, lbl, cfg)
        print(f"{tag}: {dt*1e3:.2f} ms", flush=True)
        return dt

    from audioldm_tpu.kernels.flash_attention import set_min_tokens

    use_flash_attention(True)
    full = run("full step, flash (L0 only, bk=4096)")

    set_min_tokens(1024)
    run("full step, flash on L0+L1")
    set_min_tokens(256)
    run("full step, flash on L0+L1+L2")
    set_min_tokens(2048)

    # ablate attention entirely: sdpa -> v (keeps projections/reshapes)
    nn_mod.sdpa = lambda q, k, v, *a, **kw: v
    noattn = run("step, sdpa ablated (projections kept)")
    nn_mod.sdpa = real_sdpa

    print(f"attention core: {(full-noattn)*1e3:.2f} ms of {full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
