"""Focused re-measurement of top flash block configs at the UNet level-0
shape, with correctness checks vs XLA sdpa (run on TPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_attn import timed, xla_sdpa
from audioldm_tpu.kernels import flash_attention


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.devices()[0]}")
    for shape in [(2, 8, 4096, 16)]:
        b, h, n, d = shape
        q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        ref = np.asarray(jax.jit(xla_sdpa)(q, k, v), np.float32)
        t_x = timed(xla_sdpa, q, k, v, iters=100)
        print(f"{shape} xla: {t_x*1e3:.3f} ms")
        for bq, bk in [(512, 2048), (512, 4096), (256, 4096), (128, 4096),
                       (64, 4096), (128, 2048), (1024, 4096), (2048, 4096)]:
            fn = functools.partial(flash_attention, block_q=bq, block_k=bk)
            out = np.asarray(jax.jit(fn)(q, k, v), np.float32)
            err = np.max(np.abs(out - ref))
            t = timed(fn, q, k, v, iters=100)
            print(f"{shape} flash bq={bq} bk={bk}: {t*1e3:.3f} ms  max_err={err:.4f}")


if __name__ == "__main__":
    main()
