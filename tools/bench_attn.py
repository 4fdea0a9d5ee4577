"""On-device attention micro-bench: XLA sdpa vs Pallas flash variants.

Measures the UNet's two attention shapes (SURVEY.md §2b; PERF.md "headroom"):
level-0 [2,8,4096,16] (~70% of the UNet step) and level-1 [2,8,1024,32].

Timing recipe (NOTES.md): the tunnel backend returns early from
block_until_ready, so each measurement loops the op ITERS times inside one
jit (sequential dependency via output feedback) and fences with a small
device_get.

Usage: python tools/bench_attn.py [--iters 50]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters: int = 50, warmup: int = 2) -> float:
    """Seconds per call, device-pure. The tunnel backend adds a large fixed
    dispatch+fetch overhead (~30 ms), so we time TWO loop lengths inside one
    jit each and take the slope — the fixed cost cancels."""

    def make_loop(n):
        @jax.jit
        def loop(*a):
            def body(i, carry):
                out = fn(*carry)
                # feed the output back into the first arg: sequential iters
                return (out,) + carry[1:]

            return jax.lax.fori_loop(0, n, body, a)[0]

        return loop

    lo, hi = make_loop(iters), make_loop(iters * 3)

    def run(loop):
        r = loop(*args)
        _ = jax.device_get(r[(0,) * (r.ndim - 2) + (slice(0, 2), slice(0, 2))])

    for _ in range(warmup):
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


def xla_sdpa(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from audioldm_tpu.kernels import flash_attention

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(0)

    for shape in [(2, 8, 4096, 16), (2, 8, 1024, 32), (2, 8, 4096, 32)]:
        b, h, n, d = shape
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
        t = timed(xla_sdpa, q, k, v, iters=args.iters)
        print(f"{shape} xla_sdpa: {t*1e3:.3f} ms")
        for bq, bk in [(512, 1024), (512, 2048), (256, 2048), (256, 4096), (512, 4096), (1024, 1024), (128, 4096)]:
            if bq > n or bk > n:
                continue
            try:
                fn = functools.partial(flash_attention, block_q=bq, block_k=bk)
                t = timed(fn, q, k, v, iters=args.iters)
                print(f"{shape} flash bq={bq} bk={bk}: {t*1e3:.3f} ms")
            except Exception as e:
                print(f"{shape} flash bq={bq} bk={bk}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
