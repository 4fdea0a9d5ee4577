"""Raw matmul rate probe: what TFLOP/s does the MXU deliver for the
flash-attention constituent shapes (contraction 128) vs deep-contraction
shapes? Determines whether the kernel's 10%-of-peak is shape-inherent."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_attn import timed as _timed


def timed_mm(a, b, iters=50):
    @jax.jit
    def loop(a, b):
        def body(i, a):
            out = jnp.dot(a, b, preferred_element_type=jnp.float32)
            # scalar dependency chains iterations without changing the shape
            return a + (jnp.sum(out) * 1e-30).astype(a.dtype)

        return jax.lax.fori_loop(0, iters, body, a)

    for _ in range(2):
        r = loop(a, b)
        _ = jax.device_get(r[:2, :2])
    t0 = time.perf_counter()
    r = loop(a, b)
    _ = jax.device_get(r[:2, :2])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    shapes = [
        (512, 128, 1024),   # flash QK^T block
        (512, 128, 4096),
        (4096, 128, 4096),  # all q rows at once
        (512, 1024, 128),   # flash PV block (output lanes 128)
        (512, 4096, 128),
        (4096, 4096, 128),
        (512, 512, 512),
        (2048, 2048, 2048), # reference deep shape
        (4096, 4096, 4096),
    ]
    for m, k, n in shapes:
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        # time a@b with a dependency chain: out must feed a, so append identity
        # only when shapes mismatch; simpler: time via timed() with 3D wrapper
        t = timed_mm(a, b, iters=50) if n == k or True else None
        flops = 2 * m * k * n
        print(f"[{m},{k}]x[{k},{n}]: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
