"""Diagnostic variants of the flash kernel to locate the bottleneck on-device:
full kernel vs no-exp vs no-matmul vs matmul-only. Scratch tool, results feed
PERF.md and kernel design."""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_attn import timed


def make_kernel(variant: str, block_k: int, scale: float):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]
        block_q, d = q.shape
        n_kv = k_ref.shape[1]
        num_blocks = n_kv // block_k

        m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)

        def body(i, carry):
            m, l, acc = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), :]
            v = v_ref[0, pl.ds(i * block_k, block_k), :]
            if variant == "matmul_only":
                s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
                p = s.astype(v.dtype)
                acc = acc + jnp.dot(p, v, preferred_element_type=jnp.float32)
                return m, l, acc
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
            if variant == "no_exp":
                p = s
                m_new = m
            elif variant == "no_max":
                p = jnp.exp(s)
                m_new = m
            elif variant == "exp2":
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp2((s - m_new) * 1.4426950408889634)
            else:  # full
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
            alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0) if variant == "full" else jnp.ones_like(m)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)

    return kernel


def run(q, k, v, variant: str, block_q: int, block_k: int):
    b, h, n, d = q.shape
    pad = (-d) % 128
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad))) for t in (q, k, v))
    dp = d + pad
    qp = q.reshape(b * h, n, dp)
    kp = k.reshape(b * h, n, dp)
    vp = v.reshape(b * h, n, dp)
    scale = 1.0 / math.sqrt(d)
    out = pl.pallas_call(
        make_kernel(variant, block_k, scale),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, n, dp)[..., :d]


def main():
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 8, 4096, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    for variant in ["full", "exp2", "no_max", "no_exp", "matmul_only"]:
        for bq, bk in [(512, 1024), (512, 4096)]:
            fn = functools.partial(run, variant=variant, block_q=bq, block_k=bk)
            t = timed(fn, q, k, v, iters=30)
            print(f"{variant} bq={bq} bk={bk}: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Reworked forward variants (candidate kernel v2)
# ---------------------------------------------------------------------------

LOG2E = 1.4426950408889634


def run_fori_exp2(q, k, v, block_q: int, block_k: int):
    """Current structure + exp2 with scale folded into q."""
    b, h, n, d = q.shape
    pad = (-d) % 128
    scale = (1.0 / math.sqrt(d)) * LOG2E
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad))) for t in (q, k, v))
    dp = d + pad
    qp = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, dp)
    kp = k.reshape(b * h, n, dp)
    vp = v.reshape(b * h, n, dp)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qq = q_ref[0]
        bq, dd = qq.shape
        num_blocks = k_ref.shape[1] // block_k
        m0 = jnp.full((bq, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc0 = jnp.zeros((bq, dd), jnp.float32)

        def body(i, carry):
            m, l, acc = carry
            kk = k_ref[0, pl.ds(i * block_k, block_k), :]
            vv = v_ref[0, pl.ds(i * block_k, block_k), :]
            s = jnp.dot(qq, kk.T, preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(vv.dtype), vv, preferred_element_type=jnp.float32)
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dp), lambda bb, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bb, i: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, n, dp)[..., :d]


def run_grid3(q, k, v, block_q: int, block_k: int):
    """3-D grid (bh, qb, kv) with scratch accumulators: Mosaic pipelines
    across kv steps (DMA prefetch + VPU/MXU overlap)."""
    b, h, n, d = q.shape
    pad = (-d) % 128
    scale = (1.0 / math.sqrt(d)) * LOG2E
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad))) for t in (q, k, v))
    dp = d + pad
    qp = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, dp)
    kp = k.reshape(b * h, n, dp)
    vp = v.reshape(b * h, n, dp)
    nkv = n // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_s[:] = jnp.full_like(m_s, -1e30)
            l_s[:] = jnp.zeros_like(l_s)
            acc_s[:] = jnp.zeros_like(acc_s)

        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        s = jnp.dot(qq, kk.T, preferred_element_type=jnp.float32)
        m_prev = m_s[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_s[:, 0:1] = l_s[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jnp.dot(p.astype(vv.dtype), vv, preferred_element_type=jnp.float32)
        m_s[:, 0:1] = m_new

        @pl.when(j == nkv - 1)
        def _done():
            o_ref[0] = (acc_s[:] / l_s[:, 0:1]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, n // block_q, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, n, dp)[..., :d]


def main2():
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 8, 4096, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)

    # correctness vs XLA reference first
    from tools.bench_attn import xla_sdpa
    ref = np.asarray(xla_sdpa(q, k, v), np.float32)
    for name, fn, bq, bk in [
        ("fori_exp2", run_fori_exp2, 512, 1024),
        ("grid3", run_grid3, 512, 512),
    ]:
        got = np.asarray(fn(q, k, v, bq, bk), np.float32)
        err = np.max(np.abs(got - ref))
        print(f"{name} max err vs xla: {err:.4f}")

    from audioldm_tpu.kernels import flash_attention
    t = timed(functools.partial(flash_attention, block_q=512, block_k=1024), q, k, v, iters=30)
    print(f"current flash: {t*1e3:.3f} ms")
    for bq in (512, 1024, 2048):
        t = timed(functools.partial(run_fori_exp2, block_q=bq, block_k=1024), q, k, v, iters=30)
        print(f"fori_exp2 bq={bq} bk=1024: {t*1e3:.3f} ms")
    for bq in (512, 1024, 2048):
        for bk in (512, 1024, 2048):
            t = timed(functools.partial(run_grid3, block_q=bq, block_k=bk), q, k, v, iters=30)
            print(f"grid3 bq={bq} bk={bk}: {t*1e3:.3f} ms")


if __name__ == "__main__" and len(__import__("sys").argv) > 1 and __import__("sys").argv[1] == "v2":
    main2()


def run_grid3b(q, k, v, block_q: int, block_k: int, vmem_mb: int = 0):
    """grid3 + the ones-lane trick: V's first pad lane is set to 1 so the PV
    matmul also accumulates the softmax row-sum l (no separate VPU reduce)."""
    b, h, n, d = q.shape
    pad = (-d) % 128
    assert pad >= 1
    scale = (1.0 / math.sqrt(d)) * LOG2E
    qp = (jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad))).astype(jnp.float32) * scale).astype(q.dtype)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
    vp = vp.at[..., d].set(1.0)  # ones lane -> PV accumulates l
    dp = d + pad
    qp, kp, vp = (t.reshape(b * h, n, dp) for t in (qp, kp, vp))
    nkv = n // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref, m_s, acc_s):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_s[:] = jnp.full_like(m_s, -1e30)
            acc_s[:] = jnp.zeros_like(acc_s)

        qq = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        s = jnp.dot(qq, kk.T, preferred_element_type=jnp.float32)
        m_prev = m_s[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        acc_s[:] = acc_s[:] * alpha + jnp.dot(p.astype(vv.dtype), vv, preferred_element_type=jnp.float32)
        m_s[:, 0:1] = m_new

        @pl.when(j == nkv - 1)
        def _done():
            o_ref[0] = (acc_s[:] / acc_s[:, d][:, None]).astype(o_ref.dtype)

    cp = dict(dimension_semantics=("parallel", "parallel", "arbitrary"))
    if vmem_mb:
        cp["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
    out = pl.pallas_call(
        kernel,
        grid=(b * h, n // block_q, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda bb, i, j: (bb, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda bb, i, j: (bb, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(**cp),
    )(qp, kp, vp)
    return out.reshape(b, h, n, dp)[..., :d]


def main3():
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 8, 4096, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    from tools.bench_attn import xla_sdpa
    ref = np.asarray(xla_sdpa(q, k, v), np.float32)
    got = np.asarray(run_grid3b(q, k, v, 512, 1024), np.float32)
    print(f"grid3b max err vs xla: {np.max(np.abs(got - ref)):.4f}")
    for bq, bk, mb in [(512, 2048, 0), (512, 2048, 64), (256, 4096, 64), (512, 4096, 64), (1024, 2048, 64), (512, 1024, 0), (2048, 2048, 96)]:
        try:
            t = timed(functools.partial(run_grid3b, block_q=bq, block_k=bk, vmem_mb=mb), q, k, v, iters=30)
            print(f"grid3b bq={bq} bk={bk} vmem={mb}: {t*1e3:.3f} ms")
        except Exception as e:
            print(f"grid3b bq={bq} bk={bk} vmem={mb}: FAIL {str(e)[:90]}")


if __name__ == "__main__" and len(__import__("sys").argv) > 1 and __import__("sys").argv[1] == "v3":
    main3()


def main4():
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 8, 4096, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    from audioldm_tpu.kernels import flash_attention
    cands = [
        ("current", functools.partial(flash_attention, block_q=512, block_k=1024)),
        ("grid3 512/2048", functools.partial(run_grid3, block_q=512, block_k=2048)),
        ("grid3b 512/4096/64", functools.partial(run_grid3b, block_q=512, block_k=4096, vmem_mb=64)),
        ("grid3b 512/2048/64", functools.partial(run_grid3b, block_q=512, block_k=2048, vmem_mb=64)),
        ("grid3b 256/4096/64", functools.partial(run_grid3b, block_q=256, block_k=4096, vmem_mb=64)),
    ]
    for rep in range(2):
        for name, fn in cands:
            t = timed(fn, q, k, v, iters=60)
            print(f"rep{rep} {name}: {t*1e3:.3f} ms")


if __name__ == "__main__" and len(__import__("sys").argv) > 1 and __import__("sys").argv[1] == "v4":
    main4()


def main5():
    rng = np.random.default_rng(0)
    from tools.bench_attn import xla_sdpa
    for shape in [(2, 8, 1024, 32), (2, 8, 2048, 16), (2, 8, 512, 64)]:
        b, h, n, d = shape
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
        t = timed(xla_sdpa, q, k, v, iters=60)
        print(f"{shape} xla: {t*1e3:.3f} ms")
        for bq, bk in [(512, 1024), (512, 2048), (min(512, n), min(2048, n))]:
            if bq > n or bk > n:
                continue
            t = timed(functools.partial(run_grid3, block_q=bq, block_k=bk), q, k, v, iters=60)
            print(f"{shape} grid3 {bq}/{bk}: {t*1e3:.3f} ms")


if __name__ == "__main__" and len(__import__("sys").argv) > 1 and __import__("sys").argv[1] == "v5":
    main5()
