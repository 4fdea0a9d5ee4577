"""Pallas TPU flash-attention kernel (non-causal, unmasked).

Hot-op target: the UNet's self-attention over latent tokens (SURVEY.md §2b
"attention as Pallas flash-attention kernels"). At the first UNet level a
10.24 s clip is 4096 tokens; naive attention materializes [B, H, 4096, 4096]
fp32 logits (~1 GB for the CFG-folded batch) in HBM. The streaming-softmax
kernel keeps per-block logits in VMEM and never writes them out — the
classic HBM-bandwidth win.

Design (per the Pallas TPU guide): grid over (batch*heads, q-blocks); K/V for
one batch-head stay resident in VMEM (<= 4096 x 128 x 4 B x 2 = 4 MB); the
kv loop is a `jax.lax.fori_loop` carrying (running-max, running-sum, acc);
head_dim is zero-padded to the 128-lane width by the wrapper (zero K columns
add 0 to logits; zero V columns are sliced off afterwards).

``use_flash_attention(True)`` flips audioldm_tpu.models.nn.sdpa to this
kernel; correctness is tested in interpret mode on CPU and the on/off choice
is benchmarked on hardware (bench.py --flash).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 512  # device-pure sweep on v5e: 512/1024 -> 1.35 ms vs XLA 3.2 ms
_BLOCK_K = 1024  # at the level-0 shape [2,8,4096,16]
_LANE = 128
_MIN_TOKENS = 2048  # below this XLA's fused attention is already optimal

_ENABLED = False


def use_flash_attention(enabled: bool = True):
    """Globally route models.nn.sdpa through the Pallas kernel."""
    global _ENABLED
    _ENABLED = enabled


def enabled() -> bool:
    return _ENABLED


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float):
    # keep matmul INPUTS in the storage dtype (bf16 on the fast path — fp32
    # MXU matmuls are ~4x slower on v5e) and accumulate fp32.
    q = q_ref[0]  # [block_q, D]
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
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk] fp32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # per-row logsumexp, broadcast over the lane dim (residual for backward)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (block_q, _LANE))


def _flash_bh(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, interpret: bool,
    block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """q [BH, N, D], k/v [BH, M, D] with D lane-aligned, N % block_q == 0.
    Returns (out, lse) — lse is the per-row logsumexp residual."""
    bh, n, d = q.shape
    m = k.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    grid = (bh, n // block_q)
    return pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, _LANE), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale: float):
    """Grad wrt K and V. Grid (bh, kv_block, q_block): the q-side operands
    stream through the innermost grid dim (small VMEM blocks); dk/dv
    accumulate fp32 in the resident output block across q iterations."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0]  # [block_k, D]
    v = v_ref[0]
    q = q_ref[0]  # [block_q, D]
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, bk]
    p = jnp.exp(s - lse)
    dv_ref[0] += jnp.dot(p.astype(do.dtype).T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # [bq, bk]
    ds = p * (dp - delta) * scale
    dk_ref[0] += jnp.dot(ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, block_k: int, scale: float):
    """Grad wrt Q for one q block: loop over kv blocks, recompute P."""
    q = q_ref[0]  # [block_q, D]
    do = do_ref[0]
    lse = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    block_q, d = q.shape
    n_kv = k_ref.shape[1]
    num_blocks = n_kv // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_blocks, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_bh(q, k, v, o, lse, do, scale: float, interpret: bool,
                  block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K):
    """Streaming flash backward: never materializes the [N, M] matrix in HBM.
    delta = rowsum(dO * O) is a cheap XLA elementwise reduce."""
    bh, n, d = q.shape
    m = k.shape[1]
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True), (bh, n, _LANE)
    )

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, m // block_k, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, m, d), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    dk = dk.astype(q.dtype)
    dv = dv.astype(q.dtype)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid=(bh, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def supported(n: int, m: int, d: int) -> bool:
    return (
        n >= _MIN_TOKENS  # shorter sequences: XLA's fused attention wins
        and n % min(_BLOCK_Q, n) == 0
        and m % min(_BLOCK_K, m) == 0
        and n % 8 == 0
        and m % 8 == 0
        and d <= _LANE
    )


def _pad_reshape(q, k, v):
    b, h, n, d = q.shape
    m = k.shape[2]
    pad = (-d) % _LANE
    if pad:
        padding = ((0, 0), (0, 0), (0, 0), (0, pad))
        q, k, v = (jnp.pad(t, padding) for t in (q, k, v))
    dp = d + pad
    return (
        q.reshape(b * h, n, dp),
        k.reshape(b * h, m, dp),
        v.reshape(b * h, m, dp),
        (b, h, n, m, d, dp),
    )


def _flash_fwd_impl(q, k, v, interpret=False, block_q=None, block_k=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    qp, kp, vp, (b, h, n, m, d, dp) = _pad_reshape(q, k, v)
    out, _ = _flash_bh(
        qp, kp, vp, scale, interpret,
        block_q=block_q or _BLOCK_Q, block_k=block_k or _BLOCK_K,
    )
    return out.reshape(b, h, n, dp)[..., :d]


@jax.custom_vjp
def _flash(q, k, v):
    return _flash_fwd_impl(q, k, v)


def _flash_vjp_fwd(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    qp, kp, vp, meta = _pad_reshape(q, k, v)
    out_bh, lse = _flash_bh(qp, kp, vp, scale, False)
    b, h, n, m, d, dp = meta
    return out_bh.reshape(b, h, n, dp)[..., :d], (qp, kp, vp, out_bh, lse, meta)


def _flash_vjp_bwd(res, g):
    # streaming Pallas backward (the LoRA trainer differentiates through
    # attention outputs, SURVEY.md §3.1) — recomputes P per block, never
    # writes the [N, M] matrix to HBM.
    qp, kp, vp, out_bh, lse, (b, h, n, m, d, dp) = res
    scale = 1.0 / math.sqrt(d)
    pad = dp - d
    do = g
    if pad:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, 0), (0, pad)))
    do = do.reshape(b * h, n, dp).astype(qp.dtype)
    dq, dk, dv = _flash_bwd_bh(qp, kp, vp, out_bh, lse, do, scale, False)
    dq = dq.reshape(b, h, n, dp)[..., :d]
    dk = dk.reshape(b, h, m, dp)[..., :d]
    dv = dv.reshape(b, h, m, dp)[..., :d]
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False,
    block_q: int | None = None, block_k: int | None = None,
) -> jnp.ndarray:
    """Drop-in for models.nn.sdpa on unmasked inputs: ``[B, H, N, D]``.
    Differentiable: Pallas kernel forward, XLA-attention backward."""
    if interpret or block_q is not None or block_k is not None:
        return _flash_fwd_impl(q, k, v, interpret=interpret, block_q=block_q, block_k=block_k)
    return _flash(q, k, v)
