"""Pallas TPU flash-attention kernel (non-causal, unmasked).

Hot-op target: the UNet's self-attention over latent tokens (SURVEY.md §2b
"attention as Pallas flash-attention kernels"). At the first UNet level a
10.24 s clip is 4096 tokens; naive attention materializes [B, H, 4096, 4096]
fp32 logits (~1 GB for the CFG-folded batch) in HBM. The streaming-softmax
kernel keeps per-block logits in VMEM and never writes them out — the
classic HBM-bandwidth win.

Design (v2, driven by on-device measurement — tools/bench_attn_diag.py):
- 3-D grid (batch*heads, q-blocks, kv-blocks) with the kv axis innermost and
  ``dimension_semantics=("parallel","parallel","arbitrary")``: running
  (max, sum, acc) live in VMEM scratch across kv steps, so Mosaic pipelines
  the next block's DMA and overlaps VPU softmax with MXU matmuls. Measured
  0.93 ms vs 1.08 ms for the round-1 2-D-grid/fori kernel at the level-0
  shape [2,8,4096,16] (matmul-only floor: ~0.75 ms — the padded-lane MXU
  roofline; head_dim 16 means any MXU mapping carries 8x pad FLOPs).
- softmax in base-2: ``1/sqrt(d) * log2(e)`` is folded into q on the host
  side of the call, the kernel uses ``exp2`` directly (saves the per-block
  logit scale multiply; exp == exp2 ∘ (·log2e) on the VPU anyway).
- head_dim is zero-padded to the 128-lane width by the wrapper (zero K
  columns add 0 to logits; zero V columns are sliced off afterwards).
- bf16 matmul inputs with fp32 MXU accumulation; softmax state fp32.

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

_BLOCK_Q = 512  # on-device sweep (tools/bench_attn_focus.py): 512/4096 best
_BLOCK_K = 4096  # kv resident per (bh, q-block): 0.84 ms vs 0.86 at 2048
_LANE = 128
_MIN_TOKENS = 2048  # below this XLA's fused attention is already optimal
_BWD_BLOCK_K = 1024  # backward dkv/dq kv-block (supported() pins divisibility)
_LOG2E = 1.4426950408889634


def set_min_tokens(n: int):
    """Routing threshold override (perf experiments / other model geometries)."""
    global _MIN_TOKENS
    _MIN_TOKENS = n

_ENABLED = False

# Test hook: force interpret mode through the REAL routing (custom_vjp +
# jit + shard_map) so the dp-sharded path is executable on a CPU mesh —
# the TPU-gated kernels are otherwise untestable under a virtual mesh.
_FORCE_INTERPRET = False


def force_interpret(enabled: bool = True):
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = enabled


# Single-kv-block "one-pass" forward variant: strips the running-max/rescale
# state and rides the softmax denominator on the AV matmul via a ones column
# in v's padding. MEASURED NEGATIVE on v5e (UNet step 13.65 -> 14.03-14.19
# ms; L0 micro 0.92 vs 0.84-0.92 streaming): the kernel is exp2-bound, the
# removed lane-reduce was cheap, and the ones-column write adds ~8 MB of HBM
# traffic per call. Kept behind this flag for re-evaluation on other
# hardware; tests pin its numerics either way (test_flash_attention.py).
_ONE_PASS = False


def use_flash_attention(enabled: bool = True):
    """Globally route models.nn.sdpa through the Pallas kernel."""
    global _ENABLED
    _ENABLED = enabled


def enabled() -> bool:
    return _ENABLED


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s, *, nkv: int,
                  m_real: int | None = None):
    """One (bh, q-block, kv-block) grid step. q comes pre-scaled by
    ``scale * log2e``; softmax runs in the exp2 domain. Scratch (m, l, acc)
    carries across the innermost kv axis. ``lse_ref`` is None on the
    inference path — the logsumexp residual is only needed by the backward,
    and writing it costs a [BH, N, lanes] fp32 HBM store per call.
    ``m_real``: true kv length when the wrapper padded it to a block
    multiple — padded columns are masked to -inf before the softmax."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[:] = jnp.full_like(m_s, -1e30)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    q = q_ref[0]  # [block_q, D] (pre-scaled)
    k = k_ref[0]  # [block_k, D]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk] fp32
    if m_real is not None:
        bk = s.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + j * bk
        s = jnp.where(col < m_real, s, -1e30)
    m_prev = m_s[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_s[:, 0:1] = l_s[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[:] = acc_s[:] * alpha + jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_s[:, 0:1] = m_new

    @pl.when(j == nkv - 1)
    def _done():
        l = l_s[:, 0:1]
        o_ref[0] = (acc_s[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # base-2 logsumexp residual for the backward, broadcast over lanes
            lse_ref[0] = jnp.broadcast_to(m_s[:, 0:1] + jnp.log2(l), lse_ref[0].shape)


def _flash_kernel_nolse(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *, nkv: int,
                        m_real: int | None = None):
    _flash_kernel(q_ref, k_ref, v_ref, o_ref, None, m_s, l_s, acc_s, nkv=nkv, m_real=m_real)


def _flash_kernel_one(q_ref, k_ref, v_ref, o_ref, *, sum_col: int, m_real: int | None = None):
    """Single-kv-block inference fast path (nkv == 1 — the UNet level-0
    case: block_k 4096 covers the whole sequence).

    The kernel is VPU-bound, not MXU-bound (exp2 + lane reductions over the
    [bq, bk] logits dominate; the padded matmuls are ~256 passes/step), so
    this variant strips VPU work: no running-max/rescale state, and the
    softmax DENOMINATOR rides the AV matmul for free — the wrapper sets one
    zero-pad column of v (index ``sum_col`` = real head_dim) to ONES, so
    output column ``sum_col`` IS rowsum(p); the lane-reduction for l
    disappears. Measured vs the streaming kernel at [2,8,4096,16]: see
    PERF.md round-3 attention notes."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk] fp32
    if m_real is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        s = jnp.where(col < m_real, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    l = o[:, sum_col : sum_col + 1]  # rowsum(p), from the ones column
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_bh(
    q2: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool,
    block_q: int = _BLOCK_Q, block_k: int = _BLOCK_K, with_lse: bool = True,
    sum_col: int | None = None,
):
    """q2 [BH, N, D] PRE-SCALED by scale*log2e, k/v [BH, M, D] with D
    lane-aligned. Returns (out, lse2) with ``with_lse`` (training: lse2 is
    the base-2 logsumexp residual) or just ``out`` without (inference:
    skips a [BH, N, 128] fp32 HBM store per call). ``sum_col``: index of
    v's ones column (set by _pad_reshape when head_dim < lane width) —
    enables the single-kv-block fast path.

    Ragged N/M (e.g. the API-default 10.0 s clip -> 4000 level-0 tokens)
    are padded to block multiples here: padded kv columns are masked to
    -inf inside the kernel (zero-padded k/v rows would otherwise collect
    softmax mass at logit 0); padded q rows compute garbage that the
    caller's slice discards."""
    bh, n, d = q2.shape
    m = k.shape[1]
    if q2.dtype == jnp.float32:
        # fp32 k/v/S tiles are 2x the bf16 footprint: block_k 4096 exceeds
        # the 16 MB scoped-VMEM limit at the full-geometry level-0 shape
        # ([16, 4096, 128] -> compile-time "Ran out of memory in vmem",
        # hit by `cli generate --fp32` on chip). 2048 fits with margin and
        # measured within 3% of 4096 in the bf16 block sweep.
        block_k = min(block_k, 2048)
    block_q = block_q if n >= block_q else -(-n // 8) * 8
    block_k = block_k if m >= block_k else -(-m // 8) * 8
    n_pad = -(-n // block_q) * block_q
    m_pad = -(-m // block_k) * block_k
    if n_pad != n:
        q2 = jnp.pad(q2, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        k = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, 0)))
    m_real = m if m_pad != m else None
    nkv = m_pad // block_k
    grid = (bh, n_pad // block_q, nkv)
    one_pass = nkv == 1 and not with_lse and sum_col is not None
    if one_pass:
        kernel = functools.partial(_flash_kernel_one, sum_col=sum_col, m_real=m_real)
    elif with_lse:
        kernel = functools.partial(_flash_kernel, nkv=nkv, m_real=m_real)
    else:
        kernel = functools.partial(_flash_kernel_nolse, nkv=nkv, m_real=m_real)
    out_specs = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bh, n_pad, d), q2.dtype)
    if with_lse:
        out_specs = (
            out_specs,
            pl.BlockSpec((1, block_q, _LANE), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((bh, n_pad, _LANE), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[] if one_pass else [
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k, v)
    if n_pad != n:
        res = jax.tree.map(lambda x: x[:, :n, :], res)
    return res


def _flash_bwd_dkv_kernel(q2_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale: float):
    """Grad wrt K and V. Grid (bh, kv_block, q_block): the q-side operands
    stream through the innermost grid dim (small VMEM blocks); dk/dv
    accumulate fp32 in the resident output block across q iterations.
    ``q2`` is pre-scaled (scale*log2e); dk folds the un-scale back in."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0]  # [block_k, D]
    v = v_ref[0]
    q2 = q2_ref[0]  # [block_q, D] pre-scaled
    do = do_ref[0]
    lse2 = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    s2 = jnp.dot(q2, k.T, preferred_element_type=jnp.float32)  # [bq, bk] base-2 logits
    p = jnp.exp2(s2 - lse2)
    dv_ref[0] += jnp.dot(p.astype(do.dtype).T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # [bq, bk]
    ds = p * (dp - delta) * scale  # natural-domain dS * scale
    # dk = ds^T @ q_natural = ds^T @ q2 / (scale*log2e)
    dk_ref[0] += jnp.dot(ds.astype(q2.dtype).T, q2, preferred_element_type=jnp.float32) * (1.0 / (scale * _LOG2E))


def _flash_bwd_dq_kernel(q2_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, block_k: int, scale: float):
    """Grad wrt Q for one q block: loop over kv blocks, recompute P."""
    q2 = q2_ref[0]  # [block_q, D] pre-scaled
    do = do_ref[0]
    lse2 = lse_ref[0][:, 0:1]
    delta = delta_ref[0][:, 0:1]
    block_q, d = q2.shape
    n_kv = k_ref.shape[1]
    num_blocks = n_kv // block_k

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s2 = jnp.dot(q2, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp2(s2 - lse2)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_blocks, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_bh(q2, k, v, o, lse2, do, scale: float, interpret: bool,
                  block_q: int = _BLOCK_Q, block_k: int | None = None):
    """Streaming flash backward: never materializes the [N, M] matrix in HBM.
    delta = rowsum(dO * O) is a cheap XLA elementwise reduce."""
    if block_k is None:
        block_k = _BWD_BLOCK_K  # module-level so sweeps can override live
    bh, n, d = q2.shape
    m = k.shape[1]
    block_q = block_q if n >= block_q else -(-n // 8) * 8
    block_k = block_k if m >= block_k else -(-m // 8) * 8
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True), (bh, n, _LANE)
    )
    # ragged N/M: zero-pad to block multiples. Padded q rows have do=0 so
    # every dk/dv contraction through them vanishes; padded kv rows have
    # k=v=0 so dq picks up nothing from them (p there is garbage but only
    # ever multiplies zero rows); padded dq/dk/dv rows are sliced off below.
    n_pad = -(-n // block_q) * block_q
    m_pad = -(-m // block_k) * block_k
    if n_pad != n:
        rows = ((0, 0), (0, n_pad - n), (0, 0))
        q2, do, delta, lse2 = (jnp.pad(t, rows) for t in (q2, do, delta, lse2))
    if m_pad != m:
        rows = ((0, 0), (0, m_pad - m), (0, 0))
        k, v = (jnp.pad(t, rows) for t in (k, v))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, m_pad // block_k, n_pad // block_q),
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
            jax.ShapeDtypeStruct((bh, m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, m_pad, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k, v, do, lse2, delta)
    dk = dk.astype(q2.dtype)
    dv = dv.astype(q2.dtype)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, scale=scale),
        grid=(bh, n_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANE), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q2.dtype),
        interpret=interpret,
    )(q2, k, v, do, lse2, delta)
    if n_pad != n:
        dq = dq[:, :n, :]
    if m_pad != m:
        dk, dv = dk[:, :m, :], dv[:, :m, :]
    return dq, dk, dv


def supported(n: int, m: int, d: int) -> bool:
    # ragged N/M are padded to block multiples inside _flash_bh/_flash_bwd_bh
    # with in-kernel kv masking, so divisibility is no longer required —
    # e.g. the API-default 10.0 s clip (4000 level-0 tokens) now routes
    # through flash instead of silently falling back to XLA attention.
    return n >= _MIN_TOKENS and d <= _LANE


def _pad_reshape(q, k, v):
    """Pad head_dim to the lane width, fold the softmax scale (in base-2)
    into q, and flatten batch*heads."""
    b, h, n, d = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    pad = (-d) % _LANE
    if pad:
        padding = ((0, 0), (0, 0), (0, 0), (0, pad))
        q, k, v = (jnp.pad(t, padding) for t in (q, k, v))
        if _ONE_PASS:
            # ones column in v's zero padding: the AV matmul's output column
            # d becomes rowsum(p) — the softmax denominator for free (used
            # by the single-kv-block kernel). Harmless elsewhere: the column
            # is sliced off the output, padded q/do columns are zero so
            # every gradient contraction through it vanishes.
            v = v.at[..., d].set(1.0)
    dp = d + pad
    q2 = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    return (
        q2.reshape(b * h, n, dp),
        k.reshape(b * h, m, dp),
        v.reshape(b * h, m, dp),
        (b, h, n, m, d, dp),
    )


def _flash_fwd_impl(q, k, v, interpret=False, block_q=None, block_k=None):
    q2, kp, vp, (b, h, n, m, d, dp) = _pad_reshape(q, k, v)
    out = _flash_bh(
        q2, kp, vp, interpret or _FORCE_INTERPRET,
        block_q=block_q or _BLOCK_Q, block_k=block_k or _BLOCK_K, with_lse=False,
        sum_col=d if (dp > d and _ONE_PASS) else None,
    )
    return out.reshape(b, h, n, dp)[..., :d]


@jax.custom_vjp
def _flash(q, k, v):
    return _flash_fwd_impl(q, k, v)


def _flash_vjp_fwd(q, k, v):
    q2, kp, vp, meta = _pad_reshape(q, k, v)
    out_bh, lse2 = _flash_bh(q2, kp, vp, _FORCE_INTERPRET)
    b, h, n, m, d, dp = meta
    return out_bh.reshape(b, h, n, dp)[..., :d], (q2, kp, vp, out_bh, lse2, meta)


def _flash_vjp_bwd(res, g):
    # streaming Pallas backward (the LoRA trainer differentiates through
    # attention outputs, SURVEY.md §3.1) — recomputes P per block, never
    # writes the [N, M] matrix to HBM.
    q2, kp, vp, out_bh, lse2, (b, h, n, m, d, dp) = res
    scale = 1.0 / math.sqrt(d)
    pad = dp - d
    do = g
    if pad:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, 0), (0, pad)))
    do = do.reshape(b * h, n, dp).astype(q2.dtype)
    dq, dk, dv = _flash_bwd_bh(q2, kp, vp, out_bh, lse2, do, scale, _FORCE_INTERPRET)
    dq = dq.reshape(b, h, n, dp)[..., :d]
    dk = dk.reshape(b, h, m, dp)[..., :d]
    dv = dv.reshape(b, h, m, dp)[..., :d]
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)

# Nested jit with a stable function identity: the 10+ identical-shape call
# sites inside one UNet trace hit jax's lowering cache and become calls to
# ONE sub-computation in the HLO, instead of 10 freshly-lowered pallas_call
# instances — XLA then compiles the Mosaic kernel once (cold-compile lever;
# VERDICT round-2 #2 "dedupe pallas kernel instantiations"). Keyed by the
# live ``_BWD_BLOCK_K``: the backward reads it at TRACE time, so one global
# jit object would freeze the first-seen value and silently ignore sweep
# overrides (tools/bench_train_step.py --bwd-bk) for already-seen shapes.
_flash_jits: dict = {}


def _flash_jit_for_current_config():
    # keyed by every module-level knob the trace bakes in — a stale entry
    # would silently ignore live flag flips (see the _BWD_BLOCK_K note above)
    key = (_BWD_BLOCK_K, _ONE_PASS, _FORCE_INTERPRET)
    if key not in _flash_jits:
        _flash_jits[key] = jax.jit(_flash)
    return _flash_jits[key]


def _flash_sharded_jit(mesh, batch_axis: str | None, heads_axis: str | None):
    """shard_map-wrapped kernel over the mesh: batch dim 0 split over
    ``batch_axis`` (dp), heads dim 1 over ``heads_axis`` (tp) — either may
    be None; both at once is the combined 2-D (dp, tp) train step. Each
    device runs the unmodified single-chip kernel (fwd AND custom-vjp bwd)
    on its local shard — no collectives, no GSPMD replication fallback
    (see kernels/sharding.py). ``check_vma=False``: the custom_vjp
    primitive carries no varying-along-mesh annotations; every
    operand/output is shard-local by construction."""
    key = ("shard", mesh, batch_axis, heads_axis, _BWD_BLOCK_K, _ONE_PASS, _FORCE_INTERPRET)
    if key not in _flash_jits:
        from jax.sharding import PartitionSpec as P

        spec = P(batch_axis, heads_axis)
        fn = jax.shard_map(
            _flash, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
        _flash_jits[key] = jax.jit(fn)
    return _flash_jits[key]


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False,
    block_q: int | None = None, block_k: int | None = None,
) -> jnp.ndarray:
    """Drop-in for models.nn.sdpa on unmasked inputs: ``[B, H, N, D]``.
    Differentiable: streaming Pallas kernels forward and backward."""
    if interpret or block_q is not None or block_k is not None:
        return _flash_fwd_impl(q, k, v, interpret=interpret, block_q=block_q, block_k=block_k)
    from audioldm_tpu.kernels import sharding as _ksh

    dp = _ksh.shardable(q.shape[0])
    hd = _ksh.heads_shardable(q.shape[1])
    if dp is not None and hd is not None and dp[0] is not hd[0]:
        hd = None  # different meshes cannot combine; the batch split wins
    if dp is not None or hd is not None:
        mesh = (dp or hd)[0]
        return _flash_sharded_jit(
            mesh, dp[1] if dp else None, hd[1] if hd else None
        )(q, k, v)
    return _flash_jit_for_current_config()(q, k, v)
