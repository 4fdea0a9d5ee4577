"""Shared neural-net building blocks — functional core.

Every model in audioldm_tpu is a nested dict of arrays (a pytree) plus pure
``apply`` functions built from these blocks. Conventions, chosen for TPU:

- Activations are **NHWC** (channels-last) — the layout XLA:TPU prefers for
  convs; the HF checkpoints' NCHW/OIHW tensors are transposed once at load by
  the ckpt bridge.
- Linear weights are ``[in, out]`` (right-multiply); torch ``[out, in]``
  weights are transposed at load.
- Conv kernels are ``HWIO`` (2-D) / ``WIO`` (1-D).
- Matmuls carry ``preferred_element_type=float32`` so bf16 inputs accumulate
  in fp32 on the MXU; norms and softmax always run in fp32.

Reference behavior being matched (not the implementation): the torch modules
diffusers/transformers instantiate for the audioldm-s stack — see SURVEY.md
§2b and the call sites cited in each model file.
"""

from __future__ import annotations

import contextlib
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Trace-time switch for the fused [C,3C] self-attention qkv matmul. On a
# single device the fusion is a pure win (one MXU launch instead of three);
# under tensor-parallel sharding (parallel/tp.py) the concat along the
# sharded out-features axis would defeat GSPMD's column-parallel
# propagation, so the TP step traces with fusion off (three independently
# column-sharded projections).
_QKV_FUSION = True


def qkv_fusion_enabled() -> bool:
    return _QKV_FUSION


@contextlib.contextmanager
def qkv_fusion(enabled: bool):
    """Context manager: override the qkv-fusion flag during tracing."""
    global _QKV_FUSION
    prev = _QKV_FUSION
    _QKV_FUSION = enabled
    try:
        yield
    finally:
        _QKV_FUSION = prev


# Trace-time degree for the tensor-parallel GEGLU feed-forward split
# (parallel/tp.py). 1 = off (single-device contiguous [h | gate] halves).
# When > 1, ``apply_ff`` expects the geglu kernel/bias columns stored in the
# shard-interleaved layout ``[h_0 | gate_0 | h_1 | gate_1 | ...]`` produced by
# ``parallel.tp.shard_unet_params`` so each chip's column shard contains a
# matching (h, gate) pair and the activation split stays chip-local.
_FF_TP = 1


def ff_tp_degree() -> int:
    return _FF_TP


@contextlib.contextmanager
def ff_tp(n: int):
    """Context manager: set the FF tensor-parallel degree during tracing."""
    global _FF_TP
    prev = _FF_TP
    _FF_TP = max(1, int(n))
    try:
        yield
    finally:
        _FF_TP = prev

# ---------------------------------------------------------------------------
# Initializers (used for tests and LoRA init; real weights come from ckpt)
# ---------------------------------------------------------------------------


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    p = {"kernel": _fan_in_uniform(k1, (in_dim, out_dim), in_dim, dtype)}
    if bias:
        p["bias"] = _fan_in_uniform(k2, (out_dim,), in_dim, dtype)
    return p


def init_conv2d(key, in_ch: int, out_ch: int, kernel_size: int, bias: bool = True, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    p = {"kernel": _fan_in_uniform(k1, (kernel_size, kernel_size, in_ch, out_ch), fan_in, dtype)}
    if bias:
        p["bias"] = _fan_in_uniform(k2, (out_ch,), fan_in, dtype)
    return p


def init_conv1d(key, in_ch: int, out_ch: int, kernel_size: int, bias: bool = True, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kernel_size
    p = {"kernel": _fan_in_uniform(k1, (kernel_size, in_ch, out_ch), fan_in, dtype)}
    if bias:
        p["bias"] = _fan_in_uniform(k2, (out_ch,), fan_in, dtype)
    return p


def init_norm(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_embedding(key, num: int, dim: int, dtype=jnp.float32) -> dict:
    return {"embedding": jax.random.normal(key, (num, dim), dtype) * 0.02}


# ---------------------------------------------------------------------------
# Primitive applies
# ---------------------------------------------------------------------------


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.matmul(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(
    p: dict,
    x: jnp.ndarray,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """NHWC conv with torch-style symmetric integer padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # NB: no preferred_element_type — TPU convs accumulate fp32 on the MXU
        # regardless, and the flag breaks the conv VJP when a fp32 cotangent
        # meets bf16 kernels (convs require matching operand dtypes).
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv1d(
    p: dict,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """NWC conv1d with torch-style symmetric integer padding."""
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose1d(
    p: dict, x: jnp.ndarray, stride: int, padding: int, channel_major: bool = False
) -> jnp.ndarray:
    """NWC transposed conv matching ``torch.nn.ConvTranspose1d(stride,
    padding)``. Kernel stored ``WIO`` with I=in_ch, O=out_ch (torch's IOW is
    transposed at load). Implemented as lhs-dilated conv: insert (stride-1)
    zeros between inputs, flip the kernel, swap I/O, and crop
    ``kernel_size - 1 - padding`` from each side.

    ``channel_major=True`` runs the same conv on ``[B, C, T]`` activations
    ("NCW") — used by the vocoder's fused-MRF tail where the Pallas stage
    kernel keeps channels on sublanes (measured: NCW conv_transpose is also
    ~18% faster than NWC at the late-stage shapes, tools notes in PERF.md)."""
    k = p["kernel"].astype(x.dtype)  # [W, I, O]
    kw = k.shape[0]
    pad = kw - 1 - padding
    dims = "NCW" if channel_major else "NWC"
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(k, axis=0),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=(dims, "WIO", dims),
    )
    if "bias" in p:
        b = p["bias"].astype(x.dtype)
        y = y + (b[:, None] if channel_major else b)
    return y


def group_norm(p: dict, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last activations ``[..., C]`` in fp32.

    TPU note: reshaping the lane (channel) dim into (G, C/G) on the full
    tensor forces vector relayouts, which dominated the UNet's norm cost
    (measured 1.7 ms/eps-step). Instead: reduce per-channel sums first (lane
    layout untouched), compute group stats on the tiny [B, G, C/G] tensor,
    and broadcast back per channel — two reductions + elementwise only."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shape = xf.shape
    c = shape[-1]
    g = num_groups
    red_axes = tuple(range(1, xf.ndim - 1))
    n_spatial = 1
    for s in shape[1:-1]:
        n_spatial *= s
    n = n_spatial * (c // g)
    bshape = (shape[0],) + (1,) * len(red_axes) + (c,)
    # two-pass (numerically robust vs the E[x^2]-mean^2 cancellation)
    s1 = jnp.sum(xf, axis=red_axes)  # [B, C]
    mean = jnp.sum(s1.reshape(shape[0], g, c // g), axis=-1) / n  # [B, G]
    mean_c = jnp.repeat(mean, c // g, axis=-1).reshape(bshape)
    xc = xf - mean_c
    s2 = jnp.sum(xc * xc, axis=red_axes)  # [B, C]
    var = jnp.sum(s2.reshape(shape[0], g, c // g), axis=-1) / n  # [B, G]
    rstd_c = jnp.repeat(jax.lax.rsqrt(var + eps), c // g, axis=-1).reshape(bshape)
    xf = xc * rstd_c
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch's default, used by RoBERTa and diffusers GEGLU."""
    return jax.nn.gelu(x, approximate=False)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


ACT = {"silu": silu, "swish": silu, "gelu": gelu, "relu": jax.nn.relu, "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)), "tanh": jnp.tanh}


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def init_attention(key, query_dim: int, heads: int, context_dim: Optional[int] = None, dtype=jnp.float32) -> dict:
    context_dim = context_dim or query_dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": init_linear(ks[0], query_dim, query_dim, bias=False, dtype=dtype),
        "to_k": init_linear(ks[1], context_dim, query_dim, bias=False, dtype=dtype),
        "to_v": init_linear(ks[2], context_dim, query_dim, bias=False, dtype=dtype),
        "to_out": init_linear(ks[3], query_dim, query_dim, bias=True, dtype=dtype),
    }


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scaled dot-product attention over ``[B, H, N, D]``; softmax in fp32.

    Unmasked calls route through the Pallas flash-attention kernel when
    enabled (audioldm_tpu.kernels.use_flash_attention) — streaming softmax,
    no HBM logits; otherwise XLA's fused attention."""
    if mask is None:
        from audioldm_tpu.kernels import flash_attention, flash_enabled, flash_supported
        from audioldm_tpu.kernels.sharding import flash_route_ok

        if (
            flash_enabled()
            and flash_supported(q.shape[2], k.shape[2], q.shape[3])
            and flash_route_ok(q.shape[1])
        ):
            return flash_attention(q, k, v)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", weights, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, n, c = x.shape
    return x.reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def attention(
    p: dict,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    heads: int = 8,
    mask: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """Multi-head attention over token sequences ``[B, N, C]``.

    ``lora``: optional dict of per-projection low-rank adapters
    ``{"to_q": {"a": [C,r], "b": [r,C]}, ...}`` applied unmerged as
    ``W x + scale * (x A) B`` — the training-time LoRA path (reference:
    peft LoraLayer behavior pinned at train_audioldm_lora.py:378-385).
    A projection entry may instead carry a densified ``{"ab": [..., C, C]}``
    delta (serve path: per-request ΔW=AB precomputed once outside the
    sampling scan — one aligned matmul per projection instead of two
    rank-r slivers).
    """
    context = x if context is None else context

    def lora_delta(name: str, inp: jnp.ndarray) -> jnp.ndarray:
        entry = lora[name]
        if "ab" in entry:
            return lora_scale * jnp.matmul(inp, entry["ab"].astype(inp.dtype))
        a = entry["a"].astype(inp.dtype)
        b = entry["b"].astype(inp.dtype)
        return lora_scale * jnp.matmul(jnp.matmul(inp, a), b)

    def proj(name: str, inp: jnp.ndarray) -> jnp.ndarray:
        y = linear(p[name], inp)
        if lora is not None and name in lora:
            y = y + lora_delta(name, inp)
        return y

    if context is x and _QKV_FUSION:
        # self-attention: q/k/v share the input, so the three bias-free
        # projections fuse into ONE [C, 3C] matmul (better MXU occupancy than
        # 3 small launches); LoRA deltas still apply per projection
        c = x.shape[-1]
        w = jnp.concatenate(
            [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]], axis=-1
        ).astype(x.dtype)
        qkv = jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
        qf, kf, vf = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        if lora is not None:
            if "to_q" in lora:
                qf = qf + lora_delta("to_q", x)
            if "to_k" in lora:
                kf = kf + lora_delta("to_k", x)
            if "to_v" in lora:
                vf = vf + lora_delta("to_v", x)
        q, k, v = (_split_heads(t, heads) for t in (qf, kf, vf))
    else:
        q = _split_heads(proj("to_q", x), heads)
        k = _split_heads(proj("to_k", context), heads)
        v = _split_heads(proj("to_v", context), heads)
    out = _merge_heads(sdpa(q, k, v, mask))
    y = linear(p["to_out"], out)
    if lora is not None and "to_out" in lora:
        y = y + lora_delta("to_out", out)
    return y


# ---------------------------------------------------------------------------
# Timestep embedding
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding matching diffusers ``Timesteps`` as
    configured for UNet2DConditionModel (flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
