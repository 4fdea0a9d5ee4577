"""Pallas TPU kernel: one fused HiFi-GAN multi-receptive-field (MRF) stage.

Hot-op target: the vocoder's late upsample stages (SURVEY.md §2b
SpeechT5HifiGan; models/vocoder.py). A stage at 16 kHz output resolution
runs **18 narrow conv1ds** (3 resblocks × 3 dilation units × 2 convs) over
[T≈164k, C=32/64] activations. XLA executes each conv as its own
HBM-roundtripping op at ~1 ms (tools/bench_conv1d_smallc.py: the cost is
fusion/layout overhead, not FLOPs — the whole stage is ≲0.1 ms of HBM
traffic and a few hundred MXU passes).

This kernel computes the WHOLE stage in VMEM per time-block:

    out = mean_j resblock_j(x),  resblock: for d in dilations:
          x = x + conv_k1(leaky(conv_kd(leaky(x))))     (vocoder.py:59-67)

Design notes (all forced by Mosaic's layout rules):
- **channel-major [C, T] layout**: C ∈ {32, 64} rides the sublane dim (a
  multiple of the 8-row fp32 tile — no padding), T rides the 128-lane dim.
  The time-major [T, C] layout cannot even be DMA'd (minor dim must be
  128-aligned) and would waste 3/4 of every vector register.
- grid (B, ceil(T/block_t)); the input window is DMA'd once per block with a
  halo that absorbs the receptive field of the full 6-conv chain (≤60
  samples for k=11, dilations (1,3,5); halo=128 keeps lane alignment), and
  only the exact center is written back: HBM traffic is 2 tensors per stage
  instead of ~38.
- each conv is a tap loop: ``acc += W_tap^T @ roll(v, -offset)``. Shifts are
  CIRCULAR (``pltpu.roll``) because Mosaic cannot concat/slice at unaligned
  lane offsets; the wrap-around garbage stays within (k-1)·dil/2 of the
  region edges — strictly inside the discarded halo.
- signal-edge semantics: intermediates are masked to zero outside the true
  [0, T) range after every conv, reproducing XLA's zero-padded conv chain
  exactly (a conv at position 0 must see ZERO left-neighbors of the
  *previous* conv's output, not values computed from the zero-padded x).

Parity is asserted against the pure-jnp stage in interpret mode
(tests/test_mrf_conv.py), including ragged-T and signal-edge blocks; the
routed/unrouted vocoder outputs match to fp32 tolerance. Routing:
``use_fused_mrf(True)`` + per-stage ``supported()`` (fp32, C ≤ 64) in
models/vocoder.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = False
_BLOCK_T_CANDIDATES = (2048, 1024, 512, 256)
_HALO = 128  # ≥ max receptive field (60 for k=11 @ (1,3,5)); lane-aligned
_MAX_CHANNELS = 64  # C=128+ stages keep the MXU lanes busy under XLA already


def use_fused_mrf(enabled: bool = True):
    """Globally route models.vocoder MRF stages through the Pallas kernel."""
    global _ENABLED
    _ENABLED = enabled


def enabled() -> bool:
    return _ENABLED


def _receptive_halo(kernel_sizes, dilations) -> int:
    h = 0
    for k, dils in zip(kernel_sizes, dilations):
        span = sum((k - 1) * d // 2 + (k - 1) // 2 for d in dils)
        h = max(h, span)
    return h


def pick_block_t(t: int, c: int = 32) -> int | None:
    """Largest candidate not exceeding T, capped so the fully-unrolled
    18-conv body stays inside the 16 MB VMEM scope (measured: [C=64,
    L=4352] blocks hit 25.7 MB scoped — Mosaic keeps many tap temporaries
    live). Ragged tails are handled by padding T up to a block multiple and
    slicing the output (the real vocoder stages are 5121/20484/.../163872
    long — conv_transpose adds kernel-stride extra samples, so divisibility
    can never be assumed)."""
    cap = 2048 if c <= 64 else 1024
    for b in _BLOCK_T_CANDIDATES:
        if t >= b and b <= cap:
            return b
    return None


def supported(t: int, c: int, dtype) -> bool:
    return (
        dtype == jnp.float32 and c <= _MAX_CHANNELS and pick_block_t(t, c) is not None
    )


def _leaky(x, slope):
    return jnp.where(x >= 0, x, x * slope)


def _conv_cmajor(v, w, b, k: int, dil: int, interpret: bool):
    """Dilated conv1d on channel-major ``v`` [C, L] -> [C_out, L].

    ``w``: [k, C_out, C_in] (tap-major, already transposed); ``b``: [C, 1].
    Tap i reads ``v[:, t + i*dil - pad]`` — realized as a circular lane roll
    (see module docstring for why circular is safe here).
    """
    l = v.shape[1]
    pad = (k - 1) * dil // 2
    roll = jnp.roll if interpret else pltpu.roll

    acc = None
    for i in range(k):
        s = i * dil - pad
        vi = v if s == 0 else roll(v, (l - s) % l, 1)
        y = jnp.dot(w[i], vi, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return acc + b


def _mrf_kernel(
    x_hbm, *refs, kernel_sizes, dilations, slope, block_t, t_total, interpret, post_k
):
    """One (b, t-block) grid step: DMA the haloed [C, L] window, run the
    resblock chains in VMEM, write the center block of the averaged output.

    ``post_k > 0`` fuses the vocoder's output head into the epilogue:
    leaky(0.01) → k-tap conv to ONE channel → tanh, writing the waveform
    block [1, block_t] directly (saves the 1.7 ms XLA conv_post AND the
    last stage's 2×21 MB HBM round-trip)."""
    nj = len(kernel_sizes)
    npost = 2 if post_k else 0
    w_refs = refs[: 4 * nj]
    post_refs = refs[4 * nj : 4 * nj + npost]
    o_ref, xloc, sem = refs[4 * nj + npost], refs[4 * nj + npost + 1], refs[4 * nj + npost + 2]
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    nb, nt = pl.num_programs(0), pl.num_programs(1)
    l = block_t + 2 * _HALO

    # double-buffered input DMA: next block's window streams in while this
    # block computes (xloc [2, C, L]; grid steps run sequentially per core)
    def dma(slot, bi, ti):
        return pltpu.make_async_copy(
            x_hbm.at[bi, :, pl.ds(ti * block_t, l)], xloc.at[slot], sem.at[slot]
        )

    step = b_idx * nt + t_idx

    @pl.when(step == 0)
    def _first():
        dma(0, b_idx, t_idx).start()

    nxt = step + 1

    @pl.when(nxt < nb * nt)
    def _prefetch():
        dma(nxt % 2, nxt // nt, nxt % nt).start()

    dma(step % 2, b_idx, t_idx).wait()
    x = xloc[step % 2]
    # true-signal mask: the x array is pre-padded with `halo` zeros, so
    # global position = t_idx*block_t - halo + lane
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, l), 1) + (t_idx * block_t - _HALO)
    mask = jnp.logical_and(pos >= 0, pos < t_total)

    acc = None
    for j, (k, dils) in enumerate(zip(kernel_sizes, dilations)):
        w1, b1, w2, b2 = w_refs[4 * j : 4 * j + 4]
        v = x
        for d, dil in enumerate(dils):
            h = _conv_cmajor(_leaky(v, slope), w1[d], b1[d], k, dil, interpret)
            h = jnp.where(mask, h, 0.0)
            h = _conv_cmajor(_leaky(h, slope), w2[d], b2[d], k, 1, interpret)
            v = v + jnp.where(mask, h, 0.0)
        acc = v if acc is None else acc + v

    out = acc * (1.0 / nj)
    if post_k:
        wp, bp = post_refs  # [k_post, C, 1], [1, 1]
        v = _leaky(out, 0.01)  # torch leaky_relu default slope on the head
        roll = jnp.roll if interpret else pltpu.roll
        pad = (post_k - 1) // 2
        accp = None
        for i in range(post_k):
            s = i - pad
            vi = v if s == 0 else roll(v, (l - s) % l, 1)
            term = vi * wp[i]  # [C, L]
            accp = term if accp is None else accp + term
        # Σ_taps Σ_c = Σ_c Σ_taps: ONE cross-sublane reduce instead of k
        wav = jnp.sum(accp, axis=0, keepdims=True)  # [1, L]
        out = jnp.tanh(wav + bp[:])  # [1,1] broadcasts over lanes

    o_ref[0] = out[:, _HALO : _HALO + block_t]


def _pack(block: dict, k: int, c: int):
    """vocoder resblock params (WIO kernels) -> channel-major layout:
    w1/w2 [D, k, C_out, C_in] (tap-major, pre-transposed for the in-kernel
    ``W_tap @ v`` dot), b1/b2 [D, C, 1]."""
    nd = len(block["convs1"])
    bias = lambda p: p.get("bias", jnp.zeros((c,), jnp.float32)).reshape(c, 1)
    wt = lambda p: jnp.transpose(p["kernel"], (0, 2, 1))  # [k, out, in]
    w1 = jnp.stack([wt(block["convs1"][str(d)]) for d in range(nd)])
    w2 = jnp.stack([wt(block["convs2"][str(d)]) for d in range(nd)])
    b1 = jnp.stack([bias(block["convs1"][str(d)]) for d in range(nd)])
    b2 = jnp.stack([bias(block["convs2"][str(d)]) for d in range(nd)])
    f32 = lambda a: a.astype(jnp.float32)
    return f32(w1), f32(b1), f32(w2), f32(b2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_sizes", "dilations", "slope", "block_t", "interpret", "channel_major"
    ),
)
def _fused_mrf_stage_impl(
    x: jnp.ndarray,
    blocks,
    post=None,
    *,
    kernel_sizes=(3, 7, 11),
    dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    slope: float = 0.1,
    block_t: int | None = None,
    interpret: bool = False,
    channel_major: bool = False,
) -> jnp.ndarray:
    if channel_major:
        bsz, c, t = x.shape
    else:
        bsz, t, c = x.shape
    if block_t is None:
        block_t = pick_block_t(t, c)
    post_halo = (int(post["kernel"].shape[0]) - 1) // 2 if post is not None else 0
    assert _receptive_halo(kernel_sizes, dilations) + post_halo <= _HALO, "halo too small"
    l = block_t + 2 * _HALO
    padded_t = -(-t // block_t) * block_t  # ragged tail -> pad + slice below

    # channel-major with lane-aligned halo/tail padding
    x_cm = x if channel_major else jnp.transpose(x, (0, 2, 1))
    xp = jnp.pad(
        x_cm.astype(jnp.float32),
        ((0, 0), (0, 0), (_HALO, _HALO + padded_t - t)),
    )
    packed = []
    for blk, k in zip(blocks, kernel_sizes):
        packed.extend(_pack(blk, k, c))
    post_k = 0
    if post is not None:
        post_k = int(post["kernel"].shape[0])
        wp = post["kernel"].astype(jnp.float32)  # [k_post, C, 1]
        bp = post.get("bias", jnp.zeros((1,), jnp.float32)).astype(jnp.float32)
        packed.extend([wp, bp.reshape(1, 1)])

    c_out = 1 if post_k else c
    kern = functools.partial(
        _mrf_kernel,
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        slope=slope,
        block_t=block_t,
        t_total=t,
        interpret=interpret,
        post_k=post_k,
    )
    y = pl.pallas_call(
        kern,
        grid=(bsz, padded_t // block_t),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in packed],
        out_specs=pl.BlockSpec(
            (1, c_out, block_t), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, c_out, padded_t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, l), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, *packed)
    y = y[:, :, :t] if padded_t != t else y
    return y if channel_major else jnp.transpose(y, (0, 2, 1))


_dp_fns: dict = {}


def fused_mrf_stage(
    x: jnp.ndarray,
    blocks,
    post=None,
    *,
    kernel_sizes=(3, 7, 11),
    dilations=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    slope: float = 0.1,
    block_t: int | None = None,
    interpret: bool = False,
    channel_major: bool = False,
) -> jnp.ndarray:
    """``x``: [B, T, C] fp32 (or [B, C, T] with ``channel_major=True`` —
    skips the entry/exit transposes, ~0.9 ms each at the last-stage shape);
    ``blocks``: list (len = len(kernel_sizes)) of vocoder resblock param
    dicts. Returns ``mean_j resblock_j(x)`` in the same layout — exactly
    ``models.vocoder._apply_resblock`` averaged, as one Pallas program.

    ``post``: optional conv_post param dict ({"kernel": [k, C, 1], "bias"?})
    — fuses ``tanh(conv_post(leaky_0.01(·)))`` into the epilogue and returns
    the waveform with output-channel dim 1 instead of the stage tensor.

    Under an active ``kernels.sharding.kernel_dp_shard`` context whose data
    axis divides the batch, the kernel runs inside ``shard_map`` — each
    device computes its local batch shard (the pallas custom-call has no
    GSPMD partitioning rule; unwrapped, a dp-mesh jit would replicate it)."""
    from audioldm_tpu.kernels import sharding as _ksh

    statics = dict(
        kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations),
        slope=slope, block_t=block_t, interpret=interpret,
        channel_major=channel_major,
    )
    dp = _ksh.shardable(x.shape[0])
    if dp is None:
        return _fused_mrf_stage_impl(x, blocks, post, **statics)
    mesh, axis = dp
    key = (mesh, axis) + tuple(statics.values())
    if key not in _dp_fns:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            functools.partial(_fused_mrf_stage_impl, **statics),
            mesh=mesh,
            in_specs=(P(axis), P(), P()),  # batch sharded; params replicated
            out_specs=P(axis),
            check_vma=False,
        )
        _dp_fns[key] = jax.jit(fn)
    return _dp_fns[key](x, blocks, post)
