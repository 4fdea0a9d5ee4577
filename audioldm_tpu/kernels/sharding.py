"""Batch-axis GSPMD bridging for the Pallas kernels.

Pallas calls lower to opaque custom-calls with NO partitioning rules:
inside a dp-mesh jit, GSPMD's only legal choice is to fully replicate the
operation — all-gather the batch onto every chip, run the whole kernel
everywhere, keep 1/n of the result. Correct, but it puts an all-gather and
n× redundant FLOPs on the hot path (the round-3 multi-chip caveat in
NOTES.md; reference DP semantics: SURVEY.md §2d — DDP shards the batch,
never the sequence).

Both production kernels (flash attention `[B,H,N,D]`, fused MRF vocoder
stage `[B,C,T]`) are embarrassingly batch-parallel, so the fix is
mechanical: wrap the kernel call in ``jax.shard_map`` over the mesh's data
axis — each device runs the unmodified single-chip kernel on its local
batch shard, with zero collectives.

Usage: ``kernel_dp_shard(mesh, axis)`` is entered by the mesh-aware
callers (train/trainer.py, serve/engine.py) around their sharded-jit
calls. The flag is read at TRACE time by
``flash_attention.flash_attention`` and ``mrf_conv.fused_mrf_stage`` —
the first call traces inside the context, later calls hit the jit cache.
A batch that does not divide the axis falls back to the replicated GSPMD
path (correct either way).
"""

from __future__ import annotations

from contextlib import contextmanager

_DP = None  # (mesh, axis_name) | None


@contextmanager
def kernel_dp_shard(mesh, axis: str = "dp"):
    """Route Pallas kernel calls traced inside this context through
    ``shard_map`` over ``mesh[axis]`` (batch dim 0). ``mesh=None`` is a
    no-op, so callers can wrap unconditionally."""
    global _DP
    prev = _DP
    _DP = None if mesh is None else (mesh, axis)
    try:
        yield
    finally:
        _DP = prev


def current():
    return _DP


def shardable(batch: int):
    """Return ``(mesh, axis)`` when an active context can split ``batch``
    evenly over >1 devices, else None (caller keeps the unwrapped path)."""
    if _DP is None:
        return None
    mesh, axis = _DP
    size = mesh.shape[axis]
    if size > 1 and batch % size == 0:
        return mesh, axis
    return None


# -- tensor-parallel (heads-axis) context -----------------------------------
#
# Under the TP UNet step (parallel/tp.py) the qkv column split puts the
# HEADS axis of [B, H, N, D] on the mesh, not the batch. The flash kernel
# is head-parallel too, so the same shard_map trick applies on dim 1 —
# each chip attends over its local head group, which is exactly the
# activation layout GSPMD's column propagation already produced (the
# reshard into shard_map is a no-op on real TP shardings).

_HEADS = None  # (mesh, axis_name) | None


@contextmanager
def kernel_heads_shard(mesh, axis: str = "tp"):
    """Route flash-attention calls traced inside this context through
    ``shard_map`` over ``mesh[axis]`` on the HEADS dim. ``mesh=None`` or a
    1-sized axis is a no-op."""
    global _HEADS
    prev = _HEADS
    _HEADS = None if mesh is None else (mesh, axis)
    try:
        yield
    finally:
        _HEADS = prev


def heads_ctx():
    return _HEADS


def heads_shardable(heads: int):
    """(mesh, axis) when the active TP context can split ``heads`` evenly
    over >1 devices, else None."""
    if _HEADS is None:
        return None
    mesh, axis = _HEADS
    size = mesh.shape[axis]
    if size > 1 and heads % size == 0:
        return mesh, axis
    return None


def flash_route_ok(heads: int) -> bool:
    """Whether sdpa may route to the Pallas kernel given the active shard
    contexts. Under a TP heads context with a non-divisible head count the
    kernel must NOT run: unwrapped pallas inside the tp-mesh jit would be
    GSPMD-replicated per call — strictly worse than XLA's einsum attention,
    which reshards cleanly over heads. (The dp context keeps pallas for
    non-divisible batches — the trainer/serve paths size batches as
    bs×ndev, so that fallback stays off the mesh-critical path.)"""
    if _HEADS is None:
        return True
    mesh, axis = _HEADS
    size = mesh.shape[axis]
    return size == 1 or heads % size == 0
