"""Tensor-parallel (Megatron-style) UNet epsilon step — latency scaling.

The reference's only parallelism is data parallelism (SURVEY.md §2d): it
scales *throughput*, never the latency of one clip. On a TPU slice the ICI
fabric makes intra-layer model parallelism cheap, so this module adds a
``tp`` mesh axis that shards the UNet's attention blocks across chips —
the part of the epsilon step that carries ~60% of its time (PERF.md step
anatomy) — cutting single-request latency instead of adding requests.

Design (classic column/row split, expressed purely as GSPMD shardings —
no hand-written collectives, XLA inserts the psum on ICI):

- ``to_q``/``to_k``/``to_v`` kernels ``[C, C]``: columns sharded
  ``P(None, 'tp')``. The per-head reshape ``[B,N,C] -> [B,N,H,C/H]``
  splits the sharded axis into (heads, head_dim); when ``heads % tp == 0``
  GSPMD propagates the shard onto the *heads* axis, so each chip runs
  plain local attention over its own head group — no communication inside
  softmax.
- ``to_out`` kernel ``[C, C]``: rows sharded ``P('tp', None)`` — the
  contraction over the sharded axis becomes ONE all-reduce per attention
  block, the only collective in the block.
- Everything else (convs, norms, time/class embeddings, the GEGLU FF) is
  replicated. The FF is deliberately NOT column/row-split: ``apply_ff``
  splits the geglu output into contiguous ``[h | gate]`` halves, and
  column-sharding the ``[C, 8C]`` kernel would put each half on a
  disjoint device group — GSPMD would stay correct but insert an
  all-to-all per FF. The right fix is a half-interleaved kernel layout;
  until then replicated FF keeps the TP program collective-minimal.

The step traces with the fused-qkv path disabled (``nn.qkv_fusion(False)``)
— the ``[C,3C]`` concat along the sharded axis would otherwise defeat
column propagation — and with flash attention off: the Pallas kernel has
no GSPMD partitioning rule, while XLA's attention einsums shard cleanly
over the heads batch axis. Per-device attention is ``heads/tp`` heads, so
the padded-MXU floor argument (PERF.md) is unchanged per chip.

Correctness does not depend on divisibility: GSPMD falls back to
resharding when ``heads % tp != 0`` — only the collective count suffers.
Validated in tests/test_tp.py on a virtual CPU mesh (output equality vs
the single-device step, all-reduce present in the compiled HLO) and in
``__graft_entry__.dryrun_multichip`` phase 6.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm_tpu.config import UNetConfig


def make_tp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("tp",))


def _path_keys(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
    return out


def unet_tp_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a UNet param tree: attention
    column/row-split on ``tp``, everything else replicated."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if len(keys) >= 3 and keys[-3] in ("attn1", "attn2"):
            proj, leafname = keys[-2], keys[-1]
            if proj in ("to_q", "to_k", "to_v") and leafname == "kernel":
                return P(None, "tp")
            if proj == "to_out" and leafname == "kernel":
                return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_unet_params(mesh: Mesh, params: dict) -> dict:
    """Place a UNet param tree onto the ``tp`` mesh per unet_tp_specs."""
    specs = unet_tp_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def make_tp_unet_step(cfg: UNetConfig, mesh: Mesh):
    """Jitted TP epsilon step ``(params, latents, t, class_labels) -> eps``.

    ``params`` must be placed with :func:`shard_unet_params`; activations
    are replicated across ``tp`` (latency mode: every chip holds the whole
    batch, attention heads are what's sharded). Output is replicated.
    """
    from audioldm_tpu.models import nn
    from audioldm_tpu.models.unet import apply_unet

    repl = NamedSharding(mesh, P())

    def eps(params, latents, t, class_labels):
        return apply_unet(params, cfg, latents, t, class_labels=class_labels)

    step = jax.jit(eps, out_shardings=repl)

    def call(params, latents, t, class_labels):
        # flags are read at trace time; first call traces inside this
        # context, later calls hit the jit cache
        from audioldm_tpu.kernels import flash_enabled, use_flash_attention

        # activations replicated onto the SAME mesh as the params —
        # mixing a mesh-sharded tree with single-device arrays is an error
        latents, t, class_labels = (
            jax.device_put(x, repl) for x in (latents, t, class_labels)
        )
        prev_flash = flash_enabled()
        use_flash_attention(False)
        try:
            with nn.qkv_fusion(False):
                return step(params, latents, t, class_labels)
        finally:
            use_flash_attention(prev_flash)

    call.jitted = step
    return call
