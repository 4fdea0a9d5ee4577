"""Device mesh + sharding rules.

The reference's only parallelism strategy is data parallelism via
accelerate/DDP over NCCL (SURVEY.md §2d; gradient allreduce exercised at
train_audioldm_lora.py:551,557). The TPU-native equivalent: a 1-D ``dp``
mesh over ICI; the batch is sharded on ``dp``, params (frozen bases + LoRA
adapters) are replicated, and XLA emits the psum for the adapter-gradient
allreduce from the sharded-jit training step — there is no hand-written
transport layer.

A second, optional ``lora`` axis is reserved for the multi-LoRA serving bank
(adapter-bank rows sharded across devices; see audioldm_tpu.serve).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "dp", batch_axis: int = 0):
    """Place a host batch pytree onto the mesh, sharded along ``batch_axis``
    (rank-0 leaves — e.g. a batch's scalar metadata — are replicated).

    ``batch_axis=1`` is the gradient-accumulation layout ``[accum, micro,
    ...]``: the accumulation axis stays replicated (every device scans all
    accum steps) and the micro-batch axis is sharded."""
    spec = P(*([None] * batch_axis), axis_name)
    sh = NamedSharding(mesh, spec)
    repl = replicated(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh if np.ndim(x) > batch_axis else repl), batch
    )
