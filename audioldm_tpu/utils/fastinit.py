"""Fast random-weight initialization for benchmarks and perf tools.

The real per-model ``init_*`` functions draw every leaf with its own
checkpoint-faithful initializer (4096-way key split, one ``normal`` per
leaf).  jit-compiling that graph for the 4-model bench init produced a
36 MB executable that took 320 s to compile cold on the remote v5e worker
(and ~100 s even on a persistent-cache *hit*: on the HTTP tunnel a hit
still ships the serialized executable at ~1 MB/s, measured 2026-08-18).

For benchmarks the weight *distribution* is irrelevant — only shapes,
dtypes, and the resulting FLOP/byte profile matter.  So instead: ONE fused
normal draw per model plus static slices/reshapes.  The program is ~2
trivial ops per leaf, compiles in seconds, and its executable is small.

Not for training/inference correctness paths — use the real ``init_*``
(checkpoint-compatible scaling) there.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["random_params_like", "shapes_of"]


def shapes_of(init_fn, cfg):
    """Abstract-eval a real ``init_*(key, cfg)`` into a ShapeDtypeStruct tree
    (no compile, no device work)."""
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(lambda k: init_fn(k, cfg), key)


_IDENTITY_STATS = {"mean": 0.0, "scale": 1.0, "var": 1.0}


def random_params_like(key, shapes, dtype=None, scale=0.02):
    """Pytree of N(0, scale) arrays matching ``shapes`` (a pytree of
    ShapeDtypeStruct), drawn as one fused normal + static slices.

    Leaves named like normalization STATISTICS (``mean``/``scale``/``var``)
    keep their identity values (0/1/1) instead of noise: e.g. the vocoder
    divides its input by ``params["scale"]`` — an N(0, 0.02) divisor would
    blow activations up ~50x and make the benched numerics unrepresentative.

    ``dtype`` overrides every leaf dtype (e.g. jnp.bfloat16 for the bench's
    bf16 towers); None keeps the dtypes recorded in ``shapes``.
    """
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = [l for _, l in path_leaves]
    names = [str(getattr(p[-1], "key", p[-1])) if p else "" for p, _ in path_leaves]
    sizes = [int(np.prod(l.shape)) for l in leaves]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    draw = jax.random.normal(key, (int(offs[-1]),), jnp.bfloat16) * scale
    outs = []
    for l, name, n, o in zip(leaves, names, sizes, offs[:-1]):
        out_dtype = dtype if dtype is not None else l.dtype
        if name in _IDENTITY_STATS:
            outs.append(jnp.full(l.shape, _IDENTITY_STATS[name], out_dtype))
        else:
            outs.append(
                jax.lax.slice(draw, (int(o),), (int(o) + n,))
                .reshape(l.shape)
                .astype(out_dtype)
            )
    return jax.tree.unflatten(treedef, outs)
