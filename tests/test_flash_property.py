"""Randomized-shape property test for the flash-attention kernel.

The hand-picked shapes in tests/test_flash_attention.py cover the known
edge cases; this sweep draws random (b, h, n, m, d) combinations — ragged
lengths, n != m, every supported head width — and checks the padded+masked
kernel against the XLA sdpa reference, forward and backward (interpret
mode on CPU). Deterministically seeded so failures reproduce.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.kernels.flash_attention import (
    _flash_bh,
    _flash_bwd_bh,
    _pad_reshape,
    flash_attention,
)
from audioldm_tpu.models.nn import sdpa


def _draw_shapes(seed: int, count: int, bwd: bool):
    """Random (b, h, n, m, d): ragged + aligned lengths, all head widths the
    UNet/VAE levels use (16/24/32/48/64/80), n != m cross-length cases."""
    r = np.random.default_rng(seed)
    shapes = []
    for _ in range(count):
        b = int(r.integers(1, 3))
        h = int(r.integers(1, 4))
        lo, hi = (160, 640) if bwd else (160, 1200)
        n = int(r.integers(lo, hi))
        # half the draws keep m == n (self-attention, the production path);
        # the rest exercise independent kv length padding
        m = n if r.random() < 0.5 else int(r.integers(lo, hi))
        d = int(r.choice([16, 24, 32, 48, 64, 80]))
        shapes.append((b, h, n, m, d))
    return shapes


@pytest.mark.parametrize("shape", _draw_shapes(seed=20260818, count=8, bwd=False))
def test_flash_forward_random_shapes(shape, rng):
    b, h, n, m, d = shape
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("shape", _draw_shapes(seed=20260819, count=3, bwd=True))
def test_flash_backward_random_shapes(shape, rng):
    b, h, n, m, d = shape
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, m, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))

    out_ref, vjp = jax.vjp(sdpa, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)

    scale = 1.0 / math.sqrt(d)
    qp, kp, vp, (_, _, _, _, _, dp) = _pad_reshape(q, k, v)
    out_bh, lse = _flash_bh(qp, kp, vp, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_bh.reshape(b, h, n, dp)[..., :d]), np.asarray(out_ref), atol=2e-5
    )
    do = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, n, dp)
    dq, dk, dv = _flash_bwd_bh(qp, kp, vp, out_bh, lse, do, scale, True)
    np.testing.assert_allclose(np.asarray(dq.reshape(b, h, n, dp)[..., :d]), np.asarray(dq_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dk.reshape(b, h, m, dp)[..., :d]), np.asarray(dk_ref), atol=5e-5)
    np.testing.assert_allclose(np.asarray(dv.reshape(b, h, m, dp)[..., :d]), np.asarray(dv_ref), atol=5e-5)
