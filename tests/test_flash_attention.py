"""Pallas flash-attention correctness vs the XLA sdpa reference (interpret
mode on CPU; hardware perf is measured by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.kernels.flash_attention import flash_attention, supported
from audioldm_tpu.models.nn import sdpa


@pytest.mark.parametrize(
    "shape",
    [
        (2, 2, 256, 16),
        (1, 4, 512, 64),
        (1, 2, 256, 80),
        # ragged N/M: padded to block multiples with in-kernel kv masking
        # (the API-default 10.0 s clip is the real 4000-token case)
        (1, 2, 250, 16),
        (1, 2, 300, 24),
    ],
)
def test_flash_matches_sdpa(shape, rng):
    b, h, n, d = shape
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
    ref = sdpa(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_one_pass_bf16_denominator(rng, monkeypatch):
    # single-kv-block one-pass variant (default OFF — measured negative on
    # v5e, flash_attention.py _ONE_PASS note): the softmax denominator rides
    # the bf16 AV matmul (ones column in v's padding) — must stay within
    # bf16 tolerance of the fp32-reference softmax
    import importlib

    # the module (the bare attribute is shadowed by the re-exported function)
    fa_mod = importlib.import_module("audioldm_tpu.kernels.flash_attention")
    monkeypatch.setattr(fa_mod, "_ONE_PASS", True)
    b, h, n, d = 1, 2, 512, 16
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    ref = sdpa(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    out = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_supported_routes_by_benefit():
    # flash wins only at the long level-0 sequences; XLA's fused attention
    # is already optimal below ~2048 tokens (device-pure v5e sweep)
    assert supported(4096, 4096, 16)
    assert supported(2048, 2048, 32)
    # ragged lengths route too (padded + masked in the kernel): the
    # API-default 10.0 s clip gives 4000 level-0 tokens
    assert supported(4000, 4000, 16)
    assert supported(12000, 12000, 16)  # 30 s clip
    for n, d in [(1024, 32), (256, 48), (64, 80)]:
        assert not supported(n, n, d)


def test_sdpa_routes_through_flash(rng, monkeypatch):
    import audioldm_tpu.kernels as K
    from audioldm_tpu.kernels import use_flash_attention

    q = jnp.asarray(rng.standard_normal((1, 2, 2048, 16)).astype(np.float32))
    ref = sdpa(q, q, q)

    # interpret mode on CPU: patch the package attr sdpa resolves at call time
    orig = flash_attention
    monkeypatch.setattr(K, "flash_attention", lambda q, k, v: orig(q, k, v, interpret=True))
    use_flash_attention(True)
    try:
        out = sdpa(q, q, q)
    finally:
        use_flash_attention(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_backward_matches_xla_vjp(rng):
    """Streaming Pallas backward vs XLA attention VJP (interpret mode)."""
    import math

    from audioldm_tpu.kernels.flash_attention import (
        _flash_bh,
        _flash_bwd_bh,
        _pad_reshape,
    )

    # 256: aligned; 250: ragged N/M — the pad+mask path through fwd AND bwd
    for n in (256, 250):
        b, h, d = 1, 2, 16
        q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))

        out_ref, vjp = jax.vjp(sdpa, q, k, v)
        dq_ref, dk_ref, dv_ref = vjp(g)

        scale = 1.0 / math.sqrt(d)
        qp, kp, vp, (b_, h_, n_, m_, d_, dp) = _pad_reshape(q, k, v)
        out_bh, lse = _flash_bh(qp, kp, vp, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_bh.reshape(b, h, n, dp)[..., :d]), np.asarray(out_ref), atol=2e-5
        )
        do = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(b * h, n, dp)
        dq, dk, dv = _flash_bwd_bh(qp, kp, vp, out_bh, lse, do, scale, True)
        np.testing.assert_allclose(np.asarray(dq.reshape(b, h, n, dp)[..., :d]), np.asarray(dq_ref), atol=5e-5)
        np.testing.assert_allclose(np.asarray(dk.reshape(b, h, n, dp)[..., :d]), np.asarray(dk_ref), atol=5e-5)
        np.testing.assert_allclose(np.asarray(dv.reshape(b, h, n, dp)[..., :d]), np.asarray(dv_ref), atol=5e-5)
