"""Pallas kernels under a dp mesh: the shard_map batch-partition route.

Pallas custom-calls carry no GSPMD partitioning rules, so inside a dp-mesh
jit XLA would replicate them (all-gather operands, n× redundant compute).
``kernels.sharding.kernel_dp_shard`` wraps the kernel calls in shard_map
over the data axis instead; these tests run the REAL routing (custom_vjp +
jit + shard_map) on the virtual 8-device CPU mesh with the kernels forced
into interpret mode, asserting bit-level equality with the unsharded path
(the single-chip kernel runs unmodified per batch shard).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm_tpu.kernels import flash_attention as flash_fn
from audioldm_tpu.kernels import sharding as ksh
from audioldm_tpu.kernels.mrf_conv import fused_mrf_stage
from audioldm_tpu.kernels.sharding import kernel_dp_shard

fa_mod = importlib.import_module("audioldm_tpu.kernels.flash_attention")


@pytest.fixture
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("dp",))


@pytest.fixture
def qkv(rng):
    mk = lambda: jnp.asarray(rng.standard_normal((8, 2, 256, 16)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(fa_mod, "_FORCE_INTERPRET", True)


def test_shardable_guards(mesh):
    assert ksh.shardable(8) is None  # no active context
    with kernel_dp_shard(None):
        assert ksh.shardable(8) is None  # mesh=None no-op
    with kernel_dp_shard(mesh):
        assert ksh.shardable(8) == (mesh, "dp")
        assert ksh.shardable(16) == (mesh, "dp")
        assert ksh.shardable(6) is None  # not divisible by 8
    assert ksh.current() is None  # context restored


def test_flash_dp_matches_unsharded(mesh, qkv, interp):
    q, k, v = qkv
    ref = flash_fn(q, k, v)  # unwrapped kernel (interpret, real vjp route)
    with kernel_dp_shard(mesh):
        out = flash_fn(q, k, v)
    # actually batch-partitioned across the mesh
    assert out.sharding.is_equivalent_to(NamedSharding(mesh, P("dp")), out.ndim)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flash_dp_grads_match(mesh, qkv, interp):
    q, k, v = qkv

    def loss(q, k, v):
        o = flash_fn(q, k, v)
        return jnp.sum(o * o)

    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    with kernel_dp_shard(mesh):
        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-6, err_msg=f"d{name}"
        )


def test_flash_dp_inside_sharded_jit_via_sdpa(mesh, qkv, interp, monkeypatch):
    # the trainer-shaped path: sdpa routes to flash inside a jit whose batch
    # inputs are dp-sharded (trainer.py make_train_step mesh branch)
    from audioldm_tpu.models.nn import sdpa

    monkeypatch.setattr(fa_mod, "_ENABLED", True)
    monkeypatch.setattr(fa_mod, "_MIN_TOKENS", 128)
    q, k, v = qkv
    data = NamedSharding(mesh, P("dp"))

    monkeypatch.setattr(fa_mod, "_ENABLED", False)
    ref = sdpa(q, k, v)  # XLA reference path
    monkeypatch.setattr(fa_mod, "_ENABLED", True)

    with kernel_dp_shard(mesh):
        out = jax.jit(sdpa, in_shardings=(data, data, data), out_shardings=data)(
            q, k, v
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _mrf_params(rng, c, k, nd):
    conv = lambda cin, cout: {
        "kernel": jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.standard_normal((cout,)).astype(np.float32) * 0.1),
    }
    return {
        "convs1": {str(d): conv(c, c) for d in range(nd)},
        "convs2": {str(d): conv(c, c) for d in range(nd)},
    }


def test_mrf_dp_matches_unsharded(mesh, rng):
    c, t = 8, 192
    x = jnp.asarray(rng.standard_normal((8, t, c)).astype(np.float32))
    blocks = [_mrf_params(rng, c, 3, 2)]
    kw = dict(
        kernel_sizes=(3,), dilations=((1, 3),), slope=0.1, block_t=64,
        interpret=True,
    )
    ref = fused_mrf_stage(x, blocks, **kw)
    with kernel_dp_shard(mesh):
        out = fused_mrf_stage(x, blocks, **kw)
    assert out.sharding.is_equivalent_to(NamedSharding(mesh, P("dp")), out.ndim)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vocoder_dp_end_to_end(mesh, rng):
    # the serve-shaped path: the routed vocoder (fused MRF stages +
    # conv_post epilogue) inside a dp-sharded jit == the pure-jnp resblock
    # path — exercises the channel-major + post-fused kernel under shard_map
    from audioldm_tpu.config import VocoderConfig
    from audioldm_tpu.kernels import mrf_conv
    from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder

    cfg = VocoderConfig(
        model_in_dim=8, upsample_initial_channel=16, upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    params = init_vocoder(jax.random.PRNGKey(0), cfg)
    # 256 mel frames -> stage lengths 512/1024: long enough for the fused
    # MRF routing gate (pick_block_t needs T >= 256)
    mel = jnp.asarray(rng.standard_normal((8, 256, cfg.model_in_dim)).astype(np.float32))
    ref = apply_vocoder(params, cfg, mel)  # jnp path (kernel disabled)

    data = NamedSharding(mesh, P("dp"))
    mrf_conv.use_fused_mrf(True)
    try:
        with kernel_dp_shard(mesh):
            out = jax.jit(
                lambda p, m: apply_vocoder(p, cfg, m),
                in_shardings=(NamedSharding(mesh, P()), data),
                out_shardings=data,
            )(params, mel)
    finally:
        mrf_conv.use_fused_mrf(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_heads_shard_matches_unsharded(mesh, qkv, interp):
    # the TP route: heads axis (dim 1) sharded over the mesh — each device
    # attends over its local head group (parallel/tp.py keeps flash ON
    # through kernels.sharding.kernel_heads_shard)
    from audioldm_tpu.kernels.sharding import kernel_heads_shard

    q, k, v = qkv  # [8, 2, 256, 16] -> [2, 8, ...] so heads=8 divides
    q, k, v = (jnp.transpose(x, (1, 0, 2, 3)) for x in (q, k, v))
    ref = flash_fn(q, k, v)
    heads_mesh = Mesh(np.asarray(jax.devices()[:8]), ("tp",))
    with kernel_heads_shard(heads_mesh):
        out = flash_fn(q, k, v)
    assert out.sharding.is_equivalent_to(
        NamedSharding(heads_mesh, P(None, "tp")), out.ndim
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_flash_heads_shard_grads_match(mesh, qkv, interp):
    from audioldm_tpu.kernels.sharding import kernel_heads_shard

    q, k, v = (jnp.transpose(x, (1, 0, 2, 3)) for x in qkv)
    heads_mesh = Mesh(np.asarray(jax.devices()[:8]), ("tp",))

    def loss(q, k, v):
        o = flash_fn(q, k, v)
        return jnp.sum(o * o)

    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    with kernel_heads_shard(heads_mesh):
        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-6, err_msg=f"d{name}"
        )


def test_heads_route_vetoes_non_divisible(mesh, monkeypatch):
    # sdpa must NOT route to the pallas kernel when the tp context cannot
    # split the heads: unwrapped pallas inside a tp-mesh jit would be
    # GSPMD-replicated — strictly worse than XLA attention
    from audioldm_tpu.kernels.sharding import flash_route_ok, kernel_heads_shard

    heads_mesh = Mesh(np.asarray(jax.devices()[:8]), ("tp",))
    assert flash_route_ok(6)  # no context: anything goes
    with kernel_heads_shard(heads_mesh):
        assert flash_route_ok(8)
        assert flash_route_ok(16)
        assert not flash_route_ok(6)
    assert flash_route_ok(6)  # context restored


def test_flash_combined_dp_tp_shard(qkv, interp):
    # the 2-D (dp, tp) train-step route: batch over dp AND heads over tp in
    # one shard_map (P('dp','tp') specs — parallel/tp.py make_tp_train_step)
    from audioldm_tpu.kernels.sharding import kernel_heads_shard

    q, k, v = qkv  # [8, 2, 256, 16]: batch 8 / dp 4, heads 2 / tp 2
    mesh2d = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("dp", "tp"))
    ref = flash_fn(q, k, v)
    with kernel_dp_shard(mesh2d), kernel_heads_shard(mesh2d):
        out = flash_fn(q, k, v)
    assert out.sharding.is_equivalent_to(
        NamedSharding(mesh2d, P("dp", "tp")), out.ndim
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def loss(q, k, v):
        o = flash_fn(q, k, v)
        return jnp.sum(o * o)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    with kernel_dp_shard(mesh2d), kernel_heads_shard(mesh2d):
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_non_divisible_batch_falls_back(mesh, rng, interp):
    # batch 6 on an 8-way mesh: the wrapper must keep the unwrapped path
    q = jnp.asarray(rng.standard_normal((6, 2, 256, 16)).astype(np.float32))
    ref = flash_fn(q, q, q)
    with kernel_dp_shard(mesh):
        out = flash_fn(q, q, q)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
