"""Tensor-parallel UNet step (parallel/tp.py) on the virtual 8-device mesh.

Validates the GSPMD column/row attention split: output equality with the
single-device epsilon step, presence of the expected all-reduce collective
in the partitioned HLO, and robustness when heads % tp != 0 (GSPMD
reshards; numbers must not change).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from audioldm_tpu.config import UNetConfig
from audioldm_tpu.models.unet import apply_unet, init_unet
from audioldm_tpu.parallel import (
    make_tp_mesh,
    make_tp_unet_step,
    shard_unet_params,
    unet_tp_specs,
)

TINY = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=4,  # heads=4 at every level -> tp in {2,4} divides
    projection_class_embeddings_input_dim=8,
)


def _inputs(cfg, b=2):
    k = jax.random.PRNGKey(7)
    lat = jax.random.normal(k, (b, 16, 8, cfg.in_channels), jnp.float32)
    t = jnp.asarray([981] * b, jnp.int32)
    lbl = jax.random.normal(
        jax.random.PRNGKey(8), (b, cfg.projection_class_embeddings_input_dim), jnp.float32
    )
    return lat, t, lbl


@pytest.fixture(scope="module")
def params():
    return init_unet(jax.random.PRNGKey(0), TINY)


def test_specs_structure_and_rules(params):
    # default tp=1: attention-only split, FF replicated
    specs = unet_tp_specs(params)
    assert jax.tree_util.tree_structure(specs) == jax.tree_util.tree_structure(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    col = [p for p, s in flat if s == P(None, "tp")]
    row = [p for p, s in flat if s == P("tp", None)]
    assert col and row
    for path, s in flat:
        keys = [str(getattr(k, "key", "")) for k in path]
        if s == P(None, "tp"):
            assert keys[-2] in ("to_q", "to_k", "to_v") and keys[-1] == "kernel"
        elif s == P("tp", None):
            assert keys[-2] == "to_out" and keys[-1] == "kernel"
        else:
            assert s == P()
    # every attention projection kernel is sharded, nothing else is
    n_attn = sum(1 for p, _ in flat if any(str(getattr(k, "key", "")) in ("attn1", "attn2") for k in p))
    assert len(col) + len(row) == sum(
        1
        for p, _ in flat
        if any(str(getattr(k, "key", "")) in ("attn1", "attn2") for k in p)
        and str(getattr(p[-1], "key", "")) == "kernel"
    )
    assert n_attn > len(col) + len(row)  # to_out bias stayed replicated


def test_ff_specs_and_divisibility(params):
    # tp=2 divides every level's FF hidden width (half = 4*C): geglu
    # kernel+bias column-sharded, out kernel row-sharded, out bias replicated
    specs = unet_tp_specs(params, 2)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    ff = {
        tuple(str(getattr(k, "key", "")) for k in p)[-2:]: s
        for p, s in flat
        if any(str(getattr(k, "key", "")) == "ff" for k in p)
    }
    assert ff[("geglu", "kernel")] == P(None, "tp")
    assert ff[("geglu", "bias")] == P("tp")
    assert ff[("out", "kernel")] == P("tp", None)
    assert ff[("out", "bias")] == P()
    # tp=3 divides nothing here (half in {64, 128}): FF fully replicated
    specs3 = jax.tree_util.tree_flatten_with_path(unet_tp_specs(params, 3))[0]
    assert all(
        s == P()
        for p, s in specs3
        if any(str(getattr(k, "key", "")) == "ff" for k in p)
    )


@pytest.mark.parametrize("tp", [2, 4])
def test_ff_interleaved_apply_matches_contiguous(params, tp):
    # the interleaved-layout apply path is a pure column permutation:
    # permute params, trace under nn.ff_tp(tp), compare single-device
    from audioldm_tpu.models import nn
    from audioldm_tpu.models.unet import apply_ff
    from audioldm_tpu.parallel.tp import _interleave_geglu

    ffp = params["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["ff"]
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 11, 16), jnp.float32)
    ref = apply_ff(ffp, x)
    perm = dict(ffp)
    perm["geglu"] = {k: _interleave_geglu(v, tp) for k, v in ffp["geglu"].items()}
    with nn.ff_tp(tp):
        out = apply_ff(perm, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # non-divisible degree must fall back to the contiguous split untouched
    with nn.ff_tp(3):
        out3 = apply_ff(ffp, x)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(ref))


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_step_matches_single_device(params, tp):
    cfg = TINY
    lat, t, lbl = _inputs(cfg)
    ref = apply_unet(params, cfg, lat, t, class_labels=lbl)

    mesh = make_tp_mesh(tp)
    sharded = shard_unet_params(mesh, params)
    step = make_tp_unet_step(cfg, mesh)
    out = step(sharded, lat, t, lbl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_step_heads_not_divisible_still_exact(params):
    # heads=4, tp=8: GSPMD must fall back to resharding, not change numbers
    cfg = TINY
    lat, t, lbl = _inputs(cfg)
    ref = apply_unet(params, cfg, lat, t, class_labels=lbl)
    mesh = make_tp_mesh(8)
    out = make_tp_unet_step(cfg, mesh)(shard_unet_params(mesh, params), lat, t, lbl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_hlo_contains_all_reduce(params):
    # the to_out row split must lower to a real collective on the tp axis
    cfg = TINY
    lat, t, lbl = _inputs(cfg)
    mesh = make_tp_mesh(2)
    sharded = shard_unet_params(mesh, params)
    step = make_tp_unet_step(cfg, mesh)
    from audioldm_tpu.models.nn import ff_tp, qkv_fusion

    with qkv_fusion(False), ff_tp(2):
        txt = step.jitted.lower(sharded, lat, t, lbl).compile().as_text()
    assert "all-reduce" in txt


def _tiny_modules():
    from audioldm_tpu.config import ClapTextConfig, DDIMConfig, VAEConfig, VocoderConfig
    from audioldm_tpu.pipeline.generate import random_modules

    return random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY,
        vae_cfg=VAEConfig(
            in_channels=1, out_channels=1, block_out_channels=(8, 16),
            layers_per_block=1, latent_channels=4, norm_num_groups=4,
            scaling_factor=0.9,
        ),
        text_cfg=ClapTextConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=40, projection_dim=8,
        ),
        vocoder_cfg=VocoderConfig(
            model_in_dim=8, upsample_initial_channel=16, upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),), sampling_rate=16000,
        ),
        ddim_cfg=DDIMConfig(),
    )


def test_tp_generate_matches_single_device(params):
    # full pipeline (text -> denoise scan -> VAE -> vocoder) under TP ==
    # the single-device path, with and without a replicated LoRA tree
    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.lora import init_lora
    from audioldm_tpu.pipeline.generate import generate
    from audioldm_tpu.parallel import make_tp_generate_fn, shard_modules

    mods = _tiny_modules()
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.ones((1, 6), jnp.int32).at[:, 1:].set(0)
    rng = jax.random.PRNGKey(7)
    lora = init_lora(jax.random.PRNGKey(9), mods.unet, LoRAConfig(r=2, lora_alpha=4.0))
    # non-zero B so the adapter actually perturbs the output
    lora = jax.tree.map(lambda x: x + 0.05, lora)

    kw = dict(num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.5)
    ref = generate(mods, ids, mask, u_ids, u_mask, rng, dtype=jnp.float32, **kw)
    ref_lora = generate(mods, ids, mask, u_ids, u_mask, rng, dtype=jnp.float32, lora=lora, **kw)
    assert np.max(np.abs(np.asarray(ref) - np.asarray(ref_lora))) > 1e-7

    mesh = make_tp_mesh(4)
    fn = make_tp_generate_fn(shard_modules(mesh, mods), mesh, dtype=jnp.float32, **kw)
    out = fn(ids, mask, u_ids, u_mask, rng)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    out_lora = fn(ids, mask, u_ids, u_mask, rng, lora=lora)
    np.testing.assert_allclose(np.asarray(out_lora), np.asarray(ref_lora), atol=2e-5)


def test_tp_generate_gates_pallas_kernels_during_trace(params):
    # the fused-MRF kernel has no GSPMD partitioning rule: the tp path must
    # trace with it OFF even when globally enabled, and restore the flag
    # afterwards. Flash stays globally ON — under tp it routes through the
    # heads-sharded shard_map wrapper (kernels/sharding.py; dedicated
    # equality tests in test_kernel_sharding.py) or is vetoed per call.
    from audioldm_tpu.kernels import flash_enabled, mrf_conv, use_flash_attention
    from audioldm_tpu.parallel import make_tp_generate_fn, shard_modules
    from audioldm_tpu.pipeline.generate import generate

    mods = _tiny_modules()
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.ones((1, 6), jnp.int32).at[:, 1:].set(0)
    rng = jax.random.PRNGKey(7)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.5)
    ref = generate(mods, ids, mask, u_ids, u_mask, rng, dtype=jnp.float32, **kw)

    use_flash_attention(True)
    mrf_conv.use_fused_mrf(True)
    try:
        mesh = make_tp_mesh(4)
        fn = make_tp_generate_fn(shard_modules(mesh, mods), mesh, dtype=jnp.float32, **kw)
        out = fn(ids, mask, u_ids, u_mask, rng)
        # flags restored after the call
        assert flash_enabled() and mrf_conv.enabled()
    finally:
        use_flash_attention(False)
        mrf_conv.use_fused_mrf(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_train_step_matches_single_device(params):
    # one LoRA train step on a 2x2 (dp, tp) mesh == the single-device step:
    # same loss, same updated adapters (global-batch semantics preserved)
    import optax

    from audioldm_tpu.config import LoRAConfig
    from audioldm_tpu.lora import init_lora
    from audioldm_tpu.parallel import make_tp_mesh_2d, make_tp_train_step, shard_modules
    from audioldm_tpu.train.trainer import init_train_state, make_train_step

    mods = _tiny_modules()
    lcfg = LoRAConfig(r=2, lora_alpha=4.0)
    lora = init_lora(jax.random.PRNGKey(1), mods.unet, lcfg)
    opt = optax.adamw(1e-3)
    batch = {
        "log_mel_spec": jax.random.normal(jax.random.PRNGKey(2), (4, 16, 8, 1), jnp.float32),
        "input_ids": jnp.full((4, 6), 5, jnp.int32).at[:, 0].set(0),
        "attention_mask": jnp.ones((4, 6), jnp.int32),
    }
    rng = jax.random.PRNGKey(3)

    ref_step = make_train_step(mods, opt, lcfg)
    ref_state, ref_m = ref_step(init_train_state(lora, opt), batch, rng)

    mesh = make_tp_mesh_2d(2, 2)
    tp_step = make_tp_train_step(shard_modules(mesh, mods), opt, lcfg, mesh)
    tp_state, tp_m = tp_step(init_train_state(lora, opt), batch, rng)

    np.testing.assert_allclose(float(tp_m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(tp_m["grad_norm"]), float(ref_m["grad_norm"]), rtol=1e-4
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(tp_state.lora)[0],
        jax.tree_util.tree_flatten_with_path(ref_state.lora)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(pa))
    assert int(tp_state.step) == 1


def test_shard_unet_params_placement(params):
    mesh = make_tp_mesh(2)
    sharded = shard_unet_params(mesh, params)
    leaf = sharded["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn1"][
        "to_q"
    ]["kernel"]
    assert leaf.sharding.spec == P(None, "tp")
    # sharded placement must not alter values
    np.testing.assert_array_equal(
        np.asarray(leaf),
        np.asarray(
            params["down_blocks"]["0"]["attentions"]["0"]["transformer_blocks"]["0"]["attn1"][
                "to_q"
            ]["kernel"]
        ),
    )
