"""Fused MRF vocoder-stage kernel (kernels/mrf_conv.py) parity vs the
pure-jnp resblock path in models/vocoder.py — interpret mode on CPU,
including signal-edge blocks (the in-kernel zero-mask must reproduce XLA's
zero-padded conv chain exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.config import VocoderConfig
from audioldm_tpu.kernels import mrf_conv
from audioldm_tpu.models import vocoder as voc_lib


def _jnp_stage(blocks, x, kernel_sizes, dilations, slope):
    acc = None
    for blk, k, dil in zip(blocks, kernel_sizes, dilations):
        r = voc_lib._apply_resblock(blk, x, k, dil, slope)
        acc = r if acc is None else acc + r
    return acc / len(blocks)


def _random_blocks(key, c, kernel_sizes, dilations):
    from audioldm_tpu.models.nn import init_conv1d

    blocks = []
    for k, dils in zip(kernel_sizes, dilations):
        keys = jax.random.split(key, 2 * len(dils) + 1)
        key = keys[-1]
        blocks.append(
            {
                "convs1": {str(d): init_conv1d(keys[2 * d], c, c, k) for d in range(len(dils))},
                "convs2": {str(d): init_conv1d(keys[2 * d + 1], c, c, k) for d in range(len(dils))},
            }
        )
    return blocks


@pytest.mark.parametrize("c,t,block_t", [(8, 256, 128), (16, 512, 256), (8, 300, 128)])
def test_fused_stage_matches_jnp(c, t, block_t):
    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    blocks = _random_blocks(jax.random.PRNGKey(0), c, kernel_sizes, dilations)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, c), jnp.float32)

    ref = _jnp_stage(blocks, x, kernel_sizes, dilations, 0.1)
    got = mrf_conv.fused_mrf_stage(
        x, blocks, kernel_sizes=kernel_sizes, dilations=dilations,
        slope=0.1, block_t=block_t, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_stage_small_kernels():
    # non-default MRF topology (k=3 only, 2 dilation units)
    kernel_sizes = (3, 5)
    dilations = ((1, 2), (1, 3))
    blocks = _random_blocks(jax.random.PRNGKey(2), 8, kernel_sizes, dilations)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 8), jnp.float32)
    ref = _jnp_stage(blocks, x, kernel_sizes, dilations, 0.1)
    got = mrf_conv.fused_mrf_stage(
        x, blocks, kernel_sizes=kernel_sizes, dilations=dilations,
        slope=0.1, block_t=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_post_epilogue():
    # last-stage fusion: leaky(0.01) -> conv_post -> tanh inside the kernel
    from audioldm_tpu.models.nn import conv1d, init_conv1d

    kernel_sizes = (3, 7, 11)
    dilations = ((1, 3, 5),) * 3
    c = 8
    blocks = _random_blocks(jax.random.PRNGKey(4), c, kernel_sizes, dilations)
    post = init_conv1d(jax.random.PRNGKey(5), c, 1, 7)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 300, c), jnp.float32)

    stage = _jnp_stage(blocks, x, kernel_sizes, dilations, 0.1)
    lk = jnp.where(stage >= 0, stage, stage * 0.01)
    ref = jnp.tanh(conv1d(post, lk, padding=3))  # [B, T, 1]

    got = mrf_conv.fused_mrf_stage(
        x, blocks, post=post, kernel_sizes=kernel_sizes, dilations=dilations,
        slope=0.1, block_t=128, interpret=True,
    )
    assert got.shape == (2, 300, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_supported_gate():
    # REAL stage lengths (conv_transpose emits k-stride extras: 163872, 81936)
    assert mrf_conv.supported(163872, 32, jnp.float32)
    assert mrf_conv.supported(81936, 64, jnp.float32)
    assert not mrf_conv.supported(163872, 128, jnp.float32)  # wide stage -> XLA
    assert not mrf_conv.supported(163872, 32, jnp.bfloat16)  # fp32 only
    assert not mrf_conv.supported(128, 32, jnp.float32)  # shorter than any block


def test_vocoder_route_equivalence():
    cfg = VocoderConfig(
        model_in_dim=8, upsample_initial_channel=32, upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3, sampling_rate=16000,
    )
    params = voc_lib.init_vocoder(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 8), jnp.float32)

    base = voc_lib.apply_vocoder(params, cfg, mel)
    mrf_conv.use_fused_mrf(True)
    try:
        # stage T = 256/512, C = 16/8 -> both route through the kernel
        routed = voc_lib.apply_vocoder(params, cfg, mel)
    finally:
        mrf_conv.use_fused_mrf(False)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base), atol=2e-5, rtol=2e-5)
    assert not np.allclose(np.asarray(base), 0.0)
