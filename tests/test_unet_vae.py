"""Structural + numerical tests for the UNet and VAE on tiny configs
(reference shapes: latents [B,8,256,16] from [B,1,1024,64] mel for 10.24 s,
SURVEY.md §2b; conditioning via class-embedding path,
train_audioldm_lora.py:539-546)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.config import UNetConfig, VAEConfig
from audioldm_tpu.models import unet as unet_lib
from audioldm_tpu.models import vae as vae_lib

TINY_UNET = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
    attention_head_dim=2,
    projection_class_embeddings_input_dim=6,
)

TINY_VAE = VAEConfig(
    in_channels=1,
    out_channels=1,
    block_out_channels=(8, 16),
    layers_per_block=1,
    latent_channels=4,
    norm_num_groups=4,
)


@pytest.fixture(scope="module")
def unet_params():
    return unet_lib.init_unet(jax.random.PRNGKey(0), TINY_UNET)


@pytest.fixture(scope="module")
def vae_params():
    return vae_lib.init_vae(jax.random.PRNGKey(1), TINY_VAE)


def test_unet_epsilon_shape(unet_params):
    x = jnp.ones((2, 16, 8, 4))
    t = jnp.asarray([5, 900])
    cls = jnp.ones((2, 6))
    out = unet_lib.apply_unet(unet_params, TINY_UNET, x, t, class_labels=cls)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_jit_and_timestep_sensitivity(unet_params):
    f = jax.jit(lambda x, t, c: unet_lib.apply_unet(unet_params, TINY_UNET, x, t, class_labels=c))
    x = jnp.ones((1, 16, 8, 4))
    c = jnp.ones((1, 6))
    o1 = f(x, jnp.asarray([1]), c)
    o2 = f(x, jnp.asarray([999]), c)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4  # conditioning on t matters


def test_unet_class_label_sensitivity(unet_params):
    x = jnp.ones((1, 16, 8, 4))
    t = jnp.asarray([10])
    o1 = unet_lib.apply_unet(unet_params, TINY_UNET, x, t, class_labels=jnp.ones((1, 6)))
    o2 = unet_lib.apply_unet(unet_params, TINY_UNET, x, t, class_labels=-jnp.ones((1, 6)))
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-4  # text conditioning flows through


def test_unet_grads_flow(unet_params):
    def loss(p):
        out = unet_lib.apply_unet(p, TINY_UNET, jnp.ones((1, 8, 8, 4)), jnp.asarray([3]), class_labels=jnp.ones((1, 6)))
        return jnp.mean(out**2)

    g = jax.grad(loss)(unet_params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # every parameter should receive gradient signal somewhere
    nonzero = sum(float(jnp.sum(jnp.abs(l))) > 0 for l in leaves)
    assert nonzero > 0.9 * len(leaves)


def test_vae_roundtrip_shapes(vae_params):
    x = jnp.ones((2, 16, 8, 1))
    dist = vae_lib.encode(vae_params, TINY_VAE, x)
    assert dist.mean.shape == (2, 8, 4, 4)  # one downsample per non-final block
    z = dist.sample(jax.random.PRNGKey(0))
    rec = vae_lib.decode(vae_params, TINY_VAE, z)
    assert rec.shape == x.shape
    assert np.all(np.isfinite(np.asarray(rec)))


def test_vae_audioldm_latent_geometry():
    """Full-size config: 1024x64 mel -> 256x16 latents with 8 channels."""
    cfg = VAEConfig()
    n_down = len(cfg.block_out_channels) - 1
    assert 1024 // (2**n_down) == 256
    assert 64 // (2**n_down) == 16
    assert cfg.latent_channels == 8


def test_vae_sample_uses_reparameterization(vae_params):
    x = jnp.ones((1, 16, 8, 1))
    dist = vae_lib.encode(vae_params, TINY_VAE, x)
    s1 = dist.sample(jax.random.PRNGKey(0))
    s2 = dist.sample(jax.random.PRNGKey(1))
    assert float(jnp.max(jnp.abs(s1 - s2))) > 1e-6
    np.testing.assert_allclose(np.asarray(dist.mode), np.asarray(dist.mean))
