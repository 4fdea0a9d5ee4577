"""fastinit: the bench-only fused-draw initializer must be structurally
interchangeable with the real checkpoint-faithful ``init_*`` trees
(same treedef / shapes / dtypes), or every perf tool that uses it would
silently bench a different program."""

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import ClapTextConfig, UNetConfig, VAEConfig, VocoderConfig
from audioldm_tpu.models.clap_text import init_clap_text
from audioldm_tpu.models.unet import init_unet
from audioldm_tpu.models.vae import init_vae
from audioldm_tpu.models.vocoder import init_vocoder
from audioldm_tpu.utils.fastinit import random_params_like, shapes_of

TINY_UNET = UNetConfig(
    in_channels=4, out_channels=4, block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, norm_num_groups=4, attention_head_dim=2,
    projection_class_embeddings_input_dim=8,
)
TINY_VAE = VAEConfig(
    in_channels=1, out_channels=1, block_out_channels=(8, 16),
    layers_per_block=1, latent_channels=4, norm_num_groups=4,
)
TINY_TEXT = ClapTextConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=40, projection_dim=8,
)
TINY_VOC = VocoderConfig(
    model_in_dim=8, upsample_initial_channel=16, upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), sampling_rate=16000,
)


def _struct(tree):
    return jax.tree.map(lambda x: (tuple(x.shape), jnp.dtype(x.dtype).name), tree)


def test_matches_real_init_structure():
    for init_fn, cfg in [
        (init_unet, TINY_UNET),
        (init_vae, TINY_VAE),
        (init_clap_text, TINY_TEXT),
        (init_vocoder, TINY_VOC),
    ]:
        real = init_fn(jax.random.PRNGKey(0), cfg)
        fast = random_params_like(jax.random.PRNGKey(1), shapes_of(init_fn, cfg))
        assert _struct(real) == _struct(fast)


def test_dtype_override_and_values():
    sh = shapes_of(init_unet, TINY_UNET)
    p = random_params_like(jax.random.PRNGKey(0), sh, dtype=jnp.bfloat16)
    leaves = jax.tree.leaves(p)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    flat = np.concatenate([np.asarray(l, np.float32).ravel() for l in leaves])
    # distinct values drawn from one N(0, 0.02) vector — not zeros, not tied
    assert np.std(flat) > 0.005 and len(np.unique(flat)) > 100


def test_jittable_and_deterministic():
    sh = shapes_of(init_vae, TINY_VAE)
    f = jax.jit(lambda k: random_params_like(k, sh))
    a = f(jax.random.PRNGKey(7))
    b = f(jax.random.PRNGKey(7))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
