"""Golden parity: our RoBERTa/CLAP text tower vs transformers
ClapTextModelWithProjection with shared (converted) weights — the model the
reference uses at script/train/train_audioldm_lora.py:368-369,513-524."""

import numpy as np
import pytest
import torch

from audioldm_tpu import config as cfglib
from audioldm_tpu.ckpt import convert_clap_text_state
from audioldm_tpu.models.clap_text import apply_clap_text, init_clap_text

TINY = dict(
    vocab_size=100,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=40,
    type_vocab_size=1,
    pad_token_id=1,
    projection_dim=16,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import ClapTextConfig as HFClapTextConfig
    from transformers import ClapTextModelWithProjection

    torch.manual_seed(0)
    hf_cfg = HFClapTextConfig(**TINY)
    model = ClapTextModelWithProjection(hf_cfg).eval()
    return model


def test_parity_with_transformers(torch_model, rng):
    import jax.numpy as jnp

    cfg = cfglib.ClapTextConfig(**TINY)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_clap_text_state(sd)

    ids = rng.integers(2, 100, size=(3, 12)).astype(np.int64)
    ids[:, 0] = 0  # BOS
    mask = np.ones_like(ids)
    ids[1, 8:] = 1  # pad one row
    mask[1, 8:] = 0
    ids[2, 5:] = 1
    mask[2, 5:] = 0

    with torch.no_grad():
        out_t = torch_model(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask), return_dict=True
        )
    out_j = apply_clap_text(params, cfg, jnp.asarray(ids), jnp.asarray(mask))

    np.testing.assert_allclose(
        np.asarray(out_j["text_embeds"]), out_t.text_embeds.numpy(), atol=2e-5
    )


def test_position_ids_ignore_padding(torch_model, rng):
    """RoBERTa position ids must restart after padding is masked out; a padded
    and an unpadded version of the same prompt must embed identically."""
    import jax.numpy as jnp

    cfg = cfglib.ClapTextConfig(**TINY)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_clap_text_state(sd)

    ids = rng.integers(2, 100, size=(1, 6)).astype(np.int64)
    ids_padded = np.concatenate([ids, np.full((1, 4), 1, np.int64)], axis=1)
    mask = np.concatenate([np.ones((1, 6), np.int64), np.zeros((1, 4), np.int64)], axis=1)

    short = apply_clap_text(params, cfg, jnp.asarray(ids), jnp.ones((1, 6), jnp.int32))
    padded = apply_clap_text(params, cfg, jnp.asarray(ids_padded), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(short["text_embeds"]), np.asarray(padded["text_embeds"]), atol=1e-5
    )


def test_init_structure_matches_converted(torch_model):
    import jax

    cfg = cfglib.ClapTextConfig(**TINY)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    converted = convert_clap_text_state(sd)
    ours = init_clap_text(jax.random.PRNGKey(0), cfg)

    ours_paths = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(ours)[0]}
    conv_paths = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(ours_paths) == set(conv_paths)
    for k in ours_paths:
        assert tuple(ours_paths[k]) == tuple(conv_paths[k]), k
