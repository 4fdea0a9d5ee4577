"""Checkpoint bridge round-trip: save an HF-layout checkpoint dir from our
pytrees, load it back, and through to generation — plus torch-loadability of
the exported text encoder / vocoder (the reference's consumption formats,
train_audioldm_lora.py:364-371)."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audioldm_tpu.ckpt import save_audioldm_checkpoint
from audioldm_tpu.config import DDIMConfig
from audioldm_tpu.pipeline.generate import AudioLDMModules, generate, random_modules
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC


@pytest.fixture(scope="module")
def modules():
    return random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )


def test_save_load_roundtrip(modules, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    save_audioldm_checkpoint(ckpt, modules)
    assert os.path.exists(os.path.join(ckpt, "unet", "diffusion_pytorch_model.safetensors"))
    assert json.load(open(os.path.join(ckpt, "scheduler", "scheduler_config.json")))["beta_start"] == 0.0015

    loaded = AudioLDMModules.from_checkpoint(ckpt)
    assert loaded.unet_cfg == modules.unet_cfg
    assert loaded.vae_cfg == modules.vae_cfg
    assert loaded.vocoder_cfg == modules.vocoder_cfg
    for a, b in zip(jax.tree.leaves(modules.unet), jax.tree.leaves(loaded.unet)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(modules.vocoder), jax.tree.leaves(loaded.vocoder)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # loaded bundle generates identically
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    rng = jax.random.PRNGKey(4)
    a = generate(modules, ids, mask, ids, mask, rng, 2, 0.01, 2.0)
    b = generate(loaded, ids, mask, ids, mask, rng, 2, 0.01, 2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_exported_text_encoder_loads_in_transformers(modules, tmp_path):
    from transformers import ClapTextConfig as HFCfg
    from transformers import ClapTextModelWithProjection

    ckpt = str(tmp_path / "ckpt2")
    save_audioldm_checkpoint(ckpt, modules)
    from safetensors.torch import load_file

    sd = load_file(os.path.join(ckpt, "text_encoder", "model.safetensors"))
    hf = ClapTextModelWithProjection(HFCfg(**{k: getattr(modules.text_cfg, k) for k in (
        "vocab_size", "hidden_size", "num_hidden_layers", "num_attention_heads",
        "intermediate_size", "max_position_embeddings", "type_vocab_size",
        "pad_token_id", "projection_dim")})).eval()
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not unexpected
    # only non-parameter buffers may be missing
    assert all(m.endswith(("position_ids", "token_type_ids")) for m in missing)

    # and it computes the same embeddings as our tower
    from audioldm_tpu.models.clap_text import apply_clap_text

    ids = np.full((1, 6), 5, np.int64)
    ids[0, 0] = 0
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    ours = np.asarray(apply_clap_text(modules.text_encoder, modules.text_cfg, jnp.asarray(ids))["text_embeds"])
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_exported_vocoder_loads_in_transformers(modules, tmp_path):
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    ckpt = str(tmp_path / "ckpt3")
    save_audioldm_checkpoint(ckpt, modules)
    from safetensors.torch import load_file

    sd = load_file(os.path.join(ckpt, "vocoder", "model.safetensors"))
    cfg = modules.vocoder_cfg
    hf = SpeechT5HifiGan(SpeechT5HifiGanConfig(
        model_in_dim=cfg.model_in_dim, sampling_rate=cfg.sampling_rate,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates), upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        leaky_relu_slope=cfg.leaky_relu_slope, normalize_before=cfg.normalize_before,
    )).eval()
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not unexpected and not missing

    from audioldm_tpu.models.vocoder import apply_vocoder

    mel = np.random.default_rng(0).standard_normal((1, 9, cfg.model_in_dim)).astype(np.float32)
    with torch.no_grad():
        theirs = hf(torch.from_numpy(mel)).numpy()
    ours = np.asarray(apply_vocoder(modules.vocoder, cfg, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
