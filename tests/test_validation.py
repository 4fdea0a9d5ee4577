"""Validation-harness test on the tiny bundle (reference: log_validation,
train_audioldm_lora.py:97-231)."""

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import DDIMConfig, LoRAConfig
from audioldm_tpu.lora import init_lora
from audioldm_tpu.pipeline.generate import random_modules
from audioldm_tpu.train.validation import log_validation, spectrogram_image
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC
from tests.test_serve import DummyTokenizer


def test_log_validation_runs_and_differs():
    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    lcfg = LoRAConfig(r=2, lora_alpha=4)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    lora = jax.tree.map(lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora)

    out = log_validation(
        modules, lora, lcfg, DummyTokenizer(), "hip hop music",
        num_clips=2, num_inference_steps=2, audio_length_in_s=0.01,
        guidance_scale=2.0, dtype=jnp.float32,
    )
    assert out["audios"].shape == (2, 160)
    assert out["original_audios"].shape == (2, 160)
    # the adapter must actually change the generations
    assert np.max(np.abs(out["audios"] - out["original_audios"])) > 1e-6


def test_spectrogram_image_png(rng):
    wav = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    png = spectrogram_image(wav, 16000)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
