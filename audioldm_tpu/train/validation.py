"""Validation harness — side-by-side LoRA vs frozen-base generation with
CLAP/KAD scoring and audio/spectrogram logging.

Reference behavior (``log_validation``, train_audioldm_lora.py:97-231):
generate N clips with the adapted pipeline *and* the frozen original
pipeline from the same validation prompt, log the audio + mel-spectrogram
images, compute the mean CLAP score for both and the KAD of each against a
fixed reference-audio set.

TPU-first: both passes reuse the same jitted generate fn — the LoRA pass
feeds the adapter pytree, the base pass feeds the zero adapter, so there is
exactly one compilation; scoring runs through the JAX CLAP towers.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import LoRAConfig
from audioldm_tpu.eval.metrics import clap_similarity, kernel_audio_distance
from audioldm_tpu.ops import resample
from audioldm_tpu.pipeline.generate import AudioLDMModules, make_generate_fn


def spectrogram_image(waveform: np.ndarray, sample_rate: int = 16000):
    """Mel-spectrogram PNG bytes (capability of plot_spectrogram_to_image,
    train_audioldm_lora.py:78-95; our own mel front-end instead of librosa)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from audioldm_tpu.config import MelConfig
    from audioldm_tpu.ops import log_mel_spectrogram

    cfg = MelConfig(sampling_rate=sample_rate, duration=len(waveform) / sample_rate)
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(waveform)[None], cfg))[0].T
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(mel, origin="lower", aspect="auto", cmap="viridis")
    fig.colorbar(im, ax=ax, format="%+2.0f")
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()


def log_validation(
    modules: AudioLDMModules,
    lora: dict,
    lora_cfg: LoRAConfig,
    tokenizer,
    prompt: str,
    num_clips: int = 5,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 4.0,
    guidance_scale: float = 2.5,
    scorer=None,  # audioldm_tpu.eval.scoring.ClapScorer
    ref_audios_16k: Optional[Sequence[np.ndarray]] = None,
    logger=None,
    step: int = 0,
    seed: int = 0,
    dtype=jnp.bfloat16,
    generate_fn=None,
) -> dict:
    """Returns {"audios", "original_audios", "clap_score", "original_clap_score",
    "kad_lora", "kad_original"} (metric names mirror the reference's wandb
    keys, train_audioldm_lora.py:203-229,583-589).

    ``generate_fn``: a ``make_generate_fn(..., with_lora=True)`` result to
    reuse across validations — building a fresh one per call would re-trace
    (and on a cold cache re-compile) the whole pipeline every validation;
    the train CLI builds it once."""
    fn = generate_fn or make_generate_fn(
        modules, num_inference_steps=num_inference_steps,
        audio_length_in_s=audio_length_in_s, guidance_scale=guidance_scale,
        dtype=dtype, with_lora=True,
    )
    tok = tokenizer([prompt] * num_clips)
    unc = tokenizer([""])
    args = (
        jnp.asarray(tok["input_ids"]), jnp.asarray(tok["attention_mask"]),
        jnp.asarray(unc["input_ids"]), jnp.asarray(unc["attention_mask"]),
        jax.random.PRNGKey(seed),
    )
    zero = jax.tree.map(jnp.zeros_like, lora)
    audios = np.asarray(fn(*args, lora, lora_scale=lora_cfg.scale))
    original = np.asarray(fn(*args, zero, lora_scale=lora_cfg.scale))

    sr = modules.vocoder_cfg.sampling_rate
    results: dict = {"audios": audios, "original_audios": original}

    if logger is not None:
        for i in range(num_clips):
            logger.log_audio(f"validation/{i}", audios[i], sr, step)
            logger.log_audio(f"original_validation/{i}", original[i], sr, step)
            if hasattr(logger, "log_image"):
                # mel-spectrogram PNGs, the reference's image logging
                # (train_audioldm_lora.py:78-95,146-149,176-198)
                logger.log_image(f"validation_mel/{i}", spectrogram_image(audios[i], sr), step)
                logger.log_image(f"original_validation_mel/{i}", spectrogram_image(original[i], sr), step)

    if scorer is not None:
        def to48k(batch):
            return [np.asarray(resample(jnp.asarray(w), sr, 48000)) for w in batch]

        gen48, orig48 = to48k(audios), to48k(original)
        t_emb = scorer.embed_text([prompt])
        g_emb = scorer.embed_audio(gen48)
        o_emb = scorer.embed_audio(orig48)
        results["clap_score"] = float(np.mean(np.asarray(
            clap_similarity(g_emb, jnp.broadcast_to(t_emb, g_emb.shape)))))
        results["original_clap_score"] = float(np.mean(np.asarray(
            clap_similarity(o_emb, jnp.broadcast_to(t_emb, o_emb.shape)))))
        if ref_audios_16k is not None and len(ref_audios_16k) >= 2 and len(audios) >= 2:
            ref48 = to48k(ref_audios_16k)
            r_emb = scorer.embed_audio(ref48)
            results["kad_score_lora"] = float(kernel_audio_distance(r_emb, g_emb))
            results["kad_score_original"] = float(kernel_audio_distance(r_emb, o_emb))
        elif ref_audios_16k is not None:
            # the unbiased KAD estimator needs >= 2 embeddings per set
            # (kernel_audio_distance raises); skip rather than kill a
            # training run over an undersized validation set
            print("validation: skipping KAD (needs >= 2 clips per set, got "
                  f"{len(ref_audios_16k)} ref / {len(audios)} generated)")
        # NB: scalar metrics are returned, not logged here — Trainer.fit logs
        # the returned floats (avoids double-logging when used as validate_fn)
    return results
