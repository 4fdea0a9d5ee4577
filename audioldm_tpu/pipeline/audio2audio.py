"""Audio-to-audio generation: SDEdit-style style transfer and latent
inpainting / band regeneration.

Beyond-reference capability: the reference drives the diffusers
``AudioLDMPipeline`` (text->audio only — SURVEY.md §3.2), but the original
AudioLDM release ships ``style_transfer`` / ``super_resolution_and_inpainting``
modes that users of the model family expect. This implements the same user
surface TPU-first on top of the existing one-jit denoise scan
(``pipeline/generate.py``):

- **style transfer** (SDEdit, Meng et al. 2022): VAE-encode the input mel,
  forward-noise it to timestep ``ts[start]`` chosen by ``strength`` (the
  diffusers img2img convention), then run only the remaining
  ``steps - start`` denoise steps — still one ``lax.scan`` with static
  shapes, so the whole thing stays a single XLA program.
- **inpainting**: a latent-space mask (1 = regenerate, 0 = keep) built from
  second-ranges of the clip (time axis) and/or mel-bin ranges (frequency
  axis — masking the top bins is the classic diffusion super-resolution
  trick). Each DDIM step projects the known region back onto the forward
  trajectory of the init latents (RePaint eq. 8 / diffusers legacy-inpaint
  semantics), implemented inside the scan body in ``generate.denoise``.

Everything after host-side wav loading runs under jit; the init mel rides
the same reference front-end as training (``ops.mel.log_mel_spectrogram``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import MelConfig, VocoderConfig
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.scheduler import add_noise, inference_timesteps, make_schedule
from audioldm_tpu.ops.mel import log_mel_spectrogram, normalize_wav, pad_wav
from audioldm_tpu.pipeline.generate import (
    AudioLDMModules,
    denoise,
    encode_prompt,
    latent_shape,
    vocode,
)


def a2a_start_index(num_inference_steps: int, strength: float) -> int:
    """Diffusers img2img timestep-entry convention
    (``StableDiffusionImg2ImgPipeline.get_timesteps``): run the final
    ``int(steps * strength)`` steps of the schedule. ``strength=1.0`` keeps
    the full trajectory (but still noises the init to ``ts[0]`` rather than
    drawing pure N(0,1) — SDEdit semantics)."""
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    if init_timestep < 1:
        raise ValueError(
            f"strength {strength} too low for {num_inference_steps} steps: "
            f"int(steps * strength) must be >= 1 (it selects how many denoise "
            f"steps run); raise strength or the step count"
        )
    return max(num_inference_steps - init_timestep, 0)


def mel_config_for(vocoder_cfg: VocoderConfig, n_frames: int) -> MelConfig:
    """Mel front-end matched to a vocoder geometry. At the flagship config
    (hop 160, 16 kHz, 64 mels) this reproduces the reference training
    front-end exactly (script/data/datasets.py:59-90 — filter 1024, win
    1024, fmax 8000); for other geometries (tiny test fixtures) it derives
    a consistent front-end: filter = next pow2 >= 4*hop, win = filter,
    fmax = Nyquist capped at 8 kHz."""
    hop = int(np.prod(vocoder_cfg.upsample_rates))
    filt = max(16, 2 ** math.ceil(math.log2(4 * hop)))
    sr = vocoder_cfg.sampling_rate
    return MelConfig(
        sampling_rate=sr,
        filter_length=filt,
        hop_length=hop,
        win_length=filt,
        n_mel=vocoder_cfg.model_in_dim,
        mel_fmin=0.0,
        mel_fmax=min(8000.0, sr / 2),
        duration=n_frames * hop / sr,
        # exact: int(duration*sr/hop) can truncate one frame short when
        # n*hop/sr is not float-representable (advisor round-3 finding)
        target_frames=n_frames,
    )


def prepare_init_mel(
    wav: np.ndarray, modules: AudioLDMModules, audio_length_in_s: float
) -> jnp.ndarray:
    """Host wav (float, any length, already at the vocoder sample rate) ->
    ``[1, T, F, 1]`` log-mel at the pipeline's latent geometry. Applies the
    reference wav normalization (mean-center, peak-norm, x0.5 —
    datasets.py:174-177) and pads/crops to the clip length, mirroring the
    training data path so the VAE sees its native input distribution."""
    b, n_frames_lat, _, _ = latent_shape(modules, 1, audio_length_in_s)
    factor = 2 ** (len(modules.vae_cfg.block_out_channels) - 1)
    n_frames = n_frames_lat * factor
    cfg = mel_config_for(modules.vocoder_cfg, n_frames)
    wav = normalize_wav(np.asarray(wav, np.float32))
    wav = pad_wav(wav, n_frames * cfg.hop_length)
    mel = log_mel_spectrogram(jnp.asarray(wav), cfg)
    if mel.shape[-2] != n_frames:  # pad_spec targets cfg.target_length
        raise ValueError(f"mel frames {mel.shape[-2]} != latent-geometry frames {n_frames}")
    return mel[None, :, :, None]


def latent_mask(
    modules: AudioLDMModules,
    audio_length_in_s: float,
    regenerate_times: Optional[Sequence[Tuple[float, float]]] = None,
    regenerate_mel_bins: Optional[Sequence[Tuple[int, int]]] = None,
) -> jnp.ndarray:
    """Build a ``[1, T_lat, F_lat, 1]`` inpainting mask (1 = regenerate).

    ``regenerate_times``: ``(start_s, end_s)`` second-ranges of the clip to
    regenerate (across ALL frequencies). ``regenerate_mel_bins``:
    ``(lo, hi)`` half-open mel-bin ranges (of the ``model_in_dim`` mel bins)
    to regenerate across the WHOLE clip — e.g. ``(32, 64)`` redraws the top
    octave (super-resolution). The mask is the union of both sets; with
    neither given, everything is regenerated (pure style transfer)."""
    _, T, F, _ = latent_shape(modules, 1, audio_length_in_s)
    if not regenerate_times and not regenerate_mel_bins:
        return jnp.ones((1, T, F, 1), jnp.float32)
    voc = modules.vocoder_cfg
    hop = int(np.prod(voc.upsample_rates))
    factor = 2 ** (len(modules.vae_cfg.block_out_channels) - 1)
    frames_per_s = voc.sampling_rate / hop / factor  # latent frames per second
    bins_per_lat = voc.model_in_dim / F  # mel bins per latent freq row
    mask = np.zeros((1, T, F, 1), np.float32)
    for t0, t1 in regenerate_times or ():
        if t1 <= t0:
            raise ValueError(f"empty time range ({t0}, {t1})")
        i0 = max(0, int(math.floor(t0 * frames_per_s)))
        i1 = min(T, int(math.ceil(t1 * frames_per_s)))
        mask[:, i0:i1, :, :] = 1.0
    for b0, b1 in regenerate_mel_bins or ():
        if b1 <= b0:
            raise ValueError(f"empty mel-bin range ({b0}, {b1})")
        j0 = max(0, int(math.floor(b0 / bins_per_lat)))
        j1 = min(F, int(math.ceil(b1 / bins_per_lat)))
        mask[:, :, j0:j1, :] = 1.0
    return jnp.asarray(mask)


def encode_init_latents(
    modules: AudioLDMModules,
    mel: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``[B, T, F, 1]`` mel -> scaled latents. Deterministic posterior mode
    by default; pass ``rng`` to sample (the training-path convention,
    trainer.py:101-102)."""
    dist = vae_lib.encode(modules.vae, modules.vae_cfg, mel.astype(dtype))
    z = dist.sample(rng) if rng is not None else dist.mode
    return z.astype(jnp.float32) * modules.vae_cfg.scaling_factor


def generate_mel_from_audio(
    modules: AudioLDMModules,
    mel_init: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    uncond_ids: jnp.ndarray,
    uncond_mask: jnp.ndarray,
    rng: jax.Array,
    num_inference_steps: int = 50,
    strength: float = 0.75,
    guidance_scale: float = 2.5,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
    dtype=jnp.float32,
    scheduler: str = "ddim",
    inpaint_mask: Optional[jnp.ndarray] = None,
    sample_posterior: bool = False,
) -> jnp.ndarray:
    """Audio-conditioned mel generation (SDEdit / inpainting core).

    ``mel_init``: ``[1 or B, T, F, 1]`` log-mel of the source clip at the
    pipeline geometry (see :func:`prepare_init_mel`). With ``inpaint_mask``
    the unmasked region is held to the source's forward trajectory every
    step (DDIM only). Fully traceable — jit it with ``strength`` /
    ``scheduler`` static (``make_a2a_fn``)."""
    b = input_ids.shape[0]
    cond = encode_prompt(modules, input_ids, attention_mask)
    uncond = encode_prompt(modules, uncond_ids, uncond_mask)
    if uncond.shape[0] != b:
        uncond = jnp.broadcast_to(uncond[:1], cond.shape)

    rng, noise_rng, enc_rng = jax.random.split(rng, 3)
    init = encode_init_latents(
        modules, mel_init, rng=enc_rng if sample_posterior else None, dtype=dtype
    )
    if init.shape[0] != b:
        init = jnp.broadcast_to(init[:1], (b,) + init.shape[1:])

    start = a2a_start_index(num_inference_steps, strength)
    ts = inference_timesteps(modules.ddim_cfg, num_inference_steps)
    schedule = make_schedule(modules.ddim_cfg)
    noise = jax.random.normal(noise_rng, init.shape, jnp.float32)
    latents = add_noise(schedule, init, noise, jnp.asarray(ts[start]))

    latents = denoise(
        modules, latents, cond, uncond, num_inference_steps, guidance_scale,
        lora=lora, lora_scale=lora_scale, dtype=dtype, rng=rng,
        scheduler=scheduler, start_index=start, inpaint_mask=inpaint_mask,
        init_latents=init if inpaint_mask is not None else None,
    )
    return vae_lib.decode(
        modules.vae, modules.vae_cfg, (latents / modules.vae_cfg.scaling_factor).astype(dtype)
    )


def generate_from_audio(
    modules: AudioLDMModules,
    mel_init: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    uncond_ids: jnp.ndarray,
    uncond_mask: jnp.ndarray,
    rng: jax.Array,
    audio_length_in_s: float = 10.0,
    **kw,
) -> jnp.ndarray:
    """Full audio+text -> audio path: ``generate_mel_from_audio`` + vocoder.
    Returns ``[B, samples]`` float32 waveform."""
    samples = int(audio_length_in_s * modules.vocoder_cfg.sampling_rate)
    mel = generate_mel_from_audio(
        modules, mel_init, input_ids, attention_mask, uncond_ids, uncond_mask, rng, **kw
    )
    return vocode(modules, mel, samples)


def make_a2a_fn(
    modules: AudioLDMModules,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 10.0,
    strength: float = 0.75,
    guidance_scale: float = 2.5,
    dtype=jnp.bfloat16,
    scheduler: str = "ddim",
    inpaint_mask: Optional[jnp.ndarray] = None,
    sample_posterior: bool = False,
    split_compile: bool = True,
):
    """jit-compiled audio-to-audio fn ``(mel_init, ids, mask, u_ids, u_mask,
    rng) -> wav``. Mirrors ``make_generate_fn``: the bundle travels as a jit
    argument (params as device buffers), mel-stage and vocoder compile as
    two XLA programs when ``split_compile`` (compile time is additive in
    stages, PERF.md). The inpaint mask is closed over as a compile-time
    constant — it is a per-invocation constant in practice and keeping it
    out of the signature avoids a traced-vs-None dual path."""
    samples = int(audio_length_in_s * modules.vocoder_cfg.sampling_rate)
    mask_const = None if inpaint_mask is None else jnp.asarray(inpaint_mask, jnp.float32)

    @jax.jit
    def fn_mel(mods, mel_init, ids, am, u_ids, u_am, rng):
        return generate_mel_from_audio(
            mods, mel_init, ids, am, u_ids, u_am, rng,
            num_inference_steps=num_inference_steps, strength=strength,
            guidance_scale=guidance_scale, dtype=dtype, scheduler=scheduler,
            inpaint_mask=mask_const, sample_posterior=sample_posterior,
        )

    @jax.jit
    def fn_voc(mods, mel):
        return vocode(mods, mel, samples)

    if split_compile:

        def fn(mel_init, ids, am, u_ids, u_am, rng):
            return fn_voc(modules, fn_mel(modules, mel_init, ids, am, u_ids, u_am, rng))

        return fn

    @jax.jit
    def fn_mono(mods, mel_init, ids, am, u_ids, u_am, rng):
        mel = generate_mel_from_audio(
            mods, mel_init, ids, am, u_ids, u_am, rng,
            num_inference_steps=num_inference_steps, strength=strength,
            guidance_scale=guidance_scale, dtype=dtype, scheduler=scheduler,
            inpaint_mask=mask_const, sample_posterior=sample_posterior,
        )
        return vocode(mods, mel, samples)

    def fn(mel_init, ids, am, u_ids, u_am, rng):
        return fn_mono(modules, mel_init, ids, am, u_ids, u_am, rng)

    return fn
