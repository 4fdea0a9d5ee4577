"""DDIM schedule as closed-form device-constant tables.

Behavior pinned by the reference's use of ``diffusers.DDIMScheduler`` from the
``cvssp/audioldm-s-full-v2`` scheduler subfolder:
- training: ``add_noise(latents, noise, t)`` with ``t ~ U[0, 1000)``
  (reference: script/train/train_audioldm_lora.py:503-504),
- inference: ``set_timesteps(N)`` + eta=0 ``step`` inside the denoise loop
  (reference call stack SURVEY.md §3.2; epsilon-prediction objective pinned by
  the MSE-vs-noise loss at train_audioldm_lora.py:549).

TPU-first design: no stateful scheduler object. The schedule is a frozen
pytree of tables (`` alphas_cumprod`` etc.) computed once host-side; ``step``
is a pure function indexed by the scan-carried step index so the whole
sampling loop compiles into a single ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import DDIMConfig


class DDIMSchedule(NamedTuple):
    """Static schedule tables (host numpy; become XLA constants under jit)."""

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool


def make_schedule(cfg: DDIMConfig = DDIMConfig()) -> DDIMSchedule:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta schedule: {cfg.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = np.float32(1.0) if cfg.set_alpha_to_one else np.float32(alphas_cumprod[0])
    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
        clip_sample=cfg.clip_sample,
    )


def inference_timesteps(cfg: DDIMConfig, num_inference_steps: int) -> np.ndarray:
    """"leading" timestep spacing: ``(arange(S) * (T // S)).round()[::-1] +
    steps_offset`` — the diffusers default the checkpoint config selects."""
    if cfg.timestep_spacing != "leading":
        raise ValueError(f"unsupported timestep spacing: {cfg.timestep_spacing}")
    step_ratio = cfg.num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)
    return ts + cfg.steps_offset


def add_noise(schedule: DDIMSchedule, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0): ``sqrt(acp_t) x0 + sqrt(1-acp_t) eps``.
    ``t``: int array broadcastable over the batch dim of ``sample``."""
    acp = schedule.alphas_cumprod[t]
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp * sample + sqrt_om * noise


def velocity(schedule: DDIMSchedule, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """v-prediction target (supported for completeness; the audioldm
    checkpoints use epsilon)."""
    acp = schedule.alphas_cumprod[t]
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape)
    sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
    return sqrt_acp * noise - sqrt_om * sample


def ddim_step(
    schedule: DDIMSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    noise: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One deterministic DDIM update x_t -> x_prev (eta=0 by default, matching
    the pipeline the reference drives). Pure function of (tables, tensors) —
    usable directly as a ``lax.scan`` body. ``prev_t < 0`` selects
    ``final_alpha_cumprod``."""
    acp_t = schedule.alphas_cumprod[t]
    acp_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], schedule.final_alpha_cumprod)

    sqrt_acp_t = jnp.sqrt(acp_t)
    sqrt_om_t = jnp.sqrt(1.0 - acp_t)

    if schedule.prediction_type == "epsilon":
        pred_x0 = (sample - sqrt_om_t * model_output) / sqrt_acp_t
        pred_eps = model_output
    elif schedule.prediction_type == "v_prediction":
        pred_x0 = sqrt_acp_t * sample - sqrt_om_t * model_output
        pred_eps = sqrt_acp_t * model_output + sqrt_om_t * sample
    elif schedule.prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - sqrt_acp_t * pred_x0) / sqrt_om_t
    else:
        raise ValueError(schedule.prediction_type)

    if schedule.clip_sample:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
        pred_eps = (sample - sqrt_acp_t * pred_x0) / sqrt_om_t

    if eta > 0.0:
        # sigma_t for eta>0 (DDIM paper eq. 16)
        variance = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
        sigma = eta * jnp.sqrt(variance)
    else:
        sigma = jnp.asarray(0.0, dtype=sample.dtype)

    dir_xt = jnp.sqrt(1.0 - acp_prev - sigma**2) * pred_eps
    prev_sample = jnp.sqrt(acp_prev) * pred_x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev_sample = prev_sample + sigma * noise
    return prev_sample
