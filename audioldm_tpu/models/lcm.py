"""Latent Consistency Model (LCM) schedule pieces — few-step sampling.

A capability beyond the reference (which samples 50 DDIM steps,
script/inference/generate_audio.py:49): consistency distillation collapses
the 50-step CFG teacher into a student that maps any (x_t, t) directly to
the trajectory origin, so sampling takes 1-8 UNet evals with NO CFG batch
doubling. Semantics follow the public LCM formulation (Luo et al. 2023,
arXiv:2310.04378; LCM-LoRA arXiv:2311.05556) as standardized by the
diffusers LCMScheduler, so a distilled adapter here behaves like an
LCM-LoRA adapter does there:

- boundary-condition scalings ``c_skip/c_out`` with sigma_data=0.5 and a
  x10 timestep scaling (discrete variant);
- consistency function f(x_t, t) = c_skip(t) x_t + c_out(t) x0_hat(x_t, t)
  built on the epsilon-parametrized UNet;
- sampling grid = every k-th point of the 50-point DDIM "training" grid,
  fresh noise re-injected between steps.

TPU-first: everything is closed-form tables / pure functions; the sampling
loop in ``pipeline.generate.denoise(scheduler="lcm")`` is one ``lax.scan``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import DDIMConfig
from audioldm_tpu.models.scheduler import DDIMSchedule

SIGMA_DATA = 0.5
TIMESTEP_SCALING = 10.0


def boundary_scalings(t: jnp.ndarray, timestep_scaling: float = TIMESTEP_SCALING):
    """``(c_skip, c_out)`` for the discrete boundary condition: at t=0 the
    consistency function is the identity (c_skip=1, c_out=0), so
    f(x_0, 0) = x_0 exactly — the self-consistency anchor."""
    scaled = t.astype(jnp.float32) * timestep_scaling
    c_skip = SIGMA_DATA**2 / (scaled**2 + SIGMA_DATA**2)
    c_out = scaled / jnp.sqrt(scaled**2 + SIGMA_DATA**2)
    return c_skip, c_out


def ddim_training_grid(cfg: DDIMConfig, num_ddim_steps: int = 50) -> np.ndarray:
    """The ascending N-point grid the teacher trajectory is discretized on
    during distillation: ``(arange(1, N+1) * (T // N)) - 1``."""
    step_ratio = cfg.num_train_timesteps // num_ddim_steps
    return (np.arange(1, num_ddim_steps + 1) * step_ratio).astype(np.int32) - 1


def lcm_inference_timesteps(
    cfg: DDIMConfig, num_inference_steps: int, num_ddim_steps: int = 50
) -> np.ndarray:
    """Descending sampling grid: every k-th point of the training grid,
    largest first (k = N // S)."""
    if num_inference_steps > num_ddim_steps:
        raise ValueError(
            f"lcm steps {num_inference_steps} > training grid {num_ddim_steps}"
        )
    grid = ddim_training_grid(cfg, num_ddim_steps)
    skip = num_ddim_steps // num_inference_steps
    return grid[::-1][::skip][:num_inference_steps].copy()


def consistency_output(
    schedule: DDIMSchedule,
    eps_pred: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """f(x_t, t) = c_skip(t) x_t + c_out(t) x0_hat — the denoised estimate
    the student is trained to make self-consistent along the ODE."""
    acp = schedule.alphas_cumprod[t]
    shape = (-1,) + (1,) * (sample.ndim - 1)
    if jnp.ndim(t) == 0:
        sqrt_acp, sqrt_om = jnp.sqrt(acp), jnp.sqrt(1.0 - acp)
        c_skip, c_out = boundary_scalings(t)
    else:
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
        c_skip, c_out = boundary_scalings(t)
        c_skip, c_out = c_skip.reshape(shape), c_out.reshape(shape)
    pred_x0 = (sample - sqrt_om * eps_pred) / sqrt_acp
    return c_skip * sample + c_out * pred_x0
