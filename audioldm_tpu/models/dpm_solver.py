"""DPM-Solver++ (2M) — a second, faster sampler.

The reference only exposes DDIM (SURVEY.md §2b); DPM-Solver++ reaches
comparable sample quality in ~20-25 steps instead of 50, roughly halving
generation latency at matched quality. Deterministic multistep solver in the
data-prediction form over the same alpha-cumprod tables; the whole loop is a
``lax.scan`` with (sample, prev_x0, prev_lambda) carry — drop-in for the
DDIM loop in pipeline.generate.

Math: Lu et al., "DPM-Solver++: Fast Solver for Guided Sampling of Diffusion
Probabilistic Models" (public algorithm, re-derived here for epsilon models).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.models.scheduler import DDIMSchedule


def _coeffs(schedule: DDIMSchedule, t: jnp.ndarray):
    acp = jnp.where(t >= 0, schedule.alphas_cumprod[jnp.maximum(t, 0)], schedule.final_alpha_cumprod)
    alpha = jnp.sqrt(acp)
    sigma = jnp.sqrt(1.0 - acp)
    lam = jnp.log(alpha) - jnp.log(jnp.maximum(sigma, 1e-20))
    return alpha, sigma, lam


def dpm_solver_step(
    schedule: DDIMSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    prev_t: jnp.ndarray,
    sample: jnp.ndarray,
    prev_x0: jnp.ndarray,
    prev_lambda: jnp.ndarray,
    is_first: jnp.ndarray,
):
    """One DPM-Solver++ 2M update. Returns (new_sample, x0, lambda_t).

    First step falls back to the 1st-order (DDIM-equivalent) update; later
    steps use the 2nd-order multistep correction."""
    alpha_t, sigma_t, lam_t = _coeffs(schedule, t)
    alpha_p, sigma_p, lam_p = _coeffs(schedule, prev_t)

    if schedule.prediction_type == "epsilon":
        x0 = (sample - sigma_t * model_output) / alpha_t
    elif schedule.prediction_type == "v_prediction":
        x0 = alpha_t * sample - sigma_t * model_output
    else:
        x0 = model_output

    h = lam_p - lam_t  # current step size (toward less noise, h > 0)
    h_last = lam_t - prev_lambda
    r = h_last / jnp.where(h == 0, 1.0, h)

    # 2M correction: D = (1 + 1/(2r)) x0 - (1/(2r)) x0_prev
    inv2r = 1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
    d_second = (1.0 + inv2r) * x0 - inv2r * prev_x0
    d = jnp.where(is_first, x0, d_second)

    new_sample = (sigma_p / sigma_t) * sample - alpha_p * (jnp.exp(-h) - 1.0) * d
    return new_sample, x0, lam_t


def solver_timesteps(num_train_timesteps: int, num_inference_steps: int, steps_offset: int = 1) -> np.ndarray:
    """Same 'leading' grid as the DDIM path for direct comparability."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int32)
    return ts + steps_offset
