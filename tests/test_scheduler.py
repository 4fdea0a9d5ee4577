"""DDIM schedule tests (reference behavior: diffusers DDIMScheduler as used
at train_audioldm_lora.py:503-504 and in the sampling loop, SURVEY.md §3.2).
The expected values are derived independently from the DDIM paper formulas in
float64 numpy inside the tests."""

import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import DDIMConfig
from audioldm_tpu.models.scheduler import (
    add_noise,
    ddim_step,
    inference_timesteps,
    make_schedule,
)
import pytest

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def _np_alphas_cumprod(cfg: DDIMConfig):
    betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps) ** 2
    return np.cumprod(1 - betas)


def test_alphas_cumprod_table():
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    expected = _np_alphas_cumprod(cfg)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), expected, rtol=1e-6)
    # set_alpha_to_one=False -> final alpha = alphas_cumprod[0]
    np.testing.assert_allclose(float(sched.final_alpha_cumprod), expected[0], rtol=1e-6)


def test_leading_timesteps_50():
    cfg = DDIMConfig()
    ts = inference_timesteps(cfg, 50)
    assert len(ts) == 50
    assert ts[0] == 980 + cfg.steps_offset
    assert ts[-1] == 0 + cfg.steps_offset
    assert np.all(np.diff(ts) == -20)


def test_add_noise_formula(rng):
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    acp = _np_alphas_cumprod(cfg)
    x0 = rng.standard_normal((2, 4, 3, 2)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 3, 2)).astype(np.float32)
    t = np.array([10, 500])
    out = np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t)))
    for b in range(2):
        expected = np.sqrt(acp[t[b]]) * x0[b] + np.sqrt(1 - acp[t[b]]) * eps[b]
        np.testing.assert_allclose(out[b], expected, atol=1e-5)


def test_ddim_step_formula(rng):
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    acp = _np_alphas_cumprod(cfg)
    x = rng.standard_normal((1, 4, 3, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 4, 3, 2)).astype(np.float32)
    t, prev_t = 981, 961
    out = np.asarray(
        ddim_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(prev_t), jnp.asarray(x))
    )
    # DDIM eta=0 update from the paper:
    a_t, a_p = acp[t], acp[prev_t]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_ddim_step_final_uses_final_alpha(rng):
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    acp = _np_alphas_cumprod(cfg)
    x = rng.standard_normal((1, 4)).astype(np.float32)
    eps = rng.standard_normal((1, 4)).astype(np.float32)
    t, prev_t = 1, -19  # last step of a 50-step schedule
    out = np.asarray(
        ddim_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(prev_t), jnp.asarray(x))
    )
    a_t, a_p = acp[t], acp[0]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_perfect_eps_recovers_x0(rng):
    """Sampling with the exact forward noise as the model prediction must
    walk the trajectory back to (nearly) x0."""
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    x0 = rng.standard_normal((1, 8)).astype(np.float32)
    eps = rng.standard_normal((1, 8)).astype(np.float32)
    ts = inference_timesteps(cfg, 10)
    x = np.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([ts[0]])))
    x = jnp.asarray(x)
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else t - cfg.num_train_timesteps // 10
        x = ddim_step(sched, jnp.asarray(eps), jnp.asarray(t), jnp.asarray(prev_t), x)
    # final alpha_cumprod[0] ~ 0.9985: residual noise sqrt(1-acp0)
    acp0 = _np_alphas_cumprod(cfg)[0]
    expected = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)
