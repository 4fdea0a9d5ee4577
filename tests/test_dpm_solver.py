"""DPM-Solver++ 2M tests: exact-eps invariant (the update must stay on the
trajectory alpha_t x0 + sigma_t eps when the model predicts the true noise)
and pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import DDIMConfig
from audioldm_tpu.models.dpm_solver import dpm_solver_step, solver_timesteps
from audioldm_tpu.models.scheduler import add_noise, make_schedule
import pytest

def _acp(cfg):
    betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps) ** 2
    return np.cumprod(1 - betas)


@pytest.mark.quick
def test_exact_eps_stays_on_trajectory(rng):
    cfg = DDIMConfig()
    sched = make_schedule(cfg)
    acp = _acp(cfg)
    x0 = rng.standard_normal((1, 8)).astype(np.float32)
    eps = rng.standard_normal((1, 8)).astype(np.float32)
    ts = solver_timesteps(cfg.num_train_timesteps, 10, cfg.steps_offset)
    step_ratio = cfg.num_train_timesteps // 10

    x = jnp.asarray(add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([ts[0]])))
    prev_x0 = jnp.zeros_like(x)
    prev_lam = jnp.asarray(0.0)
    for i, t in enumerate(ts):
        prev_t = ts[i + 1] if i + 1 < len(ts) else int(t) - step_ratio
        x, prev_x0, prev_lam = dpm_solver_step(
            sched, jnp.asarray(eps), jnp.asarray(int(t)), jnp.asarray(prev_t), x,
            prev_x0, prev_lam, is_first=jnp.asarray(i == 0),
        )
        # with exact eps the 2M update is exact at every step
        a = np.sqrt(acp[prev_t]) if prev_t >= 0 else np.sqrt(acp[0])
        s = np.sqrt(1 - acp[prev_t]) if prev_t >= 0 else np.sqrt(1 - acp[0])
        expected = a * x0 + s * eps
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)


def test_pipeline_with_dpm_scheduler():
    from audioldm_tpu.pipeline import generate as _generate
    from audioldm_tpu.pipeline.generate import random_modules
    from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC, _prompts

    modules = random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )
    ids, mask, u_ids, u_mask = _prompts()
    kw = dict(num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.0)
    dpm = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0), scheduler="dpm++", **kw)
    ddim = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0), scheduler="ddim", **kw)
    assert dpm.shape == (1, 160)
    assert np.all(np.isfinite(np.asarray(dpm)))
    # different solver -> different (but finite) output
    assert np.max(np.abs(np.asarray(dpm) - np.asarray(ddim))) > 1e-7
    # deterministic
    dpm2 = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0), scheduler="dpm++", **kw)
    np.testing.assert_array_equal(np.asarray(dpm), np.asarray(dpm2))
