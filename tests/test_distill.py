"""LCM-LoRA consistency-distillation tests: boundary condition, sampling
grid, EMA target update, loss descent on a tiny model, the lcm sampler in
the pipeline, and DP-mesh equivalence of the distill step.

Quality (does a distilled adapter sound right?) needs real audioldm-s
weights — environment-blocked (NOTES.md); these tests pin the MECHANICS."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audioldm_tpu.config import DDIMConfig, LoRAConfig
from audioldm_tpu.lora import init_lora
from audioldm_tpu.models.lcm import (
    boundary_scalings,
    consistency_output,
    ddim_training_grid,
    lcm_inference_timesteps,
)
from audioldm_tpu.models.scheduler import make_schedule
from audioldm_tpu.pipeline.generate import generate, random_modules
from audioldm_tpu.train.distill import (
    distill_loss_fn,
    init_distill_state,
    make_distill_step,
)
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC
from tests.test_trainer import _batch


@pytest.fixture(scope="module")
def modules():
    return random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )


def _distill_batch(b=2):
    batch = dict(_batch(b=b))
    batch["uncond_ids"] = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    batch["uncond_mask"] = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    return batch


def test_boundary_condition_identity_at_zero():
    """At t=0 the consistency function must be the identity: c_skip=1,
    c_out=0 — the anchor that makes f(x_0, 0) = x_0."""
    c_skip, c_out = boundary_scalings(jnp.asarray(0))
    assert float(c_skip) == pytest.approx(1.0)
    assert float(c_out) == pytest.approx(0.0)
    # monotone: later timesteps lean on the x0 estimate, not the sample
    ts = jnp.asarray([0, 10, 100, 999])
    cs, co = boundary_scalings(ts)
    assert np.all(np.diff(np.asarray(cs)) < 0)
    assert np.all(np.diff(np.asarray(co)) > 0)

    sched = make_schedule(DDIMConfig())
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 2)), jnp.float32)
    eps = jnp.ones_like(x)
    out = consistency_output(sched, eps, jnp.asarray([0, 0]), x)
    # at t=0, alphas_cumprod[0] ~= 1 so x0_hat ~= x and c_skip=1 anyway
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_lcm_inference_grid():
    cfg = DDIMConfig()
    grid = ddim_training_grid(cfg, 50)
    assert grid.shape == (50,) and grid[-1] == cfg.num_train_timesteps - 1
    for s in (1, 2, 4, 8):
        ts = lcm_inference_timesteps(cfg, s, 50)
        assert len(ts) == s
        assert ts[0] == cfg.num_train_timesteps - 1  # always start at the top
        assert np.all(np.diff(ts) < 0)  # strictly descending
        assert set(ts.tolist()) <= set(grid.tolist())  # on the training grid
    with pytest.raises(ValueError):
        lcm_inference_timesteps(cfg, 51, 50)


def test_distill_loss_finite_and_grads_reach_adapter(modules):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    batch = _distill_batch()
    loss, _ = distill_loss_fn(
        lora, lora, modules, batch, jax.random.PRNGKey(0), lcfg.scale, w=2.0
    )
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda l: distill_loss_fn(
            l, lora, modules, batch, jax.random.PRNGKey(0), lcfg.scale, w=2.0
        )[0]
    )(lora)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    b_grads = [v for p, v in flat if p[-1].key == "b"]
    assert b_grads and any(float(jnp.sum(jnp.abs(v))) > 0 for v in b_grads)


def test_distill_step_loss_descends_and_ema_tracks(modules):
    """30 steps on one fixed tiny batch: the consistency loss must drop, and
    the EMA adapter must satisfy ema' = d*ema + (1-d)*student' exactly."""
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = optax.adam(1e-3)
    state = init_distill_state(lora, opt)
    d = 0.9
    step = make_distill_step(modules, opt, lcfg, w=2.0, ema_decay=d)
    batch = _distill_batch()

    # one step: EMA identity check (ema0 == lora0 at init)
    s1, m1 = step(state, batch, jax.random.PRNGKey(0))
    want = jax.tree.map(lambda e, p: d * e + (1 - d) * p, state.ema_lora, s1.lora)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(s1.ema_lora)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    losses = [float(m1["loss"])]
    for i in range(1, 30):
        # fixed batch, fixed rng -> a pure optimization problem; descent is
        # deterministic
        s1, m = step(s1, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9
    assert int(s1.step) == 30


@pytest.mark.parametrize("steps", [1, 4])
def test_lcm_sampler_runs(modules, steps):
    """scheduler='lcm': S UNet evals, no CFG, finite bounded waveform."""
    ids = jnp.full((2, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((2, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    wav = generate(
        modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0),
        num_inference_steps=steps, audio_length_in_s=0.01,
        guidance_scale=2.0,  # ignored by lcm (baked in at distillation)
        scheduler="lcm",
    )
    assert wav.shape == (2, 160)
    assert np.all(np.isfinite(np.asarray(wav)))
    # different seeds -> different clips (noise actually flows)
    wav2 = generate(
        modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(1),
        num_inference_steps=steps, audio_length_in_s=0.01,
        guidance_scale=2.0, scheduler="lcm",
    )
    assert float(jnp.max(jnp.abs(wav - wav2))) > 1e-6


def test_lcm_sampler_uses_lora(modules):
    """The distilled adapter must change the lcm sample (lora flows into the
    consistency function)."""
    lcfg = LoRAConfig(r=2, lora_alpha=4)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora
    )
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=4, audio_length_in_s=0.01, scheduler="lcm")
    base = generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0), **kw)
    adapted = generate(
        modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0),
        lora=lora, lora_scale=lcfg.scale, **kw,
    )
    assert float(jnp.max(jnp.abs(base - adapted))) > 1e-6


def test_distill_step_dp_mesh_matches_single(modules):
    """The distill step under a dp mesh must produce the same adapter and
    loss as single-device (XLA psum == serial mean)."""
    from audioldm_tpu.parallel import make_mesh

    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = optax.adam(1e-3)
    batch = _distill_batch(b=8)
    rng = jax.random.PRNGKey(0)

    s_single, m_single = make_distill_step(modules, opt, lcfg, w=2.0)(
        init_distill_state(lora, opt), batch, rng
    )
    mesh = make_mesh(8)
    s_mesh, m_mesh = make_distill_step(modules, opt, lcfg, mesh=mesh, w=2.0)(
        init_distill_state(lora, opt), batch, rng
    )
    assert float(m_single["loss"]) == pytest.approx(float(m_mesh["loss"]), abs=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_single.lora)[0],
        jax.tree_util.tree_flatten_with_path(s_mesh.lora)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
