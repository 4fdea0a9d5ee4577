"""Trainer tests: loss math, optimizer schedule, DP-mesh gradient
equivalence vs single device (SURVEY.md §4 item 3), checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audioldm_tpu.config import DDIMConfig, LoRAConfig, TrainConfig
from audioldm_tpu.lora import init_lora
from audioldm_tpu.parallel import make_mesh
from audioldm_tpu.pipeline.generate import random_modules
from audioldm_tpu.train import (
    TrainState,
    Trainer,
    lora_loss_fn,
    make_optimizer,
    make_train_step,
)
from audioldm_tpu.train.trainer import init_train_state
from tests.test_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE, TINY_VOC


@pytest.fixture(scope="module")
def modules():
    return random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )


def _batch(b=8, t=8, f=8, l=6):
    rng = np.random.default_rng(0)
    return {
        "log_mel_spec": jnp.asarray(rng.standard_normal((b, t, f, 1)).astype(np.float32)),
        "input_ids": jnp.full((b, l), 5, jnp.int32).at[:, 0].set(0),
        "attention_mask": jnp.ones((b, l), jnp.int32),
    }


def test_loss_is_finite_and_grads_only_on_lora(modules):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    loss, metrics = lora_loss_fn(lora, modules, _batch(b=2), jax.random.PRNGKey(0), lcfg.scale)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda l: lora_loss_fn(l, modules, _batch(b=2), jax.random.PRNGKey(0), lcfg.scale)[0])(lora)
    # B matrices are zero-init; their grads flow through A-projections -> the
    # "b" leaves must receive nonzero gradient.
    b_leaves = [v["b"] for v in jax.tree_util.tree_leaves(
        jax.tree.map(lambda x: x, g), is_leaf=lambda x: isinstance(x, dict) and "b" in x) if isinstance(v, dict)]
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    b_grads = [v for p, v in flat if p[-1].key == "b"]
    assert b_grads and any(float(jnp.sum(jnp.abs(v))) > 0 for v in b_grads)


def test_polynomial_schedule_matches_reference():
    """diffusers get_scheduler('polynomial', lr_end=1e-7, power=1.0)
    semantics (train_audioldm_lora.py:438-443)."""
    cfg = TrainConfig(learning_rate=1e-5, max_train_steps=100, lr_warmup_steps=0)
    opt = make_optimizer(cfg)
    sched = optax.polynomial_schedule(1e-5, 1e-7, 1.0, 100)
    assert abs(float(sched(0)) - 1e-5) < 1e-12
    assert abs(float(sched(50)) - ((1e-5 - 1e-7) * 0.5 + 1e-7)) < 1e-12
    assert abs(float(sched(100)) - 1e-7) < 1e-12


def test_warmup_schedule_decays_immediately_after_warmup():
    """With warmup, decay must start right AT lr_warmup_steps and hit lr_end
    by max_train_steps (join_schedules already shifts the step — no double
    offset holding the LR flat)."""
    from audioldm_tpu.train.trainer import make_lr_schedule

    W, M, peak = 10, 100, 1e-5
    sched = make_lr_schedule(TrainConfig(learning_rate=peak, max_train_steps=M, lr_warmup_steps=W))
    assert abs(float(sched(W)) - peak) < 1e-12
    # halfway through the decay span
    mid = W + (M - W) // 2
    want = (peak - 1e-7) * (1 - (mid - W) / (M - W)) + 1e-7
    assert abs(float(sched(mid)) - want) < 1e-12
    assert abs(float(sched(M)) - 1e-7) < 1e-12  # reaches lr_end ON time
    assert float(sched(W + 1)) < peak  # decaying immediately, not flat


def test_train_step_updates_lora_and_runs(modules):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3, max_train_steps=10)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = make_optimizer(tcfg)
    state = init_train_state(lora, opt)
    step = make_train_step(modules, opt, lcfg)
    state2, m = step(state, _batch(b=2), jax.random.PRNGKey(0))
    assert int(state2.step) == 1
    assert np.isfinite(float(m["loss"]))
    # adapters moved
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(state2.lora))]
    assert max(diffs) > 0


def test_dp_mesh_matches_single_device(modules):
    """8-way DP step must produce the same adapter update as single-device on
    the same global batch — validates the psum the sharded jit emits."""
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = make_optimizer(tcfg)
    batch = _batch(b=8)
    rng = jax.random.PRNGKey(0)

    state_a = init_train_state(lora, opt)
    single = make_train_step(modules, opt, lcfg)
    out_a, m_a = single(state_a, batch, rng)

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    state_b = init_train_state(lora, opt)
    from audioldm_tpu.parallel import shard_batch

    sharded = shard_batch(mesh, batch)
    dp = make_train_step(modules, opt, lcfg, mesh=mesh)
    out_b, m_b = dp(state_b, sharded, rng)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_a.lora), jax.tree.leaves(out_b.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_accum_under_mesh_matches_single_device(modules):
    """grad_accum=2 over an 8-way dp mesh must equal the same accumulated
    step on one device — the accum axis is a sequential scan, only the micro
    axis shards (P(None, 'dp'))."""
    from audioldm_tpu.parallel import shard_batch
    from audioldm_tpu.train.trainer import to_accum_layout

    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = make_optimizer(tcfg)
    batch = to_accum_layout(_batch(b=16), accum=2)  # [2, 8, ...]
    rng = jax.random.PRNGKey(0)

    single = make_train_step(modules, opt, lcfg, grad_accum=2)
    out_a, m_a = single(init_train_state(lora, opt), batch, rng)

    mesh = make_mesh(8)
    sharded = shard_batch(mesh, batch, batch_axis=1)
    dp = make_train_step(modules, opt, lcfg, mesh=mesh, grad_accum=2)
    out_b, m_b = dp(init_train_state(lora, opt), sharded, rng)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(out_a.lora), jax.tree.leaves(out_b.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_to_accum_layout():
    from audioldm_tpu.train.trainer import to_accum_layout

    batch = {"x": np.arange(12).reshape(6, 2), "s": 3.0}
    out = to_accum_layout(batch, 3)
    assert out["x"].shape == (3, 2, 2) and out["s"] == 3.0
    np.testing.assert_array_equal(out["x"][0], [[0, 1], [2, 3]])
    with pytest.raises(ValueError):
        to_accum_layout({"x": np.zeros((5, 2))}, 2)


def test_fit_reshapes_for_grad_accum(modules, tmp_path):
    """Trainer.fit consumes FLAT [B, ...] batches even when
    gradient_accumulation_steps > 1 (it reshapes internally)."""
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3, max_train_steps=2,
                       checkpointing_steps=100, gradient_accumulation_steps=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    trainer = Trainer(modules, lcfg, tcfg, str(tmp_path))
    state = init_train_state(lora, trainer.optimizer)
    data = iter([_batch(b=4), _batch(b=4)])
    state, metrics = trainer.fit(state, data, jax.random.PRNGKey(0))
    assert int(state.step) == 2 and np.isfinite(float(metrics["loss"]))


def test_fit_profile_trace_capture(modules, tmp_path):
    """profile_dir captures a jax.profiler xplane trace over the configured
    step window (SURVEY.md §5 tracing/profiling)."""
    import glob

    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3, max_train_steps=4, checkpointing_steps=100)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    trainer = Trainer(modules, lcfg, tcfg, str(tmp_path))
    state = init_train_state(lora, trainer.optimizer)
    data = iter([_batch(b=2) for _ in range(4)])
    trace_dir = str(tmp_path / "trace")
    state, _ = trainer.fit(state, data, jax.random.PRNGKey(0),
                           profile_dir=trace_dir, profile_steps=(1, 3))
    assert int(state.step) == 4
    assert glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)


def test_checkpoint_save_restore_roundtrip(modules, tmp_path):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3, checkpointing_steps=1)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    trainer = Trainer(modules, lcfg, tcfg, str(tmp_path))
    state = init_train_state(lora, trainer.optimizer)
    state, _ = trainer.step_fn(state, _batch(b=2), jax.random.PRNGKey(0)), None
    state = state[0]
    trainer.save(state)

    fresh = init_train_state(init_lora(jax.random.PRNGKey(9), modules.unet, lcfg), trainer.optimizer)
    restored = trainer.restore(fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.lora), jax.tree.leaves(restored.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # PEFT export written alongside
    assert (tmp_path / f"checkpoint-{int(state.step)}" / "model.safetensors").exists()


def test_fit_with_validation_hook(modules, tmp_path):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=1e-3, checkpointing_steps=100)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    trainer = Trainer(modules, lcfg, tcfg, str(tmp_path))
    state = init_train_state(lora, trainer.optimizer)

    calls = []

    def validate(st, step):
        calls.append(step)
        return {"val_metric": 1.0}

    def batches():
        while True:
            yield _batch(b=2)

    state, metrics = trainer.fit(state, batches(), jax.random.PRNGKey(0),
                                 max_steps=4, validate_every=2, validate_fn=validate)
    assert int(state.step) == 4
    assert calls == [2, 4]


def test_remat_matches_standard_grads(modules):
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    batch = _batch(b=2)
    rng = jax.random.PRNGKey(0)
    g1 = jax.grad(lambda l: lora_loss_fn(l, modules, batch, rng, lcfg.scale)[0])(lora)
    g2 = jax.grad(lambda l: lora_loss_fn(l, modules, batch, rng, lcfg.scale, remat=True)[0])(lora)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_training_reduces_loss_on_fixed_objective(modules):
    """End-to-end learning signal: with a frozen (batch, rng) the adapter
    must fit the fixed noise target and drive the loss down."""
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(learning_rate=3e-2, max_train_steps=1000)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    opt = make_optimizer(tcfg)
    state = init_train_state(lora, opt)
    step = make_train_step(modules, opt, lcfg)
    batch = _batch(b=2)
    rng = jax.random.PRNGKey(7)  # FIXED: same latents/noise/t every step
    losses = []
    for _ in range(25):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[::6]


def test_bf16_trainer_loss_matches_fp32(modules, tmp_path):
    """Trainer(dtype=bf16) casts the frozen towers to bf16 storage; the loss
    must match the fp32 trainer within mixed-precision tolerance (VERDICT
    round-2 item 9 'done' criterion)."""
    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(max_train_steps=10, checkpointing_steps=1000)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    batch = _batch(b=4)
    key = jax.random.PRNGKey(3)

    tr32 = Trainer(modules, lcfg, tcfg, str(tmp_path / "fp32"), dtype=jnp.float32)
    tr16 = Trainer(modules, lcfg, tcfg, str(tmp_path / "bf16"), dtype=jnp.bfloat16)
    # frozen towers really are bf16 in the bf16 trainer
    assert jax.tree.leaves(tr16.modules.unet)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(tr16.modules.text_encoder)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(tr32.modules.unet)[0].dtype == jnp.float32

    s32 = init_train_state(lora, tr32.optimizer)
    s16 = init_train_state(lora, tr16.optimizer)
    _, m32 = tr32.step_fn(s32, batch, key)
    _, m16 = tr16.step_fn(s16, batch, key)
    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05  # same objective within bf16 drift


def test_lr_logged_matches_optimizer_schedule(modules, tmp_path):
    """fit() must log the lr from the SAME schedule make_optimizer applies,
    including the warmup join (VERDICT weak #3)."""
    from audioldm_tpu.train.trainer import make_lr_schedule
    from audioldm_tpu.utils import MetricLogger
    import json, os

    lcfg = LoRAConfig(r=2, lora_alpha=2)
    tcfg = TrainConfig(max_train_steps=6, lr_warmup_steps=3, learning_rate=1e-3,
                       checkpointing_steps=1000)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, lcfg)
    out = str(tmp_path / "run")
    logger = MetricLogger(out)
    tr = Trainer(modules, lcfg, tcfg, out, logger=logger)
    state = init_train_state(lora, tr.optimizer)
    batches = iter([_batch(b=2)] * 6)
    tr.fit(state, batches, jax.random.PRNGKey(0), max_steps=6, log_every=1)
    logger.close()

    sched = make_lr_schedule(tcfg)
    recs = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    # The update that produced state.step == N ran at optax count N-1
    # (scale_by_schedule evaluates the schedule BEFORE incrementing), so the
    # logged lr must be the schedule at step-1 — the EXACT value applied.
    for r in recs:
        if "lr" in r:
            assert abs(r["lr"] - float(sched(r["step"] - 1))) < 1e-12
    # warmup exactness: the first update applies sched(0) == 0.0 (linear
    # warmup from zero), not the decayed peak and not sched(1)
    lr1 = next(r["lr"] for r in recs if r.get("step") == 1 and "lr" in r)
    assert lr1 == float(sched(0)) == 0.0
    # and the first post-warmup update (step warmup+1) applies the peak lr
    lrp = next(r["lr"] for r in recs if r.get("step") == 4 and "lr" in r)
    assert lrp == float(sched(3)) and abs(lrp - 1e-3) < 1e-9
