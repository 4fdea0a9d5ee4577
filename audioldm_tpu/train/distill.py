"""LCM-LoRA consistency distillation — collapse the 50-step CFG teacher
into a 1-8 step student adapter.

A capability beyond the reference (SURVEY.md §6 lists no sampler work; the
reference samples 50 DDIM steps, script/inference/generate_audio.py:49).
PERF.md's roofline shows the remaining single-chip lever is FEWER FLOPs,
not hotter kernels — distillation is that lever: an LCM student samples in
4 steps with no CFG batch-doubling (8 UNet evals -> 4 at half batch ≈ 25x
fewer UNet FLOPs than 50-step CFG DDIM).

Method (public LCM formulation: Luo et al. 2023 arXiv:2310.04378, LCM-LoRA
arXiv:2311.05556; target-network form of the consistency loss):

  1. sample a grid index n; x at grid[n] via forward noising;
  2. student (base UNet + trainable LoRA) predicts eps at grid[n] ->
     consistency output f_theta via c_skip/c_out boundary scalings;
  3. frozen teacher (base UNet, NO adapter) takes ONE CFG-guided DDIM step
     grid[n] -> grid[n-1];
  4. target network (EMA of the student adapter) predicts the consistency
     output at the stepped-back point — stop-gradient;
  5. huber loss between student and target outputs. At t=0 the boundary
     scalings force f = identity, anchoring the whole trajectory to x_0.

The distilled adapter is a regular LoRA pytree: it exports through the
existing PEFT bridge and serves through ``generate(..., lora=...,
scheduler="lcm")`` or merged via ``merge_lora``.

Quality validation requires real ``cvssp/audioldm-s-full-v2`` weights
(environment-blocked, NOTES.md); the mechanics — loss descent, EMA update,
boundary condition, sampler — are tested on tiny models in
``tests/test_distill.py``.

TPU-first: one jit-compiled step; teacher + target evals live inside the
same program as the student fwd/bwd (XLA overlaps them freely); the module
bundle travels as device buffers (never HLO constants).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm_tpu.config import LoRAConfig
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.lcm import consistency_output, ddim_training_grid
from audioldm_tpu.models.scheduler import add_noise, make_schedule
from audioldm_tpu.models.unet import apply_unet
from audioldm_tpu.pipeline.generate import AudioLDMModules, encode_prompt


class DistillState(NamedTuple):
    lora: dict  # student adapter (trained)
    ema_lora: dict  # target-network adapter (EMA of student)
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def init_distill_state(lora: dict, optimizer: optax.GradientTransformation) -> DistillState:
    return DistillState(
        lora=lora,
        ema_lora=jax.tree.map(jnp.copy, lora),
        opt_state=optimizer.init(lora),
        step=jnp.asarray(0, jnp.int32),
    )


def distill_loss_fn(
    lora: dict,
    target_lora: dict,
    modules: AudioLDMModules,
    batch: dict,
    rng: jax.Array,
    lora_scale: float,
    w: Union[float, Sequence[float]] = 2.5,
    num_ddim_steps: int = 50,
    huber_c: float = 0.001,
    loss_type: str = "huber",
    dtype=jnp.float32,
    remat: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """One consistency-distillation loss. ``batch`` needs the training keys
    (``log_mel_spec`` NHWC, ``input_ids``/``attention_mask``) plus
    ``uncond_ids``/``uncond_mask`` ``[1, L]`` (tokenized negative prompt —
    the teacher's CFG needs both branches).

    ``w``: the guidance baked into the student. A float distills a single
    guidance scale; a (lo, hi) pair samples w ~ U[lo, hi] per example
    (LCM-LoRA's w-marginalized variant — the student has no w input)."""
    k_latent, k_noise, k_idx, k_w = jax.random.split(rng, 4)
    mel = batch["log_mel_spec"].astype(dtype)

    dist = vae_lib.encode(modules.vae, modules.vae_cfg, mel)
    latents = dist.sample(k_latent).astype(jnp.float32) * modules.vae_cfg.scaling_factor
    b = latents.shape[0]
    bshape = (-1,) + (1,) * (latents.ndim - 1)

    schedule = make_schedule(modules.ddim_cfg)
    grid = jnp.asarray(ddim_training_grid(modules.ddim_cfg, num_ddim_steps))
    topk = modules.ddim_cfg.num_train_timesteps // num_ddim_steps
    idx = jax.random.randint(k_idx, (b,), 0, len(grid))
    start_t = grid[idx]
    prev_t = jnp.maximum(start_t - topk, 0)

    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    noisy = add_noise(schedule, latents, noise, start_t)

    cond = encode_prompt(modules, batch["input_ids"], batch["attention_mask"])
    uncond = encode_prompt(modules, batch["uncond_ids"], batch["uncond_mask"])
    uncond = jnp.broadcast_to(uncond[:1], cond.shape)

    if isinstance(w, (tuple, list)):
        w_b = jax.random.uniform(k_w, (b,), jnp.float32, w[0], w[1]).reshape(bshape)
    else:
        w_b = jnp.asarray(float(w), jnp.float32)

    def unet_eps(x, t, emb, adapter):
        return apply_unet(
            modules.unet, modules.unet_cfg, x.astype(dtype), t,
            class_labels=emb.astype(dtype), lora=adapter, lora_scale=lora_scale,
        ).astype(jnp.float32)

    # -- student ------------------------------------------------------------
    student_fwd = jax.checkpoint(unet_eps) if remat else unet_eps
    eps_student = student_fwd(noisy, start_t, cond, lora)
    model_pred = consistency_output(schedule, eps_student, start_t, noisy)

    # -- teacher: one CFG-guided DDIM step grid[n] -> grid[n-1] -------------
    acp_t = schedule.alphas_cumprod[start_t].reshape(bshape)
    sqrt_acp_t, sqrt_om_t = jnp.sqrt(acp_t), jnp.sqrt(1.0 - acp_t)
    eps_c = unet_eps(noisy, start_t, cond, None)
    eps_u = unet_eps(noisy, start_t, uncond, None)
    x0_c = (noisy - sqrt_om_t * eps_c) / sqrt_acp_t
    x0_u = (noisy - sqrt_om_t * eps_u) / sqrt_acp_t
    x0_g = x0_c + w_b * (x0_c - x0_u)
    eps_g = eps_c + w_b * (eps_c - eps_u)
    acp_prev = schedule.alphas_cumprod[prev_t].reshape(bshape)
    x_prev = jnp.sqrt(acp_prev) * x0_g + jnp.sqrt(1.0 - acp_prev) * eps_g

    # -- target network (EMA adapter), stop-gradient ------------------------
    eps_target = unet_eps(x_prev, prev_t, cond, target_lora)
    target = consistency_output(schedule, eps_target, prev_t, x_prev)
    target = jax.lax.stop_gradient(target)

    if loss_type == "huber":
        loss = jnp.mean(jnp.sqrt((model_pred - target) ** 2 + huber_c**2) - huber_c)
    elif loss_type == "l2":
        loss = jnp.mean((model_pred - target) ** 2)
    else:
        raise ValueError(f"unknown loss_type: {loss_type}")
    return loss, {"loss": loss}


def make_distill_step(
    modules: AudioLDMModules,
    optimizer: optax.GradientTransformation,
    lora_cfg: LoRAConfig,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    w: Union[float, Sequence[float]] = 2.5,
    num_ddim_steps: int = 50,
    huber_c: float = 0.001,
    loss_type: str = "huber",
    ema_decay: float = 0.95,
    remat: bool = False,
) -> Callable:
    """jit-compiled distillation step: student fwd/bwd + frozen-teacher CFG
    step + EMA-target eval in ONE program; adapter update then EMA update.
    Under a mesh the batch shards on ``dp`` with replicated adapters — XLA
    emits the gradient psum over ICI, exactly like ``make_train_step``."""

    def step_fn(mods: AudioLDMModules, state: DistillState, batch: dict, rng: jax.Array):
        def loss_for(lora):
            return distill_loss_fn(
                lora, state.ema_lora, mods, batch, rng, lora_cfg.scale,
                w=w, num_ddim_steps=num_ddim_steps, huber_c=huber_c,
                loss_type=loss_type, dtype=dtype, remat=remat,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_for, has_aux=True)(state.lora)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        d = jnp.asarray(ema_decay, jnp.float32)
        ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state.ema_lora, lora)
        metrics["grad_norm"] = optax.global_norm(grads)
        return DistillState(lora, ema, opt_state, state.step + 1), metrics

    if mesh is None:
        jitted = jax.jit(step_fn)
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("dp"))
        # the [1, L] tokenized negative prompt is batch-size-independent ->
        # replicated; everything else shards on dp
        batch_sh = {
            "log_mel_spec": data, "input_ids": data, "attention_mask": data,
            "uncond_ids": repl, "uncond_mask": repl,
        }
        jitted = jax.jit(
            step_fn,
            in_shardings=(repl, repl, batch_sh, repl),
            out_shardings=(repl, repl),
        )

    def fn(state: DistillState, batch: dict, rng: jax.Array):
        # trace-time dp context: Pallas kernels shard over the batch instead
        # of falling back to GSPMD replication (kernels/sharding.py)
        from audioldm_tpu.kernels.sharding import kernel_dp_shard

        with kernel_dp_shard(mesh):
            return jitted(modules, state, batch, rng)

    return fn


def add_uncond_tokens(batch: dict, tokenizer, negative_prompt: str = "") -> dict:
    """Attach the tokenized negative prompt the teacher's CFG branch needs."""
    u = tokenizer([negative_prompt])
    out = dict(batch)
    out["uncond_ids"] = np.asarray(u["input_ids"], np.int32)
    out["uncond_mask"] = np.asarray(u["attention_mask"], np.int32)
    return out
