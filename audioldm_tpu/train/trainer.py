"""LoRA fine-tuning trainer.

Reference behavior being matched (script/train/train_audioldm_lora.py:324-628):
- loss: ``mse(unet(add_noise(vae.encode(mel).sample()*sf, eps, t~U[0,1000)),
  t, class_labels=l2norm(text_embeds)), eps)`` — re-derived exactly at
  :495-549;
- optimizer: AdamW lr 1e-5, betas (0.9, 0.999), wd 1e-5, eps 1e-8 over LoRA
  params only (:396-403), polynomial decay, 0 warmup (:438-443), global-norm
  clip 1.0 (:559-561);
- data parallelism: per-device batch, loss mean over the global batch,
  gradient allreduce (:551,557) — here the ``dp`` mesh + sharded jit emit the
  psum over ICI;
- checkpointing every ``checkpointing_steps`` with PEFT-format adapter
  export (:574-578) — here orbax + export_peft_state_dict, **with resume**
  (the reference hardcodes resume off, :463-466 — intended behavior built).

TPU-first: one jit-compiled ``train_step`` (frozen submodels are closure
constants; only the adapter pytree and optimizer state are carried);
gradient-accumulation as a ``lax.scan`` over micro-batches when configured.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm_tpu.config import LoRAConfig, TrainConfig
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.scheduler import add_noise, make_schedule
from audioldm_tpu.models.unet import apply_unet
from audioldm_tpu.pipeline.generate import AudioLDMModules, encode_prompt


class TrainState(NamedTuple):
    lora: dict
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_lr_schedule(cfg: TrainConfig, lr_end: float = 1e-7, power: float = 1.0) -> optax.Schedule:
    """The single source of truth for the LR curve — used by both the
    optimizer and ``Trainer.fit``'s logging, so the logged lr always matches
    what optax applies (incl. the warmup join)."""
    # NB: join_schedules already feeds the post-boundary schedule a step
    # count shifted by the boundary, so the decay must start at
    # transition_begin=0 — a second offset would hold the LR flat for
    # another warmup-length span and overshoot max_train_steps.
    schedule = optax.polynomial_schedule(
        init_value=cfg.learning_rate,
        end_value=lr_end,
        power=power,
        transition_steps=max(cfg.max_train_steps - cfg.lr_warmup_steps, 1),
    )
    if cfg.lr_warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        schedule = optax.join_schedules([warmup, schedule], [cfg.lr_warmup_steps])
    return schedule


def make_optimizer(cfg: TrainConfig, lr_end: float = 1e-7, power: float = 1.0) -> optax.GradientTransformation:
    """AdamW + polynomial decay + global-norm clip, matching the reference's
    optimizer block (train_audioldm_lora.py:396-403,438-443,559-561)."""
    schedule = make_lr_schedule(cfg, lr_end, power)
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        ),
    )


def lora_loss_fn(
    lora: dict,
    modules: AudioLDMModules,
    batch: dict,
    rng: jax.Array,
    lora_scale: float,
    dtype=jnp.float32,
    remat: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """The reference training loss, re-derived stage for stage
    (train_audioldm_lora.py:495-549). ``batch``: ``log_mel_spec`` NHWC
    ``[B, T, F, 1]``, ``input_ids``/``attention_mask`` ``[B, L]``.

    ``remat=True`` rematerializes the UNet forward during backprop
    (jax.checkpoint) — trades FLOPs for HBM when batch sizes grow."""
    k_latent, k_noise, k_t = jax.random.split(rng, 3)
    mel = batch["log_mel_spec"].astype(dtype)

    dist = vae_lib.encode(modules.vae, modules.vae_cfg, mel)
    latents = dist.sample(k_latent).astype(jnp.float32) * modules.vae_cfg.scaling_factor

    noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
    schedule = make_schedule(modules.ddim_cfg)
    b = latents.shape[0]
    t = jax.random.randint(k_t, (b,), 0, modules.ddim_cfg.num_train_timesteps)
    noisy = add_noise(schedule, latents, noise, t)

    prompt = encode_prompt(modules, batch["input_ids"], batch["attention_mask"])

    def unet_fwd(lora_, noisy_, prompt_):
        return apply_unet(
            modules.unet, modules.unet_cfg, noisy_, t,
            class_labels=prompt_, lora=lora_, lora_scale=lora_scale,
        )

    if remat:
        unet_fwd = jax.checkpoint(unet_fwd)
    eps_pred = unet_fwd(lora, noisy.astype(dtype), prompt.astype(dtype))
    loss = jnp.mean((eps_pred.astype(jnp.float32) - noise) ** 2)
    return loss, {"loss": loss}


def make_train_step(
    modules: AudioLDMModules,
    optimizer: optax.GradientTransformation,
    lora_cfg: LoRAConfig,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
    grad_accum: int = 1,
    remat: bool = False,
) -> Callable:
    """Build the jit-compiled DP train step.

    With a mesh: batch is sharded on ``dp``, adapters/opt-state replicated;
    XLA inserts the gradient psum over ICI (the NCCL-allreduce equivalent,
    SURVEY.md §5 'Distributed communication backend')."""

    def step_fn(mods: AudioLDMModules, state: TrainState, batch: dict, rng: jax.Array):
        def loss_for(lora, mb, key):
            return lora_loss_fn(lora, mods, mb, key, lora_cfg.scale, dtype, remat=remat)

        if grad_accum == 1:
            (loss, metrics), grads = jax.value_and_grad(loss_for, has_aux=True)(state.lora, batch, rng)
        else:
            # micro-batch scan: batch leading dim is [accum, micro, ...]
            def body(carry, inp):
                g_acc, l_acc = carry
                mb, key = inp
                (l, _), g = jax.value_and_grad(loss_for, has_aux=True)(state.lora, mb, key)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l), None

            zero = jax.tree.map(jnp.zeros_like, state.lora)
            keys = jax.random.split(rng, grad_accum)
            (grads, loss), _ = jax.lax.scan(body, (zero, 0.0), (batch, keys))
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            loss = loss / grad_accum
            metrics = {"loss": loss}

        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(lora, opt_state, state.step + 1), metrics

    # NB: no buffer donation — the adapter/opt pytrees are tiny (rank-r A/B
    # matrices) and donation would invalidate caller-held references.
    # The frozen module bundle is a jit ARGUMENT (device buffers), never a
    # closure constant — keeps the compile payload small at full model size.
    if mesh is None:
        jitted = jax.jit(step_fn)
    else:
        repl = NamedSharding(mesh, P())
        # grad-accum batches are [accum, micro, ...]: the accumulation axis is
        # a sequential scan on every device, so only the MICRO axis is sharded
        data = NamedSharding(mesh, P("dp") if grad_accum == 1 else P(None, "dp"))
        jitted = jax.jit(
            step_fn,
            in_shardings=(repl, repl, data, repl),
            out_shardings=(repl, repl),
        )

    def fn(state: TrainState, batch: dict, rng: jax.Array):
        # Pallas kernels traced inside the dp context run under shard_map
        # over the batch (kernels/sharding.py) — without it GSPMD would
        # replicate the partitioning-rule-less pallas custom-calls across
        # the mesh. Read at trace time only; no-op when mesh is None.
        from audioldm_tpu.kernels.sharding import kernel_dp_shard

        with kernel_dp_shard(mesh):
            return jitted(modules, state, batch, rng)

    return fn


def to_accum_layout(batch: dict, accum: int) -> dict:
    """Reshape a flat ``[B, ...]`` host batch into the ``[accum, B/accum,
    ...]`` layout the grad-accum scan consumes (rank-0 leaves pass through)."""

    def reshape(x):
        if np.ndim(x) == 0:
            return x
        b = x.shape[0]
        if b % accum:
            raise ValueError(f"batch size {b} not divisible by grad_accum {accum}")
        return x.reshape(accum, b // accum, *x.shape[1:])

    return jax.tree.map(reshape, batch)


def init_train_state(lora: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(lora=lora, opt_state=optimizer.init(lora), step=jnp.asarray(0, jnp.int32))


class Trainer:
    """Host-side orchestration: data iteration, stepping, checkpoint/resume,
    metric logging — the reference's main() loop (train_audioldm_lora.py:
    478-613) minus its pathologies, with true resume."""

    def __init__(
        self,
        modules: AudioLDMModules,
        lora_cfg: LoRAConfig,
        train_cfg: TrainConfig,
        output_dir: str,
        mesh: Optional[Mesh] = None,
        dtype=jnp.float32,
        logger=None,
        remat: bool = False,
        debug_nans: bool = False,
    ):
        if dtype == jnp.bfloat16:
            # cast the FROZEN submodels to bf16 storage once (MXU fast path;
            # LoRA adapters + optimizer state stay fp32) — the text encoder
            # alone is a 512-token RoBERTa forward per step in fp32 otherwise
            modules = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, modules)
        self.modules = modules
        self.lora_cfg = lora_cfg
        self.train_cfg = train_cfg
        self.output_dir = output_dir
        self.mesh = mesh
        if debug_nans:
            # sanitizer equivalent (SURVEY.md §5: the reference has none);
            # aborts on the first NaN-producing op in CI/debug runs
            jax.config.update("jax_debug_nans", True)
        self.optimizer = make_optimizer(train_cfg)
        self.step_fn = make_train_step(
            modules, self.optimizer, lora_cfg, mesh=mesh, dtype=dtype,
            grad_accum=train_cfg.gradient_accumulation_steps, remat=remat,
        )
        self.logger = logger
        self._ckpt_mgr = None

    # -- checkpointing ------------------------------------------------------
    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.output_dir, "checkpoints")),
                options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
            )
        return self._ckpt_mgr

    def save(self, state: TrainState):
        import orbax.checkpoint as ocp

        step = int(state.step)
        self._manager().save(
            step,
            args=ocp.args.Composite(
                lora=ocp.args.StandardSave(state.lora),
                opt_state=ocp.args.StandardSave(state.opt_state),
            ),
        )
        self._manager().wait_until_finished()
        # PEFT-format safetensors export alongside, loadable by the
        # reference's torch stack (train_audioldm_lora.py:577-578 intent).
        from safetensors.numpy import save_file

        from audioldm_tpu.lora import export_peft_state_dict

        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        os.makedirs(path, exist_ok=True)
        sd = {k: np.asarray(v) for k, v in export_peft_state_dict(jax.device_get(state.lora)).items()}
        save_file(sd, os.path.join(path, "model.safetensors"))

    def restore(self, state: TrainState) -> TrainState:
        """Resume from the latest checkpoint if one exists."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        latest = mgr.latest_step()
        if latest is None:
            return state
        restored = mgr.restore(
            latest,
            args=ocp.args.Composite(
                lora=ocp.args.StandardRestore(jax.device_get(state.lora)),
                opt_state=ocp.args.StandardRestore(jax.device_get(state.opt_state)),
            ),
        )
        return TrainState(
            lora=jax.tree.map(jnp.asarray, restored["lora"]),
            opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
            step=jnp.asarray(latest, jnp.int32),
        )

    # -- loop ---------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        data_iter,
        rng: jax.Array,
        max_steps: Optional[int] = None,
        validate_every: Optional[int] = None,
        validate_fn=None,
        log_every: int = 1,
        steps_per_epoch: Optional[int] = None,
        num_epochs: Optional[int] = None,
        validate_every_epochs: Optional[int] = None,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (2, 5),
    ):
        """Step loop with checkpointing and optional periodic validation.

        The reference trains ``num_train_epochs`` epochs and runs
        ``log_validation`` every ``validation_epochs`` epochs
        (train_audioldm_lora.py:478-613,597-607). Pass ``steps_per_epoch`` (+
        ``num_epochs``/``validate_every_epochs``) for those epoch semantics;
        ``max_steps``/``validate_every`` remain as step-cadence equivalents.
        ``validate_fn(state, step)`` is the harness hook (e.g. a closure over
        train.validation.log_validation).

        Observability is off the hot path: loss accumulates as device scalars
        and host fetches happen only every ``log_every`` steps, so the
        device->host sync (~30 ms on a tunneled backend, PERF.md) is amortized.

        ``profile_dir`` captures a jax.profiler device trace (TensorBoard/
        xprof-viewable) over steps ``[profile_steps[0], profile_steps[1])`` —
        past the compile step, so the trace shows steady-state device work
        (SURVEY.md §5 tracing/profiling; the reference has none).
        """
        if steps_per_epoch:
            if num_epochs and max_steps is None:
                # the reference loops epochs but caps at max_train_steps
                # (train_audioldm_lora.py:478,568)
                max_steps = min(num_epochs * steps_per_epoch, self.train_cfg.max_train_steps)
            if validate_every_epochs and validate_every is None:
                validate_every = validate_every_epochs * steps_per_epoch
        max_steps = max_steps or self.train_cfg.max_train_steps
        metrics = {}
        total_loss = jnp.asarray(0.0, jnp.float32)  # device-side accumulator
        total_steps = 0
        lr_sched = make_lr_schedule(self.train_cfg)
        profiling = False
        while int(state.step) < max_steps:
            if profile_dir is not None:
                done = total_steps  # steps completed this fit() call
                if not profiling and done == profile_steps[0]:
                    jax.block_until_ready(state.lora)
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                elif profiling and done >= profile_steps[1]:
                    jax.block_until_ready(state.lora)
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None
            batch = next(data_iter, None)
            if batch is None:
                break
            rng, key = jax.random.split(rng)
            accum = self.train_cfg.gradient_accumulation_steps
            if accum > 1:
                batch = to_accum_layout(batch, accum)
            if self.mesh is not None:
                from audioldm_tpu.parallel import shard_batch

                batch = shard_batch(self.mesh, batch, batch_axis=1 if accum > 1 else 0)
            state, metrics = self.step_fn(state, batch, key)
            step = int(state.step)
            total_loss = total_loss + metrics["loss"]
            total_steps += 1
            if self.logger is not None and step % max(log_every, 1) == 0:
                # metric names mirror the reference's wandb keys
                # (train_audioldm_lora.py:570,583-591); lr read from the SAME
                # schedule make_optimizer uses (incl. warmup join). The
                # update that produced `state.step == N` ran with optax count
                # N-1 (scale_by_schedule evaluates BEFORE incrementing), so
                # log the schedule at step-1 — the lr actually applied.
                self.logger.log(
                    {
                        "train_loss": float(metrics["loss"]),
                        "total_train_loss": float(total_loss) / total_steps,
                        "lr": float(lr_sched(step - 1)),
                        "grad_norm": float(metrics.get("grad_norm", 0.0)),
                        "epoch": (step - 1) // steps_per_epoch if steps_per_epoch else 0,
                    },
                    step=step,
                )
            if step % self.train_cfg.checkpointing_steps == 0:
                self.save(state)
            if validate_fn is not None and validate_every and step % validate_every == 0:
                val = validate_fn(state, step)
                if self.logger is not None and isinstance(val, dict):
                    self.logger.log({k: v for k, v in val.items() if isinstance(v, float)}, step=step)
        if profiling:  # loop ended inside the profiled window
            jax.block_until_ready(state.lora)
            jax.profiler.stop_trace()
        return state, metrics
