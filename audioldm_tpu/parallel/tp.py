"""Tensor-parallel (Megatron-style) UNet epsilon step — latency scaling.

The reference's only parallelism is data parallelism (SURVEY.md §2d): it
scales *throughput*, never the latency of one clip. On a TPU slice the ICI
fabric makes intra-layer model parallelism cheap, so this module adds a
``tp`` mesh axis that shards the UNet's attention blocks across chips —
the part of the epsilon step that carries ~60% of its time (PERF.md step
anatomy) — cutting single-request latency instead of adding requests.

Design (classic column/row split, expressed purely as GSPMD shardings —
no hand-written collectives, XLA inserts the psum on ICI):

- ``to_q``/``to_k``/``to_v`` kernels ``[C, C]``: columns sharded
  ``P(None, 'tp')``. The per-head reshape ``[B,N,C] -> [B,N,H,C/H]``
  splits the sharded axis into (heads, head_dim); when ``heads % tp == 0``
  GSPMD propagates the shard onto the *heads* axis, so each chip runs
  plain local attention over its own head group — no communication inside
  softmax.
- ``to_out`` kernel ``[C, C]``: rows sharded ``P('tp', None)`` — the
  contraction over the sharded axis becomes ONE all-reduce per attention
  block, the only collective in the block.
- GEGLU FF: column/row-split with a **shard-interleaved kernel layout**.
  ``apply_ff`` splits the geglu output into ``[h | gate]`` halves; naive
  column sharding of the ``[C, 8C]`` kernel would put each half on a
  disjoint device group and force an all-to-all. Instead
  :func:`shard_unet_params` stores the geglu kernel/bias columns permuted
  as ``[h_0 | gate_0 | h_1 | gate_1 | ...]`` (one ``[h_d | gate_d]`` pair
  per shard) so each chip's column shard carries a matching (h, gate)
  pair — the activation split is chip-local, the un-permuted ``out``
  kernel row-shards ``P('tp', None)`` (the flattened h order is unchanged
  by the permutation), and the FF costs exactly ONE all-reduce like
  attention. ``apply_ff`` reads the trace-time degree via ``nn.ff_tp``.
- Everything else (convs, norms, time/class embeddings) is replicated.

The step traces with the fused-qkv path disabled (``nn.qkv_fusion(False)``)
— the ``[C,3C]`` concat along the sharded axis would otherwise defeat
column propagation. Flash attention stays ON: the Pallas kernel has no
GSPMD partitioning rule of its own, so ``kernels.sharding
.kernel_heads_shard`` wraps it in shard_map over the tp axis on the HEADS
dim — each chip runs the single-chip kernel on its local head group, the
exact layout the qkv column split already produced (so the reshard into
shard_map is a no-op). Per-device attention is ``heads/tp`` heads; the
padded-MXU floor argument (PERF.md) is unchanged per chip, and level-0
keeps the ~1.7x flash-vs-XLA win in latency mode.

Correctness does not depend on divisibility: when ``heads % tp != 0`` the
kernel is vetoed per call (sdpa falls back to XLA attention, which GSPMD
reshards) — only the collective count suffers.
Validated in tests/test_tp.py on a virtual CPU mesh (output equality vs
the single-device step, all-reduce present in the compiled HLO) and in
``__graft_entry__.dryrun_multichip`` phase 6.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioldm_tpu.config import UNetConfig


def make_tp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("tp",))


def _path_keys(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
    return out


def unet_tp_specs(params: dict, tp: int = 1) -> dict:
    """PartitionSpec pytree matching a UNet param tree: attention
    column/row-split on ``tp``; the GEGLU FF likewise when its hidden
    width divides ``tp`` (its kernel layout is then shard-interleaved —
    see :func:`shard_unet_params`); everything else replicated."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if len(keys) >= 3 and keys[-3] in ("attn1", "attn2"):
            proj, leafname = keys[-2], keys[-1]
            if proj in ("to_q", "to_k", "to_v") and leafname == "kernel":
                return P(None, "tp")
            if proj == "to_out" and leafname == "kernel":
                return P("tp", None)
        if len(keys) >= 3 and keys[-3] == "ff":
            proj, leafname = keys[-2], keys[-1]
            half = leaf.shape[-1] // 2 if proj == "geglu" else leaf.shape[0]
            if tp > 1 and half % tp == 0:
                if proj == "geglu":  # kernel AND bias: columns split with h
                    return P(None, "tp") if leafname == "kernel" else P("tp")
                if proj == "out" and leafname == "kernel":
                    return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _interleave_geglu(arr: jax.Array, tp: int) -> jax.Array:
    """Permute geglu out-columns ``[h | gate]`` -> ``[h_0|gate_0|h_1|...]``
    so a ``tp``-way column shard holds one matching (h, gate) pair."""
    half = arr.shape[-1] // 2
    inner = half // tp
    lead = arr.shape[:-1]
    h = arr[..., :half].reshape(*lead, tp, inner)
    g = arr[..., half:].reshape(*lead, tp, inner)
    return jnp.concatenate([h, g], axis=-1).reshape(*lead, 2 * half)


def shard_unet_params(mesh: Mesh, params: dict) -> dict:
    """Place a UNet param tree onto the ``tp`` mesh per unet_tp_specs.

    FF geglu kernels/biases that shard are stored in the interleaved
    column layout ``apply_ff`` expects under ``nn.ff_tp`` (the values on
    the mesh are a column permutation of the originals — gather them back
    through :func:`_interleave_geglu`'s inverse if you need the canonical
    layout; the step's outputs are bit-identical either way)."""
    tp = mesh.shape["tp"]
    specs = unet_tp_specs(params, tp)

    def place(path, x, s):
        keys = _path_keys(path)
        if len(keys) >= 2 and keys[-2] == "geglu" and s != P():
            x = _interleave_geglu(x, tp)
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map_with_path(place, params, specs)


def make_tp_unet_step(cfg: UNetConfig, mesh: Mesh):
    """Jitted TP epsilon step ``(params, latents, t, class_labels) -> eps``.

    ``params`` must be placed with :func:`shard_unet_params`; activations
    are replicated across ``tp`` (latency mode: every chip holds the whole
    batch, attention heads are what's sharded). Output is replicated.
    """
    from audioldm_tpu.models import nn
    from audioldm_tpu.models.unet import apply_unet

    repl = NamedSharding(mesh, P())

    def eps(params, latents, t, class_labels):
        return apply_unet(params, cfg, latents, t, class_labels=class_labels)

    step = jax.jit(eps, out_shardings=repl)

    def call(params, latents, t, class_labels):
        # flags are read at trace time; first call traces inside this
        # context, later calls hit the jit cache
        from audioldm_tpu.kernels.sharding import kernel_heads_shard

        # activations replicated onto the SAME mesh as the params —
        # mixing a mesh-sharded tree with single-device arrays is an error
        latents, t, class_labels = (
            jax.device_put(x, repl) for x in (latents, t, class_labels)
        )
        # flash stays ON under tp: the heads context wraps the kernel in
        # shard_map over the heads axis — the same head-group split the qkv
        # column sharding produced (kernels/sharding.py). Non-divisible head
        # counts veto the kernel per call (sdpa falls back to XLA attention).
        with nn.qkv_fusion(False), nn.ff_tp(mesh.shape["tp"]), kernel_heads_shard(mesh):
            return step(params, latents, t, class_labels)

    call.jitted = step
    return call


def shard_modules(mesh: Mesh, modules):
    """Place an :class:`AudioLDMModules` bundle for TP generation: the UNet
    column/row-shards (:func:`shard_unet_params`, FF kernels stored
    interleaved), every other submodel replicates. The UNet carries ~95% of
    the pipeline's time (PERF.md step anatomy × 50 steps), so sharding it
    alone captures nearly all the latency win while keeping the VAE/vocoder
    programs collective-free."""
    repl = NamedSharding(mesh, P())
    put = lambda tree: jax.tree.map(lambda x: jax.device_put(x, repl), tree)
    return modules._replace(
        unet=shard_unet_params(mesh, modules.unet),
        vae=put(modules.vae),
        text_encoder=put(modules.text_encoder),
        vocoder=put(modules.vocoder),
    )


def make_tp_mesh_2d(dp: int, tp: int) -> Mesh:
    """``(dp, tp)`` mesh for combined data/tensor-parallel training. The
    ``tp`` axis should map to the fastest ICI dimension (adjacent devices):
    its all-reduces run per layer, while ``dp``'s gradient psum runs once
    per step."""
    devices = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, ("dp", "tp"))


def module_shardings(mesh: Mesh, modules):
    """NamedSharding pytree for an :class:`AudioLDMModules` bundle: UNet per
    :func:`unet_tp_specs` on the mesh's ``tp`` axis, the rest replicated."""
    repl = lambda tree: jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)
    return modules._replace(
        unet=jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            unet_tp_specs(modules.unet, mesh.shape["tp"]),
        ),
        vae=repl(modules.vae),
        text_encoder=repl(modules.text_encoder),
        vocoder=repl(modules.vocoder),
    )


def make_tp_train_step(
    modules,
    optimizer,
    lora_cfg,
    mesh: Mesh,
    dtype=None,
    remat: bool = False,
):
    """LoRA train step on a 2-D ``(dp, tp)`` mesh — combined throughput and
    model scaling beyond the reference's DP-only accelerate setup.

    ``modules`` must be placed with :func:`shard_modules` on the same mesh
    (the geglu kernels are column-permuted for the interleaved FF split —
    in_shardings alone cannot express that layout change). Batch shards
    over ``dp``; the UNet's attention/FF shard over ``tp``; LoRA adapters
    and optimizer state replicate (rank-r trees are tiny, and their deltas
    add to column-sharded projections as local slices). XLA emits the
    per-layer tp all-reduces and the once-per-step dp gradient psum on ICI.

    Same contract as ``train.trainer.make_train_step``'s product:
    ``fn(state, batch, rng) -> (state, metrics)``; global-batch semantics
    identical to the single-device step (equality-tested in
    tests/test_tp.py and dryrun phase 7)."""
    import optax

    import jax.numpy as jnp

    from audioldm_tpu.train.trainer import TrainState, lora_loss_fn

    if dtype is None:
        dtype = jnp.float32
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))  # prefix spec: every batch leaf
    mod_shardings = module_shardings(mesh, modules)

    def step_fn(mods, state, batch, rng):
        def loss_for(lora, mb, key):
            return lora_loss_fn(lora, mods, mb, key, lora_cfg.scale, dtype, remat=remat)

        (loss, metrics), grads = jax.value_and_grad(loss_for, has_aux=True)(
            state.lora, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(lora, opt_state, state.step + 1), metrics

    jitted = jax.jit(
        step_fn,
        in_shardings=(mod_shardings, repl, data, repl),
        out_shardings=(repl, repl),
    )

    def fn(state, batch, rng):
        from audioldm_tpu.kernels.sharding import kernel_dp_shard, kernel_heads_shard
        from audioldm_tpu.models import nn

        # flash rides shard_map over BOTH mesh axes on the 2-D mesh: batch
        # over dp, head group over tp (P('dp','tp') specs — heads alone
        # would silently all-gather the dp-sharded batch into every
        # shard_map block); non-divisible extents drop that axis per call
        with (
            nn.qkv_fusion(False),
            nn.ff_tp(mesh.shape["tp"]),
            kernel_dp_shard(mesh),
            kernel_heads_shard(mesh),
        ):
            return jitted(modules, state, batch, rng)

    return fn


def make_tp_generate_fn(
    modules,
    mesh: Mesh,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 10.0,
    guidance_scale: float = 2.5,
    dtype=None,
    scheduler: str = "ddim",
):
    """Tensor-parallel text->audio generation — multi-chip *latency* mode.

    ``modules`` must be placed with :func:`shard_modules` on the same mesh.
    Signature matches ``pipeline.generate.make_generate_fn``'s product:
    ``fn(input_ids, attention_mask, uncond_ids, uncond_mask, rng,
    lora=None) -> waveform`` with all activations replicated across ``tp``
    (every chip computes the full CFG batch; the UNet's attention heads and
    FF hidden width are what's sharded — one all-reduce per projection
    block on ICI). A replicated LoRA tree rides along for free: its rank-r
    deltas add to the column-sharded projections as local slices of a
    replicated operand — no extra collectives.

    Traced with flash attention sharded over the heads axis (shard_map via
    ``kernels.sharding.kernel_heads_shard``) and the qkv/geglu layouts in
    their TP forms; split-compiles the mel stage and the vocoder like the
    single-device path (compile time is superlinear in program size —
    PERF.md)."""
    import functools

    import jax.numpy as jnp

    from audioldm_tpu.pipeline.generate import generate_mel, vocode

    if dtype is None:
        dtype = jnp.bfloat16
    repl = NamedSharding(mesh, P())
    voc_samples = int(audio_length_in_s * modules.vocoder_cfg.sampling_rate)

    @functools.partial(jax.jit, out_shardings=repl)
    def fn_mel(mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng, lora):
        return generate_mel(
            mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng,
            num_inference_steps, audio_length_in_s, guidance_scale,
            lora=lora, dtype=dtype, scheduler=scheduler,
        )

    @functools.partial(jax.jit, out_shardings=repl)
    def fn_voc(mods, mel):
        return vocode(mods, mel, voc_samples)

    def fn(input_ids, attention_mask, uncond_ids, uncond_mask, rng, lora=None):
        from audioldm_tpu.kernels import mrf_conv
        from audioldm_tpu.kernels.sharding import kernel_heads_shard
        from audioldm_tpu.models import nn

        args = tuple(
            jax.device_put(jnp.asarray(x), repl)
            for x in (input_ids, attention_mask, uncond_ids, uncond_mask, rng)
        )
        if lora is not None:
            lora = jax.tree.map(lambda x: jax.device_put(x, repl), lora)
        prev_mrf = mrf_conv.enabled()
        # flash attention stays ON: the heads context wraps it in shard_map
        # over the tp axis (kernels/sharding.py). The fused-MRF vocoder
        # kernel stays OFF — the vocoder is replicated across tp and the
        # partitioning-rule-less pallas call would pin replication choices
        # GSPMD should make (it is ~2% of clip time here).
        mrf_conv.use_fused_mrf(False)
        try:
            with nn.qkv_fusion(False), nn.ff_tp(mesh.shape["tp"]), kernel_heads_shard(mesh):
                mel = fn_mel(modules, *args, lora)
                return fn_voc(modules, mel)
        finally:
            mrf_conv.use_fused_mrf(prev_mrf)

    return fn
