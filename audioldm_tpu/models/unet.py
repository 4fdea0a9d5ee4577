"""UNet2DCondition — the epsilon-prediction denoiser.

Behavior pinned by the reference call site (script/train/train_audioldm_lora.py:539-546):

    unet(noisy_latents, timesteps, encoder_hidden_states=None,
         class_labels=prompt_embeds, cross_attention_kwargs={"scale": 1.0})

i.e. the audioldm-s conditioning is the pooled 512-d CLAP text embedding fed
through the **class-embedding path** (``class_embed_type="simple_projection"``,
``class_embeddings_concat=True``), and with ``encoder_hidden_states=None`` the
"cross"-attention layers self-attend. The block graph is config-driven from
the checkpoint's ``unet/config.json`` (see audioldm_tpu.config.UNetConfig).

TPU-first design decisions (vs the torch module graph):
- NHWC activations, HWIO kernels; latents are ``[B, T/4, F/4, C]``.
- One pure ``apply(params, x, t, class_labels, lora=...)`` function; the full
  CFG-batched denoise loop jits into a single ``lax.scan`` (pipeline/).
- LoRA adapters ride along as an optional parallel pytree applied unmerged in
  the attention projections (training) or merged into the base kernels at
  load (inference) — see audioldm_tpu.lora.
- bf16-friendly: every matmul/conv accumulates fp32 on the MXU; group norms
  and softmax run fp32.

Param tree key names mirror diffusers module paths (down_blocks.0.attentions.
1.transformer_blocks.0.attn1.to_q ...) so the checkpoint bridge and PEFT LoRA
import/export are pure key-path maps.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from audioldm_tpu.config import UNetConfig
from audioldm_tpu.models import nn
from audioldm_tpu.models.nn import (
    ACT,
    attention,
    conv2d,
    group_norm,
    init_attention,
    init_conv2d,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    silu,
    timestep_embedding,
)

# ---------------------------------------------------------------------------
# LoRA threading: adapters live in a parallel dict tree keyed by the same
# path component names (list indices as strings).
# ---------------------------------------------------------------------------


def _sub(tree: Optional[dict], *keys) -> Optional[dict]:
    for k in keys:
        if tree is None:
            return None
        tree = tree.get(str(k))
    return tree


def _upsample_nearest(x: jnp.ndarray, th: int, tw: int) -> jnp.ndarray:
    """Nearest-neighbor upsample to an arbitrary target size with torch
    ``F.interpolate(mode="nearest")`` index semantics (src = floor(dst *
    in/out)). diffusers passes ``upsample_size`` down to ``Upsample2D`` when
    the input resolution is not divisible by 2**num_upsamplers
    (UNet2DConditionModel ``forward_upsample_size``) — e.g. a 10.0 s clip is
    1000 mel frames -> 250-frame latents -> 63 at level 2, and the upsample
    must come back to exactly 63, not 64. For the exact-2x case both
    formulas agree and XLA's resize path is used."""
    b, h, w, c = x.shape
    if th == 2 * h and tw == 2 * w:
        return jax.image.resize(x, (b, th, tw, c), method="nearest")
    hi = (jnp.arange(th) * h) // th
    wi = (jnp.arange(tw) * w) // tw
    return x[:, hi][:, :, wi]


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def init_resnet(key, in_ch: int, out_ch: int, temb_ch: int, groups: int) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv2d(ks[0], in_ch, out_ch, 3),
        "time_emb_proj": init_linear(ks[1], temb_ch, out_ch),
        "norm2": init_norm(out_ch),
        "conv2": init_conv2d(ks[2], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(ks[3], in_ch, out_ch, 1)
    return p


def apply_resnet(p: dict, x: jnp.ndarray, emb: jnp.ndarray, groups: int, eps: float, act=silu) -> jnp.ndarray:
    h = act(group_norm(p["norm1"], x, groups, eps))
    h = conv2d(p["conv1"], h, padding=1)
    temb = linear(p["time_emb_proj"], act(emb))
    h = h + temb[:, None, None, :]
    h = act(group_norm(p["norm2"], h, groups, eps))
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x)
    return x + h


def init_ff(key, dim: int, mult: int = 4) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "geglu": init_linear(k1, dim, dim * mult * 2),
        "out": init_linear(k2, dim * mult, dim),
    }


def apply_ff(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    h = linear(p["geglu"], x)
    half = p["geglu"]["kernel"].shape[-1] // 2
    tp = nn.ff_tp_degree()
    if tp > 1 and half % tp == 0:
        # tensor-parallel layout (parallel/tp.py): geglu columns are stored
        # shard-interleaved as [h_d | gate_d] blocks, so splitting via this
        # reshape keeps the (h, gate) pairing local to each chip's column
        # shard; the un-permuted `out` matmul then row-reduces into ONE
        # all-reduce. Bit-identical to the contiguous split (same scalars,
        # reordered columns).
        y = h.reshape(*h.shape[:-1], tp, 2, half // tp)
        a, gate = y[..., 0, :], y[..., 1, :]
        a = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(a.dtype)
        h = a.reshape(*a.shape[:-2], half)
    else:
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)
    return linear(p["out"], h)


def init_transformer_block(key, dim: int, heads: int, context_dim: Optional[int]) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "norm1": init_norm(dim),
        "attn1": init_attention(ks[0], dim, heads),
        "norm2": init_norm(dim),
        "attn2": init_attention(ks[1], dim, heads, context_dim=context_dim),
        "norm3": init_norm(dim),
        "ff": init_ff(ks[2], dim),
    }


def apply_transformer_block(
    p: dict,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray],
    heads: int,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    # attn1: self-attention. attn2: cross-attention, but with context=None
    # (the audioldm case) it attends to the hidden states themselves.
    h = attention(p["attn1"], layer_norm(p["norm1"], x), None, heads, lora=_sub(lora, "attn1"), lora_scale=lora_scale)
    x = x + h
    h = attention(p["attn2"], layer_norm(p["norm2"], x), context, heads, lora=_sub(lora, "attn2"), lora_scale=lora_scale)
    x = x + h
    x = x + apply_ff(p["ff"], layer_norm(p["norm3"], x))
    return x


def init_transformer2d(key, channels: int, heads: int, num_layers: int, context_dim: Optional[int]) -> dict:
    ks = jax.random.split(key, num_layers + 2)
    return {
        "norm": init_norm(channels),
        "proj_in": init_conv2d(ks[0], channels, channels, 1),
        "transformer_blocks": {
            str(i): init_transformer_block(ks[i + 1], channels, heads, context_dim) for i in range(num_layers)
        },
        "proj_out": init_conv2d(ks[-1], channels, channels, 1),
    }


def apply_transformer2d(
    p: dict,
    x: jnp.ndarray,
    context: Optional[jnp.ndarray],
    heads: int,
    groups: int,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    b, h_, w_, c = x.shape
    residual = x
    x = group_norm(p["norm"], x, groups, eps=1e-6)
    x = conv2d(p["proj_in"], x)
    x = x.reshape(b, h_ * w_, c)
    for i in range(len(p["transformer_blocks"])):
        x = apply_transformer_block(
            p["transformer_blocks"][str(i)], x, context, heads,
            lora=_sub(lora, "transformer_blocks", i), lora_scale=lora_scale,
        )
    x = x.reshape(b, h_, w_, c)
    x = conv2d(p["proj_out"], x)
    return x + residual


# ---------------------------------------------------------------------------
# UNet init
# ---------------------------------------------------------------------------


def init_unet(key, cfg: UNetConfig = UNetConfig()) -> dict:
    """Random-init parameter tree with checkpoint-compatible structure."""
    b0 = cfg.block_out_channels[0]
    temb_dim = b0 * 4
    temb_cat = temb_dim * 2 if cfg.class_embeddings_concat else temb_dim
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)

    p: dict = {
        "conv_in": init_conv2d(nk(), cfg.in_channels, b0, 3),
        "time_embedding": {
            "linear_1": init_linear(nk(), b0, temb_dim),
            "linear_2": init_linear(nk(), temb_dim, temb_dim),
        },
    }
    if cfg.class_embed_type == "simple_projection":
        p["class_embedding"] = init_linear(nk(), cfg.projection_class_embeddings_input_dim, temb_dim)
    elif cfg.class_embed_type is not None:
        raise NotImplementedError(cfg.class_embed_type)

    # Down blocks
    down = {}
    out_ch = b0
    for i, block_type in enumerate(cfg.down_block_types):
        in_ch = out_ch
        out_ch = cfg.block_out_channels[i]
        is_final = i == len(cfg.down_block_types) - 1
        heads = cfg.num_heads(i)
        blk: dict = {"resnets": {}, }
        if "CrossAttn" in block_type:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = init_resnet(nk(), in_ch if j == 0 else out_ch, out_ch, temb_cat, cfg.norm_num_groups)
            if "CrossAttn" in block_type:
                blk["attentions"][str(j)] = init_transformer2d(
                    nk(), out_ch, heads, cfg.transformer_layers_per_block, cfg.cross_attention_dim
                )
        if not is_final:
            blk["downsamplers"] = {"0": init_conv2d(nk(), out_ch, out_ch, 3)}
        down[str(i)] = blk
    p["down_blocks"] = down

    # Mid
    mid_ch = cfg.block_out_channels[-1]
    p["mid_block"] = {
        "resnets": {
            "0": init_resnet(nk(), mid_ch, mid_ch, temb_cat, cfg.norm_num_groups),
            "1": init_resnet(nk(), mid_ch, mid_ch, temb_cat, cfg.norm_num_groups),
        },
        "attentions": {
            "0": init_transformer2d(nk(), mid_ch, cfg.num_heads(len(cfg.block_out_channels) - 1), cfg.transformer_layers_per_block, cfg.cross_attention_dim)
        },
    }

    # Up blocks
    up = {}
    rev = list(reversed(cfg.block_out_channels))
    out_ch = rev[0]
    for i, block_type in enumerate(cfg.up_block_types):
        prev_out = out_ch
        out_ch = rev[i]
        in_ch = rev[min(i + 1, len(rev) - 1)]
        is_final = i == len(cfg.up_block_types) - 1
        heads = cfg.num_heads(len(rev) - 1 - i)
        blk = {"resnets": {}}
        if "CrossAttn" in block_type:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block + 1):
            skip_ch = in_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            blk["resnets"][str(j)] = init_resnet(nk(), res_in + skip_ch, out_ch, temb_cat, cfg.norm_num_groups)
            if "CrossAttn" in block_type:
                blk["attentions"][str(j)] = init_transformer2d(
                    nk(), out_ch, heads, cfg.transformer_layers_per_block, cfg.cross_attention_dim
                )
        if not is_final:
            blk["upsamplers"] = {"0": init_conv2d(nk(), out_ch, out_ch, 3)}
        up[str(i)] = blk
    p["up_blocks"] = up

    p["conv_norm_out"] = init_norm(b0)
    p["conv_out"] = init_conv2d(nk(), b0, cfg.out_channels, 3)
    return p


# ---------------------------------------------------------------------------
# UNet apply
# ---------------------------------------------------------------------------


def apply_unet(
    params: dict,
    cfg: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    class_labels: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
) -> jnp.ndarray:
    """Epsilon prediction. ``sample``: NHWC latents ``[B, H, W, C]``;
    ``timesteps``: ``[B]`` int; ``class_labels``: ``[B, 512]`` pooled text
    embedding (the audioldm conditioning path)."""
    act = ACT[cfg.act_fn]
    b0 = cfg.block_out_channels[0]
    dtype = sample.dtype

    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

    t_emb = timestep_embedding(timesteps, b0, cfg.flip_sin_to_cos, float(cfg.freq_shift)).astype(dtype)
    emb = linear(params["time_embedding"]["linear_2"], act(linear(params["time_embedding"]["linear_1"], t_emb)))

    if cfg.class_embed_type == "simple_projection":
        if class_labels is None:
            raise ValueError("audioldm unet requires class_labels (pooled text embedding)")
        class_emb = linear(params["class_embedding"], class_labels.astype(dtype))
        if cfg.class_embeddings_concat:
            emb = jnp.concatenate([emb, class_emb], axis=-1)
        else:
            emb = emb + class_emb

    context = encoder_hidden_states
    groups, eps = cfg.norm_num_groups, cfg.norm_eps

    sample = conv2d(params["conv_in"], sample, padding=1)
    skips = [sample]

    for i, block_type in enumerate(cfg.down_block_types):
        blk = params["down_blocks"][str(i)]
        blora = _sub(lora, "down_blocks", i)
        heads = cfg.num_heads(i)
        for j in range(cfg.layers_per_block):
            sample = apply_resnet(blk["resnets"][str(j)], sample, emb, groups, eps, act)
            if "CrossAttn" in block_type:
                sample = apply_transformer2d(
                    blk["attentions"][str(j)], sample, context, heads, groups,
                    lora=_sub(blora, "attentions", j), lora_scale=lora_scale,
                )
            skips.append(sample)
        if "downsamplers" in blk:
            sample = conv2d(blk["downsamplers"]["0"], sample, stride=2, padding=cfg.downsample_padding)
            skips.append(sample)

    mid = params["mid_block"]
    mlora = _sub(lora, "mid_block")
    mid_heads = cfg.num_heads(len(cfg.block_out_channels) - 1)
    sample = apply_resnet(mid["resnets"]["0"], sample, emb, groups, eps, act)
    sample = apply_transformer2d(
        mid["attentions"]["0"], sample, context, mid_heads, groups,
        lora=_sub(mlora, "attentions", 0), lora_scale=lora_scale,
    )
    sample = apply_resnet(mid["resnets"]["1"], sample, emb, groups, eps, act)

    rev = list(reversed(cfg.block_out_channels))
    for i, block_type in enumerate(cfg.up_block_types):
        blk = params["up_blocks"][str(i)]
        blora = _sub(lora, "up_blocks", i)
        heads = cfg.num_heads(len(rev) - 1 - i)
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            sample = jnp.concatenate([sample, skip], axis=-1)
            sample = apply_resnet(blk["resnets"][str(j)], sample, emb, groups, eps, act)
            if "CrossAttn" in block_type:
                sample = apply_transformer2d(
                    blk["attentions"][str(j)], sample, context, heads, groups,
                    lora=_sub(blora, "attentions", j), lora_scale=lora_scale,
                )
        if "upsamplers" in blk:
            # diffusers semantics: upsample to the NEXT skip's spatial size
            # (== exact 2x whenever the input resolution divides evenly)
            b, h_, w_, c = sample.shape
            th, tw = (skips[-1].shape[1], skips[-1].shape[2]) if skips else (h_ * 2, w_ * 2)
            sample = _upsample_nearest(sample, th, tw)
            sample = conv2d(blk["upsamplers"]["0"], sample, padding=1)

    sample = act(group_norm(params["conv_norm_out"], sample, groups, eps))
    sample = conv2d(params["conv_out"], sample, padding=1)
    return sample
