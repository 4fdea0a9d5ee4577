"""AutoencoderKL — mel-spectrogram VAE.

Behavior pinned by the reference call sites: training encodes log-mels with
``vae.encode(mel).latent_dist.sample() * vae.config.scaling_factor``
(script/train/train_audioldm_lora.py:495-496); inference decodes latents back
to mel before vocoding (SURVEY.md §3.2). For 10.24 s audio the 1x1024x64
log-mel maps to 8x256x16 latents (4x spatial reduction, 8 channels).

TPU-first: NHWC ([B, T, F, C]); encoder/decoder are pure functions; the
decode fuses into the sampling jit. Param paths mirror diffusers
``AutoencoderKL`` module names for the checkpoint bridge.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from audioldm_tpu.config import VAEConfig
from audioldm_tpu.models.nn import (
    ACT,
    conv2d,
    group_norm,
    init_attention,
    init_conv2d,
    init_norm,
    linear,
    silu,
)


def _init_resnet(key, in_ch: int, out_ch: int) -> dict:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv2d(ks[0], in_ch, out_ch, 3),
        "norm2": init_norm(out_ch),
        "conv2": init_conv2d(ks[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(ks[2], in_ch, out_ch, 1)
    return p


def _apply_resnet(p: dict, x: jnp.ndarray, groups: int, act=silu) -> jnp.ndarray:
    h = act(group_norm(p["norm1"], x, groups, eps=1e-6))
    h = conv2d(p["conv1"], h, padding=1)
    h = act(group_norm(p["norm2"], h, groups, eps=1e-6))
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x)
    return x + h


def _init_mid(key, ch: int, groups: int) -> dict:
    ks = jax.random.split(key, 3)
    attn = init_attention(ks[1], ch, heads=1)
    attn["group_norm"] = init_norm(ch)
    return {
        "resnets": {"0": _init_resnet(ks[0], ch, ch), "1": _init_resnet(ks[2], ch, ch)},
        "attentions": {"0": attn},
    }


def _apply_mid(p: dict, x: jnp.ndarray, groups: int, act=silu) -> jnp.ndarray:
    x = _apply_resnet(p["resnets"]["0"], x, groups, act)
    # single-head full self-attention over spatial tokens
    attn = p["attentions"]["0"]
    b, h_, w_, c = x.shape
    res = x
    t = group_norm(attn["group_norm"], x, groups, eps=1e-6).reshape(b, h_ * w_, c)
    q = linear(attn["to_q"], t)
    k = linear(attn["to_k"], t)
    v = linear(attn["to_v"], t)
    logits = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32) * (c**-0.5)
    w = jax.nn.softmax(logits, axis=-1).astype(t.dtype)
    t = jnp.einsum("bnm,bmc->bnc", w, v, preferred_element_type=jnp.float32).astype(t.dtype)
    t = linear(attn["to_out"], t).reshape(b, h_, w_, c)
    x = res + t
    x = _apply_resnet(p["resnets"]["1"], x, groups, act)
    return x


def init_vae(key, cfg: VAEConfig = VAEConfig()) -> dict:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)
    b = cfg.block_out_channels
    enc: dict = {"conv_in": init_conv2d(nk(), cfg.in_channels, b[0], 3), "down_blocks": {}}
    out_ch = b[0]
    for i in range(len(b)):
        in_ch, out_ch = out_ch, b[i]
        blk = {"resnets": {str(j): _init_resnet(nk(), in_ch if j == 0 else out_ch, out_ch) for j in range(cfg.layers_per_block)}}
        if i < len(b) - 1:
            blk["downsamplers"] = {"0": init_conv2d(nk(), out_ch, out_ch, 3)}
        enc["down_blocks"][str(i)] = blk
    enc["mid_block"] = _init_mid(nk(), b[-1], cfg.norm_num_groups)
    enc["conv_norm_out"] = init_norm(b[-1])
    enc["conv_out"] = init_conv2d(nk(), b[-1], 2 * cfg.latent_channels, 3)

    dec: dict = {"conv_in": init_conv2d(nk(), cfg.latent_channels, b[-1], 3), "up_blocks": {}}
    rev = list(reversed(b))
    out_ch = rev[0]
    for i in range(len(rev)):
        in_ch, out_ch = out_ch, rev[i]
        blk = {"resnets": {str(j): _init_resnet(nk(), in_ch if j == 0 else out_ch, out_ch) for j in range(cfg.layers_per_block + 1)}}
        if i < len(rev) - 1:
            blk["upsamplers"] = {"0": init_conv2d(nk(), out_ch, out_ch, 3)}
        dec["up_blocks"][str(i)] = blk
    dec["mid_block"] = _init_mid(nk(), rev[0], cfg.norm_num_groups)
    dec["conv_norm_out"] = init_norm(rev[-1])
    dec["conv_out"] = init_conv2d(nk(), rev[-1], cfg.out_channels, 3)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv2d(nk(), 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1),
        "post_quant_conv": init_conv2d(nk(), cfg.latent_channels, cfg.latent_channels, 1),
    }


class LatentDist(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, key) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    @property
    def mode(self) -> jnp.ndarray:
        return self.mean


def encode(params: dict, cfg: VAEConfig, x: jnp.ndarray) -> LatentDist:
    """``x``: NHWC mel ``[B, T, F, 1]`` -> diagonal gaussian over
    ``[B, T/4, F/4, latent_channels]``."""
    act = ACT[cfg.act_fn]
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x, padding=1)
    for i in range(len(cfg.block_out_channels)):
        blk = enc["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _apply_resnet(blk["resnets"][str(j)], h, g, act)
        if "downsamplers" in blk:
            # torch Downsample2D(padding=0) pads (0,1) on each spatial dim
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(blk["downsamplers"]["0"], h, stride=2, padding=0)
    h = _apply_mid(enc["mid_block"], h, g, act)
    h = act(group_norm(enc["conv_norm_out"], h, g, eps=1e-6))
    h = conv2d(enc["conv_out"], h, padding=1)
    moments = conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return LatentDist(mean, logvar)


def decode(params: dict, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Latents ``[B, T/4, F/4, C]`` -> mel ``[B, T, F, 1]``."""
    act = ACT[cfg.act_fn]
    g = cfg.norm_num_groups
    dec = params["decoder"]
    h = conv2d(params["post_quant_conv"], z)
    h = conv2d(dec["conv_in"], h, padding=1)
    h = _apply_mid(dec["mid_block"], h, g, act)
    rev = list(reversed(cfg.block_out_channels))
    for i in range(len(rev)):
        blk = dec["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = _apply_resnet(blk["resnets"][str(j)], h, g, act)
        if "upsamplers" in blk:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            h = conv2d(blk["upsamplers"]["0"], h, padding=1)
    h = act(group_norm(dec["conv_norm_out"], h, g, eps=1e-6))
    return conv2d(dec["conv_out"], h, padding=1)
