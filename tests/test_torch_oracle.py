"""Raw-torch golden oracle for the UNet / VAE / DDIM / full pipeline.

diffusers is NOT installable in this image (no network), so the block math of
``UNet2DConditionModel`` / ``AutoencoderKL`` / ``DDIMScheduler`` is re-derived
here **independently, in raw torch** — the same technique tests/test_metrics.py
uses for KAD. The torch modules below use diffusers' exact module names, so
their ``state_dict()`` feeds the real checkpoint bridge
(``convert_unet_state`` / ``convert_vae_state``): one test run verifies both
the JAX models and the bridge against an independent implementation.

Reference behavior being pinned (the component the repo had no oracle for,
VERDICT.md Missing #1):
- the training-side stage list at
  /root/reference/script/train/train_audioldm_lora.py:495-549 (VAE encode ×
  scaling_factor -> add_noise at t~U[0,1000) -> unet(noisy, t,
  encoder_hidden_states=None, class_labels=pooled text emb) -> eps MSE);
- the AudioLDMPipeline stage list (SURVEY.md §3.2): text encode -> CFG ->
  DDIM loop -> VAE decode -> vocoder.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audioldm_tpu.ckpt import convert_unet_state, convert_vae_state
from audioldm_tpu.config import DDIMConfig, UNetConfig, VAEConfig
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.scheduler import (
    add_noise,
    ddim_step,
    inference_timesteps,
    make_schedule,
)
from audioldm_tpu.models.unet import apply_unet

# ---------------------------------------------------------------------------
# Torch re-derivation of the diffusers blocks (independent implementation;
# module attribute names == diffusers module paths so state_dict keys match).
# ---------------------------------------------------------------------------


class TAttention(nn.Module):
    """diffusers ``Attention``: no-bias q/k/v, ``to_out = ModuleList([Linear,
    Dropout])``, softmax over scaled scores with scale = head_dim**-0.5.
    With ``context=None`` the layer self-attends (the audioldm attn2 case)."""

    def __init__(self, query_dim, heads, context_dim=None, bias=False):
        super().__init__()
        context_dim = context_dim or query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=bias)
        self.to_k = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_v = nn.Linear(context_dim, query_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        b, n, c = q.shape
        h = self.heads
        d = c // h
        q = q.view(b, n, h, d).transpose(1, 2)
        k = k.view(b, -1, h, d).transpose(1, 2)
        v = v.view(b, -1, h, d).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) * (d**-0.5)
        attn = scores.softmax(dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(b, n, c)
        return self.to_out[0](out)


class TGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TFeedForward(nn.Module):
    """diffusers ``FeedForward`` with GEGLU: net = [GEGLU, Dropout, Linear]."""

    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList([TGEGLU(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, context=None):
        x = x + self.attn1(self.norm1(x))
        # context None -> self-attend (diffusers BasicTransformerBlock with
        # encoder_hidden_states=None; the audioldm conditioning corner)
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(nn.Module):
    """diffusers ``Transformer2DModel`` (use_linear_projection=False):
    GroupNorm(eps=1e-6) -> 1x1 conv proj_in -> [B,HW,C] -> blocks -> proj_out
    -> + residual."""

    def __init__(self, ch, heads, layers, context_dim, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicTransformerBlock(ch, heads, context_dim) for _ in range(layers)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context=None):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class TResnet(nn.Module):
    """diffusers ``ResnetBlock2D``: norm->silu->conv, +time_emb_proj(silu(t)),
    norm->silu->conv, + (1x1) shortcut; output_scale_factor=1."""

    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


def torch_timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / (half - shift)
    emb = torch.exp(exponent)[None, :] * t.float()[:, None]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class TUNet(nn.Module):
    """Config-driven mirror of ``UNet2DConditionModel`` restricted to the
    audioldm configuration (class_embed_type='simple_projection',
    class_embeddings_concat=True, cross_attention_dim=None)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        b0 = cfg.block_out_channels[0]
        temb = b0 * 4
        temb_cat = temb * 2 if cfg.class_embeddings_concat else temb
        g, eps = cfg.norm_num_groups, cfg.norm_eps
        self.conv_in = nn.Conv2d(cfg.in_channels, b0, 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(b0, temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)
        assert cfg.class_embed_type == "simple_projection"
        self.class_embedding = nn.Linear(cfg.projection_class_embeddings_input_dim, temb)

        self.down_blocks = nn.ModuleList()
        out_ch = b0
        for i, btype in enumerate(cfg.down_block_types):
            in_ch, out_ch = out_ch, cfg.block_out_channels[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(in_ch if j == 0 else out_ch, out_ch, temb_cat, g, eps) for j in range(cfg.layers_per_block)]
            )
            if "CrossAttn" in btype:
                blk.attentions = nn.ModuleList(
                    [
                        TTransformer2D(out_ch, cfg.num_heads(i), cfg.transformer_layers_per_block, cfg.cross_attention_dim, g)
                        for _ in range(cfg.layers_per_block)
                    ]
                )
            if i < len(cfg.down_block_types) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=cfg.downsample_padding)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)

        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.num_heads(len(cfg.block_out_channels) - 1)
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(mid_ch, mid_ch, temb_cat, g, eps), TResnet(mid_ch, mid_ch, temb_cat, g, eps)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(mid_ch, mid_heads, cfg.transformer_layers_per_block, cfg.cross_attention_dim, g)]
        )

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(cfg.block_out_channels))
        out_ch = rev[0]
        for i, btype in enumerate(cfg.up_block_types):
            prev_out = out_ch
            out_ch = rev[i]
            in_ch = rev[min(i + 1, len(rev) - 1)]
            heads = cfg.num_heads(len(rev) - 1 - i)
            blk = nn.Module()
            resnets = []
            for j in range(cfg.layers_per_block + 1):
                skip_ch = in_ch if j == cfg.layers_per_block else out_ch
                res_in = prev_out if j == 0 else out_ch
                resnets.append(TResnet(res_in + skip_ch, out_ch, temb_cat, g, eps))
            blk.resnets = nn.ModuleList(resnets)
            if "CrossAttn" in btype:
                blk.attentions = nn.ModuleList(
                    [
                        TTransformer2D(out_ch, heads, cfg.transformer_layers_per_block, cfg.cross_attention_dim, g)
                        for _ in range(cfg.layers_per_block + 1)
                    ]
                )
            if i < len(cfg.up_block_types) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, b0, eps=eps)
        self.conv_out = nn.Conv2d(b0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, class_labels, encoder_hidden_states=None):
        cfg = self.cfg
        b0 = cfg.block_out_channels[0]
        t_emb = torch_timestep_embedding(timesteps, b0, cfg.flip_sin_to_cos, float(cfg.freq_shift))
        emb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(t_emb)))
        class_emb = self.class_embedding(class_labels)
        emb = torch.cat([emb, class_emb], dim=-1) if cfg.class_embeddings_concat else emb + class_emb

        sample = self.conv_in(sample)
        skips = [sample]
        for i, btype in enumerate(cfg.down_block_types):
            blk = self.down_blocks[i]
            for j in range(cfg.layers_per_block):
                sample = blk.resnets[j](sample, emb)
                if "CrossAttn" in btype:
                    sample = blk.attentions[j](sample, encoder_hidden_states)
                skips.append(sample)
            if hasattr(blk, "downsamplers"):
                sample = blk.downsamplers[0].conv(sample)
                skips.append(sample)

        sample = self.mid_block.resnets[0](sample, emb)
        sample = self.mid_block.attentions[0](sample, encoder_hidden_states)
        sample = self.mid_block.resnets[1](sample, emb)

        for i, btype in enumerate(cfg.up_block_types):
            blk = self.up_blocks[i]
            for j in range(cfg.layers_per_block + 1):
                sample = torch.cat([sample, skips.pop()], dim=1)
                sample = blk.resnets[j](sample, emb)
                if "CrossAttn" in btype:
                    sample = blk.attentions[j](sample, encoder_hidden_states)
            if hasattr(blk, "upsamplers"):
                # diffusers forward_upsample_size semantics: when the input
                # resolution doesn't divide by 2**num_upsamplers, Upsample2D
                # receives the next skip's spatial size as output_size
                # (UNet2DConditionModel.forward; equals exact 2x otherwise)
                if skips:
                    sample = F.interpolate(sample, size=skips[-1].shape[2:], mode="nearest")
                else:
                    sample = F.interpolate(sample, scale_factor=2.0, mode="nearest")
                sample = blk.upsamplers[0].conv(sample)

        sample = self.conv_out(F.silu(self.conv_norm_out(sample)))
        return sample


class TVAEAttention(nn.Module):
    """diffusers VAE mid-block ``Attention``: biased q/k/v, single head with
    dim_head = channels (scale = C**-0.5), its own GroupNorm(eps=1e-6), and a
    residual connection."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        t = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = (torch.matmul(q, k.transpose(-1, -2)) * (c**-0.5)).softmax(dim=-1)
        t = self.to_out[0](torch.matmul(attn, v))
        return res + t.transpose(1, 2).view(b, c, h, w)


class TVAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(ch, ch, None, groups, 1e-6), TResnet(ch, ch, None, groups, 1e-6)])
        self.attentions = nn.ModuleList([TVAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class TVAE(nn.Module):
    """Mirror of diffusers ``AutoencoderKL`` (Encoder/Decoder + quant convs).
    Encoder downsamplers use padding=0 with asymmetric (0,1) pre-pad; decoder
    upsampling is nearest-2x + 3x3 conv. Resnets use eps=1e-6 (the diffusers
    VAE default), unlike the UNet's norm_eps."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.cfg = cfg
        b = cfg.block_out_channels
        g = cfg.norm_num_groups
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, b[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        out_ch = b[0]
        for i in range(len(b)):
            in_ch, out_ch = out_ch, b[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(in_ch if j == 0 else out_ch, out_ch, None, g, 1e-6) for j in range(cfg.layers_per_block)]
            )
            if i < len(b) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
        enc.mid_block = TVAEMid(b[-1], g)
        enc.conv_norm_out = nn.GroupNorm(g, b[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(b[-1], 2 * cfg.latent_channels, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(cfg.latent_channels, b[-1], 3, padding=1)
        dec.mid_block = TVAEMid(b[-1], g)
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(b))
        out_ch = rev[0]
        for i in range(len(rev)):
            in_ch, out_ch = out_ch, rev[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(in_ch if j == 0 else out_ch, out_ch, None, g, 1e-6) for j in range(cfg.layers_per_block + 1)]
            )
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(out_ch, out_ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, x):
        cfg = self.cfg
        h = self.encoder.conv_in(x)
        for i in range(len(cfg.block_out_channels)):
            blk = self.encoder.down_blocks[i]
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))  # torch Downsample2D(padding=0)
                h = blk.downsamplers[0].conv(h)
        h = self.encoder.mid_block(h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        cfg = self.cfg
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for i in range(len(cfg.block_out_channels)):
            blk = self.decoder.up_blocks[i]
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def torch_ddim_step(acp, final_acp, eps, t, prev_t, sample):
    """diffusers DDIMScheduler.step (eta=0, epsilon prediction), re-derived."""
    acp_t = acp[t]
    acp_prev = acp[prev_t] if prev_t >= 0 else final_acp
    pred_x0 = (sample - (1 - acp_t) ** 0.5 * eps) / acp_t**0.5
    direction = (1 - acp_prev) ** 0.5 * eps
    return acp_prev**0.5 * pred_x0 + direction


# ---------------------------------------------------------------------------
# Tiny configs (exercise every block variant: CrossAttn + plain blocks,
# per-level head counts, multi-resnet layers, channel changes)
# ---------------------------------------------------------------------------

ORACLE_UNET = UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16, 24),
    down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=2,
    norm_num_groups=4,
    attention_head_dim=(2, 4, 4),
    projection_class_embeddings_input_dim=8,
)

ORACLE_VAE = VAEConfig(
    in_channels=1,
    out_channels=1,
    block_out_channels=(8, 16),
    layers_per_block=1,
    latent_channels=4,
    norm_num_groups=4,
    scaling_factor=0.9,
)


def to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def torch_unet():
    torch.manual_seed(0)
    return TUNet(ORACLE_UNET).eval()


@pytest.fixture(scope="module")
def torch_vae():
    torch.manual_seed(1)
    return TVAE(ORACLE_VAE).eval()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_unet_parity(torch_unet, rng):
    params = convert_unet_state(to_numpy_sd(torch_unet))
    x = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)  # NCHW
    t = np.array([17, 903], dtype=np.int64)
    cls = rng.standard_normal((2, 8)).astype(np.float32)

    with torch.no_grad():
        out_t = torch_unet(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cls)).numpy()
    out_j = np.asarray(
        apply_unet(
            params, ORACLE_UNET, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t), class_labels=jnp.asarray(cls)
        )
    ).transpose(0, 3, 1, 2)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_unet_parity_with_cross_attention_context(rng):
    """cross_attention_dim set + encoder_hidden_states passed — the generic
    diffusers path (beyond the audioldm corner), kept working for parity."""
    cfg = UNetConfig(
        in_channels=4,
        out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=2,
        cross_attention_dim=12,
        projection_class_embeddings_input_dim=8,
    )
    torch.manual_seed(2)
    model = TUNet(cfg).eval()
    params = convert_unet_state(to_numpy_sd(model))
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([5, 500], dtype=np.int64)
    cls = rng.standard_normal((2, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 12)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cls), torch.from_numpy(ctx)).numpy()
    out_j = np.asarray(
        apply_unet(
            params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
            class_labels=jnp.asarray(cls), encoder_hidden_states=jnp.asarray(ctx),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_vae_encode_parity(torch_vae, rng):
    params = convert_vae_state(to_numpy_sd(torch_vae))
    # odd spatial dims exercise the asymmetric (0,1) downsample padding
    x = rng.standard_normal((2, 1, 17, 9)).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = torch_vae.encode_moments(torch.from_numpy(x))
    dist = vae_lib.encode(params, ORACLE_VAE, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(dist.mean).transpose(0, 3, 1, 2), mean_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dist.logvar).transpose(0, 3, 1, 2), logvar_t.numpy(), atol=1e-4)


def test_vae_decode_parity(torch_vae, rng):
    params = convert_vae_state(to_numpy_sd(torch_vae))
    z = rng.standard_normal((2, 4, 8, 4)).astype(np.float32)
    with torch.no_grad():
        out_t = torch_vae.decode(torch.from_numpy(z)).numpy()
    out_j = np.asarray(vae_lib.decode(params, ORACLE_VAE, jnp.asarray(z.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=1e-4)


def test_add_noise_and_ddim_step_parity(rng):
    """Scheduler math vs an independent float64 torch derivation of the
    diffusers DDIM formulas (scaled_linear betas, leading spacing)."""
    cfg = DDIMConfig()
    schedule = make_schedule(cfg)
    # independent beta/alpha tables
    betas = torch.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, 1000, dtype=torch.float64) ** 2
    acp = torch.cumprod(1.0 - betas, dim=0)
    np.testing.assert_allclose(np.asarray(schedule.alphas_cumprod), acp.numpy(), rtol=1e-6)
    assert float(schedule.final_alpha_cumprod) == pytest.approx(float(acp[0]), rel=1e-6)

    x0 = rng.standard_normal((2, 3, 4, 2)).astype(np.float32)
    noise = rng.standard_normal((2, 3, 4, 2)).astype(np.float32)
    t = np.array([7, 613])
    noisy_j = np.asarray(add_noise(schedule, jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
    for i, ti in enumerate(t):
        a = float(acp[ti])
        expect = a**0.5 * x0[i] + (1 - a) ** 0.5 * noise[i]
        np.testing.assert_allclose(noisy_j[i], expect, atol=1e-5)

    # step parity across the trajectory incl. the prev_t < 0 final step
    ts = inference_timesteps(cfg, 5)
    prev = ts - (1000 // 5)
    sample = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
    eps = rng.standard_normal((1, 3, 4, 2)).astype(np.float32)
    for t_i, p_i in zip(ts, prev):
        out_j = np.asarray(ddim_step(schedule, jnp.asarray(eps), jnp.asarray(t_i), jnp.asarray(p_i), jnp.asarray(sample)))
        out_t = torch_ddim_step(acp, acp[0], torch.from_numpy(eps).double(), int(t_i), int(p_i), torch.from_numpy(sample).double()).numpy()
        np.testing.assert_allclose(out_j, out_t, atol=1e-5)
        sample = out_j.astype(np.float32)


def test_training_stage_parity(torch_unet, torch_vae, rng):
    """The reference's training loss stages, torch vs JAX with shared weights
    and shared randomness (train_audioldm_lora.py:495-549): VAE encode mode ×
    scaling_factor -> add_noise -> unet(class_labels) -> MSE vs noise."""
    unet_p = convert_unet_state(to_numpy_sd(torch_unet))
    vae_p = convert_vae_state(to_numpy_sd(torch_vae))
    cfg = DDIMConfig()
    schedule = make_schedule(cfg)
    acp = torch.from_numpy(np.asarray(schedule.alphas_cumprod)).double()

    mel = rng.standard_normal((2, 1, 32, 16)).astype(np.float32)  # NCHW [B,1,T,F]
    noise = rng.standard_normal((2, 4, 16, 8)).astype(np.float32)
    t = np.array([250, 750], dtype=np.int64)
    emb = rng.standard_normal((2, 8)).astype(np.float32)
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    sf = ORACLE_VAE.scaling_factor

    with torch.no_grad():
        mean_t, _ = torch_vae.encode_moments(torch.from_numpy(mel))
        lat_t = mean_t * sf
        noisy_t = torch.zeros_like(lat_t)
        for i, ti in enumerate(t):
            a = float(acp[ti])
            noisy_t[i] = a**0.5 * lat_t[i] + (1 - a) ** 0.5 * torch.from_numpy(noise[i])
        eps_t = torch_unet(noisy_t, torch.from_numpy(t), torch.from_numpy(emb))
        loss_t = float(F.mse_loss(eps_t, torch.from_numpy(noise)))

    dist = vae_lib.encode(vae_p, ORACLE_VAE, jnp.asarray(mel.transpose(0, 2, 3, 1)))
    lat_j = dist.mode * sf
    noisy_j = add_noise(schedule, lat_j, jnp.asarray(noise.transpose(0, 2, 3, 1)), jnp.asarray(t))
    eps_j = apply_unet(unet_p, ORACLE_UNET, noisy_j, jnp.asarray(t), class_labels=jnp.asarray(emb))
    loss_j = float(jnp.mean((eps_j - jnp.asarray(noise.transpose(0, 2, 3, 1))) ** 2))

    np.testing.assert_allclose(
        np.asarray(eps_j).transpose(0, 3, 1, 2), eps_t.numpy(), atol=2e-4
    )
    assert loss_j == pytest.approx(loss_t, abs=1e-5)


def test_full_pipeline_trajectory_parity(torch_unet, torch_vae, rng):
    """2-step end-to-end generate trajectory: transformers CLAP text encoder +
    torch UNet/DDIM/VAE + transformers HiFi-GAN vs our fused pipeline stages,
    all with shared weights (SURVEY.md §3.2 stage list; CFG scale 2.0)."""
    from transformers import ClapTextConfig as HFClapTextConfig
    from transformers import ClapTextModelWithProjection, SpeechT5HifiGan, SpeechT5HifiGanConfig

    from audioldm_tpu.ckpt import convert_clap_text_state, convert_vocoder_state
    from audioldm_tpu.config import ClapTextConfig, VocoderConfig
    from audioldm_tpu.models.clap_text import apply_clap_text
    from audioldm_tpu.models.vocoder import apply_vocoder

    text_kw = dict(
        vocab_size=64, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=40, projection_dim=8,
    )
    voc_kw = dict(
        model_in_dim=16, sampling_rate=16000, upsample_initial_channel=16,
        upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        leaky_relu_slope=0.1, normalize_before=True,
    )
    torch.manual_seed(3)
    t_text = ClapTextModelWithProjection(HFClapTextConfig(**text_kw)).eval()
    t_voc = SpeechT5HifiGan(SpeechT5HifiGanConfig(**voc_kw)).eval()

    text_p = convert_clap_text_state(to_numpy_sd(t_text))
    voc_p = convert_vocoder_state(to_numpy_sd(t_voc))
    unet_p = convert_unet_state(to_numpy_sd(torch_unet))
    vae_p = convert_vae_state(to_numpy_sd(torch_vae))
    text_cfg = ClapTextConfig(**text_kw)
    voc_cfg = VocoderConfig(
        **{k: (tuple(map(tuple, v)) if k == "resblock_dilation_sizes" else tuple(v) if isinstance(v, list) else v) for k, v in voc_kw.items()}
    )
    ddim_cfg = DDIMConfig()
    schedule = make_schedule(ddim_cfg)
    acp = torch.from_numpy(np.asarray(schedule.alphas_cumprod)).double()

    ids = np.full((1, 6), 5, np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    u_ids = np.full((1, 6), 1, np.int64)
    u_ids[:, 0] = 0
    u_mask = np.zeros_like(u_ids)
    u_mask[:, 0] = 1

    steps, g = 2, 2.0
    # latents: [B, C=4, T=16, F=8] NCHW ([B,16,8,4] NHWC); VAE 2x up -> mel
    # [B, 32, 16] -> vocoder model_in_dim 16
    lat0 = rng.standard_normal((1, 4, 16, 8)).astype(np.float32)
    sf = ORACLE_VAE.scaling_factor

    # ---- torch trajectory ----
    with torch.no_grad():
        cond = t_text(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).text_embeds
        cond = F.normalize(cond, dim=-1)
        uncond = t_text(input_ids=torch.from_numpy(u_ids), attention_mask=torch.from_numpy(u_mask)).text_embeds
        uncond = F.normalize(uncond, dim=-1)
        embeds = torch.cat([uncond, cond], dim=0)
        lat = torch.from_numpy(lat0)
        ts = inference_timesteps(ddim_cfg, steps)
        prev = ts - (1000 // steps)
        for t_i, p_i in zip(ts, prev):
            model_in = torch.cat([lat, lat], dim=0)
            tt = torch.full((2,), int(t_i), dtype=torch.long)
            eps = torch_unet(model_in, tt, embeds)
            eps_u, eps_c = eps[:1], eps[1:]
            eps = eps_u + g * (eps_c - eps_u)
            lat = torch_ddim_step(acp, acp[0], eps.double(), int(t_i), int(p_i), lat.double()).float()
        mel_t = torch_vae.decode(lat / sf)  # [B,1,32,16]
        wav_t = t_voc(mel_t[:, 0]).numpy()

    # ---- JAX trajectory (the pipeline's own stages) ----
    from audioldm_tpu.pipeline.generate import AudioLDMModules, denoise, encode_prompt

    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=text_p, vocoder=voc_p,
        unet_cfg=ORACLE_UNET, vae_cfg=ORACLE_VAE, text_cfg=text_cfg,
        vocoder_cfg=voc_cfg, ddim_cfg=ddim_cfg,
    )
    cond_j = encode_prompt(modules, jnp.asarray(ids), jnp.asarray(mask))
    uncond_j = encode_prompt(modules, jnp.asarray(u_ids), jnp.asarray(u_mask))
    np.testing.assert_allclose(np.asarray(cond_j), cond.numpy(), atol=2e-5)
    lat_j = denoise(modules, jnp.asarray(lat0.transpose(0, 2, 3, 1)), cond_j, uncond_j, steps, g)
    np.testing.assert_allclose(np.asarray(lat_j).transpose(0, 3, 1, 2), lat.numpy(), atol=2e-4)
    mel_j = vae_lib.decode(vae_p, ORACLE_VAE, lat_j / sf)
    wav_j = np.asarray(apply_vocoder(voc_p, voc_cfg, mel_j[..., 0]))
    np.testing.assert_allclose(wav_j, wav_t, atol=5e-4)


def test_bridge_roundtrip_unet(torch_unet):
    """export_unet_state(convert_unet_state(sd)) == sd — checkpoints trained
    here stay loadable by the reference's torch stack (VERDICT weak #1)."""
    from audioldm_tpu.ckpt import export_unet_state

    sd = to_numpy_sd(torch_unet)
    back = export_unet_state(convert_unet_state(sd))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], atol=0)


# ---------------------------------------------------------------------------
# Full-geometry tier (VERDICT round-2 next-step #4): the toy configs above
# can't catch shape-dependent bugs — legacy int `attention_head_dim` (= head
# COUNT) at non-power-of-two per-head dims, 4-level asymmetric 256x16
# latents, groupnorm at the real norm_num_groups=32, odd-size coarsest
# levels through the nearest-upsample path. This tier runs the REAL
# audioldm-s block graph (train_audioldm_lora.py:364-371 geometry) at 1/4
# channel width — same level count, same latent shape, same head count —
# which is memory/time-feasible on the 1-CPU CI while exercising every
# shape-dependent code path the full checkpoint will hit.
# ---------------------------------------------------------------------------

FULLGEOM_UNET = UNetConfig(
    in_channels=8,
    out_channels=8,
    # real: (128, 256, 384, 640) — same 1:2:3:5 asymmetric ratios at 1/4 width
    block_out_channels=(32, 64, 96, 160),
    down_block_types=(
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D",
    ),
    up_block_types=(
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    ),
    layers_per_block=2,
    norm_num_groups=32,  # the real value; 32|96, 32|160 exercise odd groups
    # legacy INT semantics: head COUNT 8 at every level (the real checkpoint
    # config) -> per-head dims 4/8/12/20 incl. non-power-of-two
    attention_head_dim=8,
    projection_class_embeddings_input_dim=512,
    class_embeddings_concat=True,
)

FULLGEOM_VAE = VAEConfig(
    in_channels=1,
    out_channels=1,
    block_out_channels=(32, 64, 128),  # real: (128, 256, 512)
    layers_per_block=2,
    latent_channels=8,
    norm_num_groups=32,
    scaling_factor=0.9227914214134216,
)


@pytest.fixture(scope="module")
def fullgeom_unet():
    torch.manual_seed(10)
    return TUNet(FULLGEOM_UNET).eval()


@pytest.fixture(scope="module")
def fullgeom_vae():
    torch.manual_seed(11)
    return TVAE(FULLGEOM_VAE).eval()


def test_fullgeom_unet_parity(fullgeom_unet, rng):
    """Forward parity at the real 256x16x8 latent geometry, 4 levels,
    head-count-8 legacy attention_head_dim."""
    params = convert_unet_state(to_numpy_sd(fullgeom_unet))
    x = rng.standard_normal((1, 8, 256, 16)).astype(np.float32)  # NCHW
    t = np.array([617], dtype=np.int64)
    cls = rng.standard_normal((1, 512)).astype(np.float32)
    cls = cls / np.linalg.norm(cls, axis=-1, keepdims=True)

    with torch.no_grad():
        out_t = fullgeom_unet(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cls)).numpy()
    out_j = np.asarray(
        apply_unet(
            params, FULLGEOM_UNET, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), class_labels=jnp.asarray(cls),
        )
    ).transpose(0, 3, 1, 2)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=5e-4)


def test_fullgeom_unet_odd_size_upsample(fullgeom_unet, rng):
    """Odd spatial dims through the 4-level graph: 40x8 -> 20x4 -> 10x2 ->
    5x1 at the coarsest level, then nearest-upsample 5x1 -> 10x2 -> ... —
    pins the odd-size upsample/skip alignment (VERDICT Missing #2)."""
    params = convert_unet_state(to_numpy_sd(fullgeom_unet))
    x = rng.standard_normal((1, 8, 40, 8)).astype(np.float32)
    t = np.array([42], dtype=np.int64)
    cls = rng.standard_normal((1, 512)).astype(np.float32)

    with torch.no_grad():
        out_t = fullgeom_unet(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cls)).numpy()
    out_j = np.asarray(
        apply_unet(
            params, FULLGEOM_UNET, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), class_labels=jnp.asarray(cls),
        )
    ).transpose(0, 3, 1, 2)
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(out_j, out_t, atol=5e-4)


def test_fullgeom_vae_parity(fullgeom_vae, rng):
    """VAE at the real 1024x64 mel <-> 256x16x8 latent geometry."""
    params = convert_vae_state(to_numpy_sd(fullgeom_vae))
    mel = rng.standard_normal((1, 1, 1024, 64)).astype(np.float32)
    with torch.no_grad():
        mean_t, logvar_t = fullgeom_vae.encode_moments(torch.from_numpy(mel))
    dist = vae_lib.encode(params, FULLGEOM_VAE, jnp.asarray(mel.transpose(0, 2, 3, 1)))
    assert dist.mean.shape == (1, 256, 16, 8)
    np.testing.assert_allclose(np.asarray(dist.mean).transpose(0, 3, 1, 2), mean_t.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dist.logvar).transpose(0, 3, 1, 2), logvar_t.numpy(), atol=5e-4)

    z = rng.standard_normal((1, 8, 256, 16)).astype(np.float32)
    with torch.no_grad():
        out_t = fullgeom_vae.decode(torch.from_numpy(z)).numpy()
    out_j = np.asarray(vae_lib.decode(params, FULLGEOM_VAE, jnp.asarray(z.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert out_j.shape == (1, 1, 1024, 64)
    np.testing.assert_allclose(out_j, out_t, atol=5e-4)


def test_fullgeom_pipeline_trajectory(fullgeom_unet, fullgeom_vae, rng):
    """3-step CFG DDIM trajectory + VAE decode at the real latent geometry —
    the accumulated-error version of the per-module tests above."""
    unet_p = convert_unet_state(to_numpy_sd(fullgeom_unet))
    vae_p = convert_vae_state(to_numpy_sd(fullgeom_vae))
    ddim_cfg = DDIMConfig()
    schedule = make_schedule(ddim_cfg)
    acp = torch.from_numpy(np.asarray(schedule.alphas_cumprod)).double()

    steps, g = 3, 2.5
    lat0 = rng.standard_normal((1, 8, 256, 16)).astype(np.float32)
    cond = rng.standard_normal((1, 512)).astype(np.float32)
    cond = cond / np.linalg.norm(cond, axis=-1, keepdims=True)
    uncond = rng.standard_normal((1, 512)).astype(np.float32)
    uncond = uncond / np.linalg.norm(uncond, axis=-1, keepdims=True)
    sf = FULLGEOM_VAE.scaling_factor

    with torch.no_grad():
        embeds = torch.from_numpy(np.concatenate([uncond, cond], axis=0))
        lat = torch.from_numpy(lat0)
        ts = inference_timesteps(ddim_cfg, steps)
        prev = ts - (1000 // steps)
        for t_i, p_i in zip(ts, prev):
            model_in = torch.cat([lat, lat], dim=0)
            tt = torch.full((2,), int(t_i), dtype=torch.long)
            eps = fullgeom_unet(model_in, tt, embeds)
            eps_u, eps_c = eps[:1], eps[1:]
            eps = eps_u + g * (eps_c - eps_u)
            lat = torch_ddim_step(acp, acp[0], eps.double(), int(t_i), int(p_i), lat.double()).float()
        mel_t = fullgeom_vae.decode(lat / sf).numpy()

    from audioldm_tpu.pipeline.generate import AudioLDMModules, denoise

    modules = AudioLDMModules(
        unet=unet_p, vae=vae_p, text_encoder=None, vocoder=None,
        unet_cfg=FULLGEOM_UNET, vae_cfg=FULLGEOM_VAE, text_cfg=None,
        vocoder_cfg=None, ddim_cfg=ddim_cfg,
    )
    lat_j = denoise(
        modules, jnp.asarray(lat0.transpose(0, 2, 3, 1)), jnp.asarray(cond),
        jnp.asarray(uncond), steps, g,
    )
    np.testing.assert_allclose(np.asarray(lat_j).transpose(0, 3, 1, 2), lat.numpy(), atol=2e-3)
    mel_j = np.asarray(vae_lib.decode(vae_p, FULLGEOM_VAE, lat_j / sf)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(mel_j, mel_t, atol=2e-3)


def test_fullgeom_unet_nondivisible_resolution(fullgeom_unet, rng):
    """The 10.0 s clip case: 1000 mel frames -> 250-frame latents, which do
    NOT divide by 2**3 (250 -> 125 -> 63 -> 32). diffusers handles this via
    forward_upsample_size (upsample to the skip's size, 32 -> 63 -> 125 ->
    250); this pins our _upsample_nearest torch-index semantics at a
    non-2x resize. A 125x16 slice keeps the test fast."""
    params = convert_unet_state(to_numpy_sd(fullgeom_unet))
    x = rng.standard_normal((1, 8, 125, 16)).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    cls = rng.standard_normal((1, 512)).astype(np.float32)

    with torch.no_grad():
        out_t = fullgeom_unet(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cls)).numpy()
    out_j = np.asarray(
        apply_unet(
            params, FULLGEOM_UNET, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), class_labels=jnp.asarray(cls),
        )
    ).transpose(0, 3, 1, 2)
    assert out_j.shape == out_t.shape == (1, 8, 125, 16)
    np.testing.assert_allclose(out_j, out_t, atol=5e-4)
