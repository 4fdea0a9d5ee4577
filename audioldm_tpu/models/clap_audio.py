"""CLAP audio tower — HTSAT Swin transformer with fused mel input.

Behavior pinned by the reference's eval stack: CLAP/KAD scores are computed
from ``ClapModel("laion/clap-htsat-fused").get_audio_features`` embeddings at
48 kHz (script/train/train_audioldm_lora.py:128-137,296-321,361-362;
script/inference/inference.py:86-87). Parity is tested against the installed
``transformers`` implementation with shared weights (tests/test_clap_audio.py).

Architecture (config-driven, ClapAudioConfig): BatchNorm over mel bins ->
mel->"image" reshape with align-corners bicubic time interpolation ->
fused patch embed (global 4x4 conv + local 3-crop conv + attentional feature
fusion) -> 4 Swin stages (window attention with relative position bias,
shifted windows, patch merging) -> LayerNorm -> token-mean pooling ->
2-layer MLP projection.

TPU-first notes: all window partitions/shift masks/relative-position indices
and the bicubic interpolation matrix are host-precomputed static constants;
the whole tower is one jit with static shapes; ``is_longer`` is handled
branchlessly (both fusion paths computed, per-sample select) so one compiled
program serves mixed batches.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import ClapAudioConfig
from audioldm_tpu.models.nn import (
    ACT,
    conv2d,
    init_conv2d,
    init_linear,
    init_norm,
    layer_norm,
    linear,
)

# ---------------------------------------------------------------------------
# Static host-side tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """Pairwise relative-position index inside a window [N, N]."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(height: int, width: int, window: int, shift: int) -> Optional[np.ndarray]:
    """SW-MSA attention mask [num_windows, N, N] (0 / -100)."""
    if shift == 0:
        return None
    img = np.zeros((height, width))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(height // window, window, width // window, window).transpose(0, 2, 1, 3)
    win = win.reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def cubic_interp_matrix(n_in: int, n_out: int, align_corners: bool = True) -> np.ndarray:
    """1-D cubic-convolution interpolation matrix [n_out, n_in] matching
    torch's bicubic (Keys kernel a=-0.75) with align_corners semantics —
    used by reshape_mel2img's time-axis resize. Precomputed so the resize is
    a single MXU matmul."""
    a = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
        f = int(np.floor(src))
        for j in range(f - 1, f + 3):
            W[i, min(max(j, 0), n_in - 1)] += k(src - j)
    return W.astype(np.float32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_bn(dim: int) -> dict:
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "running_mean": jnp.zeros((dim,)),
        "running_var": jnp.ones((dim,)),
    }


def _apply_bn(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["running_mean"]) * inv * p["scale"] + p["bias"]).astype(x.dtype)


def _init_aff(key, cfg: ClapAudioConfig) -> dict:
    ch = cfg.patch_embeds_hidden_size
    inter = ch // cfg.aff_block_r
    ks = jax.random.split(key, 4)
    return {
        "local_att": {
            "0": init_conv2d(ks[0], ch, inter, 1),
            "1": _init_bn(inter),
            "3": init_conv2d(ks[1], inter, ch, 1),
            "4": _init_bn(ch),
        },
        "global_att": {
            "1": init_conv2d(ks[2], ch, inter, 1),
            "2": _init_bn(inter),
            "4": init_conv2d(ks[3], inter, ch, 1),
            "5": _init_bn(ch),
        },
    }


def _init_swin_block(key, cfg: ClapAudioConfig, dim: int) -> dict:
    ks = jax.random.split(key, 7)
    window = cfg.window_size
    return {
        "layernorm_before": init_norm(dim),
        "attention": {
            "self": {
                "query": init_linear(ks[0], dim, dim, bias=cfg.qkv_bias),
                "key": init_linear(ks[1], dim, dim, bias=cfg.qkv_bias),
                "value": init_linear(ks[2], dim, dim, bias=cfg.qkv_bias),
                "relative_position_bias_table": jnp.zeros(((2 * window - 1) ** 2, 1)),  # resized per stage in init
            },
            "output": {"dense": init_linear(ks[3], dim, dim)},
        },
        "layernorm_after": init_norm(dim),
        "intermediate": {"dense": init_linear(ks[4], dim, int(cfg.mlp_ratio * dim))},
        "output": {"dense": init_linear(ks[5], int(cfg.mlp_ratio * dim), dim)},
    }


def init_clap_audio(key, cfg: ClapAudioConfig = ClapAudioConfig()) -> dict:
    keys = iter(jax.random.split(key, 4096))
    nk = lambda: next(keys)
    window = cfg.window_size
    p: dict = {
        "audio_model": {
            "audio_encoder": {
                "batch_norm": _init_bn(cfg.num_mel_bins),
                "patch_embed": {
                    "proj": init_conv2d(nk(), cfg.patch_embed_input_channels, cfg.patch_embeds_hidden_size, cfg.patch_size),
                    "norm": init_norm(cfg.patch_embeds_hidden_size),
                },
                "layers": {},
                "norm": init_norm(int(cfg.patch_embeds_hidden_size * 2 ** (len(cfg.depths) - 1))),
            }
        },
        "audio_projection": {
            "linear1": init_linear(nk(), cfg.hidden_size, cfg.projection_dim),
            "linear2": init_linear(nk(), cfg.projection_dim, cfg.projection_dim),
        },
    }
    enc = p["audio_model"]["audio_encoder"]
    if cfg.enable_fusion:
        # local conv kernel is (patch, 3*patch) with stride (patch, 3*patch)
        k3 = jax.random.normal(nk(), (cfg.patch_size, cfg.patch_size * 3, cfg.patch_embed_input_channels, cfg.patch_embeds_hidden_size)) * 0.02
        enc["patch_embed"]["mel_conv2d"] = {"kernel": k3, "bias": jnp.zeros((cfg.patch_embeds_hidden_size,))}
        enc["patch_embed"]["fusion_model"] = _init_aff(nk(), cfg)

    for i_layer, depth in enumerate(cfg.depths):
        dim = int(cfg.patch_embeds_hidden_size * 2**i_layer)
        heads = cfg.num_attention_heads[i_layer]
        stage: dict = {"blocks": {}}
        for b in range(depth):
            blk = _init_swin_block(nk(), cfg, dim)
            blk["attention"]["self"]["relative_position_bias_table"] = (
                jnp.zeros(((2 * window - 1) ** 2, heads))
            )
            stage["blocks"][str(b)] = blk
        if i_layer < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm": init_norm(4 * dim),
                "reduction": init_linear(nk(), 4 * dim, 2 * dim, bias=False),
            }
        enc["layers"][str(i_layer)] = stage
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    b, h_, w_, c = x.shape
    x = x.reshape(b, h_ // w, w, w_ // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: jnp.ndarray, w: int, h_: int, w_: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h_ // w, w_ // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h_, w_, c)


def _swin_block(
    p: dict,
    x: jnp.ndarray,
    resolution: tuple[int, int],
    heads: int,
    window: int,
    shift: int,
    cfg: ClapAudioConfig,
) -> jnp.ndarray:
    height, width = resolution
    if min(resolution) <= window:
        window, shift = min(resolution), 0
    b, n, c = x.shape
    shortcut = x
    h = layer_norm(p["layernorm_before"], x, eps=cfg.layer_norm_eps)
    h = h.reshape(b, height, width, c)
    pad_b = (window - height % window) % window
    pad_r = (window - width % window) % window
    if pad_b or pad_r:
        h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = height + pad_b, width + pad_r
    if shift > 0:
        h = jnp.roll(h, shift=(-shift, -shift), axis=(1, 2))
    windows = _window_partition(h, window)  # [B*nW, N, C]

    sa = p["attention"]["self"]
    nw = windows.shape[0] // b
    nwin = window * window

    def split(t):
        return t.reshape(-1, nwin, heads, c // heads).transpose(0, 2, 1, 3)

    q = split(linear(sa["query"], windows))
    k = split(linear(sa["key"], windows))
    v = split(linear(sa["value"], windows))
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) / math.sqrt(c // heads)
    rpi = relative_position_index(window)
    bias = sa["relative_position_bias_table"][rpi.reshape(-1)].reshape(nwin, nwin, heads)
    logits = logits + bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    mask = shift_attn_mask(hp, wp, window, shift)
    if mask is not None:
        logits = logits.reshape(b, nw, heads, nwin, nwin) + jnp.asarray(mask)[None, :, None]
        logits = logits.reshape(-1, heads, nwin, nwin)
    attn = jax.nn.softmax(logits, axis=-1).astype(windows.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32).astype(windows.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(-1, nwin, c)
    out = linear(p["attention"]["output"]["dense"], out)

    out = _window_reverse(out.reshape(-1, window, window, c), window, hp, wp)
    if shift > 0:
        out = jnp.roll(out, shift=(shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        out = out[:, :height, :width]
    h = shortcut + out.reshape(b, n, c)

    ff = layer_norm(p["layernorm_after"], h, eps=cfg.layer_norm_eps)
    ff = ACT[cfg.hidden_act](linear(p["intermediate"]["dense"], ff))
    h = h + linear(p["output"]["dense"], ff)
    return h


def _patch_merge(p: dict, x: jnp.ndarray, resolution: tuple[int, int], eps: float) -> jnp.ndarray:
    height, width = resolution
    b, n, c = x.shape
    x = x.reshape(b, height, width, c)
    if height % 2 or width % 2:
        x = jnp.pad(x, ((0, 0), (0, height % 2), (0, width % 2), (0, 0)))
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(b, -1, 4 * c)
    x = layer_norm(p["norm"], x, eps=eps)
    return linear(p["reduction"], x)


def _aff(p: dict, hidden: jnp.ndarray, residual: jnp.ndarray) -> jnp.ndarray:
    """Attentional feature fusion (NHWC)."""
    x = hidden + residual
    la = p["local_att"]
    local = conv2d(la["0"], x)
    local = jax.nn.relu(_apply_bn(la["1"], local))
    local = _apply_bn(la["4"], conv2d(la["3"], local))
    ga = p["global_att"]
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = jax.nn.relu(_apply_bn(ga["2"], conv2d(ga["1"], g)))
    g = _apply_bn(ga["5"], conv2d(ga["4"], g))
    w = jax.nn.sigmoid(local + g)
    return 2.0 * hidden * w + 2.0 * residual * (1.0 - w)


def reshape_mel2img(x: jnp.ndarray, cfg: ClapAudioConfig) -> jnp.ndarray:
    """[B, C, T, F] mel -> [B, C, F*ratio, T/ratio] 'image'
    (transformers ClapAudioEncoder.reshape_mel2img semantics, incl. the
    align-corners bicubic time interpolation)."""
    b, c, t, f = x.shape
    ratio = cfg.freq_ratio
    spec_w = cfg.spec_size * ratio
    spec_h = cfg.spec_size // ratio
    if t > spec_w or f > spec_h:
        raise ValueError(f"mel ({t}x{f}) larger than model input ({spec_w}x{spec_h})")
    if t < spec_w:
        W = jnp.asarray(cubic_interp_matrix(t, spec_w))
        x = jnp.einsum("ot,bctf->bcof", W, x)
    if f < spec_h:
        W = jnp.asarray(cubic_interp_matrix(f, spec_h))
        x = jnp.einsum("of,bctf->bcto", W, x)
    t2, f2 = x.shape[2], x.shape[3]
    x = x.reshape(b, c * ratio, t2 // ratio, f2)
    x = x.transpose(0, 1, 3, 2)
    x = x.reshape(b, c, f2 * ratio, t2 // ratio)
    return x


def apply_clap_audio(
    params: dict,
    cfg: ClapAudioConfig,
    input_features: jnp.ndarray,
    is_longer: Optional[jnp.ndarray] = None,
) -> dict:
    """``input_features``: ``[B, 4, T, num_mel_bins]`` fused log-mels (or
    ``[B, 1, T, bins]`` without fusion); ``is_longer``: bool ``[B]``.
    Returns ``{"audio_embeds", "pooler_output"}``."""
    enc = params["audio_model"]["audio_encoder"]
    b = input_features.shape[0]

    # BatchNorm over mel bins (channel = frequency axis)
    x = _apply_bn(enc["batch_norm"], input_features)  # [..., F] channel-last already

    x = reshape_mel2img(x, cfg)  # [B, C, H, W]

    pe = enc["patch_embed"]
    ps = cfg.patch_size
    global_x = x[:, 0:1].transpose(0, 2, 3, 1)  # NHWC [B, H, W, 1]
    g = conv2d(pe["proj"], global_x, stride=ps, padding=0)  # [B, H/ps, W/ps, C]

    if cfg.enable_fusion:
        if is_longer is None:
            is_longer = jnp.zeros((b,), bool)
        local_x = x[:, 1:4].reshape(b * 3, 1, x.shape[2], x.shape[3]).transpose(0, 2, 3, 1)
        l = conv2d(pe["mel_conv2d"], local_x, stride=(ps, ps * 3), padding=0)  # [B*3, h, wl, C]
        h_, wl, cch = l.shape[1], l.shape[2], l.shape[3]
        l = l.reshape(b, 3, h_, wl, cch).transpose(0, 2, 1, 3, 4).reshape(b, h_, 3 * wl, cch)
        out_w = g.shape[2]
        if 3 * wl < out_w:
            l = jnp.pad(l, ((0, 0), (0, 0), (0, out_w - 3 * wl), (0, 0)))
        fused = _aff(pe["fusion_model"], g, l)
        g = jnp.where(is_longer[:, None, None, None], fused, g)

    gh, gw = g.shape[1], g.shape[2]
    h = g.reshape(b, gh * gw, -1)
    if cfg.enable_patch_layer_norm:
        h = layer_norm(pe["norm"], h, eps=cfg.layer_norm_eps)

    resolution = (gh, gw)
    for i_layer, depth in enumerate(cfg.depths):
        stage = enc["layers"][str(i_layer)]
        heads = cfg.num_attention_heads[i_layer]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            h = _swin_block(stage["blocks"][str(bi)], h, resolution, heads, cfg.window_size, shift, cfg)
        if "downsample" in stage:
            h = _patch_merge(stage["downsample"], h, resolution, cfg.layer_norm_eps)
            resolution = ((resolution[0] + 1) // 2, (resolution[1] + 1) // 2)

    h = layer_norm(enc["norm"], h, eps=cfg.layer_norm_eps)
    pooled = jnp.mean(h, axis=1)  # == torch's group-reshape + AdaptiveAvgPool1d(1)

    proj = params["audio_projection"]
    emb = linear(proj["linear2"], ACT[cfg.projection_hidden_act](linear(proj["linear1"], pooled)))
    return {"audio_embeds": emb, "pooler_output": pooled, "last_hidden_state": h}
