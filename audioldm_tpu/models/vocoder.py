"""HiFi-GAN vocoder (SpeechT5HifiGan-compatible).

Behavior pinned by the reference's vocoder load
(script/train/train_audioldm_lora.py:371) and the pipeline stage mel
``[B, T, 64]`` -> waveform @16 kHz with hop 160 (SURVEY.md §3.2): optional
mean/scale input normalization, conv_pre (k=7), a stack of transposed-conv
upsamplers whose rates multiply to 160, multi-receptive-field residual blocks
(kernels x dilations, averaged), leaky-relu, conv_post, tanh.

Parity is tested against the installed ``transformers.SpeechT5HifiGan`` with
shared weights (tests/test_vocoder.py).

TPU-first: NWC layout; transposed convs are lhs-dilated convs (XLA native);
the whole vocoder jits into the generation graph so mel->wav never leaves the
device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioldm_tpu.config import VocoderConfig
from audioldm_tpu.kernels import mrf_conv
from audioldm_tpu.models.nn import conv1d, conv_transpose1d, init_conv1d


def _leaky(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def init_vocoder(key, cfg: VocoderConfig = VocoderConfig()) -> dict:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)
    p: dict = {
        "conv_pre": init_conv1d(nk(), cfg.model_in_dim, cfg.upsample_initial_channel, 7),
        "upsampler": {},
        "resblocks": {},
        "mean": jnp.zeros((cfg.model_in_dim,)),
        "scale": jnp.ones((cfg.model_in_dim,)),
    }
    ch = cfg.upsample_initial_channel
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = cfg.upsample_initial_channel // (2**i)
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        # stored WIO (in, out); torch ConvTranspose1d weight [in, out, W] transposed at load
        p["upsampler"][str(i)] = init_conv1d(nk(), in_ch, out_ch, ksize)
        ch = out_ch
        for j, (k, dil) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            rb = {
                "convs1": {str(d): init_conv1d(nk(), out_ch, out_ch, k) for d in range(len(dil))},
                "convs2": {str(d): init_conv1d(nk(), out_ch, out_ch, k) for d in range(len(dil))},
            }
            p["resblocks"][str(i * num_kernels + j)] = rb
    p["conv_post"] = init_conv1d(nk(), ch, 1, 7)
    return p


def _apply_resblock(p: dict, x: jnp.ndarray, kernel_size: int, dilations, slope: float) -> jnp.ndarray:
    for d, dil in enumerate(dilations):
        res = x
        h = _leaky(x, slope)
        h = conv1d(p["convs1"][str(d)], h, padding=(kernel_size * dil - dil) // 2, dilation=dil)
        h = _leaky(h, slope)
        h = conv1d(p["convs2"][str(d)], h, padding=(kernel_size - 1) // 2)
        x = h + res
    return x


def apply_vocoder(params: dict, cfg: VocoderConfig, spectrogram: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """``spectrogram``: ``[B, T, model_in_dim]`` log-mel -> waveform
    ``[B, T * prod(upsample_rates)]`` float32 in [-1, 1].

    ``dtype=jnp.bfloat16`` runs the conv stack in bf16 (weights cast at use;
    input normalization and the final conv_post+tanh stay fp32). Offered
    because the reference's own app runs the whole pipeline in fp16
    (app.py:6) — but it is NOT the pipeline default: on-chip slope timing
    measured bf16 at 19.2-23.0 ms vs fp32's 19.3-20.6 ms for a 10.24 s clip
    (no reproducible win). The late stages run 32-64 channels over 100k+
    samples, so the conv is layout/HBM-bound, not MXU-FLOP-bound; halving
    the element width doesn't move it (second negative result after the
    space-to-depth repack — PERF.md)."""
    x = spectrogram.astype(jnp.float32)
    if cfg.normalize_before:
        x = (x - params["mean"].astype(x.dtype)) / params["scale"].astype(x.dtype)
    conv_post = params["conv_post"]  # captured BEFORE any bf16 cast: the
    # output stage must run fp32 arithmetic on FULL-precision weights
    if dtype is not None:
        x = x.astype(dtype)
        params = jax.tree.map(lambda w: w.astype(dtype), params)
    num_kernels = len(cfg.resblock_kernel_sizes)
    h = conv1d(params["conv_pre"], x, padding=3)

    # Fused Pallas MRF routing (kernels/mrf_conv.py): the first stage index
    # from which EVERY remaining stage is kernel-supported switches the tail
    # into channel-major [B, C, T] — one entry transpose, then the upsampler
    # conv_transpose, the fused stages, and conv_post all run NCW (measured
    # faster than NWC at these shapes, and it avoids ~0.9 ms of layout
    # transposes per stage boundary — PERF.md vocoder notes).
    route_from = None
    # +conv_post taps: the last fused stage runs the output head in its
    # epilogue, extending the receptive field the halo must absorb
    post_halo = (conv_post["kernel"].shape[0] - 1) // 2
    halo_ok = (
        mrf_conv._receptive_halo(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        + post_halo
        <= mrf_conv._HALO
    )
    if mrf_conv.enabled() and dtype is None and halo_ok:
        tt = h.shape[1]
        lens, chans = [], []
        for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            tt = (tt - 1) * rate - 2 * ((ksize - rate) // 2) + ksize
            lens.append(tt)
            chans.append(cfg.upsample_initial_channel // (2 ** (i + 1)))
        n = len(lens)
        for i in range(n):
            if all(mrf_conv.supported(lens[j], chans[j], jnp.float32) for j in range(i, n)):
                route_from = i
                break

    cm = False  # channel-major tail active?
    for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        h = _leaky(h, cfg.leaky_relu_slope)
        if route_from is not None and i == route_from:
            h = jnp.transpose(h, (0, 2, 1))
            cm = True
        h = conv_transpose1d(
            params["upsampler"][str(i)], h, stride=rate,
            padding=(ksize - rate) // 2, channel_major=cm,
        )
        blocks = [params["resblocks"][str(i * num_kernels + j)] for j in range(num_kernels)]
        last = i == len(cfg.upsample_rates) - 1
        if cm:
            # whole 18-conv residual stack VMEM-resident in one program; the
            # LAST stage also fuses leaky(0.01)+conv_post+tanh into its
            # epilogue and emits the waveform directly (parity tested vs
            # this file's jnp path in tests/test_mrf_conv.py)
            h = mrf_conv.fused_mrf_stage(
                h,
                blocks,
                post=jax.tree.map(lambda w: w.astype(jnp.float32), conv_post) if last else None,
                kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                slope=cfg.leaky_relu_slope,
                interpret=jax.default_backend() != "tpu",
                channel_major=True,
            )
            if last:
                return h[:, 0, :]  # tanh'd waveform from the fused epilogue
        else:
            acc = None
            for blk, k, dil in zip(blocks, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                r = _apply_resblock(blk, h, k, dil, cfg.leaky_relu_slope)
                acc = r if acc is None else acc + r
            h = acc / num_kernels
    h = _leaky(h.astype(jnp.float32), 0.01)  # torch leaky_relu default slope on the output stage
    h = conv1d(jax.tree.map(lambda w: w.astype(jnp.float32), conv_post), h, padding=3)
    h = jnp.tanh(h)
    return h[..., 0]
