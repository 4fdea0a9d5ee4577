"""Text -> audio generation pipeline, fully fused under one jit.

Reference behavior (diffusers ``AudioLDMPipeline.__call__`` as driven by the
repo — app.py:14, generate_audio.py:47-52, train_audioldm_lora.py:142; stage
list reconstructed in SURVEY.md §3.2):

  tokenize -> CLAP text encode -> pooled 512-d embedding, L2-normalized ->
  CFG (uncond = "") -> gaussian latents -> DDIM loop -> VAE decode ->
  HiFi-GAN vocoder -> 16 kHz float waveform.

TPU-first re-design:
- the entire pipeline after host tokenization is ONE jit-compiled function:
  no host round-trips between stages;
- the S-step denoise loop is a single ``lax.scan`` whose body runs the UNet
  once on a CFG-folded batch of 2B (uncond rows stacked with cond rows);
- timestep tables are device constants; shapes are static (steps and clip
  length are compile-time constants);
- bf16 compute through the UNet/VAE/vocoder with fp32 scheduler math.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import (
    ClapTextConfig,
    DDIMConfig,
    MelConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)
from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.clap_text import apply_clap_text, init_clap_text
from audioldm_tpu.models.scheduler import add_noise, ddim_step, inference_timesteps, make_schedule
from audioldm_tpu.models.unet import apply_unet, init_unet
from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class AudioLDMModules:
    """Bundle of all submodel params + configs (the pipeline's 'self').

    Registered as a pytree with the configs as STATIC aux data: a jitted
    function can take the whole bundle as an argument, so the (GB-scale)
    params travel as device buffers instead of being baked into the HLO as
    constants — critical for compile-payload size and retrace avoidance."""

    unet: dict
    vae: dict
    text_encoder: dict
    vocoder: dict
    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    text_cfg: ClapTextConfig
    vocoder_cfg: VocoderConfig
    ddim_cfg: DDIMConfig

    def tree_flatten(self):
        children = (self.unet, self.vae, self.text_encoder, self.vocoder)
        aux = (self.unet_cfg, self.vae_cfg, self.text_cfg, self.vocoder_cfg, self.ddim_cfg)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def _replace(self, **kw) -> "AudioLDMModules":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str) -> "AudioLDMModules":
        from audioldm_tpu.ckpt import load_audioldm_checkpoint

        bundle = load_audioldm_checkpoint(checkpoint_dir)
        p, c = bundle["params"], bundle["configs"]
        return cls(
            unet=p["unet"],
            vae=p["vae"],
            text_encoder=p["text_encoder"],
            vocoder=p["vocoder"],
            unet_cfg=c["unet"],
            vae_cfg=c["vae"],
            text_cfg=c["text_encoder"],
            vocoder_cfg=c["vocoder"],
            ddim_cfg=c["scheduler"],
        )


def random_modules(
    key,
    unet_cfg: UNetConfig = UNetConfig(),
    vae_cfg: VAEConfig = VAEConfig(),
    text_cfg: ClapTextConfig = ClapTextConfig(),
    vocoder_cfg: VocoderConfig = VocoderConfig(),
    ddim_cfg: DDIMConfig = DDIMConfig(),
) -> AudioLDMModules:
    """Random-init bundle (tests / benches without checkpoint files)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return AudioLDMModules(
        unet=init_unet(k1, unet_cfg),
        vae=vae_lib.init_vae(k2, vae_cfg),
        text_encoder=init_clap_text(k3, text_cfg),
        vocoder=init_vocoder(k4, vocoder_cfg),
        unet_cfg=unet_cfg,
        vae_cfg=vae_cfg,
        text_cfg=text_cfg,
        vocoder_cfg=vocoder_cfg,
        ddim_cfg=ddim_cfg,
    )


def encode_prompt(modules: AudioLDMModules, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Pooled projected text embedding, L2-normalized — what the UNet's
    class-embedding path consumes (reference: train_audioldm_lora.py:513-524,
    pipeline stage cf. SURVEY.md §3.2)."""
    out = apply_clap_text(modules.text_encoder, modules.text_cfg, input_ids, attention_mask)
    emb = out["text_embeds"]
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def encode_stage(
    modules: AudioLDMModules,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    uncond_ids: jnp.ndarray,
    uncond_mask: jnp.ndarray,
    num_waveforms_per_prompt: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both prompt embeddings (cond, uncond), ``num_waveforms`` repeats and
    the single-uncond broadcast applied — the text half of ``generate_mel``,
    factored out so the fine-grained program split can compile it as its own
    XLA program (``make_generate_fn(split_compile="fine")``)."""
    cond = encode_prompt(modules, input_ids, attention_mask)
    uncond = encode_prompt(modules, uncond_ids, uncond_mask)
    if num_waveforms_per_prompt > 1:
        cond = jnp.repeat(cond, num_waveforms_per_prompt, axis=0)
    if uncond.shape[0] != cond.shape[0]:
        uncond = jnp.broadcast_to(uncond[:1], cond.shape)
    return cond, uncond


def init_noise(
    modules: AudioLDMModules,
    rng: jax.Array,
    batch: int,
    audio_length_in_s: float,
    latent_keys: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jax.Array]:
    """Per-row init latents + the denoise rng — the noise half of
    ``generate_mel`` (see its docstring for the per-row key contract).
    Returns ``(latents, denoise_rng)``."""
    rng_in = rng
    rng, _ = jax.random.split(rng)  # keep denoise's in-scan stream distinct
    shape = latent_shape(modules, batch, audio_length_in_s)
    if latent_keys is None:
        latent_keys = jax.vmap(lambda i: jax.random.fold_in(rng_in, i))(jnp.arange(batch))
    if latent_keys.shape[0] != batch:
        raise ValueError(f"latent_keys rows {latent_keys.shape[0]} != batch {batch}")
    latents = jax.vmap(lambda k: jax.random.normal(k, shape[1:], jnp.float32))(latent_keys)
    return latents, rng


def decode_latents(modules: AudioLDMModules, latents: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Scaled VAE decode: denoised latents -> mel ``[B, T, F, 1]`` — the
    decode tail of ``generate_mel``, factored out for the fine split."""
    return vae_lib.decode(
        modules.vae, modules.vae_cfg, (latents / modules.vae_cfg.scaling_factor).astype(dtype)
    )


def window_params(
    modules: AudioLDMModules, window_seconds: Optional[float], window_overlap: float
) -> tuple[Optional[int], Optional[int]]:
    """MultiDiffusion window geometry in latent frames (validated), or
    ``(None, None)`` when windowing is off."""
    if window_seconds is None:
        return None, None
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if not 0.0 <= window_overlap <= 0.9:
        # <0 would leave stride > window (uncovered frames -> 1/0 -> NaN
        # audio); ~1.0 degenerates to stride 1 (a ~T-window UNet batch)
        raise ValueError(f"window_overlap must be in [0, 0.9], got {window_overlap}")
    voc = modules.vocoder_cfg
    hop = int(np.prod(voc.upsample_rates))
    factor = 2 ** (len(modules.vae_cfg.block_out_channels) - 1)
    window_frames = max(1, int(round(window_seconds * voc.sampling_rate / hop / factor)))
    window_stride = max(1, int(round(window_frames * (1.0 - window_overlap))))
    return window_frames, window_stride


def make_scan_fn(
    num_inference_steps: int,
    audio_length_in_s: float,
    guidance_scale: float,
    dtype=jnp.bfloat16,
    scheduler: str = "ddim",
    guidance_interval: Optional[tuple] = None,
    window_seconds: Optional[float] = None,
    window_overlap: float = 0.5,
):
    """One jitted denoise-scan program ``(mods, cond, uncond, rng) ->
    latents``: init latents + (optional) MultiDiffusion window geometry +
    the sampler scan. The SINGLE builder behind every scan-only program —
    ``make_generate_fn(split_compile="fine")``'s scan stage, bench.py's
    secondary samplers, and tools/quality_proximity.py's paths — so their
    compiled programs are the same object by construction (round-5 review:
    two hand-rolled copies had started to drift)."""

    @jax.jit
    def _scan(mods, cond, uncond, rng):
        latents, rng2 = init_noise(mods, rng, cond.shape[0], audio_length_in_s)
        wf, ws = window_params(mods, window_seconds, window_overlap)
        return denoise(
            mods, latents, cond, uncond, num_inference_steps, guidance_scale,
            dtype=dtype, rng=rng2, scheduler=scheduler,
            window_frames=wf, window_stride=ws, guidance_interval=guidance_interval,
        )

    return _scan


def latent_shape(modules: AudioLDMModules, batch: int, audio_length_in_s: float) -> tuple[int, int, int, int]:
    """NHWC latent geometry for a clip length. Mel frames = seconds *
    sr / hop; rounded up to a multiple of the VAE downsampling factor."""
    voc = modules.vocoder_cfg
    hop = int(np.prod(voc.upsample_rates))
    n_frames = int(audio_length_in_s * voc.sampling_rate / hop)
    factor = 2 ** (len(modules.vae_cfg.block_out_channels) - 1)
    n_frames = int(math.ceil(n_frames / factor) * factor)
    return (batch, n_frames // factor, voc.model_in_dim // factor, modules.vae_cfg.latent_channels)


def window_starts(total: int, window: int, stride: int) -> tuple[int, ...]:
    """Static window start offsets covering ``[0, total)``: a stride-grid
    plus a final flush-right window so the tail is always covered."""
    if window >= total:
        return (0,)
    starts = list(range(0, total - window, stride))
    starts.append(total - window)
    return tuple(dict.fromkeys(starts))


def denoise(
    modules: AudioLDMModules,
    latents: jnp.ndarray,
    cond_embeds: jnp.ndarray,
    uncond_embeds: Optional[jnp.ndarray],
    num_inference_steps: int,
    guidance_scale: float,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
    dtype=jnp.float32,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    scheduler: str = "ddim",
    window_frames: Optional[int] = None,
    window_stride: Optional[int] = None,
    start_index: int = 0,
    inpaint_mask: Optional[jnp.ndarray] = None,
    init_latents: Optional[jnp.ndarray] = None,
    guidance_interval: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """CFG-batched denoise loop as one ``lax.scan``.

    ``scheduler``: "ddim" (the reference's sampler; eta>0 adds the stochastic
    variance term), "dpm++" (DPM-Solver++ 2M — comparable quality in
    ~20-25 steps) or "lcm" (consistency sampling for an LCM-distilled
    adapter, 1-8 steps, NO CFG — guidance is baked in at distillation time,
    so each step is ONE UNet eval at batch B instead of two at 2B;
    ``train/distill.py``).

    ``window_frames`` (opt-in, long-form clips): MultiDiffusion-style
    windowed denoising — each step predicts eps on overlapping fixed-size
    windows of the latent TIME axis (all windows stacked into one batched
    UNet call) and averages the predictions in the overlaps, then the
    scheduler steps the FULL latent. The level-0 attention is N^2 in latent
    frames, so full-length 30 s+ clips pay quadratically while windows stay
    at the 4096-token flash sweet spot; beyond ~30 s this is the difference
    between quadratic and linear cost. Sampling semantics deviate from the
    reference (windows can't hear each other beyond overlaps) — off by
    default; with ``window_frames >= T`` it is exactly the standard path.
    ``window_stride`` defaults to ``window_frames // 2`` (50% overlap).

    ``start_index`` (audio-to-audio / SDEdit, ``pipeline/audio2audio.py``):
    enter the trajectory at ``ts[start_index]`` instead of ``ts[0]`` — the
    caller supplies ``latents`` already noised to that timestep via
    ``add_noise``. Supported for "ddim" and "dpm++"; "lcm" uses its own
    distilled grid (raises).

    ``inpaint_mask`` (1 = regenerate, 0 = keep; broadcastable to
    ``latents``): after every DDIM update the known region is overwritten
    with the init latents forward-noised to the step's output timestep
    (q-sampled x_{t_prev}), the standard latent-inpainting projection
    (RePaint eq. 8 / diffusers legacy inpaint). Requires ``init_latents``
    and ``rng``; DDIM only — DPM-Solver++ carries a multistep x0 history
    that the projection would invalidate.

    ``guidance_interval`` (opt-in, ``(lo, hi)`` fractions of the train
    timestep range): apply classifier-free guidance ONLY on steps whose
    timestep satisfies ``lo*(N-1) <= t <= hi*(N-1)``; outside the interval
    the step runs the conditional-only UNet at batch ``b`` instead of the
    CFG pair at ``2b`` — roughly halving UNet cost on the skipped steps.
    Limited-interval guidance is the Kynkäänniemi et al. 2024 result
    ("Applying Guidance in a Limited Interval Improves Sample and
    Distribution Quality"): guidance is harmful at high noise and wasted
    near zero noise, so restricting it both speeds up AND (per the paper)
    improves sampling. Sampling semantics deviate from the reference's
    every-step CFG — off by default; ``(0.0, 1.0)`` is exactly the
    standard path. Suggested starting interval for this schedule:
    ``(0.05, 0.65)``. "ddim"/"dpm++" only; incompatible with windowed
    denoise (one batched-window UNet geometry per step there)."""
    schedule = make_schedule(modules.ddim_cfg)
    if scheduler == "lcm":
        from audioldm_tpu.models.lcm import lcm_inference_timesteps

        ts = lcm_inference_timesteps(modules.ddim_cfg, num_inference_steps)
        if rng is None:
            raise ValueError("lcm sampling requires an rng (inter-step noise)")
    else:
        ts = inference_timesteps(modules.ddim_cfg, num_inference_steps)
        step_ratio = modules.ddim_cfg.num_train_timesteps // num_inference_steps
        prev_ts = ts - step_ratio
        prev_dev = jnp.asarray(prev_ts)
    ts_dev = jnp.asarray(ts)
    if eta > 0.0 and rng is None:
        raise ValueError("eta > 0 requires an rng")
    if scheduler not in ("ddim", "dpm++", "lcm"):
        raise ValueError(f"unknown scheduler: {scheduler}")
    if start_index:
        if scheduler == "lcm":
            raise ValueError("start_index (audio-to-audio) is not supported with the lcm scheduler")
        if not 0 <= start_index < len(ts):
            raise ValueError(f"start_index {start_index} outside [0, {len(ts)})")
    if inpaint_mask is not None:
        if scheduler != "ddim":
            raise ValueError("inpaint_mask requires scheduler='ddim'")
        if init_latents is None or rng is None:
            raise ValueError("inpaint_mask requires init_latents and an rng")
        inpaint_mask = jnp.asarray(inpaint_mask, jnp.float32)
        init_f32 = init_latents.astype(jnp.float32)

    do_cfg = uncond_embeds is not None and guidance_scale != 1.0 and scheduler != "lcm"
    if do_cfg:
        embeds = jnp.concatenate([uncond_embeds, cond_embeds], axis=0)
    else:
        embeds = cond_embeds
    b = latents.shape[0]

    def predict_eps(lat, t):
        model_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        t_b = jnp.broadcast_to(t, (model_in.shape[0],))
        eps = apply_unet(
            modules.unet,
            modules.unet_cfg,
            model_in.astype(dtype),
            t_b,
            class_labels=embeds.astype(dtype),
            lora=lora,
            lora_scale=lora_scale,
        ).astype(jnp.float32)
        if do_cfg:
            eps_u, eps_c = eps[:b], eps[b:]
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        return eps

    if window_frames is not None and window_frames < latents.shape[1]:
        T = latents.shape[1]
        W = int(window_frames)
        S = int(window_stride) if window_stride is not None else max(1, W // 2)
        if S > W:
            # gaps between windows would never be denoised (and their
            # overlap-average divides by zero)
            raise ValueError(f"window_stride {S} > window_frames {W} leaves uncovered frames")
        starts = window_starts(T, W, S)
        K = len(starts)
        if lora is not None and any(x.ndim == 3 for x in jax.tree.leaves(lora)):
            raise ValueError(
                "windowed denoise does not support per-request batched "
                "adapters (their leading dim is the unwindowed batch); "
                "merge the adapter or serve uniform batches"
            )
        counts = np.zeros((T,), np.float32)
        for s in starts:
            counts[s : s + W] += 1.0
        inv = jnp.asarray((1.0 / counts)[None, :, None, None])

        def predict_eps(lat, t):  # noqa: F811 — MultiDiffusion override
            # all K windows ride ONE batched UNet call (uncond halves first,
            # mirroring the CFG layout of the standard path)
            wins = jnp.concatenate([lat[:, s : s + W] for s in starts], axis=0)
            model_in = jnp.concatenate([wins, wins], axis=0) if do_cfg else wins
            if do_cfg:
                emb_w = jnp.concatenate(
                    [jnp.tile(uncond_embeds, (K, 1)), jnp.tile(cond_embeds, (K, 1))], axis=0
                )
            else:
                emb_w = jnp.tile(embeds, (K, 1))
            t_b = jnp.broadcast_to(t, (model_in.shape[0],))
            eps = apply_unet(
                modules.unet, modules.unet_cfg, model_in.astype(dtype), t_b,
                class_labels=emb_w.astype(dtype), lora=lora, lora_scale=lora_scale,
            ).astype(jnp.float32)
            if do_cfg:
                eps_u, eps_c = eps[: K * b], eps[K * b :]
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            full = jnp.zeros(lat.shape, jnp.float32)
            for i, s in enumerate(starts):
                full = full.at[:, s : s + W].add(eps[i * b : (i + 1) * b])
            return full * inv

    if guidance_interval is not None:
        lo, hi = guidance_interval
        if not 0.0 <= lo <= hi <= 1.0:
            raise ValueError(f"guidance_interval must satisfy 0 <= lo <= hi <= 1, got {guidance_interval}")
        if scheduler == "lcm":
            raise ValueError("guidance_interval is meaningless with the lcm scheduler (no CFG)")
        if window_frames is not None and window_frames < latents.shape[1]:
            raise ValueError("guidance_interval is not supported with windowed denoise")
        if do_cfg and not (lo == 0.0 and hi == 1.0):
            n_train = modules.ddim_cfg.num_train_timesteps
            t_lo = jnp.asarray(lo * (n_train - 1), jnp.float32)
            t_hi = jnp.asarray(hi * (n_train - 1), jnp.float32)
            cfg_predict = predict_eps
            # per-request batched lora leaves are CFG-tiled to [2b, ...]
            # (AdapterBank.gather cfg_batch=2 tiles the same adapter rows
            # into both halves), so the batch-b conditional-only call takes
            # the first b rows — identical adapters, matching batch
            lora_cond = lora
            if lora is not None and any(x.ndim == 3 for x in jax.tree.leaves(lora)):
                lora_cond = jax.tree.map(lambda x: x[:b] if x.ndim == 3 else x, lora)

            def cond_predict(lat, t):
                # conditional-only step — identical math to the do_cfg=False
                # path (guidance momentarily 1.0), at batch b instead of 2b
                t_b = jnp.broadcast_to(t, (lat.shape[0],))
                return apply_unet(
                    modules.unet, modules.unet_cfg, lat.astype(dtype), t_b,
                    class_labels=cond_embeds.astype(dtype),
                    lora=lora_cond, lora_scale=lora_scale,
                ).astype(jnp.float32)

            def predict_eps(lat, t):  # noqa: F811 — limited-interval override
                in_interval = jnp.logical_and(t >= t_lo, t <= t_hi)
                return jax.lax.cond(in_interval, cfg_predict, cond_predict, lat, t)

    if scheduler == "lcm":
        from audioldm_tpu.models.lcm import consistency_output

        n_steps = len(ts)

        def body(carry, idx):
            lat, _ = carry
            t = ts_dev[idx]
            denoised = consistency_output(schedule, predict_eps(lat, t), t, lat)
            # re-noise to the NEXT grid point (skipped after the final step —
            # the second carry slot holds the clean estimate)
            acp_next = jnp.where(
                idx + 1 < n_steps,
                schedule.alphas_cumprod[ts_dev[jnp.minimum(idx + 1, n_steps - 1)]],
                jnp.asarray(1.0, jnp.float32),
            )
            noise = jax.random.normal(jax.random.fold_in(rng, idx), lat.shape, jnp.float32)
            renoised = jnp.sqrt(acp_next) * denoised + jnp.sqrt(1.0 - acp_next) * noise
            return (renoised, denoised), None

        lat0 = latents.astype(jnp.float32)
        (_, latents), _ = jax.lax.scan(body, (lat0, lat0), jnp.arange(n_steps))
        return latents

    if scheduler == "dpm++":
        from audioldm_tpu.models.dpm_solver import dpm_solver_step

        def body(carry, idx):
            lat, prev_x0, prev_lambda = carry
            t = ts_dev[idx]
            eps = predict_eps(lat, t)
            lat, x0, lam_t = dpm_solver_step(
                schedule, eps, t, prev_dev[idx], lat, prev_x0, prev_lambda, is_first=idx == start_index
            )
            return (lat, x0, lam_t), None

        init = (latents.astype(jnp.float32), jnp.zeros_like(latents, jnp.float32), jnp.asarray(0.0))
        (latents, _, _), _ = jax.lax.scan(body, init, jnp.arange(start_index, len(ts)))
        return latents

    def body(carry, idx):
        lat = carry
        t = ts_dev[idx]
        eps = predict_eps(lat, t)
        if eta > 0.0:
            noise = jax.random.normal(jax.random.fold_in(rng, idx), lat.shape, jnp.float32)
            lat = ddim_step(schedule, eps, t, prev_dev[idx], lat, eta=eta, noise=noise)
        else:
            lat = ddim_step(schedule, eps, t, prev_dev[idx], lat)
        if inpaint_mask is not None:
            # project the known region to the trajectory the forward process
            # assigns it at the step's OUTPUT timestep t_prev (clean init once
            # t_prev < 0, i.e. after the final step). Noise key folded twice
            # so it never collides with the eta>0 variance noise above.
            t_prev = prev_dev[idx]
            k_noise = jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(rng, idx), 1), lat.shape, jnp.float32
            )
            known = add_noise(schedule, init_f32, k_noise, jnp.maximum(t_prev, 0))
            known = jnp.where(t_prev >= 0, known, init_f32)
            lat = inpaint_mask * lat + (1.0 - inpaint_mask) * known
        return lat, None

    latents, _ = jax.lax.scan(body, latents.astype(jnp.float32), jnp.arange(start_index, len(ts)))
    return latents


def generate_mel(
    modules: AudioLDMModules,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    uncond_ids: jnp.ndarray,
    uncond_mask: jnp.ndarray,
    rng: jax.Array,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 10.0,
    guidance_scale: float = 2.5,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
    dtype=jnp.float32,
    num_waveforms_per_prompt: int = 1,
    eta: float = 0.0,
    scheduler: str = "ddim",
    window_seconds: Optional[float] = None,
    window_overlap: float = 0.5,
    latent_keys: Optional[jnp.ndarray] = None,
    guidance_interval: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Text -> mel: encode -> CFG denoise scan -> VAE decode. The vocoder
    stage lives in :func:`generate`; splitting here lets callers compile
    text+denoise+decode and the vocoder as two XLA programs (see
    ``make_generate_fn(split_compile=...)``) — XLA's optimization time is
    superlinear in program size, and the monolithic pipeline's cold compile
    measured far above the sum of its stages (PERF.md compile table).

    Init latents are drawn PER ROW, each row from its own key: row i of a
    default call uses ``fold_in(rng, i)``, so a row's latents depend only
    on its key — not on the batch size or its position — which is what
    lets a seeded serving request ride a shared batch and still reproduce
    bit-for-bit (serve/engine.py derives the same keys, substituting
    ``fold_in(PRNGKey(seed), i)`` for seeded rows; VERDICT round-3 #6).
    ``latent_keys`` (``[B, 2]`` uint32, optional) overrides the per-row
    keys explicitly. The batch ``rng`` is still the source for any
    in-scan noise (eta>0 / lcm), so those samplers remain batch-rng
    dependent."""
    if num_waveforms_per_prompt > 1 and latent_keys is not None:
        raise ValueError("latent_keys requires num_waveforms_per_prompt == 1 "
                         "(keys are one per final batch row)")
    cond, uncond = encode_stage(
        modules, input_ids, attention_mask, uncond_ids, uncond_mask,
        num_waveforms_per_prompt=num_waveforms_per_prompt,
    )
    b = cond.shape[0]
    latents, rng = init_noise(modules, rng, b, audio_length_in_s, latent_keys=latent_keys)
    window_frames, window_stride = window_params(modules, window_seconds, window_overlap)

    latents = denoise(
        modules, latents, cond, uncond, num_inference_steps, guidance_scale,
        lora=lora, lora_scale=lora_scale, dtype=dtype, eta=eta, rng=rng,
        scheduler=scheduler, window_frames=window_frames, window_stride=window_stride,
        guidance_interval=guidance_interval,
    )

    return decode_latents(modules, latents, dtype)


def vocode(modules: AudioLDMModules, mel: jnp.ndarray, original_samples: int, dtype=None) -> jnp.ndarray:
    """Mel ``[B, T, F, 1]`` -> waveform ``[B, original_samples]`` float32.

    ``dtype=jnp.bfloat16`` runs the HiFi-GAN conv stack in bf16 (an option,
    NOT the default: on-chip slope timing measured bf16 at 19.2-23.0 ms vs
    fp32's 19.3-20.6 — no reproducible win, the vocoder's late narrow-channel
    convs are layout/HBM-bound, not FLOP-bound; PERF.md "vocoder negative
    results"). fp32 when None."""
    compute = None if dtype in (None, jnp.float32) else dtype
    wav = apply_vocoder(modules.vocoder, modules.vocoder_cfg, mel[..., 0], dtype=compute)
    return wav[:, :original_samples]


def generate(
    modules: AudioLDMModules,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    uncond_ids: jnp.ndarray,
    uncond_mask: jnp.ndarray,
    rng: jax.Array,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 10.0,
    guidance_scale: float = 2.5,
    lora: Optional[dict] = None,
    lora_scale: float = 1.0,
    dtype=jnp.float32,
    num_waveforms_per_prompt: int = 1,
    eta: float = 0.0,
    scheduler: str = "ddim",
    window_seconds: Optional[float] = None,
    window_overlap: float = 0.5,
    guidance_interval: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Full text->audio path. Returns waveform ``[B*num_waveforms, samples]``
    float32.

    Defaults mirror the reference workloads: 50 DDIM steps / 10 s
    (generate_audio.py:49-50), lib-default guidance 2.5, 1 waveform/prompt
    (SURVEY.md §2b). ``window_seconds`` enables MultiDiffusion windowed
    denoising for long-form clips; ``guidance_interval`` enables
    limited-interval CFG (see :func:`denoise` for both).
    """
    voc = modules.vocoder_cfg
    original_samples = int(audio_length_in_s * voc.sampling_rate)
    mel = generate_mel(
        modules, input_ids, attention_mask, uncond_ids, uncond_mask, rng,
        num_inference_steps, audio_length_in_s, guidance_scale,
        lora=lora, lora_scale=lora_scale, dtype=dtype,
        num_waveforms_per_prompt=num_waveforms_per_prompt, eta=eta,
        scheduler=scheduler, window_seconds=window_seconds,
        window_overlap=window_overlap, guidance_interval=guidance_interval,
    )
    # vocoder stays fp32 regardless of the pipeline dtype: measured no bf16
    # win (layout-bound, see vocode docstring)
    return vocode(modules, mel, original_samples)


def make_generate_fn(
    modules: AudioLDMModules,
    num_inference_steps: int = 50,
    audio_length_in_s: float = 10.0,
    guidance_scale: float = 2.5,
    dtype=jnp.bfloat16,
    with_lora: bool = False,
    scheduler: str = "ddim",
    split_compile: bool = True,
    window_seconds: Optional[float] = None,
    window_overlap: float = 0.5,
    guidance_interval: Optional[Tuple[float, float]] = None,
):
    """jit-compiled generation over the module bundle. The bundle is a jit
    ARGUMENT (configs static via the pytree registration), so params travel
    as device buffers — never serialized into the compiled program.

    ``split_compile=True`` compiles text+denoise+VAE-decode and the vocoder
    as TWO XLA programs instead of one. Numerically identical (the boundary
    tensor is the [B,T,64,1] mel; XLA fuses nothing useful across it), but
    XLA's optimization time is superlinear in program size: the monolithic
    pipeline's cold compile measured several times the sum of its stages
    (740 s driver-observed, PERF.md) while the split form compiles in
    roughly stage-sum time. Both dispatches are async, so steady-state cost
    is one extra enqueue (~no-op next to a 0.75 s clip).

    ``split_compile="fine"`` (plain path only; LoRA callers get the 2-way
    split) goes further: text-encode / denoise-scan / VAE-decode / vocoder
    as FOUR programs at the exact tensor boundaries of the fused path
    (cond+uncond embeddings, denoised fp32 latents, mel) — bit-identical
    (tests/test_pipeline.py pins all three modes equal). The point is the
    COLD START on remote-TPU backends: the one-time load of the compiled
    executable onto the worker dominates time-to-first-clip (the 2-way mel
    program is 293 MB serialized and its load measured 12-565 s, PERF.md
    round-4 receipts), executable loads overlap on the transport (the 80 MB
    vocoder loads in ~1 s behind the mel load), and the fine split turns
    one 293 MB load into 3 concurrent smaller ones whose wall-clock is the
    LARGEST stage (the scan) instead of the sum. ``precompile`` compiles
    all stages thread-parallel; ``warm_stages`` forces the loads
    concurrently (VERDICT round-4 #1). Steady state: two extra async
    enqueues (~no-op)."""
    voc_samples = int(audio_length_in_s * modules.vocoder_cfg.sampling_rate)
    fine = split_compile == "fine"
    if split_compile:

        @jax.jit
        def fn_vocode(mods, mel):
            return vocode(mods, mel, voc_samples)

    if with_lora:

        @functools.partial(jax.jit, static_argnames=("lora_scale",))
        def fn_lora(mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng, lora, lora_scale=1.0):
            stage = generate_mel if split_compile else generate
            return stage(
                mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng,
                num_inference_steps, audio_length_in_s, guidance_scale,
                lora=lora, lora_scale=lora_scale, dtype=dtype, scheduler=scheduler,
                window_seconds=window_seconds, window_overlap=window_overlap,
                guidance_interval=guidance_interval,
            )

        def fn(input_ids, attention_mask, uncond_ids, uncond_mask, rng, lora, lora_scale=1.0):
            out = fn_lora(modules, input_ids, attention_mask, uncond_ids, uncond_mask, rng, lora, lora_scale=lora_scale)
            return fn_vocode(modules, out) if split_compile else out

        return fn

    @jax.jit
    def fn_plain(mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng):
        stage = generate_mel if split_compile else generate
        return stage(
            mods, input_ids, attention_mask, uncond_ids, uncond_mask, rng,
            num_inference_steps, audio_length_in_s, guidance_scale, dtype=dtype,
            scheduler=scheduler, window_seconds=window_seconds,
            window_overlap=window_overlap, guidance_interval=guidance_interval,
        )

    if fine:

        @jax.jit
        def fn_text(mods, input_ids, attention_mask, uncond_ids, uncond_mask):
            return encode_stage(mods, input_ids, attention_mask, uncond_ids, uncond_mask)

        fn_scan = make_scan_fn(
            num_inference_steps, audio_length_in_s, guidance_scale, dtype=dtype,
            scheduler=scheduler, guidance_interval=guidance_interval,
            window_seconds=window_seconds, window_overlap=window_overlap,
        )

        @jax.jit
        def fn_vae(mods, latents):
            return decode_latents(mods, latents, dtype)

    # AOT slot filled by fn.precompile():
    #   (arg_key, (compiled stage executables...), warm_meta_or_None)
    aot = []

    def _arg_key(args):
        return tuple((x.shape, jnp.asarray(x).dtype) for x in args)

    def fn(input_ids, attention_mask, uncond_ids, uncond_mask, rng):
        args = (input_ids, attention_mask, uncond_ids, uncond_mask, rng)
        if aot and aot[0][0] == _arg_key(args):
            cs = aot[0][1]
            if fine:
                c_text, c_scan, c_vae, c_voc = cs
                cond, uncond = c_text(modules, *args[:4])
                return c_voc(modules, c_vae(modules, c_scan(modules, cond, uncond, rng)))
            c_mel, c_voc = cs
            return c_voc(modules, c_mel(modules, *args))
        if fine:
            cond, uncond = fn_text(modules, *args[:4])
            return fn_vocode(modules, fn_vae(modules, fn_scan(modules, cond, uncond, rng)))
        out = fn_plain(modules, *args)
        return fn_vocode(modules, out) if split_compile else out

    def precompile(input_ids, attention_mask, uncond_ids, uncond_mask, rng):
        """AOT-compile both stage programs CONCURRENTLY for these arg shapes.

        ``jax.jit`` compiles each stage lazily at first call, back to back;
        on the remote-compiler backend the two compilations are independent
        server work, and two threads overlap them (measured 51.8 s parallel
        vs 86.4 s serial for the 50-step flagship geometry — the mel-stage
        and vocoder programs dominate). Calls with exactly these arg
        shapes/dtypes then use the AOT executables; any other shapes fall
        back to the normal jit path (which recompiles per shape as usual).
        Only wired for the plain (non-LoRA) split-compile path — the bench/
        driver contract (bench.py) and `cli generate` without adapters.

        Returns per-stage wall seconds ``{"mel_compile_s", "voc_compile_s"}``
        (measured inside each thread, so they overlap — the receipts the
        bench of record emits, VERDICT round-3 #1). The split_compile=False
        branch instead returns ``{"mono_compile_s"}``: one monolithic
        compile+first-execution, which is NOT comparable to the split
        mel-stage receipt and must not masquerade as it."""
        import time as _time

        if not split_compile:
            t0 = _time.perf_counter()
            fn_plain(modules, input_ids, attention_mask, uncond_ids, uncond_mask, rng)
            return {"mono_compile_s": _time.perf_counter() - t0}
        from concurrent.futures import ThreadPoolExecutor

        args = (input_ids, attention_mask, uncond_ids, uncond_mask, rng)

        def _timed(thunk):
            t0 = _time.perf_counter()
            out = thunk()
            return out, _time.perf_counter() - t0

        if fine:
            text_out = jax.eval_shape(fn_text, modules, *args[:4])
            scan_out = jax.eval_shape(fn_scan, modules, *text_out, args[4])
            mel_aval = jax.eval_shape(fn_vae, modules, scan_out)
            with ThreadPoolExecutor(4) as ex:
                futs = {
                    "text": ex.submit(_timed, lambda: fn_text.lower(modules, *args[:4]).compile()),
                    "scan": ex.submit(_timed, lambda: fn_scan.lower(modules, *text_out, args[4]).compile()),
                    "vae": ex.submit(_timed, lambda: fn_vae.lower(modules, scan_out).compile()),
                    "voc": ex.submit(_timed, lambda: fn_vocode.lower(modules, mel_aval).compile()),
                }
                done = {k: f.result() for k, f in futs.items()}
            meta = {"args": args, "text_out": text_out, "scan_out": scan_out, "mel": mel_aval}
            aot[:] = [(_arg_key(args), tuple(done[k][0] for k in ("text", "scan", "vae", "voc")), meta)]
            return {f"{k}_compile_s": s for k, (_, s) in done.items()}

        mel_aval = jax.eval_shape(fn_plain, modules, *args)
        with ThreadPoolExecutor(2) as ex:
            f_mel = ex.submit(_timed, lambda: fn_plain.lower(modules, *args).compile())
            f_voc = ex.submit(_timed, lambda: fn_vocode.lower(modules, mel_aval).compile())
            (c_mel, mel_s), (c_voc, voc_s) = f_mel.result(), f_voc.result()
        aot[:] = [(_arg_key(args), (c_mel, c_voc), None)]
        return {"mel_compile_s": mel_s, "voc_compile_s": voc_s}

    def stage_fns():
        """After ``precompile``: the AOT stage executables — ``(c_mel,
        c_voc)`` for the 2-way split, ``(c_text, c_scan, c_vae, c_voc)``
        for the fine split — so callers can time/warm the stages separately
        (bench.py first-execution receipts). None before precompile."""
        return aot[0][1] if aot else None

    def warm_stages():
        """Force every AOT stage's one-time executable load CONCURRENTLY
        (fine split, after ``precompile``; requires the module bundle to
        hold real buffers, not avals). On remote-TPU backends the compiled
        executable is shipped to the worker at its first execution — the
        dominant cold-start cost (PERF.md round-4 receipts) — and the
        transport overlaps concurrent loads, so executing all four stages
        at once from threads pays max(stage load) instead of the sum.
        Inputs are zeros at the precompiled avals; each thread fences with
        a device fetch (``block_until_ready`` returns early on the tunnel
        backend, NOTES). Returns per-stage first-execution seconds."""
        if not aot or aot[0][2] is None:
            return None
        c_text, c_scan, c_vae, c_voc = aot[0][1]
        meta = aot[0][2]
        cond_a, uncond_a = meta["text_out"]
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        def _z(aval):
            return jnp.zeros(aval.shape, aval.dtype)

        jobs = {
            "text": lambda: c_text(modules, *meta["args"][:4]),
            "scan": lambda: c_scan(modules, _z(cond_a), _z(uncond_a), meta["args"][4]),
            "vae": lambda: c_vae(modules, _z(meta["scan_out"])),
            "voc": lambda: c_voc(modules, _z(meta["mel"])),
        }

        def _run(thunk):
            t0 = _time.perf_counter()
            jax.device_get(thunk())
            return _time.perf_counter() - t0

        with ThreadPoolExecutor(4) as ex:
            futs = {k: ex.submit(_run, t) for k, t in jobs.items()}
            return {f"{k}_load_s": f.result() for k, f in futs.items()}

    fn.precompile = precompile
    fn.stage_fns = stage_fns
    fn.warm_stages = warm_stages
    # fine mode's lazy per-stage jits — callers that skip precompile (the
    # bench's AUDIOLDM_BENCH_AOT=0 A/B path) reuse these instead of
    # wrapping cache-distinct fresh jits around the same computations,
    # which would pay three redundant remote compiles (round-5 review)
    fn.lazy_stages = (fn_text, fn_scan, fn_vae, fn_vocode) if fine else None
    return fn
