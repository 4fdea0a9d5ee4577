"""End-to-end pipeline tests on a tiny random-init model bundle
(reference stage list: SURVEY.md §3.2; CFG folding per BASELINE north star)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.config import (
    ClapTextConfig,
    DDIMConfig,
    LoRAConfig,
    UNetConfig,
    VAEConfig,
    VocoderConfig,
)
from audioldm_tpu.lora import init_lora, merge_lora
from audioldm_tpu.pipeline import generate as _generate, encode_prompt as _encode_prompt
from audioldm_tpu.pipeline.generate import denoise as _denoise
from audioldm_tpu.pipeline.generate import AudioLDMModules, latent_shape, random_modules, make_generate_fn

TINY_TEXT = ClapTextConfig(
    vocab_size=64, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=40, projection_dim=8,
)
TINY_UNET = UNetConfig(
    in_channels=4, out_channels=4, block_out_channels=(8, 16),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, norm_num_groups=4, attention_head_dim=2,
    projection_class_embeddings_input_dim=8,
)
TINY_VAE = VAEConfig(
    in_channels=1, out_channels=1, block_out_channels=(8, 16), layers_per_block=1,
    latent_channels=4, norm_num_groups=4, scaling_factor=0.9,
)
TINY_VOC = VocoderConfig(
    model_in_dim=8, upsample_initial_channel=16, upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),), sampling_rate=16000,
)


@pytest.fixture(scope="module")
def modules():
    return random_modules(
        jax.random.PRNGKey(0),
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfg=TINY_TEXT, vocoder_cfg=TINY_VOC,
        ddim_cfg=DDIMConfig(),
    )


def _prompts(b=1, n=6):
    ids = jnp.full((b, n), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((b, n), jnp.int32)
    u_ids = jnp.full((1, n), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.ones((1, n), jnp.int32).at[:, 1:].set(0)
    return ids, mask, u_ids, u_mask


def test_latent_geometry(modules):
    # hop = 4, sr = 16000; 0.01 s -> 40 frames -> /2 = 20 latent frames
    shape = latent_shape(modules, 2, 0.01)
    assert shape == (2, 20, 4, 4)


def test_generate_shapes_and_determinism(modules):
    ids, mask, u_ids, u_mask = _prompts()
    wav1 = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(7),
                        num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.5)
    wav2 = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(7),
                        num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.5)
    assert wav1.shape == (1, 160)
    np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))
    assert np.all(np.isfinite(np.asarray(wav1)))
    assert np.max(np.abs(np.asarray(wav1))) <= 1.0  # tanh output

    wav3 = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(8),
                        num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.5)
    assert np.max(np.abs(np.asarray(wav1) - np.asarray(wav3))) > 1e-6  # rng matters


def test_guidance_one_equals_cond_only(modules):
    """g=1 must reduce to the conditional-only path (CFG folding sanity)."""
    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(3)
    wav_g1 = _generate(modules, ids, mask, u_ids, u_mask, rng,
                          num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=1.0)

    cond = _encode_prompt(modules, ids, mask)
    shape = latent_shape(modules, 1, 0.01)
    # generate() draws row i's latents from fold_in(rng, i) (per-row keys —
    # batch-composition-independent seeding, see generate_mel docstring)
    latents = jax.random.normal(jax.random.fold_in(rng, 0), shape[1:], jnp.float32)[None]
    lat = _denoise(modules, latents, cond, None, 2, 1.0)
    from audioldm_tpu.models import vae as vae_lib
    from audioldm_tpu.models.vocoder import apply_vocoder

    mel = vae_lib.decode(modules.vae, modules.vae_cfg, lat / modules.vae_cfg.scaling_factor)
    wav_manual = apply_vocoder(modules.vocoder, modules.vocoder_cfg, mel[..., 0])[:, :160]
    np.testing.assert_allclose(np.asarray(wav_g1), np.asarray(wav_manual), atol=1e-5)


def test_generate_with_merged_lora_equals_unmerged(modules):
    """Merged-at-load inference must equal the unmerged adapter path through
    the full pipeline (BASELINE config 2)."""
    ids, mask, u_ids, u_mask = _prompts()
    cfg = LoRAConfig(r=2, lora_alpha=4)
    lora = init_lora(jax.random.PRNGKey(1), modules.unet, cfg)
    lora = jax.tree.map(lambda x: x + 0.03 * jax.random.normal(jax.random.PRNGKey(2), x.shape), lora)

    rng = jax.random.PRNGKey(11)
    wav_unmerged = _generate(modules, ids, mask, u_ids, u_mask, rng,
                                num_inference_steps=2, audio_length_in_s=0.01,
                                guidance_scale=2.0, lora=lora, lora_scale=cfg.scale)
    merged_modules = modules._replace(unet=merge_lora(modules.unet, lora, cfg))
    wav_merged = _generate(merged_modules, ids, mask, u_ids, u_mask, rng,
                              num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0)
    np.testing.assert_allclose(np.asarray(wav_unmerged), np.asarray(wav_merged), atol=2e-4)


def test_jit_generate_fn(modules):
    ids, mask, u_ids, u_mask = _prompts(b=2)
    fn = make_generate_fn(modules, num_inference_steps=2, audio_length_in_s=0.01,
                              guidance_scale=2.5, dtype=jnp.float32)
    wav = fn(ids, mask, u_ids, u_mask, jax.random.PRNGKey(0))
    assert wav.shape == (2, 160)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_num_waveforms_per_prompt(modules):
    ids, mask, u_ids, u_mask = _prompts()
    wav = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(0),
                    num_inference_steps=2, audio_length_in_s=0.01, guidance_scale=2.0,
                    num_waveforms_per_prompt=3)
    assert wav.shape == (3, 160)
    # different latent draws per waveform
    assert np.max(np.abs(np.asarray(wav[0]) - np.asarray(wav[1]))) > 1e-7


def test_eta_stochastic_ddim(modules):
    ids, mask, u_ids, u_mask = _prompts()
    kw = dict(num_inference_steps=3, audio_length_in_s=0.01, guidance_scale=2.0)
    det = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(5), **kw)
    sto = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(5), eta=1.0, **kw)
    assert np.max(np.abs(np.asarray(det) - np.asarray(sto))) > 1e-7
    # eta runs are reproducible per seed
    sto2 = _generate(modules, ids, mask, u_ids, u_mask, jax.random.PRNGKey(5), eta=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(sto), np.asarray(sto2))


def test_default_10s_clip_shapes_compile():
    """audio_length_in_s=10.0 (the API default and the reference's
    generate_audio.py:50 value) gives 250-frame latents at the REAL config —
    not divisible by 2**3, which crashed the UNet before the
    forward_upsample_size fix. eval_shape traces the full-size graph without
    computing, so this pins the fix at zero FLOPs."""
    from audioldm_tpu.config import UNetConfig, VAEConfig, VocoderConfig
    from audioldm_tpu.models.unet import apply_unet, init_unet
    from audioldm_tpu.pipeline.generate import AudioLDMModules, latent_shape

    mods = AudioLDMModules(
        unet=None, vae=None, text_encoder=None, vocoder=None,
        unet_cfg=UNetConfig(), vae_cfg=VAEConfig(), text_cfg=None,
        vocoder_cfg=VocoderConfig(), ddim_cfg=None,
    )
    shape = latent_shape(mods, 1, 10.0)
    assert shape == (1, 250, 16, 8)

    cfg = UNetConfig()
    params = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.PRNGKey(0))
    out = jax.eval_shape(
        lambda p, x, t, c: apply_unet(p, cfg, x, t, class_labels=c),
        params,
        jax.ShapeDtypeStruct((2, 250, 16, 8), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.int32),
        jax.ShapeDtypeStruct((2, 512), jnp.float32),
    )
    assert out.shape == (2, 250, 16, 8)


def test_split_compile_matches_monolithic(modules):
    """make_generate_fn(split_compile=True) runs text+denoise+decode and the
    vocoder as two XLA programs — must be bit-equivalent to the monolithic
    one-jit path (the boundary is a materialized mel tensor)."""
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_scale=2.0, dtype=jnp.float32)
    f_split = make_generate_fn(modules, split_compile=True, **kw)
    f_mono = make_generate_fn(modules, split_compile=False, **kw)
    a = np.asarray(f_split(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    b = np.asarray(f_mono(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_precompile_aot_matches_jit_path(modules):
    """fn.precompile() AOT-compiles both stage programs (in parallel threads
    on remote backends — bench.py's driver contract) and pins them for the
    precompiled arg shapes; results must be bit-identical to the lazy jit
    path, and OTHER arg shapes must fall back to the jit path unharmed."""
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_scale=2.0, dtype=jnp.float32)
    f_lazy = make_generate_fn(modules, split_compile=True, **kw)
    f_aot = make_generate_fn(modules, split_compile=True, **kw)
    f_aot.precompile(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3))
    a = np.asarray(f_aot(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    b = np.asarray(f_lazy(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)

    # different batch -> aval mismatch -> normal jit path (recompiles, works)
    ids2, mask2, u2, um2 = _prompts(b=2)
    wav2 = np.asarray(f_aot(ids2, mask2, u2, um2, jax.random.PRNGKey(3)))
    ref2 = np.asarray(f_lazy(ids2, mask2, u2, um2, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(wav2, ref2)


def test_window_starts():
    from audioldm_tpu.pipeline.generate import window_starts

    assert window_starts(10, 4, 3) == (0, 3, 6)
    assert window_starts(8, 4, 4) == (0, 4)
    assert window_starts(4, 8, 4) == (0,)
    assert window_starts(9, 4, 4) == (0, 4, 5)
    # full coverage, windows in-bounds
    for total, w, s in ((10, 4, 3), (9, 4, 4), (17, 5, 3)):
        starts = window_starts(total, w, s)
        covered = set()
        for st in starts:
            assert 0 <= st <= total - w
            covered.update(range(st, st + w))
        assert covered == set(range(total))


def test_windowed_denoise_no_overlap_equals_independent(modules):
    """MultiDiffusion windows that exactly tile the time axis with no
    overlap evolve independently under elementwise schedulers: windowed
    denoise must equal the concat of per-window standard denoises — this
    pins the window stacking order, the CFG embed tiling, and the
    scatter-average in one equality."""
    b, T, W = 1, 8, 4
    shape = latent_shape(modules, b, 8 * 2 * 4 / 16000)  # T latent frames
    assert shape[1] == T
    lat = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (b, 8), jnp.float32)
    unc = jax.random.normal(jax.random.PRNGKey(3), (b, 8), jnp.float32)

    out_w = _denoise(modules, lat, cond, unc, 3, 2.0, window_frames=W, window_stride=W)
    left = _denoise(modules, lat[:, :W], cond, unc, 3, 2.0)
    right = _denoise(modules, lat[:, W:], cond, unc, 3, 2.0)
    np.testing.assert_allclose(
        np.asarray(out_w), np.asarray(jnp.concatenate([left, right], axis=1)), atol=1e-5
    )
    # overlapping windows actually mix: stride < W changes the result
    out_o = _denoise(modules, lat, cond, unc, 3, 2.0, window_frames=W, window_stride=2)
    assert np.max(np.abs(np.asarray(out_o) - np.asarray(out_w))) > 1e-6


def test_windowed_covering_window_is_standard_path(modules):
    """window_frames >= T takes the exact standard path (bit-equal)."""
    b = 1
    shape = latent_shape(modules, b, 8 * 2 * 4 / 16000)
    lat = jax.random.normal(jax.random.PRNGKey(4), shape, jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(5), (b, 8), jnp.float32)
    unc = jax.random.normal(jax.random.PRNGKey(6), (b, 8), jnp.float32)
    a = _denoise(modules, lat, cond, unc, 2, 2.0)
    w = _denoise(modules, lat, cond, unc, 2, 2.0, window_frames=64, window_stride=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(w))


def test_windowed_generate_end_to_end(modules):
    """window_seconds threads through generate/make_generate_fn: long-form
    windowed output is finite with the right shape, and a clip-covering
    window reproduces the standard output exactly."""
    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(0)
    seconds = 8 * 2 * 4 / 16000  # T=8 latent frames
    base = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0)
    win = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0,
                    window_seconds=seconds / 2, window_overlap=0.5)
    assert win.shape == base.shape and np.all(np.isfinite(np.asarray(win)))
    assert np.max(np.abs(np.asarray(win) - np.asarray(base))) > 1e-7
    cover = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0,
                      window_seconds=seconds * 2)
    np.testing.assert_array_equal(np.asarray(cover), np.asarray(base))

    fn = make_generate_fn(modules, num_inference_steps=2, audio_length_in_s=seconds,
                          guidance_scale=2.0, dtype=jnp.float32,
                          window_seconds=seconds / 2)
    out = np.asarray(fn(ids, mask, u_ids, u_mask, rng))
    np.testing.assert_allclose(out, np.asarray(win), atol=1e-6)


def test_windowed_denoise_rejects_batched_adapters(modules):
    b = 1
    shape = latent_shape(modules, b, 8 * 2 * 4 / 16000)
    lat = jnp.zeros(shape, jnp.float32)
    cond = jnp.zeros((b, 8), jnp.float32)
    fake_lora = {"to_q": {"a": jnp.zeros((2, 8, 2)), "b": jnp.zeros((2, 2, 8))}}
    with pytest.raises(ValueError, match="batched"):
        _denoise(modules, lat, cond, cond, 2, 2.0, lora=fake_lora,
                 window_frames=4, window_stride=4)


def test_windowed_lcm_sampling(modules):
    """Windowed denoising composes with the LCM consistency sampler (the
    few-step long-form path): covering window == standard bit-equal, real
    windows run and differ."""
    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(0)
    seconds = 8 * 2 * 4 / 16000
    base = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 1.0,
                     scheduler="lcm")
    cover = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 1.0,
                      scheduler="lcm", window_seconds=seconds * 2)
    np.testing.assert_array_equal(np.asarray(cover), np.asarray(base))
    win = _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 1.0,
                    scheduler="lcm", window_seconds=seconds / 2)
    assert win.shape == base.shape and np.all(np.isfinite(np.asarray(win)))
    assert np.max(np.abs(np.asarray(win) - np.asarray(base))) > 1e-7


def test_window_parameter_validation(modules):
    """Bad window params fail loudly instead of producing NaN audio
    (negative overlap -> stride > window -> uncovered frames -> 1/0)."""
    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(0)
    seconds = 8 * 2 * 4 / 16000
    with pytest.raises(ValueError, match="window_overlap"):
        _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0,
                  window_seconds=seconds / 4, window_overlap=-0.5)
    with pytest.raises(ValueError, match="window_overlap"):
        _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0,
                  window_seconds=seconds / 4, window_overlap=0.99)
    with pytest.raises(ValueError, match="window_seconds"):
        _generate(modules, ids, mask, u_ids, u_mask, rng, 2, seconds, 2.0,
                  window_seconds=0.0)
    lat = jnp.zeros(latent_shape(modules, 1, seconds), jnp.float32)
    cond = jnp.zeros((1, 8), jnp.float32)
    with pytest.raises(ValueError, match="uncovered"):
        _denoise(modules, lat, cond, cond, 2, 2.0, window_frames=2, window_stride=4)


# ---- limited-interval guidance (Kynkäänniemi et al. 2024; opt-in) ----


def _gi_fixtures(modules, b=1):
    shape = latent_shape(modules, b, 8 * 2 * 4 / 16000)
    lat = jax.random.normal(jax.random.PRNGKey(11), shape, jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(12), (b, 8), jnp.float32)
    unc = jax.random.normal(jax.random.PRNGKey(13), (b, 8), jnp.float32)
    return lat, cond, unc


def test_guidance_interval_full_covering_is_standard_path(modules):
    """(0, 1) covers every timestep: exactly the standard CFG path."""
    lat, cond, unc = _gi_fixtures(modules)
    a = _denoise(modules, lat, cond, unc, 3, 2.5)
    g = _denoise(modules, lat, cond, unc, 3, 2.5, guidance_interval=(0.0, 1.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_guidance_interval_empty_equals_cond_only(modules):
    """An interval covering NO inference timestep must equal guidance 1.0
    (the conditional-only path), for ddim AND dpm++."""
    from audioldm_tpu.models.scheduler import inference_timesteps

    lat, cond, unc = _gi_fixtures(modules)
    n = modules.ddim_cfg.num_train_timesteps
    ts = inference_timesteps(modules.ddim_cfg, 3)
    # a degenerate interval strictly between the top timestep and the train max
    empty = (float(max(ts) + 0.5) / (n - 1), float(max(ts) + 0.6) / (n - 1))
    for sched in ("ddim", "dpm++"):
        g = _denoise(modules, lat, cond, unc, 3, 2.5, scheduler=sched,
                     guidance_interval=empty)
        c = _denoise(modules, lat, cond, None, 3, 1.0, scheduler=sched)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(c))


def test_guidance_interval_mid_differs_from_both_extremes(modules):
    """A genuine sub-interval is neither full CFG nor cond-only, and stays
    finite."""
    lat, cond, unc = _gi_fixtures(modules)
    full = _denoise(modules, lat, cond, unc, 4, 2.5)
    none = _denoise(modules, lat, cond, None, 4, 1.0)
    mid = _denoise(modules, lat, cond, unc, 4, 2.5, guidance_interval=(0.2, 0.6))
    mid = np.asarray(mid)
    assert np.all(np.isfinite(mid))
    assert np.max(np.abs(mid - np.asarray(full))) > 1e-7
    assert np.max(np.abs(mid - np.asarray(none))) > 1e-7


def test_guidance_interval_generate_end_to_end(modules):
    """Plumbing proof at the full text->audio surface: an interval covering
    NO timestep must bit-equal the guidance-1.0 run (guidance_interval
    actually reaches denoise through generate/generate_mel), and a
    sub-interval stays finite at the same shape."""
    from audioldm_tpu.models.scheduler import inference_timesteps

    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(9)
    n = modules.ddim_cfg.num_train_timesteps
    ts = inference_timesteps(modules.ddim_cfg, 3)
    empty = (float(max(ts) + 0.5) / (n - 1), float(max(ts) + 0.6) / (n - 1))
    wav_empty = _generate(modules, ids, mask, u_ids, u_mask, rng, 3, 0.01, 2.5,
                          guidance_interval=empty)
    wav_g1 = _generate(modules, ids, mask, u_ids, u_mask, rng, 3, 0.01, 1.0)
    np.testing.assert_array_equal(np.asarray(wav_empty), np.asarray(wav_g1))

    wav = _generate(modules, ids, mask, u_ids, u_mask, rng, 3, 0.01, 2.5,
                    guidance_interval=(0.1, 0.7))
    assert wav.shape == wav_g1.shape and np.all(np.isfinite(np.asarray(wav)))


def test_guidance_interval_validation(modules):
    lat, cond, unc = _gi_fixtures(modules)
    with pytest.raises(ValueError, match="guidance_interval"):
        _denoise(modules, lat, cond, unc, 2, 2.5, guidance_interval=(0.7, 0.2))
    with pytest.raises(ValueError, match="lcm"):
        _denoise(modules, lat, cond, unc, 2, 2.5, scheduler="lcm",
                 rng=jax.random.PRNGKey(0), guidance_interval=(0.1, 0.5))
    with pytest.raises(ValueError, match="windowed"):
        _denoise(modules, lat, cond, unc, 2, 2.5, window_frames=2,
                 window_stride=1, guidance_interval=(0.1, 0.5))


def test_fine_split_matches_monolithic(modules):
    """make_generate_fn(split_compile="fine") runs text / scan / VAE-decode /
    vocoder as FOUR XLA programs (cold-start executable loads overlap on
    remote backends, VERDICT round-4 #1) — must be bit-equivalent to both
    the 2-way split and the monolithic path at the exact same boundaries.

    Default (non-quick) tier: compiling five tiny pipeline programs costs
    ~150 s on the 1-core box and inflates quick-tier neighbors via CPU
    contention (measured 210 s with vs 59 s without, round 5)."""
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_scale=2.0, dtype=jnp.float32)
    f_fine = make_generate_fn(modules, split_compile="fine", **kw)
    f_split = make_generate_fn(modules, split_compile=True, **kw)
    a = np.asarray(f_fine(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    b = np.asarray(f_split(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_fine_split_sampler_variants(modules):
    """Fine split composes with the non-default samplers and the
    limited-interval CFG (each a scan-program-only change) — slow tier:
    each variant pair costs two full tiny-pipeline compiles."""
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_scale=2.0, dtype=jnp.float32)
    for extra in (dict(scheduler="dpm++"), dict(guidance_interval=(0.1, 0.9)),
                  dict(window_seconds=0.005, window_overlap=0.5)):
        f1 = make_generate_fn(modules, split_compile="fine", **kw, **extra)
        f2 = make_generate_fn(modules, split_compile=True, **kw, **extra)
        x = np.asarray(f1(ids, mask, u_ids, u_mask, jax.random.PRNGKey(4)))
        y = np.asarray(f2(ids, mask, u_ids, u_mask, jax.random.PRNGKey(4)))
        np.testing.assert_allclose(x, y, atol=1e-6)


@pytest.mark.slow
def test_fine_precompile_and_warm_stages(modules):
    """The fine split's precompile returns four per-stage compile receipts,
    warm_stages forces all four loads concurrently (zero inputs at the
    precompiled avals) and returns per-stage first-exec receipts, and the
    AOT chain's output is bit-identical to the lazy fine path."""
    ids = jnp.full((1, 6), 5, jnp.int32).at[:, 0].set(0)
    mask = jnp.ones((1, 6), jnp.int32)
    u_ids = jnp.full((1, 6), 1, jnp.int32).at[:, 0].set(0)
    u_mask = jnp.zeros((1, 6), jnp.int32).at[:, 0].set(1)
    kw = dict(num_inference_steps=2, audio_length_in_s=0.01,
              guidance_scale=2.0, dtype=jnp.float32)
    f_lazy = make_generate_fn(modules, split_compile="fine", **kw)
    f_aot = make_generate_fn(modules, split_compile="fine", **kw)
    assert f_aot.warm_stages() is None  # before precompile
    stages = f_aot.precompile(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3))
    assert set(stages) == {"text_compile_s", "scan_compile_s", "vae_compile_s", "voc_compile_s"}
    warm = f_aot.warm_stages()
    assert set(warm) == {"text_load_s", "scan_load_s", "vae_load_s", "voc_load_s"}
    assert f_aot.stage_fns() is not None and len(f_aot.stage_fns()) == 4
    a = np.asarray(f_aot(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    b = np.asarray(f_lazy(ids, mask, u_ids, u_mask, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)
    # other arg shapes fall back to the lazy jit path unharmed
    ids2, mask2, u2, um2 = _prompts(b=2)
    np.testing.assert_array_equal(
        np.asarray(f_aot(ids2, mask2, u2, um2, jax.random.PRNGKey(5))),
        np.asarray(f_lazy(ids2, mask2, u2, um2, jax.random.PRNGKey(5))),
    )
