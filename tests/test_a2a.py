"""Audio-to-audio (SDEdit style transfer) + latent inpainting tests.

Beyond-reference surface (the reference's diffusers pipeline is text->audio
only); semantics pinned to the diffusers img2img timestep-entry convention
and RePaint/legacy-inpaint known-region projection (pipeline/audio2audio.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audioldm_tpu.models import vae as vae_lib
from audioldm_tpu.models.scheduler import add_noise, inference_timesteps, make_schedule
from audioldm_tpu.pipeline.audio2audio import (
    a2a_start_index,
    encode_init_latents,
    generate_from_audio,
    generate_mel_from_audio,
    latent_mask,
    make_a2a_fn,
    mel_config_for,
    prepare_init_mel,
)
from audioldm_tpu.pipeline.generate import denoise, latent_shape
from tests.test_pipeline import modules  # noqa: F401 — tiny module fixture
from tests.test_pipeline import _prompts


@pytest.fixture(scope="module")
def init_mel(modules):  # noqa: F811
    """Deterministic tiny source mel at the 0.01 s geometry ([1, 40, 8, 1])."""
    rng = np.random.RandomState(0)
    wav = rng.randn(160).astype(np.float32)
    return prepare_init_mel(wav, modules, 0.01)


def test_start_index_matches_diffusers_convention():
    # StableDiffusionImg2ImgPipeline.get_timesteps: run the last
    # int(steps*strength) steps
    assert a2a_start_index(50, 0.75) == 13
    assert a2a_start_index(50, 1.0) == 0
    assert a2a_start_index(50, 0.02) == 49
    assert a2a_start_index(4, 0.5) == 2
    with pytest.raises(ValueError):
        a2a_start_index(50, 0.0)
    with pytest.raises(ValueError):
        a2a_start_index(50, 1.5)
    # int(steps*strength) == 0 selects ZERO denoise steps — a descriptive
    # error here, not an opaque start_index-out-of-range at trace time
    with pytest.raises(ValueError, match="too low"):
        a2a_start_index(10, 0.05)


def test_mel_config_for_flagship_matches_reference_frontend():
    from audioldm_tpu.config import MelConfig, VocoderConfig

    cfg = mel_config_for(VocoderConfig(), 1024)
    ref = MelConfig()
    assert (cfg.filter_length, cfg.hop_length, cfg.win_length) == (
        ref.filter_length, ref.hop_length, ref.win_length)
    assert (cfg.n_mel, cfg.mel_fmin, cfg.mel_fmax) == (ref.n_mel, ref.mel_fmin, ref.mel_fmax)
    assert cfg.target_length == 1024


def test_mel_config_for_exact_frame_count():
    # target_length must round-trip EXACTLY for every frame count — the old
    # int(duration*sr/hop) reconstruction truncated one frame short whenever
    # n*hop/sr was not float-representable (e.g. 29*160/16000 = 0.29 ->
    # int(28.999...) == 28), tripping the prepare_init_mel shape guard
    from audioldm_tpu.config import VocoderConfig

    for n in range(1, 260):
        assert mel_config_for(VocoderConfig(), n).target_length == n, n


def test_prepare_init_mel_geometry(modules, init_mel):  # noqa: F811
    _, t_lat, f_lat, _ = latent_shape(modules, 1, 0.01)
    factor = 2 ** (len(modules.vae_cfg.block_out_channels) - 1)
    assert init_mel.shape == (1, t_lat * factor, modules.vocoder_cfg.model_in_dim, 1)
    assert np.all(np.isfinite(np.asarray(init_mel)))


def test_a2a_shapes_and_determinism(modules, init_mel):  # noqa: F811
    ids, mask, u_ids, u_mask = _prompts()
    kw = dict(num_inference_steps=4, strength=0.5, guidance_scale=2.5, audio_length_in_s=0.01)
    wav1 = generate_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                               jax.random.PRNGKey(3), **kw)
    wav2 = generate_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                               jax.random.PRNGKey(3), **kw)
    assert wav1.shape == (1, 160)
    np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))
    assert np.all(np.isfinite(np.asarray(wav1)))
    wav3 = generate_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                               jax.random.PRNGKey(4), **kw)
    assert np.max(np.abs(np.asarray(wav1) - np.asarray(wav3))) > 1e-7


def test_a2a_runs_partial_trajectory(modules, init_mel):  # noqa: F811
    """strength selects the trajectory suffix: manually noising the init to
    ts[start] and denoising from start_index reproduces the API exactly."""
    ids, mask, u_ids, u_mask = _prompts()
    rng = jax.random.PRNGKey(11)
    steps, strength = 4, 0.5
    mel_api = generate_mel_from_audio(
        modules, init_mel, ids, mask, u_ids, u_mask, rng,
        num_inference_steps=steps, strength=strength)

    # hand-rolled: same rng splits as generate_mel_from_audio
    from audioldm_tpu.pipeline.generate import encode_prompt
    cond = encode_prompt(modules, ids, mask)
    uncond = encode_prompt(modules, u_ids, u_mask)
    r, noise_rng, _ = jax.random.split(rng, 3)
    init = encode_init_latents(modules, init_mel)
    start = a2a_start_index(steps, strength)
    ts = inference_timesteps(modules.ddim_cfg, steps)
    sched = make_schedule(modules.ddim_cfg)
    noise = jax.random.normal(noise_rng, init.shape, jnp.float32)
    lat = add_noise(sched, init, noise, jnp.asarray(ts[start]))
    lat = denoise(modules, lat, cond, uncond, steps, 2.5, rng=r, start_index=start)
    mel_hand = vae_lib.decode(
        modules.vae, modules.vae_cfg, lat / modules.vae_cfg.scaling_factor)
    np.testing.assert_array_equal(np.asarray(mel_api), np.asarray(mel_hand))


def test_inpaint_all_ones_mask_equals_no_mask(modules, init_mel):  # noqa: F811
    ids, mask, u_ids, u_mask = _prompts()
    shape = latent_shape(modules, 1, 0.01)
    ones = jnp.ones((1,) + shape[1:], jnp.float32)
    kw = dict(num_inference_steps=3, strength=1.0, guidance_scale=2.5)
    a = generate_mel_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                                jax.random.PRNGKey(5), **kw)
    b = generate_mel_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                                jax.random.PRNGKey(5), inpaint_mask=ones, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inpaint_all_zeros_mask_returns_source(modules, init_mel):  # noqa: F811
    """mask==0 everywhere: after the final step the latents are EXACTLY the
    init latents (t_prev < 0 branch), so the output is the VAE round-trip of
    the source mel regardless of prompt/strength."""
    ids, mask, u_ids, u_mask = _prompts()
    shape = latent_shape(modules, 1, 0.01)
    zeros = jnp.zeros((1,) + shape[1:], jnp.float32)
    out = generate_mel_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                                  jax.random.PRNGKey(6), num_inference_steps=3,
                                  strength=1.0, inpaint_mask=zeros)
    init = encode_init_latents(modules, init_mel)
    roundtrip = vae_lib.decode(
        modules.vae, modules.vae_cfg, init / modules.vae_cfg.scaling_factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(roundtrip), atol=1e-6)


def test_inpaint_mask_keeps_known_region_pinned(modules, init_mel):  # noqa: F811
    """Partial mask at the latent level: after the final step (t_prev < 0)
    the known region is EXACTLY the init latents, while the regenerated
    half moved away from them."""
    ids, mask, u_ids, u_mask = _prompts()
    from audioldm_tpu.pipeline.generate import encode_prompt
    cond = encode_prompt(modules, ids, mask)
    uncond = encode_prompt(modules, u_ids, u_mask)
    shape = latent_shape(modules, 1, 0.01)
    m = np.zeros((1,) + shape[1:], np.float32)
    half = shape[1] // 2
    m[:, :half] = 1.0  # regenerate the first half only
    init = encode_init_latents(modules, init_mel)
    rng = jax.random.PRNGKey(7)
    noise = jax.random.normal(jax.random.fold_in(rng, 99), init.shape, jnp.float32)
    ts = inference_timesteps(modules.ddim_cfg, 3)
    sched = make_schedule(modules.ddim_cfg)
    lat0 = add_noise(sched, init, noise, jnp.asarray(ts[0]))
    lat = denoise(modules, lat0, cond, uncond, 3, 2.5, rng=rng,
                  inpaint_mask=jnp.asarray(m), init_latents=init)
    np.testing.assert_array_equal(np.asarray(lat)[:, half:], np.asarray(init)[:, half:])
    assert np.max(np.abs(np.asarray(lat)[:, :half] - np.asarray(init)[:, :half])) > 1e-3


def test_latent_mask_ranges(modules):  # noqa: F811
    _, T, F, _ = latent_shape(modules, 1, 0.01)  # (20, 4) at 0.01 s
    # full clip is 0.01 s -> 20 latent frames -> 2000 frames/s
    m = np.asarray(latent_mask(modules, 0.01, regenerate_times=[(0.0, 0.005)]))
    assert m.shape == (1, T, F, 1)
    assert m[:, : T // 2].min() == 1.0 and m[:, T // 2 :].max() == 0.0
    # top half of the 8 mel bins -> top 2 of 4 latent rows
    m = np.asarray(latent_mask(modules, 0.01, regenerate_mel_bins=[(4, 8)]))
    assert m[:, :, 2:].min() == 1.0 and m[:, :, :2].max() == 0.0
    # union of both
    m = np.asarray(latent_mask(modules, 0.01, regenerate_times=[(0.0, 0.005)],
                               regenerate_mel_bins=[(4, 8)]))
    assert m[:, : T // 2].min() == 1.0 and m[:, T // 2 :, 2:].min() == 1.0
    assert m[:, T // 2 :, :2].max() == 0.0
    # no ranges: regenerate everything
    assert np.asarray(latent_mask(modules, 0.01)).min() == 1.0
    with pytest.raises(ValueError):
        latent_mask(modules, 0.01, regenerate_times=[(0.5, 0.1)])


def test_a2a_dpm_solver_runs_and_inpaint_rejects(modules, init_mel):  # noqa: F811
    ids, mask, u_ids, u_mask = _prompts()
    wav = generate_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                              jax.random.PRNGKey(8), num_inference_steps=4,
                              strength=0.5, scheduler="dpm++", audio_length_in_s=0.01)
    assert wav.shape == (1, 160) and np.all(np.isfinite(np.asarray(wav)))
    shape = latent_shape(modules, 1, 0.01)
    with pytest.raises(ValueError, match="ddim"):
        generate_mel_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                                jax.random.PRNGKey(8), num_inference_steps=4,
                                scheduler="dpm++",
                                inpaint_mask=jnp.ones((1,) + shape[1:]))


def test_denoise_start_index_validation(modules):  # noqa: F811
    ids, mask, u_ids, u_mask = _prompts()
    from audioldm_tpu.pipeline.generate import encode_prompt
    cond = encode_prompt(modules, ids, mask)
    uncond = encode_prompt(modules, u_ids, u_mask)
    lat = jnp.zeros(latent_shape(modules, 1, 0.01), jnp.float32)
    with pytest.raises(ValueError, match="lcm"):
        denoise(modules, lat, cond, uncond, 4, 2.5, scheduler="lcm",
                rng=jax.random.PRNGKey(0), start_index=2)
    with pytest.raises(ValueError, match="start_index"):
        denoise(modules, lat, cond, uncond, 4, 2.5, start_index=7)
    with pytest.raises(ValueError, match="init_latents"):
        denoise(modules, lat, cond, uncond, 4, 2.5,
                inpaint_mask=jnp.ones_like(lat))


def test_make_a2a_fn_matches_eager(modules, init_mel):  # noqa: F811
    ids, mask, u_ids, u_mask = _prompts()
    fn = make_a2a_fn(modules, num_inference_steps=3, audio_length_in_s=0.01,
                     strength=0.5, dtype=jnp.float32)
    wav_jit = fn(init_mel, ids, mask, u_ids, u_mask, jax.random.PRNGKey(9))
    wav_eager = generate_from_audio(modules, init_mel, ids, mask, u_ids, u_mask,
                                    jax.random.PRNGKey(9), num_inference_steps=3,
                                    strength=0.5, audio_length_in_s=0.01)
    np.testing.assert_allclose(np.asarray(wav_jit), np.asarray(wav_eager),
                               rtol=1e-5, atol=1e-5)
