"""Golden parity: our HTSAT audio tower + fused feature extractor vs the
installed transformers ClapAudioModelWithProjection / ClapFeatureExtractor
with shared weights — the eval model the reference scores with
(train_audioldm_lora.py:361-362)."""

import numpy as np
import pytest
import torch

from audioldm_tpu.ckpt import convert_clap_audio_state
from audioldm_tpu.config import ClapAudioConfig
from audioldm_tpu.eval.clap_features import extract_fused_features
from audioldm_tpu.models.clap_audio import apply_clap_audio, init_clap_audio

TINY = dict(
    window_size=2,
    num_mel_bins=16,
    spec_size=32,
    patch_size=4,
    patch_stride=(4, 4),
    patch_embeds_hidden_size=8,
    depths=[2, 2],
    num_attention_heads=[2, 4],
    hidden_size=16,
    projection_dim=8,
    enable_fusion=True,
    aff_block_r=4,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import ClapAudioConfig as HFConfig
    from transformers import ClapAudioModelWithProjection

    torch.manual_seed(0)
    model = ClapAudioModelWithProjection(HFConfig(**TINY)).eval()
    with torch.no_grad():
        # randomize the zero-init relative position bias + BN stats so the
        # parity test actually exercises them
        for n, p in model.named_parameters():
            if "relative_position_bias_table" in n:
                p.normal_(0, 0.5)
        for n, b in model.named_buffers():
            if "running_mean" in n:
                b.normal_(0, 0.5)
            if "running_var" in n:
                b.uniform_(0.5, 1.5)
    return model


def _convert(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    return convert_clap_audio_state(sd)


def test_parity_not_longer(torch_model, rng):
    import jax.numpy as jnp

    cfg = ClapAudioConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in TINY.items()})
    params = _convert(torch_model)
    # T=63 exercises the align-corners bicubic time interpolation (63 -> 64)
    feats = rng.standard_normal((2, 4, 63, 16)).astype(np.float32)
    is_longer = np.array([[False], [False]])
    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(feats), is_longer=torch.from_numpy(is_longer))
    out_j = apply_clap_audio(params, cfg, jnp.asarray(feats), jnp.asarray(is_longer[:, 0]))
    np.testing.assert_allclose(np.asarray(out_j["audio_embeds"]), out_t.audio_embeds.numpy(), atol=5e-4)


def test_parity_fusion_longer(torch_model, rng):
    import jax.numpy as jnp

    cfg = ClapAudioConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in TINY.items()})
    params = _convert(torch_model)
    feats = rng.standard_normal((2, 4, 64, 16)).astype(np.float32)
    is_longer = np.array([[True], [False]])
    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(feats), is_longer=torch.from_numpy(is_longer))
    out_j = apply_clap_audio(params, cfg, jnp.asarray(feats), jnp.asarray(is_longer[:, 0]))
    np.testing.assert_allclose(np.asarray(out_j["audio_embeds"]), out_t.audio_embeds.numpy(), atol=5e-4)


def test_structure_matches(torch_model):
    import jax

    cfg = ClapAudioConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in TINY.items()})
    converted = _convert(torch_model)
    ours = init_clap_audio(jax.random.PRNGKey(0), cfg)
    a = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(ours)[0]}
    b = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(a) == set(b)
    for k in a:
        assert tuple(a[k]) == tuple(b[k]), k


@pytest.mark.parametrize("n_samples", [48000 * 3, 480000])
def test_feature_extractor_parity_short(n_samples, rng):
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    wav = (rng.standard_normal(n_samples) * 0.2).astype(np.float32)
    theirs = fe(wav, sampling_rate=48000, return_tensors="np")
    ours, longer = extract_fused_features(wav)
    assert not longer  # the raw flag; the batch packer replicates the
    # transformers force-one-longer quirk separately (clap_features.py)
    np.testing.assert_allclose(ours, theirs["input_features"][0], atol=2e-3)


def test_batch_features_replicate_per_clip_quirk(rng):
    from audioldm_tpu.eval.clap_features import batch_fused_features

    wavs = [(rng.standard_normal(48000) * 0.2).astype(np.float32) for _ in range(2)]
    _, longer = batch_fused_features(wavs)
    assert np.asarray(longer).all()  # reference-style per-clip scoring
    _, longer2 = batch_fused_features(wavs, per_clip_batches=False)
    assert not np.asarray(longer2).any()


def test_feature_extractor_longer_flag_and_overview(rng):
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()
    wav = (rng.standard_normal(480000 + 96000) * 0.2).astype(np.float32)
    theirs = fe(wav, sampling_rate=48000, return_tensors="np")
    ours, longer = extract_fused_features(wav, np.random.default_rng(0))
    assert longer
    assert ours.shape == theirs["input_features"][0].shape == (4, 1001, 64)
    # channel 0 (bilinear overview) is deterministic — crops are random
    np.testing.assert_allclose(ours[0], theirs["input_features"][0][0], atol=2e-2)
