"""Golden parity: our HiFi-GAN vs transformers SpeechT5HifiGan with shared
weights (the vocoder the reference loads at train_audioldm_lora.py:371)."""

import numpy as np
import pytest
import torch

from audioldm_tpu.ckpt import convert_vocoder_state
from audioldm_tpu.config import VocoderConfig
from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder

TINY = dict(
    model_in_dim=8,
    sampling_rate=16000,
    upsample_initial_channel=16,
    upsample_rates=[2, 2],
    upsample_kernel_sizes=[4, 4],
    resblock_kernel_sizes=[3, 5],
    resblock_dilation_sizes=[[1, 3], [1, 3]],
    leaky_relu_slope=0.1,
    normalize_before=True,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import SpeechT5HifiGan, SpeechT5HifiGanConfig

    torch.manual_seed(0)
    model = SpeechT5HifiGan(SpeechT5HifiGanConfig(**TINY)).eval()
    with torch.no_grad():
        model.mean.normal_(0, 0.5)
        model.scale.uniform_(0.5, 1.5)
    return model


def test_parity_with_transformers(torch_model, rng):
    import jax.numpy as jnp

    cfg = VocoderConfig(**{k: (tuple(map(tuple, v)) if k == "resblock_dilation_sizes" else tuple(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = convert_vocoder_state(sd)

    mel = rng.standard_normal((2, 17, 8)).astype(np.float32)
    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(mel)).numpy()
    out_j = np.asarray(apply_vocoder(params, cfg, jnp.asarray(mel)))

    assert out_j.shape == out_t.shape == (2, 17 * 4)
    np.testing.assert_allclose(out_j, out_t, atol=2e-5)


def test_init_structure_matches_converted(torch_model):
    import jax

    cfg = VocoderConfig(**{k: (tuple(map(tuple, v)) if k == "resblock_dilation_sizes" else tuple(v) if isinstance(v, list) else v) for k, v in TINY.items()})
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    converted = convert_vocoder_state(sd)
    ours = init_vocoder(jax.random.PRNGKey(0), cfg)
    ours_paths = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(ours)[0]}
    conv_paths = {"/".join(map(str, p)): v.shape for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(ours_paths) == set(conv_paths)
    for k in ours_paths:
        assert tuple(ours_paths[k]) == tuple(conv_paths[k]), k


def test_upsample_factor_is_hop_length():
    """The audioldm-s vocoder must upsample by exactly hop_length=160 so a
    1024-frame mel yields 10.24 s at 16 kHz (SURVEY.md §2b)."""
    cfg = VocoderConfig()
    factor = int(np.prod(cfg.upsample_rates))
    assert factor == 160


def test_vocoder_bf16_path_close_to_fp32():
    """dtype=bfloat16 runs the conv stack in bf16. Kept as an option (the
    reference's own app runs the whole pipeline in fp16, app.py:6) though
    NOT the pipeline default — on-chip it measured no win over fp32, the
    conv being layout/HBM-bound (PERF.md vocoder negative results). Input
    normalization and conv_post+tanh stay fp32; the waveform must stay
    close to the fp32 reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audioldm_tpu.config import VocoderConfig
    from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder

    cfg = VocoderConfig(
        model_in_dim=8, upsample_initial_channel=32, upsample_rates=(4, 2, 2),
        upsample_kernel_sizes=(8, 4, 4), resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    params = init_vocoder(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 8), jnp.float32)
    ref = np.asarray(apply_vocoder(params, cfg, mel))
    bf = np.asarray(apply_vocoder(params, cfg, mel, dtype=jnp.bfloat16))
    assert bf.shape == ref.shape and bf.dtype == np.float32
    # tanh-bounded output; bf16 conv noise stays within ~1% rms
    rms = np.sqrt(np.mean(ref**2)) + 1e-9
    err = np.sqrt(np.mean((bf - ref) ** 2))
    assert err / rms < 0.02, f"bf16 vocoder rel-rms {err / rms:.4f}"
