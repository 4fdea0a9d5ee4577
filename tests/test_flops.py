"""Validate the analytic FLOP counter against XLA's own cost model.

``compile().cost_analysis()['flops']`` counts every FLOP in the optimized
HLO (matmuls + elementwise). The analytic counter in utils/flops.py counts
matmul-class FLOPs only, so XLA's number must be >= ours and close (the
elementwise residue — norms, softmax, gelu — is a few percent at these
shapes). This pins the *walk* (block structure, shapes) to the real model
code: a missed block or wrong spatial dim shows up as a big gap.

Runs at the REAL audioldm-s geometry (compile-only, CPU — nothing is
executed), so the counts backing PERF.md's roofline table are validated at
the exact shapes the bench measures.
"""

import jax
import jax.numpy as jnp
import pytest

from audioldm_tpu.config import ClapTextConfig, UNetConfig, VAEConfig, VocoderConfig
from audioldm_tpu.utils import flops as fl

# per-test quick marks: the UNet real-geometry compile (~15 s) stays out of
# the quick tier (pyproject markers); the rest are cheap enough


def _xla_flops(fn, *args) -> float:
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def _check(analytic: float, xla: float, rtol: float):
    # XLA counts elementwise ops too -> xla >= analytic, within rtol.
    # One systematic difference the lower bound absorbs: XLA's conv cost
    # excludes the padding taps at spatial borders (measured: a 3x3
    # same-pad conv at 256x16 counts 18.47 vs the naive 19.33 GFLOPs);
    # our count includes them — that's the work the implicit GEMM
    # actually schedules. Border taps are <= ~7% on the narrow (W=16)
    # mel geometries here.
    assert xla >= analytic * 0.93, f"analytic {analytic:.3e} exceeds XLA {xla:.3e}"
    assert xla <= analytic * (1 + rtol), (
        f"XLA {xla:.3e} is {xla / analytic:.3f}x the analytic count "
        f"{analytic:.3e} — the walk is missing FLOPs"
    )


def test_unet_step_flops_real_geometry():
    from audioldm_tpu.kernels import use_flash_attention
    from audioldm_tpu.models.unet import apply_unet, init_unet

    use_flash_attention(False)  # count pure-XLA attention
    cfg = UNetConfig()
    params = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    x = jnp.zeros((2, 256, 16, cfg.in_channels), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    lbl = jnp.zeros((2, 512), jnp.float32)

    xla = _xla_flops(lambda p, a, b, c: apply_unet(p, cfg, a, b, c), params, x, t, lbl)
    fc = fl.unet_step_flops(cfg, 2, 256, 16)
    _check(fc.useful, xla, rtol=0.12)
    # the padded model must dominate the useful one, and level-0 attention's
    # 16-lane contraction guarantees a substantial pad factor on qk/av
    assert fc.padded > fc.useful
    qk_u, qk_p = fc.by_category["attention_qk_av"]
    assert qk_p / qk_u > 4.0  # head_dim 16 on 128 lanes -> 8x on QK^T


@pytest.mark.quick
def test_vae_flops_real_geometry():
    from audioldm_tpu.models import vae as vae_lib

    cfg = VAEConfig()
    params = jax.eval_shape(lambda k: vae_lib.init_vae(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    mel = jnp.zeros((1, 1024, 64, 1), jnp.float32)
    xla = _xla_flops(lambda p, m: vae_lib.encode(p, cfg, m).mean, params, mel)
    _check(fl.vae_encode_flops(cfg, 1, 1024, 64).useful, xla, rtol=0.12)

    z = jnp.zeros((1, 256, 16, cfg.latent_channels), jnp.float32)
    xla = _xla_flops(lambda p, m: vae_lib.decode(p, cfg, m), params, z)
    _check(fl.vae_decode_flops(cfg, 1, 256, 16).useful, xla, rtol=0.12)


@pytest.mark.quick
def test_vocoder_flops_real_geometry():
    from audioldm_tpu.models.vocoder import apply_vocoder, init_vocoder

    cfg = VocoderConfig()
    params = jax.eval_shape(lambda k: init_vocoder(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    mel = jnp.zeros((1, 1024, 64), jnp.float32)
    xla = _xla_flops(lambda p, m: apply_vocoder(p, cfg, m), params, mel)
    _check(fl.vocoder_flops(cfg, 1, 1024).useful, xla, rtol=0.15)


@pytest.mark.quick
def test_clap_text_flops():
    from audioldm_tpu.models.clap_text import apply_clap_text, init_clap_text

    cfg = ClapTextConfig()
    params = jax.eval_shape(lambda k: init_clap_text(k, cfg), jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    ids = jnp.zeros((2, 512), jnp.int32)
    mask = jnp.ones((2, 512), jnp.int32)
    xla = _xla_flops(lambda p, i, m: apply_clap_text(p, cfg, i, m), params, ids, mask)
    _check(fl.clap_text_flops(cfg, 2, 512).useful, xla, rtol=0.12)


@pytest.mark.quick
def test_pipeline_and_train_totals():
    """Workload aggregates: sanity ranges + stage composition."""
    stages = fl.pipeline_flops(steps=50)
    total = stages["total"].useful
    # 50 CFG-folded UNet steps dominate; audioldm-s pipeline is O(10) TFLOPs
    assert stages["unet_denoise"].useful / total > 0.75
    assert 1e12 < total < 1e14
    assert stages["total"].padded > stages["total"].useful

    tr = fl.train_step_flops(batch=2)
    assert tr["unet_bwd"].useful == pytest.approx(tr["unet_fwd"].useful)
    tr_remat = fl.train_step_flops(batch=2, remat=True)
    assert tr_remat["total"].useful > tr["total"].useful

    # mfu: 1 TFLOP in 1 s on a 197 TFLOP/s chip
    assert fl.mfu(1e12, 1.0) == pytest.approx(1 / 197.0, rel=1e-6)

    txt = fl.summarize(stages, seconds=0.75)
    assert "MFU" in txt and "unet_denoise" in txt
