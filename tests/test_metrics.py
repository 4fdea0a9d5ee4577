"""Metric-formula parity vs an independent torch re-derivation of the
reference math (train_audioldm_lora.py:128-137,234-294) with fixed random
embeddings (SURVEY.md §4 item 4)."""

import jax.numpy as jnp
import numpy as np
import torch

from audioldm_tpu.eval import (
    clap_similarity,
    kernel_audio_distance,
    median_pairwise_distance,
)
import pytest

pytestmark = pytest.mark.quick  # fast core-numerics tier (pyproject markers)


def _torch_kad(x, y, kernel="gaussian", eps=1e-8, scale=100.0, bandwidth=None):
    x, y = torch.from_numpy(x).float(), torch.from_numpy(y).float()
    if bandwidth is None:
        bandwidth = torch.median(torch.pdist(y)).item()
        if bandwidth < 1e-6 or np.isnan(bandwidth):
            bandwidth = 1.0
    gamma = 1 / (2 * bandwidth**2 + eps)
    fns = {
        "gaussian": lambda a: torch.exp(-gamma * a),
        "iq": lambda a: 1 / (1 + gamma * a),
        "imq": lambda a: 1 / torch.sqrt(1 + gamma * a),
    }
    k = fns[kernel]

    def block(a, b):
        an = torch.diagonal(a @ a.T)
        bn = torch.diagonal(b @ b.T)
        return an.unsqueeze(1) + bn.unsqueeze(0) - 2 * (a @ b.T)

    k_xx = k(block(x, x))
    k_xx = k_xx - torch.diag(torch.diagonal(k_xx))
    k_yy = k(block(y, y))
    k_yy = k_yy - torch.diag(torch.diagonal(k_yy))
    mmd = (
        k_xx.sum() / (x.shape[0] * (x.shape[0] - 1))
        + k_yy.sum() / (y.shape[0] * (y.shape[0] - 1))
        - 2 * k(block(x, y)).mean()
    )
    return float(mmd * scale)


def test_clap_similarity_range_and_value(rng):
    a = rng.standard_normal((4, 16)).astype(np.float32)
    t = rng.standard_normal((4, 16)).astype(np.float32)
    s = np.asarray(clap_similarity(jnp.asarray(a), jnp.asarray(t)))
    assert np.all((s >= 0) & (s <= 1))
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    np.testing.assert_allclose(s, ((an * tn).sum(-1) + 1) / 2, atol=1e-6)
    # identical embeddings -> 1.0
    np.testing.assert_allclose(np.asarray(clap_similarity(jnp.asarray(a), jnp.asarray(a))), 1.0, atol=1e-6)


def test_median_pairwise_distance_matches_torch_pdist(rng):
    x = rng.standard_normal((9, 8)).astype(np.float32)
    ours = float(median_pairwise_distance(jnp.asarray(x)))
    theirs = float(torch.median(torch.pdist(torch.from_numpy(x))))
    assert abs(ours - theirs) < 1e-5


def test_kad_matches_reference_math(rng):
    x = rng.standard_normal((10, 32)).astype(np.float32)
    y = rng.standard_normal((12, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    for kernel in ("gaussian", "iq", "imq"):
        ours = float(kernel_audio_distance(jnp.asarray(x), jnp.asarray(y), kernel=kernel))
        theirs = _torch_kad(x, y, kernel=kernel)
        assert abs(ours - theirs) < 1e-3, kernel


def test_kad_identical_sets_matches_reference(rng):
    # NB: the reference's estimator mixes an unbiased self-term with a biased
    # cross-term, so KAD(x, x) != 0 — parity matters, not zero.
    x = rng.standard_normal((8, 16)).astype(np.float32)
    ours = float(kernel_audio_distance(jnp.asarray(x), jnp.asarray(x)))
    theirs = _torch_kad(x, x)
    assert abs(ours - theirs) < 1e-3


def test_kad_bandwidth_fallback():
    # y identical rows -> median distance 0 -> fallback bandwidth 1.0
    y = np.ones((6, 4), np.float32)
    x = np.zeros((6, 4), np.float32)
    ours = float(kernel_audio_distance(jnp.asarray(x), jnp.asarray(y)))
    theirs = _torch_kad(x, y)
    assert abs(ours - theirs) < 1e-4


def test_median_pairwise_subsample_branch(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    full = float(median_pairwise_distance(jnp.asarray(x)))
    import jax

    sub = float(median_pairwise_distance(jnp.asarray(x), subsample=400, rng=jax.random.PRNGKey(0)))
    # subsampled median is a noisy estimate of the full median
    assert abs(sub - full) / full < 0.15
    # large subsample count falls through to the exact branch
    exact = float(median_pairwise_distance(jnp.asarray(x), subsample=10**6))
    assert exact == full


@pytest.mark.quick
def test_proximity_gauges():
    """eval/proximity.py (VERDICT round-4 #4): mel correlation is exactly 1
    on identical audio, scale-invariant, and drops for unrelated audio;
    embedding cosine behaves as a cosine. PROXIMITY gauges, not quality —
    see the module docstring."""
    from audioldm_tpu.eval.proximity import embedding_cosine, log_mel_host, mel_correlation

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    a = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    b = (0.3 * np.sin(2 * np.pi * 1337 * t) + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)
    assert mel_correlation(a, a) == pytest.approx(1.0, abs=1e-6)
    assert mel_correlation(a, 0.1 * a) > 0.98  # log-mel gain shift, same structure
    assert mel_correlation(a, b) < 0.6
    # length mismatch trims to the common prefix
    assert mel_correlation(a, a[:8000]) == pytest.approx(1.0, abs=1e-6)
    assert mel_correlation(np.zeros(4000, np.float32), np.zeros(4000, np.float32)) == 0.0

    assert log_mel_host(a).shape[1] == 64
    v = rng.standard_normal(512)
    w = rng.standard_normal(512)
    assert embedding_cosine(v, v) == pytest.approx(1.0)
    assert embedding_cosine(v, -v) == pytest.approx(-1.0)
    assert abs(embedding_cosine(v, w)) < 0.2


@pytest.mark.quick
def test_kad_rejects_single_element_sets(rng):
    """The unbiased estimator divides by n*(n-1): one embedding per set
    used to yield a silent NaN that flowed into results JSON
    (round-5 review finding)."""
    x = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    with pytest.raises(ValueError, match=">= 2 embeddings"):
        kernel_audio_distance(x, y)
    with pytest.raises(ValueError, match=">= 2 embeddings"):
        kernel_audio_distance(y, x)
