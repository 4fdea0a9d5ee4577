"""Evaluation metrics: CLAP similarity + Kernel Audio Distance (KAD).

Formula parity targets in the reference:
- CLAP score: cosine similarity between L2-normalized CLAP audio/text
  embeddings rescaled to [0,1] via ``(s+1)/2``
  (script/train/train_audioldm_lora.py:128-137);
- KAD: unbiased MMD^2 between CLAP audio embedding sets with
  gaussian/iq/imq kernels, median-pairwise-distance bandwidth from the
  *generated* set (the reference calls ``calc_kernel_audio_distance(ref,
  gen)`` with the bandwidth from ``y`` — see kernel_audio_distance's
  docstring), NaN/underflow fallback to 1.0, scaled x100
  (script/train/train_audioldm_lora.py:234-294, SCALE_FACTOR at :71;
  standalone duplicate in script/inference/inference.py:8-77).

All pure jnp; embeddings come from the CLAP towers
(audioldm_tpu.models.clap_text / clap_audio).
"""

from __future__ import annotations

import jax.numpy as jnp

SCALE_FACTOR = 100.0


def clap_similarity(audio_embed: jnp.ndarray, text_embed: jnp.ndarray) -> jnp.ndarray:
    """``(cos(a, t) + 1) / 2``. Inputs ``[D]`` or ``[B, D]`` (unnormalized ok)."""
    a = audio_embed / jnp.linalg.norm(audio_embed, axis=-1, keepdims=True)
    t = text_embed / jnp.linalg.norm(text_embed, axis=-1, keepdims=True)
    sim = jnp.sum(a * t, axis=-1)
    return (sim + 1.0) / 2.0


def median_pairwise_distance(
    x: jnp.ndarray,
    subsample: int | None = None,
    rng=None,
) -> jnp.ndarray:
    """Median euclidean distance over the strict upper triangle (torch.pdist
    semantics, train_audioldm_lora.py:234-245). With ``subsample`` (the
    reference's large-set branch, :237-242): median over ``subsample`` random
    pairs, self-pairs shifted to the next row."""
    x = x.astype(jnp.float32)
    n = x.shape[0]
    if subsample is not None and subsample < n * (n - 1) / 2:
        import jax

        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        idx1 = jax.random.randint(k1, (subsample,), 0, n)
        idx2 = jax.random.randint(k2, (subsample,), 0, n)
        idx2 = jnp.where(idx1 == idx2, (idx2 + 1) % n, idx2)
        d = jnp.sqrt(jnp.sum((x[idx1] - x[idx2]) ** 2, axis=1))
        pair = jnp.sort(d)
        return pair[(pair.shape[0] - 1) // 2]
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    iu, ju = jnp.triu_indices(n, k=1)
    pair = jnp.sort(d[iu, ju])
    # torch.median returns the LOWER of the two middle elements; match it.
    return pair[(pair.shape[0] - 1) // 2]


def _kernel(name: str, d2: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    if name == "gaussian":
        return jnp.exp(-gamma * d2)
    if name == "iq":
        return 1.0 / (1.0 + gamma * d2)
    if name == "imq":
        return 1.0 / jnp.sqrt(1.0 + gamma * d2)
    raise ValueError(f"invalid kernel: {name}")


def kernel_audio_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    bandwidth: float | None = None,
    kernel: str = "gaussian",
    eps: float = 1e-8,
    scale: float = SCALE_FACTOR,
) -> jnp.ndarray:
    """Unbiased MMD^2(x, y) * scale with median-heuristic bandwidth from
    ``y`` — exact formula parity with train_audioldm_lora.py:247-294
    including the <1e-6/NaN fallback to 1.0. NB the reference calls this as
    ``calc_kernel_audio_distance(ref, gen)`` (:321), so the bandwidth comes
    from the GENERATED set; callers here preserve that order
    (``kad(ref, gen)``)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if x.shape[0] < 2 or y.shape[0] < 2:
        # the unbiased estimator divides by n*(n-1): one embedding per set
        # yields a silent NaN that flows into results JSON / metrics.jsonl
        # (round-5 review finding) — fail with an actionable message
        raise ValueError(
            f"KAD needs >= 2 embeddings per set, got {x.shape[0]} vs "
            f"{y.shape[0]} (add more clips to the smaller corpus)")
    if bandwidth is None:
        bw = median_pairwise_distance(y)
        bw = jnp.where(jnp.isnan(bw) | (bw < 1e-6), 1.0, bw)
    else:
        bw = jnp.asarray(bandwidth, jnp.float32)
    gamma = 1.0 / (2.0 * bw**2 + eps)

    def sq_dists(a, b):
        na = jnp.sum(a * a, axis=1)
        nb = jnp.sum(b * b, axis=1)
        return na[:, None] + nb[None, :] - 2.0 * (a @ b.T)

    n, m = x.shape[0], y.shape[0]
    k_xx = _kernel(kernel, sq_dists(x, x), gamma)
    k_xx = k_xx - jnp.diag(jnp.diag(k_xx))
    k_xx_mean = jnp.sum(k_xx) / (n * (n - 1))

    k_yy = _kernel(kernel, sq_dists(y, y), gamma)
    k_yy = k_yy - jnp.diag(jnp.diag(k_yy))
    k_yy_mean = jnp.sum(k_yy) / (m * (m - 1))

    k_xy_mean = jnp.mean(_kernel(kernel, sq_dists(x, y), gamma))
    return (k_xx_mean + k_yy_mean - 2.0 * k_xy_mean) * scale
