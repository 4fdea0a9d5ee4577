"""Directory-level CLAP/KAD scoring.

Replaces the reference's broken ``script/inference/inference.py`` (duplicate
``compute_kad_score`` defs make it unimportable — SURVEY.md §0): score a
directory of generated wavs against a prompt (per-file CLAP score) and a
reference wav directory (corpus-level KAD), using the JAX CLAP towers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import ClapAudioConfig, ClapTextConfig, load_hf_config
from audioldm_tpu.data.wavio import read_wav
from audioldm_tpu.eval.clap_features import batch_fused_features
from audioldm_tpu.eval.metrics import clap_similarity, kernel_audio_distance
from audioldm_tpu.models.clap_audio import apply_clap_audio
from audioldm_tpu.models.clap_text import apply_clap_text
from audioldm_tpu.ops import resample


class ClapScorer:
    """Loaded CLAP model (text + audio towers) with jitted embed fns."""

    def __init__(self, text_params, text_cfg, audio_params, audio_cfg, tokenizer):
        self.text_params, self.text_cfg = text_params, text_cfg
        self.audio_params, self.audio_cfg = audio_params, audio_cfg
        self.tokenizer = tokenizer
        # params as jit ARGUMENTS, not closure constants: closed-over
        # weights are serialized into the lowered program — on the
        # remote-compile backend that ships the full CLAP tower inside
        # the HLO/executable (the repo-wide rule, pipeline/generate.py)
        self._audio_fn = jax.jit(lambda p, f, l: apply_clap_audio(p, audio_cfg, f, l)["audio_embeds"])
        self._text_fn = jax.jit(lambda p, i, m: apply_clap_text(p, text_cfg, i, m)["text_embeds"])

    @classmethod
    def from_checkpoint(cls, clap_dir: str) -> "ClapScorer":
        """``clap_dir``: HF-layout CLAP model dir (full ClapModel weights), or
        a checkpoint dir containing a ``clap/`` subfolder (both layouts the
        ``score`` CLI documents)."""
        from audioldm_tpu.ckpt.hf_bridge import convert_clap_model_state, load_state_dict
        from audioldm_tpu.data.tokenizer import load_tokenizer

        sub = os.path.join(clap_dir, "clap")
        if not os.path.exists(os.path.join(clap_dir, "config.json")) and os.path.isdir(sub):
            clap_dir = sub
        sd = load_state_dict(clap_dir)
        text_params, audio_params = convert_clap_model_state(sd)
        cfg = load_hf_config(clap_dir, "")
        text_cfg = ClapTextConfig.from_hf(cfg.get("text_config", {}))
        audio_cfg = ClapAudioConfig.from_hf(cfg.get("audio_config", {}))
        tokenizer = load_tokenizer(clap_dir)
        return cls(text_params, text_cfg, audio_params, audio_cfg, tokenizer)

    def embed_audio(
        self, waveforms_48k: list[np.ndarray], rng=None, batch_size: int = 16
    ) -> jnp.ndarray:
        """Batched HTSAT embeddings. The corpus streams through the jitted
        audio tower in fixed-size chunks (last chunk zero-padded, trimmed
        after) so ONE compile serves any corpus length — per-clip embeddings
        are independent, so chunking is numerically free. Sub-batch corpora
        pad to the next power of two (capped at ``batch_size``): at most
        log2(batch_size)+1 compile keys total, instead of one compile per
        distinct corpus size (round-5 review finding) while a tiny corpus
        still doesn't pay the full-batch FLOPs."""
        feats, longer = batch_fused_features(waveforms_48k, rng)
        n = feats.shape[0]
        if batch_size is None:
            emb = self._audio_fn(self.audio_params, feats, longer)
        else:
            bucket = 1
            while bucket < min(n, batch_size):
                bucket *= 2
            chunks = []
            for i in range(0, n, bucket):
                f, l = feats[i : i + bucket], longer[i : i + bucket]
                keep = f.shape[0]
                pad = bucket - keep
                if pad:
                    f = jnp.concatenate([f, jnp.zeros((pad, *f.shape[1:]), f.dtype)])
                    l = jnp.concatenate([l, jnp.zeros((pad,), l.dtype)])
                chunks.append(self._audio_fn(self.audio_params, f, l)[:keep])
            emb = jnp.concatenate(chunks, axis=0)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def embed_text(self, texts: list[str]) -> jnp.ndarray:
        # reference parity: `clap_processor(text=..., padding=True)` pads to
        # the batch longest WITHOUT truncation (RoBERTa max 512,
        # train_audioldm_lora.py:133) — a 77-token cap was the CLIP
        # convention, not CLAP's (round-5 review finding). Sequence length
        # then rounds up to a power-of-two bucket: masked PAD positions
        # don't change the embedding (pinned by
        # tests/test_data.py::test_text_bucketing_embedding_equivalence),
        # and per-prompt-length retraces would cost a remote compile each.
        max_len = self.text_cfg.max_position_embeddings - 2
        tok = self.tokenizer(texts, max_length=max_len, padding="longest")
        ids, mask = np.asarray(tok["input_ids"]), np.asarray(tok["attention_mask"])
        bucket = 8
        while bucket < ids.shape[1]:
            bucket *= 2
        bucket = min(bucket, max_len)
        if ids.shape[1] < bucket:
            pad_id = getattr(self.tokenizer, "pad_token_id", 1)
            extra = bucket - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, extra)), constant_values=pad_id)
            mask = np.pad(mask, ((0, 0), (0, extra)))
        emb = self._text_fn(self.text_params, jnp.asarray(ids), jnp.asarray(mask))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def clap_scores(self, waveforms_48k: list[np.ndarray], prompt: str) -> np.ndarray:
        """Per-clip ``(cos+1)/2`` scores vs one prompt (reference formula,
        train_audioldm_lora.py:128-137)."""
        a = self.embed_audio(waveforms_48k)
        t = self.embed_text([prompt])
        return np.asarray(clap_similarity(a, jnp.broadcast_to(t, a.shape)))

    def kad(self, ref_48k: list[np.ndarray], gen_48k: list[np.ndarray]) -> float:
        """Corpus-level KAD (reference: compute_clap_kad_from_audio_lists,
        train_audioldm_lora.py:296-321)."""
        r = self.embed_audio(ref_48k)
        g = self.embed_audio(gen_48k)
        return float(kernel_audio_distance(r, g))


def _load_dir_48k(folder: str, limit: Optional[int] = None) -> list[np.ndarray]:
    out = []
    for name in sorted(os.listdir(folder)):
        if not name.lower().endswith(".wav"):
            continue
        wav, sr = read_wav(os.path.join(folder, name))
        if wav.size == 0:
            # a zero-length wav would crash far downstream with a bare
            # ZeroDivisionError in the fusion feature repeat
            # (round-5 review finding)
            raise ValueError(f"empty wav file: {os.path.join(folder, name)}")
        if sr != 48000:
            wav = np.asarray(resample(jnp.asarray(wav), sr, 48000))
        out.append(wav)
        if limit and len(out) >= limit:
            break
    if not out:
        raise ValueError(f"no .wav files found in {folder}")
    return out


def score_directories(
    clap_dir: str,
    generated_dir: str,
    reference_dir: Optional[str] = None,
    prompt: Optional[str] = None,
    limit: Optional[int] = None,
) -> dict:
    scorer = ClapScorer.from_checkpoint(clap_dir)
    gen = _load_dir_48k(generated_dir, limit)
    results: dict = {"num_generated": len(gen)}
    if prompt:
        scores = scorer.clap_scores(gen, prompt)
        results["clap_scores"] = [float(s) for s in scores]
        results["clap_score_mean"] = float(np.mean(scores))
    if reference_dir:
        ref = _load_dir_48k(reference_dir, limit)
        results["num_reference"] = len(ref)
        results["kad"] = scorer.kad(ref, gen)
    return results
