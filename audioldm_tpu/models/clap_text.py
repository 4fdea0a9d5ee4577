"""CLAP text tower: RoBERTa encoder + 2-layer MLP projection head.

Behavior pinned by the reference call site
(script/train/train_audioldm_lora.py:368-369,513-524): tokenized captions ->
``ClapTextModelWithProjection(...).text_embeds`` (pooled CLS state -> tanh
pooler -> linear/relu/linear projection to 512-d), then L2-normalized by the
caller. Param paths mirror the transformers module names so the checkpoint
bridge is a key map; parity is tested against the installed ``transformers``
implementation with shared weights (tests/test_clap_text.py).

TPU-first: one pure ``apply``; fixed ``max_length`` padding keeps shapes
static under jit (the reference tokenizes to max_length=512,
datasets.py:128-134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioldm_tpu.config import ClapTextConfig
from audioldm_tpu.models.nn import ACT, init_embedding, init_linear, init_norm, layer_norm, linear, sdpa


def init_clap_text(key, cfg: ClapTextConfig = ClapTextConfig()) -> dict:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_hidden_layers))
    nk = lambda: next(keys)
    layers = {}
    for i in range(cfg.num_hidden_layers):
        layers[str(i)] = {
            "attention": {
                "self": {
                    "query": init_linear(nk(), cfg.hidden_size, cfg.hidden_size),
                    "key": init_linear(nk(), cfg.hidden_size, cfg.hidden_size),
                    "value": init_linear(nk(), cfg.hidden_size, cfg.hidden_size),
                },
                "output": {
                    "dense": init_linear(nk(), cfg.hidden_size, cfg.hidden_size),
                    "LayerNorm": init_norm(cfg.hidden_size),
                },
            },
            "intermediate": {"dense": init_linear(nk(), cfg.hidden_size, cfg.intermediate_size)},
            "output": {
                "dense": init_linear(nk(), cfg.intermediate_size, cfg.hidden_size),
                "LayerNorm": init_norm(cfg.hidden_size),
            },
        }
    return {
        "text_model": {
            "embeddings": {
                "word_embeddings": init_embedding(nk(), cfg.vocab_size, cfg.hidden_size),
                "position_embeddings": init_embedding(nk(), cfg.max_position_embeddings, cfg.hidden_size),
                "token_type_embeddings": init_embedding(nk(), cfg.type_vocab_size, cfg.hidden_size),
                "LayerNorm": init_norm(cfg.hidden_size),
            },
            "encoder": {"layer": layers},
            "pooler": {"dense": init_linear(nk(), cfg.hidden_size, cfg.hidden_size)},
        },
        "text_projection": {
            "linear1": init_linear(nk(), cfg.hidden_size, cfg.projection_dim),
            "linear2": init_linear(nk(), cfg.projection_dim, cfg.projection_dim),
        },
    }


def _roberta_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa's pad-aware position ids: ``cumsum(mask) * mask + pad_id``."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


def apply_clap_text(
    params: dict,
    cfg: ClapTextConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
) -> dict:
    """Returns ``{"text_embeds": [B, proj], "pooler_output": [B, H],
    "last_hidden_state": [B, N, H]}``."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

    tm = params["text_model"]
    emb = tm["embeddings"]
    pos_ids = _roberta_position_ids(input_ids, cfg.pad_token_id)
    h = (
        emb["word_embeddings"]["embedding"][input_ids]
        + emb["position_embeddings"]["embedding"][pos_ids]
        + emb["token_type_embeddings"]["embedding"][jnp.zeros_like(input_ids)]
    )
    h = layer_norm(emb["LayerNorm"], h, eps=cfg.layer_norm_eps)

    # additive attention mask, fp32 big-negative for padded keys
    ext_mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    act = ACT[cfg.hidden_act]

    for i in range(cfg.num_hidden_layers):
        lp = tm["encoder"]["layer"][str(i)]
        sa = lp["attention"]["self"]
        b, n, _ = h.shape

        def heads(x):
            return x.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(linear(sa["query"], h)), heads(linear(sa["key"], h)), heads(linear(sa["value"], h))
        a = sdpa(q, k, v, ext_mask).transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        ao = lp["attention"]["output"]
        h = layer_norm(ao["LayerNorm"], linear(ao["dense"], a) + h, eps=cfg.layer_norm_eps)
        inter = act(linear(lp["intermediate"]["dense"], h))
        out = lp["output"]
        h = layer_norm(out["LayerNorm"], linear(out["dense"], inter) + h, eps=cfg.layer_norm_eps)

    pooled = jnp.tanh(linear(tm["pooler"]["dense"], h[:, 0]))
    proj = params["text_projection"]
    text_embeds = linear(proj["linear2"], ACT[cfg.projection_hidden_act](linear(proj["linear1"], pooled)))
    return {"text_embeds": text_embeds, "pooler_output": pooled, "last_hidden_state": h}
