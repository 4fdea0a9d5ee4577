"""LoRA adapter subsystem.

Reference behavior being matched (peft usage in the reference):
- training wraps every attention ``to_q``/``to_v`` linear with
  ``W x + (alpha/r) * B A x``, only A/B trainable
  (script/train/train_audioldm_lora.py:378-394; LoraConfig r=2, alpha=2,
  gaussian init);
- inference merges trained adapters into the base UNet for zero-overhead
  sampling (script/inference/generate_audio.py:21-39 — clumsily via
  state-dict surgery there; here it is a clean load-time ``W += (alpha/r)BA``
  per the BASELINE.json north star);
- PEFT/diffusers checkpoint formats are importable/exportable
  (get_peft_model_state_dict / convert_state_dict_to_diffusers at
  train_audioldm_lora.py:577-578).

TPU-first design: adapters are a *parallel pytree* keyed by the same path
components as the base params (list indices as string keys). Training jits
the unmerged path and differentiates only the adapter tree; serving either
merges (single-adapter) or evaluates a batched adapter bank (multi-LoRA,
audioldm_tpu.serve). Init conventions match peft
(``gaussian``: A ~ N(0, 1/r^2) [std=1/r], B = 0; default: kaiming-uniform).
"""

from __future__ import annotations

import math
import re
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audioldm_tpu.config import LoRAConfig

# Attention projection leaves that can host adapters.
_PROJ_NAMES = ("to_q", "to_k", "to_v", "to_out")


def iter_lora_paths(params: dict, target_modules: Sequence[str]) -> Iterator[tuple[tuple[str, ...], dict]]:
    """Yield (path, linear-params) for every 2-D linear in ``params`` whose
    leaf module name is in ``target_modules`` (to_q/to_k/to_v/to_out live
    only inside attention blocks), mirroring peft's match-by-leaf-name
    targeting (train_audioldm_lora.py:378-383)."""

    def walk(tree: dict, path: tuple[str, ...]):
        for k, v in tree.items():
            if not isinstance(v, dict):
                continue
            if k in target_modules and "kernel" in v and v["kernel"].ndim == 2:
                yield path + (k,)
                continue
            yield from walk(v, path + (k,))

    for p in walk(params, ()):
        node = params
        for k in p:
            node = node[k]
        yield p, node


def _set_path(tree: dict, path: tuple[str, ...], value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _get_path(tree: dict, path: tuple[str, ...]):
    for k in path:
        tree = tree[k]
    return tree


def init_lora(key, params: dict, cfg: LoRAConfig = LoRAConfig()) -> dict:
    """Build an adapter pytree for ``params`` (typically the UNet tree)."""
    lora: dict = {}
    paths = [p for p, _ in iter_lora_paths(params, cfg.target_modules)]
    keys = jax.random.split(key, max(len(paths), 1))
    for p, k in zip(paths, keys):
        w = _get_path(params, p)["kernel"]
        d_in, d_out = w.shape
        if cfg.init_lora_weights == "gaussian":
            a = jax.random.normal(k, (d_in, cfg.r), jnp.float32) * (1.0 / cfg.r)
        else:  # kaiming-uniform over the [r, d_in] torch layout
            bound = math.sqrt(6.0 / d_in)
            a = jax.random.uniform(k, (d_in, cfg.r), jnp.float32, -bound, bound)
        b = jnp.zeros((cfg.r, d_out), jnp.float32)
        _set_path(lora, p, {"a": a, "b": b})
    return lora


def _delta(node: dict, dtype) -> jnp.ndarray:
    return jnp.matmul(node["a"].astype(jnp.float32), node["b"].astype(jnp.float32)).astype(dtype)


def merge_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    """Return params with ``W += (alpha/r) A B`` applied at every adapter
    path — zero-overhead inference (BASELINE north star)."""
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy of structure

    def walk(ptree: dict, ltree: dict):
        for k, lv in ltree.items():
            if isinstance(lv, dict) and "a" in lv and "b" in lv:
                w = ptree[k]["kernel"]
                ptree[k] = dict(ptree[k])
                ptree[k]["kernel"] = w + cfg.scale * _delta(lv, w.dtype)
            elif isinstance(lv, dict):
                walk(ptree[k], lv)

    walk(out, lora)
    return out


def unmerge_lora(params: dict, lora: dict, cfg: LoRAConfig) -> dict:
    neg = jax.tree.map(lambda x: x, lora)

    def walk(t):
        for k, v in t.items():
            if isinstance(v, dict) and "a" in v:
                t[k] = {"a": v["a"], "b": -v["b"]}
            elif isinstance(v, dict):
                walk(v)

    walk(neg)
    return merge_lora(params, neg, cfg)


def compose_adapters(
    parts: Sequence[tuple[dict, LoRAConfig, float]],
) -> tuple[dict, LoRAConfig]:
    """EXACT weighted composition of LoRA adapters into one adapter
    (peft's ``add_weighted_adapter(combination_type="cat")`` capability —
    beyond the reference, which only ever loads a single adapter at
    script/inference/generate_audio.py:21-39).

    ``parts`` is a sequence of ``(adapter_tree, cfg, weight)``. The composed
    delta is ``sum_i w_i * (alpha_i/r_i) * A_i B_i`` — represented without
    approximation by concatenating along the rank axis with each ``B_i``
    pre-scaled by ``w_i * scale_i``, and a composed config whose scale is 1
    (``lora_alpha == r``). Adapters may target different module subsets; a
    path missing from some adapters simply concatenates fewer ranks there.

    Returns ``(composed_tree, composed_cfg)`` — feed to ``merge_lora`` for
    zero-overhead inference or serve unmerged like any other adapter."""
    if not parts:
        raise ValueError("compose_adapters needs at least one (tree, cfg, weight)")

    def paths_of(tree: dict, path: tuple[str, ...] = ()) -> Iterator[tuple[str, ...]]:
        for k, v in tree.items():
            if isinstance(v, dict) and "a" in v and "b" in v:
                yield path + (k,)
            elif isinstance(v, dict):
                yield from paths_of(v, path + (k,))

    all_paths: list[tuple[str, ...]] = []
    for tree, _, _ in parts:
        for p in paths_of(tree):
            if p not in all_paths:
                all_paths.append(p)

    composed: dict = {}
    for p in all_paths:
        a_pieces, b_pieces = [], []
        for tree, cfg, w in parts:
            try:
                node = _get_path(tree, p)
            except KeyError:
                continue
            a_pieces.append(node["a"].astype(jnp.float32))
            b_pieces.append(float(w) * cfg.scale * node["b"].astype(jnp.float32))
        _set_path(composed, p, {
            "a": jnp.concatenate(a_pieces, axis=1),
            "b": jnp.concatenate(b_pieces, axis=0),
        })

    r_total = sum(cfg.r for _, cfg, _ in parts)
    targets: list[str] = []
    for _, cfg, _ in parts:
        targets.extend(t for t in cfg.target_modules if t not in targets)
    return composed, LoRAConfig(
        r=r_total, lora_alpha=float(r_total), target_modules=tuple(targets)
    )


# ---------------------------------------------------------------------------
# PEFT state-dict bridge
# ---------------------------------------------------------------------------

def _parse_peft_key(key: str) -> Optional[tuple[str, str]]:
    m = re.match(r"^(?:base_model\.model\.)?(.+?)\.(lora_A|lora_B)(?:\.default)?\.weight$", key)
    if m:
        return m.group(1), m.group(2)
    # diffusers-converted format: ...to_q.lora.down.weight / .lora.up.weight
    m = re.match(r"^(?:base_model\.model\.)?(.+?)\.lora\.(down|up)\.weight$", key)
    if m:
        return m.group(1), "lora_A" if m.group(2) == "down" else "lora_B"
    return None


def _module_to_path(module: str) -> tuple[str, ...]:
    # torch module path -> our param path (to_out.0 -> to_out)
    module = module.replace("to_out.0", "to_out")
    return tuple(module.split("."))


def import_peft_state_dict(sd: dict) -> tuple[dict, int]:
    """Parse a PEFT (or diffusers-converted) LoRA state dict into an adapter
    pytree. Accepts the key layouts produced by ``get_peft_model_state_dict``,
    ``accelerator.save_state`` (model.safetensors with ``.default.`` adapter
    names), and ``convert_state_dict_to_diffusers`` — the three formats the
    reference emits/consumes (train_audioldm_lora.py:577-578,
    generate_audio.py:32-39). Returns (lora_tree, rank)."""
    lora: dict = {}
    rank = 0
    for key, v in sd.items():
        parsed = _parse_peft_key(key)
        if parsed is None:
            continue
        module, ab = parsed
        path = _module_to_path(module)
        v = np.asarray(v)
        node = lora
        for k in path:
            node = node.setdefault(k, {})
        if ab == "lora_A":  # torch [r, in] -> a [in, r]
            node["a"] = jnp.asarray(v.T)
            rank = v.shape[0]
        else:  # torch [out, r] -> b [r, out]
            node["b"] = jnp.asarray(v.T)
            rank = max(rank, v.shape[1])
    return lora, rank


def export_peft_state_dict(lora: dict, prefix: str = "base_model.model.") -> dict:
    """Emit a PEFT-format state dict (``...lora_A.weight`` [r,in] /
    ``...lora_B.weight`` [out,r]) from an adapter pytree, so checkpoints are
    loadable by the reference's torch stack."""
    out: dict = {}

    def walk(tree: dict, path: list[str]):
        for k, v in tree.items():
            if isinstance(v, dict) and "a" in v and "b" in v:
                module = ".".join(path + [k]).replace("to_out", "to_out.0")
                out[f"{prefix}{module}.lora_A.weight"] = np.asarray(v["a"]).T
                out[f"{prefix}{module}.lora_B.weight"] = np.asarray(v["b"]).T
            elif isinstance(v, dict):
                walk(v, path + [k])

    walk(lora, [])
    return out
