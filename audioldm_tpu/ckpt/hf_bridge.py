"""HuggingFace checkpoint bridge.

Reads ``cvssp/audioldm-s-full-v2``-style checkpoint directories (safetensors
or torch .bin per subfolder — unet/vae/text_encoder/vocoder/scheduler) into
audioldm_tpu parameter pytrees (reference load sites:
script/train/train_audioldm_lora.py:364-371). Layout conversions:

  torch Linear [out, in]        -> kernel [in, out]
  torch Conv2d OIHW             -> kernel HWIO
  torch Conv1d OIW              -> kernel WIO
  torch ConvTranspose1d IOW     -> kernel WIO (I=in, O=out)
  torch {Layer,Group}Norm       -> {scale, bias}
  torch Embedding               -> {embedding}

Conversion is shape-driven (weight ndim decides the op class) plus a few
name rewrites where the torch module graph nests differently
(``to_out.0 -> to_out``, ``ff.net.0.proj -> ff.geglu``, ``ff.net.2 ->
ff.out``, ``{down,up}samplers.N.conv -> {down,up}samplers.N``, legacy VAE
attention names). Param-path names otherwise mirror the torch module paths
exactly, so this bridge plus the PEFT LoRA key map (audioldm_tpu.lora) cover
the reference's whole checkpoint surface.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def load_safetensors(path: str) -> dict:
    from safetensors.numpy import load_file

    return load_file(path)


def load_torch_bin(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def load_state_dict(folder: str) -> dict:
    """Load the first weights file found in a checkpoint subfolder."""
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return load_safetensors(p) if p.endswith(".safetensors") else load_torch_bin(p)
    raise FileNotFoundError(f"no weights file under {folder}")


# ---------------------------------------------------------------------------
# Generic converter core
# ---------------------------------------------------------------------------


def _set(tree: dict, parts: list[str], value):
    import jax.numpy as jnp

    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    # device arrays, not numpy: params may be closed over by jitted fns
    # (tracer-indexing a numpy embedding table fails)
    tree[parts[-1]] = jnp.asarray(value)


def _rewrite(module: str, rules: list[tuple[str, str]]) -> str:
    for old, new in rules:
        module = module.replace(old, new)
    return module


def convert_state_dict(
    sd: dict,
    rename_rules: list[tuple[str, str]],
    is_embedding: Callable[[str], bool] = lambda m: False,
    is_conv_transpose: Callable[[str], bool] = lambda m: False,
    extra_leaf: Callable[[str], Optional[list[str]]] = lambda k: None,
) -> dict:
    tree: dict = {}
    for key, v in sd.items():
        v = np.asarray(v)
        custom = extra_leaf(key)
        if custom is not None:
            _set(tree, custom, v)
            continue
        parts = key.split(".")
        leaf, module = parts[-1], ".".join(parts[:-1])
        module = _rewrite(module, rename_rules)
        mparts = module.split(".") if module else []
        if leaf == "weight":
            if is_embedding(module):
                _set(tree, mparts + ["embedding"], v)
            elif v.ndim == 4:  # Conv2d OIHW -> HWIO
                _set(tree, mparts + ["kernel"], v.transpose(2, 3, 1, 0))
            elif v.ndim == 3:
                if is_conv_transpose(module):  # ConvTranspose1d IOW -> WIO
                    _set(tree, mparts + ["kernel"], v.transpose(2, 0, 1))
                else:  # Conv1d OIW -> WIO
                    _set(tree, mparts + ["kernel"], v.transpose(2, 1, 0))
            elif v.ndim == 2:  # Linear [out,in] -> [in,out]
                _set(tree, mparts + ["kernel"], v.T)
            elif v.ndim == 1:  # Norm scale
                _set(tree, mparts + ["scale"], v)
            else:
                raise ValueError(f"unclassified weight {key} shape {v.shape}")
        elif leaf == "bias":
            _set(tree, mparts + ["bias"], v)
        elif leaf in ("mean", "scale", "running_mean", "running_var"):
            _set(tree, mparts + [leaf], v)
        # anything else (num_batches_tracked, position_ids buffers) is dropped
    return tree


# ---------------------------------------------------------------------------
# Per-model converters
# ---------------------------------------------------------------------------

_UNET_RULES = [
    ("to_out.0", "to_out"),
    ("ff.net.0.proj", "ff.geglu"),
    ("ff.net.2", "ff.out"),
    ("downsamplers.0.conv", "downsamplers.0"),
    ("upsamplers.0.conv", "upsamplers.0"),
]

_VAE_RULES = _UNET_RULES + [
    # legacy diffusers VAE attention naming
    (".query", ".to_q"),
    (".key", ".to_k"),
    (".value", ".to_v"),
    (".proj_attn", ".to_out"),
]


def convert_unet_state(sd: dict) -> dict:
    return convert_state_dict(sd, _UNET_RULES)


def convert_vae_state(sd: dict) -> dict:
    return convert_state_dict(sd, _VAE_RULES)


def convert_clap_text_state(sd: dict) -> dict:
    return convert_state_dict(
        sd,
        rename_rules=[],
        is_embedding=lambda m: m.endswith("_embeddings"),
    )


def convert_clap_audio_state(sd: dict) -> dict:
    """HTSAT audio tower (ClapAudioModelWithProjection layout)."""
    return convert_state_dict(
        sd,
        rename_rules=[],
        extra_leaf=lambda k: (
            k.split(".") if k.endswith("relative_position_bias_table") else None
        ),
    )


def convert_clap_model_state(sd: dict) -> tuple[dict, dict]:
    """Split a full ``ClapModel`` (laion/clap-htsat-fused) state dict into
    (text_tower_params, audio_tower_params) for our two towers."""
    text_sd = {k: v for k, v in sd.items() if k.startswith(("text_model.", "text_projection."))}
    audio_sd = {k: v for k, v in sd.items() if k.startswith(("audio_model.", "audio_projection."))}
    return convert_clap_text_state(text_sd), convert_clap_audio_state(audio_sd)


def convert_vocoder_state(sd: dict) -> dict:
    return convert_state_dict(
        sd,
        rename_rules=[],
        is_conv_transpose=lambda m: m.startswith("upsampler."),
        extra_leaf=lambda k: [k] if k in ("mean", "scale") else None,
    )


# ---------------------------------------------------------------------------
# Inverse converters: audioldm_tpu pytrees -> HF/torch state dicts, so
# checkpoints trained here remain loadable by the reference's torch stack.
# ---------------------------------------------------------------------------


def _flatten(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def export_state_dict(
    tree: dict,
    rename_rules: list[tuple[str, str]],
    is_conv_transpose: Callable[[str], bool] = lambda m: False,
) -> dict:
    """Inverse of :func:`convert_state_dict` (same rules, applied backwards)."""
    inv_rules = [(new, old) for old, new in rename_rules]
    sd = {}
    for key, v in _flatten(tree).items():
        parts = key.split(".")
        leaf, module = parts[-1], ".".join(parts[:-1])
        module = _rewrite(module, inv_rules)
        if leaf == "kernel":
            if v.ndim == 4:  # HWIO -> OIHW
                sd[f"{module}.weight"] = v.transpose(3, 2, 0, 1)
            elif v.ndim == 3:
                if is_conv_transpose(module):  # WIO -> IOW
                    sd[f"{module}.weight"] = v.transpose(1, 2, 0)
                else:  # WIO -> OIW
                    sd[f"{module}.weight"] = v.transpose(2, 1, 0)
            elif v.ndim == 2:  # [in,out] -> [out,in]
                sd[f"{module}.weight"] = v.T
            else:
                raise ValueError(f"unexported kernel {key} shape {v.shape}")
        elif leaf in ("scale", "mean") and not module:
            sd[leaf] = v  # vocoder's top-level mean/scale buffers
        elif leaf == "scale":
            sd[f"{module}.weight"] = v  # norm / BN gain
        elif leaf == "embedding":
            sd[f"{module}.weight"] = v
        elif leaf in ("bias", "running_mean", "running_var"):
            sd[f"{module}.{leaf}"] = v
        else:
            sd[key] = v
    return sd


def export_unet_state(params: dict) -> dict:
    return export_state_dict(params, _UNET_RULES)


def export_vae_state(params: dict) -> dict:
    return export_state_dict(params, _UNET_RULES)  # modern to_q/... names


def export_clap_text_state(params: dict) -> dict:
    return export_state_dict(params, [])


def export_vocoder_state(params: dict) -> dict:
    return export_state_dict(params, [], is_conv_transpose=lambda m: m.startswith("upsampler."))


# ---------------------------------------------------------------------------
# Full checkpoint load
# ---------------------------------------------------------------------------


def save_audioldm_checkpoint(checkpoint_dir: str, modules) -> None:
    """Write an HF-layout audioldm checkpoint directory (safetensors +
    config.json per subfolder) from an AudioLDMModules bundle — the inverse
    of :func:`load_audioldm_checkpoint`, so models trained/merged here stay
    loadable by the reference's diffusers/transformers stack."""
    import dataclasses
    import json

    from safetensors.numpy import save_file

    specs = [
        ("unet", modules.unet, modules.unet_cfg, export_unet_state, "diffusion_pytorch_model.safetensors", "config.json"),
        ("vae", modules.vae, modules.vae_cfg, export_vae_state, "diffusion_pytorch_model.safetensors", "config.json"),
        ("text_encoder", modules.text_encoder, modules.text_cfg, export_clap_text_state, "model.safetensors", "config.json"),
        ("vocoder", modules.vocoder, modules.vocoder_cfg, export_vocoder_state, "model.safetensors", "config.json"),
    ]
    for sub, params, cfg, export, weights_name, cfg_name in specs:
        folder = os.path.join(checkpoint_dir, sub)
        os.makedirs(folder, exist_ok=True)
        sd = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in export(params).items()}
        save_file(sd, os.path.join(folder, weights_name))
        with open(os.path.join(folder, cfg_name), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)
    sched = os.path.join(checkpoint_dir, "scheduler")
    os.makedirs(sched, exist_ok=True)
    with open(os.path.join(sched, "scheduler_config.json"), "w") as f:
        json.dump(dataclasses.asdict(modules.ddim_cfg), f, indent=2)


def load_audioldm_checkpoint(checkpoint_dir: str):
    """Load every submodel of an audioldm-s checkpoint directory into a
    pytree bundle + configs. Returns a dict with keys
    ``unet/vae/text_encoder/vocoder`` (params) and ``configs``.
    """
    from audioldm_tpu.config import (
        ClapTextConfig,
        DDIMConfig,
        UNetConfig,
        VAEConfig,
        VocoderConfig,
        load_hf_config,
    )

    configs = {
        "unet": UNetConfig.from_hf(load_hf_config(checkpoint_dir, "unet")),
        "vae": VAEConfig.from_hf(load_hf_config(checkpoint_dir, "vae")),
        "text_encoder": ClapTextConfig.from_hf(load_hf_config(checkpoint_dir, "text_encoder")),
        "vocoder": VocoderConfig.from_hf(load_hf_config(checkpoint_dir, "vocoder")),
        "scheduler": DDIMConfig.from_hf(load_hf_config(checkpoint_dir, "scheduler")),
    }
    params = {
        "unet": convert_unet_state(load_state_dict(os.path.join(checkpoint_dir, "unet"))),
        "vae": convert_vae_state(load_state_dict(os.path.join(checkpoint_dir, "vae"))),
        "text_encoder": convert_clap_text_state(load_state_dict(os.path.join(checkpoint_dir, "text_encoder"))),
        "vocoder": convert_vocoder_state(load_state_dict(os.path.join(checkpoint_dir, "vocoder"))),
    }
    return {"params": params, "configs": configs}
