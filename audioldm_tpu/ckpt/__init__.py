from audioldm_tpu.ckpt.hf_bridge import (
    convert_clap_audio_state,
    convert_clap_model_state,
    convert_clap_text_state,
    convert_unet_state,
    convert_vae_state,
    convert_vocoder_state,
    load_audioldm_checkpoint,
    load_safetensors,
)

__all__ = [
    "convert_clap_audio_state",
    "convert_clap_model_state",
    "convert_clap_text_state",
    "convert_unet_state",
    "convert_vae_state",
    "convert_vocoder_state",
    "load_audioldm_checkpoint",
    "load_safetensors",
]
