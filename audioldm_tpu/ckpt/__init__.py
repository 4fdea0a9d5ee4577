from audioldm_tpu.ckpt.hf_bridge import (
    convert_clap_audio_state,
    convert_clap_model_state,
    convert_clap_text_state,
    convert_unet_state,
    convert_vae_state,
    convert_vocoder_state,
    export_clap_text_state,
    export_unet_state,
    export_vae_state,
    export_vocoder_state,
    load_audioldm_checkpoint,
    load_safetensors,
    save_audioldm_checkpoint,
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
