from audioldm_tpu.pipeline.generate import (
    AudioLDMModules,
    encode_prompt,
    generate,
    make_generate_fn,
    random_modules,
)
from audioldm_tpu.pipeline.audio2audio import (
    generate_from_audio,
    latent_mask,
    make_a2a_fn,
    prepare_init_mel,
)

__all__ = [
    "AudioLDMModules",
    "encode_prompt",
    "generate",
    "generate_from_audio",
    "latent_mask",
    "make_a2a_fn",
    "make_generate_fn",
    "prepare_init_mel",
    "random_modules",
]
