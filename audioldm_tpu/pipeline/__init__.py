from audioldm_tpu.pipeline.generate import (
    AudioLDMModules,
    encode_prompt,
    generate,
    make_generate_fn,
    random_modules,
)

__all__ = [
    "AudioLDMModules",
    "encode_prompt",
    "generate",
    "make_generate_fn",
    "random_modules",
]
