"""audioldm_tpu — a TPU-native JAX/XLA framework for AudioLDM text-to-audio
generation with LoRA fine-tuning.

Built from scratch with the capabilities of the PyTorch/HuggingFace reference
repo ``2025-comprehensive-design/AudioLDM-with-LoRA`` (see SURVEY.md), but
designed TPU-first:

- models are parameter pytrees + pure ``apply`` functions (functional core),
- the whole text->audio pipeline (CLAP text encode -> CFG-batched DDIM loop
  over the UNet -> VAE decode -> HiFi-GAN vocoder) runs inside a single jit,
- the DDIM denoise loop is a ``lax.scan`` with the alpha-cumprod tables as
  device constants,
- LoRA adapters are a separate pytree; merged into base weights at load time
  for zero-overhead inference, applied unmerged during training,
- data parallelism is a ``jax.sharding.Mesh`` + NamedSharding (XLA emits the
  collectives over ICI), not a hand-written transport layer.

Subpackages
-----------
ops       DSP core: STFT, Slaney mel filterbank, log compression, resampling,
          griffin-lim (reference: script/utilities/audio/, script/data/datasets.py)
models    UNet2DCondition, AutoencoderKL, CLAP text tower, HiFi-GAN vocoder,
          DDIM schedule (reference L3: diffusers/transformers components)
lora      rank-r adapter system (reference: peft usage in script/train)
pipeline  jit-compiled text->audio generation (reference: AudioLDMPipeline)
data      dataset ingestion + feature extraction (reference: script/data)
train     LoRA fine-tuning loop (reference: script/train/train_audioldm_lora.py)
eval      CLAP similarity + Kernel Audio Distance (reference: train:234-321)
parallel  mesh construction + sharding rules
serve     batched multi-LoRA serving engine
ckpt      HuggingFace checkpoint bridge (safetensors -> pytrees)
"""

__version__ = "0.1.0"
