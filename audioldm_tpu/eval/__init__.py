from audioldm_tpu.eval.metrics import (
    clap_similarity,
    kernel_audio_distance,
    median_pairwise_distance,
)

__all__ = ["clap_similarity", "kernel_audio_distance", "median_pairwise_distance"]
