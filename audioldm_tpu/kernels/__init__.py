from audioldm_tpu.kernels import mrf_conv
from audioldm_tpu.kernels.flash_attention import (
    enabled as flash_enabled,
    flash_attention,
    supported as flash_supported,
    use_flash_attention,
)
from audioldm_tpu.kernels.mrf_conv import fused_mrf_stage, use_fused_mrf

__all__ = [
    "flash_attention",
    "flash_enabled",
    "flash_supported",
    "use_flash_attention",
    "fused_mrf_stage",
    "mrf_conv",
    "use_fused_mrf",
]
