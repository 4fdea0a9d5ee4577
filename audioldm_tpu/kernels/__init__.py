from audioldm_tpu.kernels import mrf_conv, sharding
from audioldm_tpu.kernels.flash_attention import (
    enabled as flash_enabled,
    flash_attention,
    supported as flash_supported,
    use_flash_attention,
)
from audioldm_tpu.kernels.mrf_conv import fused_mrf_stage, use_fused_mrf
from audioldm_tpu.kernels.sharding import kernel_dp_shard

__all__ = [
    "flash_attention",
    "flash_enabled",
    "flash_supported",
    "use_flash_attention",
    "fused_mrf_stage",
    "kernel_dp_shard",
    "mrf_conv",
    "sharding",
    "use_fused_mrf",
]
