from audioldm_tpu.kernels.flash_attention import (
    enabled as flash_enabled,
    flash_attention,
    supported as flash_supported,
    use_flash_attention,
)

__all__ = ["flash_attention", "flash_enabled", "flash_supported", "use_flash_attention"]
