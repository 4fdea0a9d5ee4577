from audioldm_tpu.lora.adapter import (
    compose_adapters,
    export_peft_state_dict,
    import_peft_state_dict,
    init_lora,
    iter_lora_paths,
    merge_lora,
    unmerge_lora,
)

__all__ = [
    "compose_adapters",
    "export_peft_state_dict",
    "import_peft_state_dict",
    "init_lora",
    "iter_lora_paths",
    "merge_lora",
    "unmerge_lora",
]
