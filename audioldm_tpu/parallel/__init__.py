from audioldm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from audioldm_tpu.parallel.tp import (
    make_tp_generate_fn,
    make_tp_mesh,
    make_tp_mesh_2d,
    make_tp_train_step,
    make_tp_unet_step,
    module_shardings,
    shard_modules,
    shard_unet_params,
    unet_tp_specs,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_tp_generate_fn",
    "make_tp_mesh",
    "make_tp_mesh_2d",
    "make_tp_train_step",
    "make_tp_unet_step",
    "module_shardings",
    "replicated",
    "shard_batch",
    "shard_modules",
    "shard_unet_params",
    "unet_tp_specs",
]
