from .mesh import (
    create_mesh,
    data_sharding,
    grid_row_sharding,
    replicated,
    shard_batch,
    shard_spatial_batch,
    shard_stacked_batches,
)
from .train_step import (
    TrainState,
    jit_eval_step,
    jit_multi_train_step,
    jit_spatial_eval_step,
    jit_spatial_train_step,
    jit_train_step,
    make_eval_step,
    make_multi_train_step,
    make_per_device_bn_train_step,
    make_train_step,
)
from .grid_shard import (
    gather_grid,
    init_sharded_grid,
    make_sharded_frame_parallel_run,
    make_sharded_step,
)
from .frame_parallel import make_frame_parallel_run, stack_frames
from .spatial_infer import (
    make_spatial_forward,
    replicate_variables,
    shard_image,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "grid_row_sharding",
    "replicated",
    "shard_batch",
    "shard_spatial_batch",
    "shard_stacked_batches",
    "TrainState",
    "jit_eval_step",
    "jit_multi_train_step",
    "jit_spatial_eval_step",
    "jit_spatial_train_step",
    "jit_train_step",
    "make_multi_train_step",
    "make_eval_step",
    "make_per_device_bn_train_step",
    "make_train_step",
    "gather_grid",
    "init_sharded_grid",
    "make_sharded_frame_parallel_run",
    "make_sharded_step",
    "make_frame_parallel_run",
    "stack_frames",
    "make_spatial_forward",
    "replicate_variables",
    "shard_image",
]
