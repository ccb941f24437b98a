from .mesh import (
    DATA_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    shard_eval_step,
    shard_train_step,
)
