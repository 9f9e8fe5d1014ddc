from .mesh import (
    batch_sharding,
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    make_view_sharded_forward,
    replicated,
    shard_batch,
)
