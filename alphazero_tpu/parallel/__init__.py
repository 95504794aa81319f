from alphazero_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_selfplay_move,
    sharded_train_step,
)

__all__ = [
    "make_mesh", "shard_batch", "sharded_selfplay_move", "sharded_train_step",
]
