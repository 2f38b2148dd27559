from .train_step import TrainState, create_train_state, make_train_step
from .mesh import data_parallel_mesh, distributed_init, shard_batch

__all__ = [
    "TrainState",
    "create_train_state",
    "data_parallel_mesh",
    "distributed_init",
    "make_train_step",
    "shard_batch",
]
