from .mesh import (DevicePrefetcher, get_mesh, initialize_distributed,
                   make_calibrate_step, make_eval_step, make_loss_eval_step,
                   make_train_step, replicated, batch_sharded, shard_batch)

__all__ = [
    "DevicePrefetcher", "get_mesh", "initialize_distributed",
    "make_calibrate_step", "make_eval_step", "make_loss_eval_step",
    "make_train_step", "replicated", "batch_sharded", "shard_batch",
]
