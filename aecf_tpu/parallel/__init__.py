"""Mesh/sharding layer: the framework's distributed-communication backend."""

from .data_parallel import make_dp_train_step, replicate, shard_batch
from .mesh import (
    data_mesh,
    data_model_mesh,
    make_mesh,
    maybe_initialize_distributed,
)

__all__ = [
    "make_dp_train_step",
    "replicate",
    "shard_batch",
    "data_mesh",
    "data_model_mesh",
    "make_mesh",
    "maybe_initialize_distributed",
]
