"""Device mesh and sharding layer."""

from marlnav_tpu.parallel.mesh import make_mesh
from marlnav_tpu.parallel.sharding import (
    buffer_shardings,
    env_state_shardings,
    shard_env_state,
    shard_train_state,
    train_state_shardings,
)

__all__ = [
    "make_mesh",
    "buffer_shardings",
    "env_state_shardings",
    "shard_env_state",
    "shard_train_state",
    "train_state_shardings",
]
