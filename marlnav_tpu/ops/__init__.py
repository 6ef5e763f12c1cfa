"""Performance kernels: Pallas fused paths for the rollout hot loop."""

from marlnav_tpu.ops.fused_rollout import (
    RowState,
    env_state_to_rows,
    make_fused_rollout,
    rows_to_env_arrays,
    rows_to_env_state,
)
from marlnav_tpu.ops.fused_collect import make_fused_collect
from marlnav_tpu.ops.sharded import make_sharded_fused_rollout

__all__ = [
    "RowState",
    "env_state_to_rows",
    "make_fused_collect",
    "make_fused_rollout",
    "make_sharded_fused_rollout",
    "rows_to_env_arrays",
    "rows_to_env_state",
]
