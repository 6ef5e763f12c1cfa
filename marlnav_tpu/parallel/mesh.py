"""Device mesh construction.

The reference has no distributed layer at all (single device, no
torch.distributed/NCCL/MPI — SURVEY.md §2.6); scaling here is pure JAX:
a ('data', 'model') mesh over all local/global devices.  The env batch and
rollout buffer shard over 'data'; network hidden dims may shard over
'model' (tensor parallelism — a hook more than a need at these model
sizes, kept 1 by default).  XLA inserts all collectives (gradient psum,
buffer-normalization reductions) from the sharding annotations; ICI
carries them within a slice, DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """A ('data', 'model') mesh over the given (default: all) devices.

    ``num_data`` defaults to ``len(devices) // num_model``.  For multi-host
    pods call ``jax.distributed.initialize()`` first and pass
    ``jax.devices()`` (the global device list).
    """
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    use = num_data * num_model
    if use > len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} needs {use} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))
