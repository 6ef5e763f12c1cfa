"""Multi-device fused rollout: shard_map over the mesh 'data' axis.

The fused Pallas kernel (fused_rollout.py) is a single-core program; this
wrapper runs one instance per device with the env batch sharded over the
mesh's 'data' axis — the same scaling story as the XLA path
(parallel/sharding.py): every shard steps its own envs, no cross-device
communication exists in a rollout (the only collectives in the system are
the trainer's gradient/normalization reductions, inserted by XLA).

Each shard derives a distinct PRNG stream by folding in its axis index,
so per-device trajectories are independent, exactly as a per-host
``jax.random.fold_in`` would be on the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from marlnav_tpu.ops.fused_rollout import RowState, make_fused_rollout


def make_sharded_fused_rollout(
    env_params,
    init_cfg,
    normalizer_cfg,
    scaler_cfg,
    num_steps: int,
    mesh: Mesh,
    axis: str = "data",
    **kernel_kwargs,
):
    """Build ``rollout(rows, actor, seed[, noise]) -> (rows', rewards)``
    with every RowState leaf (and the rewards) sharded over ``axis``.

    ``rows`` leaves are (r, P) with P divisible by
    (mesh.shape[axis] * 1024); ``actor`` params are replicated.
    """
    roll = make_fused_rollout(env_params, init_cfg, normalizer_cfg,
                              scaler_cfg, num_steps, **kernel_kwargs)
    n_shards = mesh.shape[axis]
    row_spec = P(None, axis)
    state_specs = RowState(*([row_spec] * 9))
    noise_input = kernel_kwargs.get("noise_input", False)

    def per_shard(rows, actor, seed, noise):
        # Distinct per-shard PRNG stream (one kernel block consumes
        # `seed + program_id`, so shards must be >= a grid apart).
        shard_seed = seed + jax.lax.axis_index(axis) * (1 << 20)
        return roll(rows, actor, shard_seed,
                    **({"noise": noise} if noise_input else {}))

    def rollout(rows: RowState, actor, seed, noise=None):
        num_envs = rows.px.shape[-1]
        if num_envs % (n_shards * 1024) != 0:
            raise ValueError(
                f"num_envs {num_envs} not divisible by "
                f"{n_shards} shards x 1024-env blocks")
        mapped = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(state_specs, P(), P(), P(None, None, None, axis)),
            out_specs=(state_specs, P(None, axis)),
            # pallas_call out_shapes carry no varying-mesh-axes metadata.
            check_vma=False,
        )
        seed_arr = jnp.asarray(seed, jnp.int32)
        if noise is None:
            noise = jnp.zeros((1, 1, 1, n_shards), jnp.float32)
        return mapped(rows, actor, seed_arr, noise)

    return rollout
