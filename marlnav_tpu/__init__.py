"""marlnav_tpu — a TPU-native multi-agent RL navigation framework.

A ground-up JAX/XLA rebuild of the capabilities of MARL-nav
(reference: /root/reference, JussiM01/MARL-nav): a batch-parallelized
2-D multi-agent navigation environment plus a MAPPO trainer, redesigned
TPU-first:

  * the environment is a pure-functional ``init``/``step`` pair over an
    ``EnvState`` pytree — no mutable objects, everything under ``jit``;
  * the rollout time axis is a single ``lax.scan`` (one device program per
    rollout instead of per-step host round trips);
  * discounted returns are a reverse ``lax.scan``;
  * the env batch axis is sharded over a ``jax.sharding.Mesh`` so the same
    program scales from one chip to a multi-host pod slice, with XLA
    inserting the collectives;
  * on-device episode statistics (no per-step ``.item()`` host syncs).

Package layout:
  env/         environment core (dynamics, observations, rewards, auto-reset)
  models/      actor / critic networks and the Gaussian policy distribution
  algo/        MAPPO: rollout scan, returns, PPO losses, update loops
  ops/         performance kernels (fused env step, Pallas variants)
  parallel/    device mesh + sharding layer
  utils/       transforms, seeding, stats persistence, checkpointing
  diagnostics/ reward-check harness and trajectory renderer
"""

__version__ = "0.1.0"
