"""Headline benchmark: random-policy lockstep env stepping throughput.

BASELINE.json configs 3/5 scale: random-policy lockstep stepping with
auto-reset on terminal, 3 agents, 16384 parallel envs (the multi-host
config's env count, which one v5e chip already sustains).

Two implementations are measured:
  * the XLA path — the whole rollout (policy forward + Gaussian sample +
    env step, x T) as ONE jitted ``lax.scan``, the same program the MAPPO
    trainer runs.  The policy consumes the *carried* step-output
    observations, exactly like the trainer (and the reference's data
    flow, reference models.py:117-122);
  * the fused Pallas kernel (marlnav_tpu/ops/fused_rollout.py) — the
    entire rollout as one VMEM-resident kernel.  This is the headline.

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N}

``vs_baseline`` is value / 10e6 — the BASELINE.json north-star target of
>=10M AGGREGATE env-steps/s on a v5e multi-host slice (the reference
itself publishes no numbers; BASELINE.md).  This benchmark runs on ONE
chip, so vs_baseline > 1 means a single chip beats the whole-slice
target.  Per-config detail goes to stderr.

NOTE (remote-TPU tunnel): fetching large outputs dominates wall-clock, so
both rollouts reduce rewards to a scalar on device and timing blocks on
that scalar + the final env state only.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: first-ever run pays the (minutes-long,
# tunnel-bound) XLA compile; every later bench process starts hot.
from marlnav_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from marlnav_tpu.config import (
    EnvParams,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.models import DiagGaussian, actor_apply, actor_init
from marlnav_tpu.utils.transforms import make_action_scaler, make_obs_normalizer

NUM_AGENTS = 3
BASELINE_TARGET = 10e6  # north-star aggregate env-steps/s (BASELINE.json)
HEADLINE = (16384, 500)  # (num_envs, steps per jitted rollout)
TIMED_CALLS = 5


def _build_env(num_envs: int):
    return make_env(
        EnvParams(num_parallel=num_envs, num_agents=NUM_AGENTS),
        TriangleInitConfig(num_parallel=num_envs, num_obstacles=3),
        None,
    )


def _time_rollouts(name, fn, state, seed0: int, num_envs: int,
                   num_steps: int) -> float:
    t0 = time.perf_counter()
    state, mean_rew = fn(state, seed0)
    float(mean_rew)  # scalar fetch: the reliable barrier on the remote-TPU
    print(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(TIMED_CALLS):
        state, mean_rew = fn(state, seed0 + 1 + i)
    float(mean_rew)  # (block_until_ready can return early on axon)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * num_steps * TIMED_CALLS / dt
    print(f"{name}: {TIMED_CALLS}x{num_steps}-step rollouts of {num_envs} "
          f"envs in {dt:.3f}s -> {steps_per_s / 1e6:.1f}M steps/s "
          f"(mean reward {float(mean_rew):.1f})", file=sys.stderr)
    return steps_per_s


def measure_xla(num_envs: int, num_steps: int) -> float:
    """The lax.scan rollout (the trainer's program shape)."""
    env = _build_env(num_envs)
    normalize = make_obs_normalizer(NormalizerConfig(num_agents=NUM_AGENTS))
    scale_up = make_action_scaler(ScalerConfig())
    k_env, k_actor = jax.random.split(jax.random.PRNGKey(0))
    env_state = env.init(k_env)
    actor = actor_init(k_actor, env.params.obs_size, 50, 2)

    @jax.jit
    def rollout(env_state, seed):
        rng = jax.random.PRNGKey(seed)
        obs0 = normalize(env.observations(env_state))

        def body(carry, _):
            env_state, obs, rng = carry
            rng, k = jax.random.split(rng)
            mean, var = actor_apply(actor, obs)
            actions = DiagGaussian(mean, var).sample(k)
            actions = actions.reshape(num_envs, NUM_AGENTS, 2)
            env_state, out = env.step(env_state, scale_up(actions))
            return (env_state, normalize(out.obs), rng), out.rewards

        (env_state, _, _), rewards = jax.lax.scan(
            body, (env_state, obs0, rng), None, length=num_steps
        )
        return env_state, jnp.mean(rewards)

    return _time_rollouts("xla-scan", rollout, env_state, 0, num_envs,
                          num_steps)


def measure_fused(num_envs: int, num_steps: int) -> float:
    """The VMEM-resident fused Pallas rollout kernel."""
    from marlnav_tpu.ops import env_state_to_rows, make_fused_rollout

    env = _build_env(num_envs)
    k_env, k_actor = jax.random.split(jax.random.PRNGKey(0))
    rows = env_state_to_rows(env.init(k_env))
    actor = actor_init(k_actor, env.params.obs_size, 50, 2)
    roll = make_fused_rollout(
        env.params, TriangleInitConfig(num_parallel=num_envs, num_obstacles=3),
        NormalizerConfig(num_agents=NUM_AGENTS), ScalerConfig(), num_steps,
    )

    @jax.jit
    def rollout(rows, seed):
        rows, rewards = roll(rows, actor, seed)
        return rows, jnp.mean(rewards)

    return _time_rollouts("fused-pallas", rollout, rows, 0, num_envs,
                          num_steps)


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--xla", action="store_true",
                        help="also measure the lax.scan path (its compile "
                             "takes minutes over the remote-TPU tunnel; "
                             "measured 80.9M steps/s vs the fused kernel's "
                             "750M at the headline config)")
    ns = parser.parse_args(argv)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    num_envs, num_steps = HEADLINE
    if dev.platform == "tpu":
        fused = measure_fused(num_envs, num_steps)
        xla = measure_xla(num_envs, num_steps) if ns.xla else 0.0
        if ns.xla:
            print(f"fused/xla speedup: {fused / xla:.2f}x", file=sys.stderr)
    else:  # Mosaic kernels need real TPU hardware; CPU measures XLA only.
        print("non-TPU device: skipping fused-kernel config", file=sys.stderr)
        fused = 0.0
        xla = measure_xla(num_envs, num_steps)

    steps_per_s = max(xla, fused)
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
