"""Headline benchmark: random-policy lockstep env stepping throughput.

BASELINE.json configs 3/5 scale: random-policy lockstep stepping with
auto-reset on terminal, 3 agents, 16384 parallel envs (the multi-host
config's env count, which one v5e chip already sustains).  The whole
rollout (policy forward + Gaussian sample + env step, x T) is ONE jitted
``lax.scan``; the policy consumes the *carried* step-output observations,
exactly like the trainer's rollout (and the reference's data flow,
reference models.py:117-122) — recomputing observations from the carried
state each step instead measures 5x slower at this scale.

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N}

``vs_baseline`` is value / 10e6 — the BASELINE.json north-star target of
>=10M AGGREGATE env-steps/s on a v5e multi-host slice (the reference
itself publishes no numbers; BASELINE.md).  This benchmark runs on ONE
chip, so vs_baseline > 1 means a single chip beats the whole-slice
target.  A secondary 1024-env config (BASELINE.json config 3) reports to
stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

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
SECONDARY = (1024, 1000)  # BASELINE.json config 3
TIMED_CALLS = 3


def measure(num_envs: int, num_steps: int) -> float:
    """Steady-state env-steps/s for one (P, T) config."""
    env = make_env(
        EnvParams(num_parallel=num_envs, num_agents=NUM_AGENTS),
        TriangleInitConfig(num_parallel=num_envs, num_obstacles=3),
        None,
    )
    normalize = make_obs_normalizer(NormalizerConfig(num_agents=NUM_AGENTS))
    scale_up = make_action_scaler(ScalerConfig())

    def rollout(env_state, actor, rng):
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

    rollout = jax.jit(rollout)
    k_env, k_actor, k_roll = jax.random.split(jax.random.PRNGKey(0), 3)
    env_state = env.init(k_env)
    actor = actor_init(k_actor, env.params.obs_size, 50, 2)

    t0 = time.perf_counter()
    env_state, mean_rew = rollout(env_state, actor, k_roll)
    jax.block_until_ready(env_state)
    print(f"P={num_envs}: compile+first run {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        env_state, mean_rew = rollout(env_state, actor, k_roll)
    jax.block_until_ready(env_state)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * num_steps * TIMED_CALLS / dt
    print(f"P={num_envs}: {TIMED_CALLS}x{num_steps}-step rollouts in "
          f"{dt:.3f}s -> {steps_per_s / 1e6:.1f}M steps/s "
          f"(mean reward {float(mean_rew):.1f})", file=sys.stderr)
    return steps_per_s


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", file=sys.stderr)

    measure(*SECONDARY)
    steps_per_s = measure(*HEADLINE)

    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
