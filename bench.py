"""Headline benchmark: random-policy lockstep env stepping throughput.

BASELINE.json config 3: "random-policy lockstep stepping, 1024 parallel
envs, 3 agents, auto-reset on terminal".  The whole rollout (policy forward
+ sample + env step, x T) is ONE jitted ``lax.scan`` — the design that
replaces the reference's per-step Python loop with per-step host syncs
(reference models.py:106-129, environment.py:92-107).

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N}

``vs_baseline`` is value / 10e6 — the BASELINE.json north-star target of
>=10M aggregate env-steps/s (the reference itself publishes no numbers;
BASELINE.md).  Extra human-readable detail goes to stderr.
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

NUM_ENVS = 1024
NUM_AGENTS = 3
T = 1000  # env steps per jitted rollout
WARMUP_CALLS = 2
TIMED_CALLS = 5
BASELINE_TARGET = 10e6  # north-star aggregate env-steps/s (BASELINE.json)


def build_rollout():
    env = make_env(
        EnvParams(num_parallel=NUM_ENVS, num_agents=NUM_AGENTS),
        TriangleInitConfig(num_parallel=NUM_ENVS, num_obstacles=3),
        None,
    )
    normalize = make_obs_normalizer(NormalizerConfig(num_agents=NUM_AGENTS))
    scale_up = make_action_scaler(ScalerConfig())

    def rollout(env_state, actor, rng):
        def body(carry, _):
            env_state, rng = carry
            rng, k = jax.random.split(rng)
            obs = normalize(env.observations(env_state))
            mean, var = actor_apply(actor, obs)
            actions = DiagGaussian(mean, var).sample(k)
            actions = actions.reshape(NUM_ENVS, NUM_AGENTS, 2)
            env_state, out = env.step(env_state, scale_up(actions))
            return (env_state, rng), out.rewards

        (env_state, _), rewards = jax.lax.scan(
            body, (env_state, rng), None, length=T
        )
        return env_state, jnp.mean(rewards)

    return env, jax.jit(rollout, donate_argnums=0)


def main() -> None:
    env, rollout = build_rollout()
    rng = jax.random.PRNGKey(0)
    k_env, k_actor, k_roll = jax.random.split(rng, 3)
    env_state = env.init(k_env)
    actor = actor_init(k_actor, env.params.obs_size, 50, 2)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind}), "
          f"P={NUM_ENVS}, A={NUM_AGENTS}, T={T}", file=sys.stderr)

    for _ in range(WARMUP_CALLS):
        env_state, mean_rew = rollout(env_state, actor, k_roll)
    jax.block_until_ready(env_state)

    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        env_state, mean_rew = rollout(env_state, actor, k_roll)
    jax.block_until_ready(env_state)
    dt = time.perf_counter() - t0

    steps_per_s = NUM_ENVS * T * TIMED_CALLS / dt
    print(f"{TIMED_CALLS} rollouts in {dt:.3f}s, mean reward "
          f"{float(mean_rew):.3f}", file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
