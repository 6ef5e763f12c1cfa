"""Whole-trajectory rollout as one device program.

``rollout_trajectory`` scans the env for ``num_steps`` with actions from
either the env's scripted sampler (reference utils.py:595-597) or a policy
(mean or sampled — reference animation.py:42-50), returning time-stacked
host-side arrays: the decoupling that lets the renderer and the
reward-check harness consume a finished trajectory instead of stepping the
device per frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from marlnav_tpu.env.env import Env
from marlnav_tpu.env.types import Observations


class Trajectory(NamedTuple):
    """Time-stacked rollout record, as host numpy arrays.

    states    (T, P, A, 5), obstacles (T, P, O, 2), target (T, P, 1, 2):
    the POST-step state each frame (what the renderer draws,
    reference animation.py:64-69).  obs/rewards are the step outputs
    (post-reinit observations, pre-reinit rewards — reference
    environment.py:92-107).
    """

    states: np.ndarray
    obstacles: np.ndarray
    target: np.ndarray
    obs: Observations  # leaves (T, P, A, K)
    rewards: np.ndarray  # (T, P)
    terminated: np.ndarray  # (T, P)
    truncated: np.ndarray  # (T, P)


def rollout_trajectory(
    env: Env,
    num_steps: int,
    rng: jax.Array,
    actor=None,
    normalizer_cfg=None,
    scaler_cfg=None,
    sample: bool = False,
) -> Trajectory:
    """Run ``num_steps`` of the env under scripted or policy actions.

    Without ``actor``, actions come from ``env.sample_actions`` (scripted
    sampler — must exist).  With ``actor``, actions are the policy mean, or
    samples when ``sample`` (reference animation.py:42-50); ``rng`` seeds
    both env init and action sampling.
    """
    if actor is None and env.sample_actions is None:
        raise ValueError("env has no scripted sampler and no actor was given")
    if actor is None:
        # Reference parity: its scripted samplers are generators that yield
        # exactly max_step tensors and raise StopIteration beyond that
        # (reference utils.py:428-448).  The scan below can't raise
        # mid-trace, so the overrun is rejected up front.
        bound = getattr(env.sample_actions, "max_step", None)
        if bound is not None and num_steps > bound:
            raise StopIteration(
                f"scripted sampler provides {bound} steps, "
                f"{num_steps} requested")

    if actor is not None:
        from marlnav_tpu.models import DiagGaussian, actor_apply
        from marlnav_tpu.utils.transforms import (
            make_action_scaler,
            make_obs_normalizer,
        )

        normalize = make_obs_normalizer(normalizer_cfg)
        scale_up = make_action_scaler(scaler_cfg)
        p, a = env.params.num_parallel, env.params.num_agents

    rng, init_key = jax.random.split(rng)

    def body(carry, step):
        # The normalized post-reinit observations are carried through the
        # scan (exactly as MAPPO.collect does) — recomputing them from the
        # carried state would run the pairwise geometry twice per step.
        state, obs, rng = carry
        if actor is None:
            actions = env.sample_actions(step)
        else:
            rng, k = jax.random.split(rng)
            mean, var = actor_apply(actor, obs)
            if sample:
                raw = DiagGaussian(mean, var).sample(k)
            else:
                raw = mean
            actions = scale_up(raw.reshape(p, a, 2))
        state, out = env.step(state, actions)
        new_obs = normalize(out.obs) if actor is not None else obs
        frame = (state.states, state.obstacles, state.target,
                 out.obs, out.rewards, out.terminated, out.truncated)
        return (state, new_obs, rng), frame

    @jax.jit
    def run(rng, init_key):
        state = env.init(init_key)
        obs0 = (normalize(env.observations(state)) if actor is not None
                else jnp.zeros(()))
        _, frames = jax.lax.scan(
            body, (state, obs0, rng), jnp.arange(num_steps, dtype=jnp.int32)
        )
        return frames

    frames = jax.device_get(run(rng, init_key))
    return Trajectory(*frames)
