"""The batched navigation environment as pure ``init`` / ``step`` functions.

``make_env`` closes over static configuration and returns an ``Env`` bundle
of pure functions.  Nothing here is jitted — callers compose these into
their own jitted programs (the MAPPO rollout puts ``step`` inside a
``lax.scan``; the benchmark jits a whole-trajectory scan).

Step semantics replicate the reference's exact ordering
(reference environment.py:92-107; SURVEY.md §2.4):

  move -> step_num += 1 -> truncated -> [stats] -> observations ->
  rewards & terminations (from the *pre-reinit* state) -> reinit mask =
  terminated | truncated -> fresh draw for all P envs, mask-blended ->
  observations recomputed post-reinit and returned.

The reference's einsum mask-blend ``(1-m)*old + m*new``
(reference environment.py:86-90) is exactly ``jnp.where`` on each state
leaf.  The fresh draw consumes PRNG state threaded through ``EnvState.rng``
(the reference consumes torch global RNG the same way each step).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from marlnav_tpu.config import EnvParams
from marlnav_tpu.env import geometry
from marlnav_tpu.env.dynamics import move_agents
from marlnav_tpu.env.initializers import make_initializer
from marlnav_tpu.env.reward import rewards_and_terminations
from marlnav_tpu.env.samplers import SamplerFn, make_action_sampler
from marlnav_tpu.env.types import EnvState, EpisodeStats, Observations, StepOutput


class Env(NamedTuple):
    """Bundle of pure environment functions over a fixed configuration."""

    params: EnvParams
    init: Callable[[jax.Array], EnvState]
    step: Callable[[EnvState, jax.Array], tuple]
    observations: Callable[[EnvState], Observations]
    reset: Callable[[EnvState], tuple]
    sample_actions: Optional[SamplerFn]


def _observations(
    states: jax.Array,
    obstacles: jax.Array,
    target: jax.Array,
    params: EnvParams,
    others_idx: jax.Array,
) -> Observations:
    """Fully-vectorized observation builder.

    One broadcasted pairwise-geometry pass over (P, A, K) replaces the
    reference's per-agent/per-obstacle Python loops
    (reference environment.py:139-182).  Angles (not distances) are zeroed
    where the distance is below ``cap_distance``
    (reference environment.py:172-177).
    """
    positions = states[:, :, :2]
    headings = states[:, :, 2:4]

    tar_ang, tar_dist = geometry.angles_and_distances(positions, headings, target)
    obs_ang, obs_dist = geometry.angles_and_distances(positions, headings, obstacles)
    others_pos = states[:, others_idx, :2]  # (P, A, A-1, 2)
    oth_ang, oth_dist = geometry.angles_and_distances(positions, headings, others_pos)

    cap = params.cap_distance
    return Observations(
        target_angle=jnp.where(tar_dist < cap, 0.0, tar_ang),
        target_distance=tar_dist,
        obstacles_angles=jnp.where(obs_dist < cap, 0.0, obs_ang),
        obstacles_distances=obs_dist,
        others_angles=jnp.where(oth_dist < cap, 0.0, oth_ang),
        others_distances=oth_dist,
    )


def make_env(params: EnvParams, init_cfg, sampler_cfg=None) -> Env:
    """Build the environment function bundle.

    ``init_cfg`` selects the reset distribution (triangle or mock);
    ``sampler_cfg`` optionally attaches a scripted action source.
    """
    init_fn = make_initializer(init_cfg)
    sampler = make_action_sampler(sampler_cfg)
    others_idx = geometry.others_indices(params.num_agents)
    p = params.num_parallel
    # Mock initializers need the reference's aliasing-bug emulation (see
    # EnvState.reset_states in types.py).
    from marlnav_tpu.config import MockInitConfig

    mock_aliasing = isinstance(init_cfg, MockInitConfig)

    def init(rng: jax.Array) -> EnvState:
        rng, key, k_stagger = jax.random.split(rng, 3)
        states, obstacles, target = init_fn(key)
        if params.staggered_resets:
            # Uniform initial phases: each env truncates at a different
            # step, decorrelating episode boundaries across the batch
            # (see EnvParams.staggered_resets).
            step_num = jax.random.randint(
                k_stagger, (p,), 0, params.episode_len, jnp.int32)
        else:
            step_num = jnp.zeros((p,), jnp.int32)
        return EnvState(
            states=states,
            obstacles=obstacles,
            target=target,
            step_num=step_num,
            terminates=jnp.zeros((p,), bool),
            stats=EpisodeStats.zeros(),
            rng=rng,
            reset_states=states if mock_aliasing else None,
            virgin=jnp.asarray(True) if mock_aliasing else None,
        )

    def observations(state: EnvState) -> Observations:
        return _observations(
            state.states, state.obstacles, state.target, params, others_idx
        )

    def step(state: EnvState, actions: jax.Array):
        """One lockstep transition for all P envs.

        ``actions`` (P, A, 2) in physical scale.  Returns
        ``(new_state, StepOutput)``.
        """
        states = move_agents(state.states, actions, params)
        step_num = state.step_num + 1
        truncated = step_num > params.episode_len - 1

        obs = _observations(states, state.obstacles, state.target, params, others_idx)
        prev_max_dist = None
        if params.group_soft_factor:
            # Pre-move max-over-agents target distance, the potential
            # input for the group-convergence shaping (env/reward.py).
            delta = state.states[:, :, :2] - state.target  # target (P,1,2)
            prev_max_dist = jnp.max(
                jnp.sqrt(jnp.sum(delta * delta, axis=2)), axis=1)
        rew = rewards_and_terminations(obs, state.terminates, params,
                                       prev_max_dist)

        stats = EpisodeStats(
            num_trunc=state.stats.num_trunc + jnp.sum(truncated).astype(jnp.int32),
            num_col=state.stats.num_col + rew.col_count,
            num_tar=state.stats.num_tar + rew.tar_count,
        )

        # Auto-reset: fresh draw for every env, blended in where finished
        # (reference environment.py:76-90, 102-105).
        finished = truncated | rew.terminated
        rng, key = jax.random.split(state.rng)
        new_states, new_obstacles, new_target = init_fn(key)
        reset_states = state.reset_states
        virgin = state.virgin
        if mock_aliasing:
            # Reference aliasing bug: the first step's in-place move writes
            # through to the initializer's stored tensor, so the reset pool
            # becomes the once-moved states (see EnvState docstring).
            reset_states = jnp.where(virgin, states, reset_states)
            virgin = jnp.asarray(False)
            new_states = reset_states
        m3 = finished[:, None, None]
        states = jnp.where(m3, new_states, states)
        obstacles = jnp.where(m3, new_obstacles, state.obstacles)
        target = jnp.where(m3, new_target, state.target)
        step_num = jnp.where(finished, 0, step_num)

        new_state = EnvState(
            states=states,
            obstacles=obstacles,
            target=target,
            step_num=step_num,
            terminates=rew.new_latch,
            stats=stats,
            rng=rng,
            reset_states=reset_states,
            virgin=virgin,
        )
        # Observations are recomputed from the post-reinit state — finished
        # envs report their fresh episode's first view
        # (reference environment.py:105).
        out_obs = _observations(states, obstacles, target, params, others_idx)
        return new_state, StepOutput(out_obs, rew.rewards, rew.terminated, truncated)

    def reset(state: EnvState):
        """Faithful no-op reset: returns current observations unchanged.

        The reference's ``reset`` only sets a reinit mask that the next
        ``step`` overwrites, and is never called anywhere
        (reference environment.py:70-74; SURVEY.md §3.5).  All resets happen
        inside ``step``.
        """
        return observations(state), state

    return Env(
        params=params,
        init=init,
        step=step,
        observations=observations,
        reset=reset,
        sample_actions=sampler,
    )
