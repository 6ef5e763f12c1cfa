"""Reward components, collision termination and the delayed target latch.

Faithful pure-functional port of the reference's reward semantics
(reference environment.py:184-269; SURVEY.md §2.2), including:

* the group target bonus uses min-over-agents membership, broadcast back to
  every agent;
* a collision (any obstacle within ``ob_coll_dist`` or other agent within
  ``ag_coll_dist``) terminates immediately;
* group target-reach sets a *delayed* terminate latch — the env terminates
  on the following step, with the latch arranged so reinit fires only once
  (reference environment.py:216-221);
* the floating-point summation order of the components is preserved
  (reference environment.py:230-231).

Episode-ending statistics are returned as on-device scalar increments
instead of the reference's per-step ``.item()`` host syncs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from marlnav_tpu.config import EnvParams
from marlnav_tpu.env.types import Observations


class RewardOutput(NamedTuple):
    rewards: jax.Array  # (P,) float32 — mean over agents
    terminated: jax.Array  # (P,) bool
    new_latch: jax.Array  # (P,) bool — updated delayed-terminate latch
    tar_count: jax.Array  # () int32 — envs with all agents in target
    col_count: jax.Array  # () int32 — envs with >= 1 collision


def _in_area(distances: jax.Array, radius: float) -> jax.Array:
    """1.0 where any observed object is within ``radius``
    (reference environment.py:236-241).  (P, A, K) -> (P, A)."""
    detections = jnp.where(distances < radius, 1.0, 0.0)
    return jnp.max(detections, axis=2)


def _distance_reward(distances: jax.Array, params: EnvParams) -> jax.Array:
    """Fraction (capped) of other agents within the proper distance band
    (reference environment.py:243-251)."""
    above = jnp.where(params.agents_min_d < distances, 1.0, 0.0)
    below = jnp.where(distances < params.agents_max_d, 1.0, 0.0)
    capped = jnp.minimum(jnp.sum(above * below, axis=2), params.max_at_prop_d)
    return capped / params.max_at_prop_d


def _bond_reward(distances: jax.Array, params: EnvParams) -> jax.Array:
    """Cauchy bump peaked at the ideal bond distance
    (reference environment.py:264-269)."""
    scaled = (distances - params.ideal_dist) / params.bond_sharpness
    return jnp.mean(1.0 / (1.0 + scaled * scaled), axis=2)


def rewards_and_terminations(
    obs: Observations, latch: jax.Array, params: EnvParams,
    prev_max_dist: jax.Array | None = None,
) -> RewardOutput:
    """Compute (P,) rewards and termination flags from observations.

    ``latch`` is the (P,) bool delayed target-reach latch carried in
    ``EnvState.terminates``.  ``prev_max_dist`` (P,) is the PRE-MOVE
    max-over-agents target distance, required iff
    ``params.group_soft_factor`` is set (the potential-based
    group-convergence shaping below).
    """
    obstacle_risks = _in_area(obs.obstacles_distances, params.ob_risk_dist)
    agent_risks = _in_area(obs.others_distances, params.ag_risk_dist)
    obstacle_colls = _in_area(obs.obstacles_distances, params.ob_coll_dist)
    agent_colls = _in_area(obs.others_distances, params.ag_coll_dist)

    in_target = jnp.where(obs.target_distance < params.target_radius, 1.0, 0.0)
    distance_scores = _distance_reward(obs.others_distances, params)
    heading_scores = jnp.where(
        jnp.abs(obs.target_angle[:, :, 0]) < params.max_angle_diff, 1.0, 0.0
    )
    soft_score = -obs.target_distance[:, :, 0] / params.init_dist
    bond_score = _bond_reward(obs.others_distances, params)

    risks = jnp.minimum(obstacle_risks + agent_risks, 1.0)
    collisions = jnp.minimum(obstacle_colls + agent_colls, 1.0)
    atleast_1_coll = jnp.max(collisions, axis=1)  # (P,)
    all_in_target = jnp.min(in_target, axis=1)  # (P, 1)

    tar_count = jnp.sum(all_in_target).astype(jnp.int32)
    col_count = jnp.sum(atleast_1_coll).astype(jnp.int32)

    terminated = (atleast_1_coll > 0) | latch
    to_terminate = all_in_target[:, 0] > 0
    # Only previously-False entries latch, so reinit fires exactly once per
    # target reach (reference environment.py:218-221).
    new_latch = (~latch) & to_terminate

    reward = (
        params.target_factor * all_in_target  # broadcasts (P,1) over agents
        + params.heading_factor * heading_scores
        + params.distance_factor * distance_scores
        + params.soft_factor * soft_score
        + params.bond_factor * bond_score
        - params.risk_factor * risks
    )
    if params.group_soft_factor:
        if prev_max_dist is None:
            raise ValueError(
                "group_soft_factor requires prev_max_dist: the potential-"
                "based shaping needs the pre-move max target distance "
                "(thread it from the previous step's observations)")
        # Group-convergence shaping (config.py EnvParams.group_soft_factor;
        # no reference counterpart, default off): POTENTIAL-BASED on the
        # max-over-agents target distance, phi = -max_i d_i / init_dist,
        # reward += factor * (phi(s') - phi(s)).  The raw-penalty form
        # (-factor * max_d) was tried first and MEASURED HARMFUL — a
        # constant negative per-step term makes collisions the cheap
        # escape (the r2 curriculum's suicide basin; run r4a stage 1:
        # 0 reaches, episodes collapsing to ~5 steps).  The telescoping
        # potential difference adds no per-step bias, so neither suicide
        # nor hovering pays; it purely redistributes the sparse group
        # bonus along converging paths (gamma=1 form; the (1-gamma)*phi
        # bias of skipping the discount is ~0.4/step at factor 5e4).
        new_max = jnp.max(obs.target_distance[:, :, 0], axis=1,
                          keepdims=True)
        reward = reward + (params.group_soft_factor / params.init_dist) * (
            prev_max_dist[:, None] - new_max)
    return RewardOutput(
        rewards=jnp.mean(reward, axis=1),
        terminated=terminated,
        new_latch=new_latch,
        tar_count=tar_count,
        col_count=col_count,
    )
