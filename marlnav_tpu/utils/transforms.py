"""Observation normalization and action scaling.

These affine transforms live *outside* the env, exactly as in the
reference: the env consumes physical-scale actions and emits physical-scale
observations; the policy sees [-1, 1] on both sides
(reference utils.py:519-547; SURVEY.md layer 4).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from marlnav_tpu.config import NormalizerConfig, ScalerConfig
from marlnav_tpu.env.types import Observations


def make_obs_normalizer(cfg: NormalizerConfig) -> Callable[[Observations], jax.Array]:
    """Concatenate the observation namedtuple and map each feature from its
    [min, max] bounds to [-1, 1] (reference utils.py:519-532)."""
    min_obs, max_obs = cfg.bounds()
    min_obs = jnp.asarray(min_obs, jnp.float32)
    max_obs = jnp.asarray(max_obs, jnp.float32)
    mean = 0.5 * (min_obs + max_obs)
    scale = 0.5 * (max_obs - min_obs)

    def normalize(obs: Observations) -> jax.Array:
        flat = obs.concat()  # (P, A, obs_size)
        return (flat - mean) / scale

    return normalize


def make_action_scaler(cfg: ScalerConfig) -> Callable[[jax.Array], jax.Array]:
    """Map network outputs in [-1, 1] to physical [angle, accel] ranges
    (reference utils.py:535-547)."""
    min_action, max_action = cfg.bounds()
    min_action = jnp.asarray(min_action, jnp.float32)
    max_action = jnp.asarray(max_action, jnp.float32)
    mean = 0.5 * (min_action + max_action)
    scale = 0.5 * (max_action - min_action)

    def scale_up(actions: jax.Array) -> jax.Array:
        return scale * actions + mean

    return scale_up
