"""Agent dynamics: heading rotation + clamped speed integrator.

Pure-functional version of the reference's in-place state mutation
(reference environment.py:113-137).  Exact op order is preserved:
steering angle clamped to [-pi, pi], heading rotated, acceleration clamped
to [min_accel, max_accel], speed = clamp(speed + accel, [min_speed,
max_speed]), position += new_heading * new_speed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from marlnav_tpu.config import EnvParams
from marlnav_tpu.env.geometry import rotate


def move_agents(states: jax.Array, actions: jax.Array, params: EnvParams) -> jax.Array:
    """Advance the (P, A, 5) state tensor by one step of physical actions.

    ``actions`` is (P, A, 2): [steering angle (rad), acceleration].
    """
    angles = jnp.clip(actions[:, :, 0], -math.pi, math.pi)
    directions = rotate(states[:, :, 2:4], angles)
    accel = jnp.clip(actions[:, :, 1:2], params.min_accel, params.max_accel)
    speeds = jnp.clip(states[:, :, 4:5] + accel, params.min_speed, params.max_speed)
    positions = states[:, :, :2] + directions * speeds
    return jnp.concatenate([positions, directions, speeds], axis=2)
