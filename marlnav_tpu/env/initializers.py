"""Initial-state distributions (the env's pluggable reset backends).

Pure-functional equivalents of the reference's initializer objects
(reference utils.py:310-416): each initializer is a function
``sample(rng) -> (states, obstacles, target)`` built by a ``make_*``
factory from a hashable config.  The same function serves both initial
construction and the per-step auto-reset draw (the reference draws a fresh
population for *all* P envs every step and mask-blends,
reference environment.py:76-90).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from marlnav_tpu.config import MockInitConfig, TriangleInitConfig
from marlnav_tpu.env.geometry import rotate

InitFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array, jax.Array]]


def make_mock_initializer(cfg: MockInitConfig) -> InitFn:
    """Constant initial state (reference utils.py:310-319).  Consumes no RNG,
    so trajectories through it are fully deterministic — the basis of the
    golden parity tests (SURVEY.md §4)."""
    states = jnp.asarray(cfg.states, jnp.float32)
    obstacles = jnp.asarray(cfg.obstacles, jnp.float32)
    target = jnp.asarray(cfg.target, jnp.float32)

    def sample(rng: jax.Array):
        del rng
        return states, obstacles, target

    return sample


def make_triangle_initializer(cfg: TriangleInitConfig) -> InitFn:
    """Three agents in an equilateral triangle facing +x, target disk to the
    right, obstacles uniform in a rectangle (reference utils.py:322-408).

    With ``noisy_ags`` the agent positions get Gaussian noise (std
    ``ags_dist * ags_std`` per coordinate) and headings a uniform rotation
    in ``[-angle_range/2, angle_range/2]`` (reference utils.py:381-388).
    """
    p = cfg.num_parallel
    num_obs = cfg.num_obstacles

    # Equilateral triangle with side `ags_dist` around the center point,
    # all agents heading (1, 0) at `init_speed` (reference utils.py:349-368).
    pos_const = 0.5 * cfg.ags_dist
    r3 = math.sqrt(3.0)
    base_pos = pos_const * jnp.asarray(
        [[-1.0 / r3, 1.0], [2.0 / r3, 0.0], [-1.0 / r3, -1.0]], jnp.float32
    ) + jnp.asarray([cfg.ags_cent_x, cfg.ags_cent_y], jnp.float32)
    base_pos = jnp.broadcast_to(base_pos, (p, 3, 2))
    base_dir = jnp.broadcast_to(jnp.asarray([1.0, 0.0], jnp.float32), (p, 3, 2))
    speeds = jnp.full((p, 3, 1), cfg.init_speed, jnp.float32)
    target = jnp.broadcast_to(
        jnp.asarray([cfg.tar_pos_x, cfg.tar_pos_y], jnp.float32), (p, 1, 2)
    )

    ox_range = cfg.obst_max_x - cfg.obst_min_x
    oy_range = cfg.obst_max_y - cfg.obst_min_y
    ox_mean = 0.5 * (cfg.obst_min_x + cfg.obst_max_x)
    oy_mean = 0.5 * (cfg.obst_min_y + cfg.obst_max_y)
    noisy = float(cfg.noisy_ags)

    def sample(rng: jax.Array):
        k_obs, k_pos, k_ang = jax.random.split(rng, 3)
        # Obstacles uniform over [min, max] x [min, max]
        # (reference utils.py:390-398).
        u = jax.random.uniform(k_obs, (p, num_obs, 2), jnp.float32) - 0.5
        obstacles = jnp.stack(
            [u[..., 0] * ox_range + ox_mean, u[..., 1] * oy_range + oy_mean],
            axis=-1,
        )
        if cfg.noisy_ags:
            # The reference draws from a MultivariateNormal whose
            # *covariance* diagonal is ags_std (reference utils.py:370-373,
            # 382), so the per-coordinate std is sqrt(ags_std), scaled by
            # ags_dist.
            pos_noise = cfg.ags_dist * math.sqrt(cfg.ags_std) * jax.random.normal(
                k_pos, (p, 3, 2), jnp.float32
            )
            angles = cfg.angle_range * (
                jax.random.uniform(k_ang, (p, 3), jnp.float32) - 0.5
            )
            positions = base_pos + noisy * pos_noise
            directions = rotate(base_dir, noisy * angles)
        else:
            positions, directions = base_pos, base_dir
        states = jnp.concatenate([positions, directions, speeds], axis=2)
        return states, obstacles, target

    return sample


def make_initializer(cfg) -> InitFn:
    """Factory dispatch (reference utils.py:411-416)."""
    if isinstance(cfg, MockInitConfig):
        return make_mock_initializer(cfg)
    if isinstance(cfg, TriangleInitConfig):
        return make_triangle_initializer(cfg)
    raise TypeError(f"unknown initializer config: {type(cfg).__name__}")
