"""Scripted action samplers (deterministic test fixtures).

The reference implements these as *stateful Python generators*
(reference utils.py:419-497); here each sampler is a pure function of the
step index, ``actions(step) -> (P, A, 2)``, so it can live inside a
``lax.scan`` rollout.  Actions are in physical scale (the reward-check
harness feeds them straight to the env, reference utils.py:595-597).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from marlnav_tpu.config import ConstantSamplerConfig, MockSamplerConfig

SamplerFn = Callable[[jax.Array], jax.Array]


def make_constant_sampler(cfg: ConstantSamplerConfig) -> SamplerFn:
    """Every agent plays [angle=0, accel=1] forever
    (reference utils.py:477-485).  Acceleration is clamped by the env to
    ``max_accel``, so agents run straight and accelerate to max speed."""
    actions = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0], jnp.float32),
        (cfg.num_parallel, cfg.num_agents, 2),
    )

    def sample(step: jax.Array) -> jax.Array:
        del step
        return actions

    return sample


def make_mock_sampler(cfg: MockSamplerConfig) -> SamplerFn:
    """The two deterministic scripted-action scenarios.

    ``num=0`` (reference utils.py:97-105, 423-431): constant per-agent
    actions — straight-line runs, one agent slammed to min speed by a -100
    deceleration.

    ``num=1`` (reference utils.py:107-115, 432-448): step 0 applies special
    half-actions (turn-in maneuvers), every later step applies constant turn
    rates — producing circular orbits (e.g. radius-300 orbits at 1.8°/step).
    """
    def bounded(sample: SamplerFn) -> SamplerFn:
        """Replicate the reference's generator exhaustion: its samplers
        yield exactly ``max_step`` tensors, then ``next()`` raises
        StopIteration (reference utils.py:428-448).  A traced ``step``
        (inside ``lax.scan``) cannot raise, so the bound is enforced on
        concrete host-side indices and exported as ``sample.max_step`` for
        trajectory-length validation (diagnostics/trajectory.py)."""
        if cfg.max_step is None:
            return sample

        def guarded(step):
            if isinstance(step, int) and step >= cfg.max_step:
                raise StopIteration(
                    f"mock sampler exhausted after {cfg.max_step} steps")
            return sample(step)

        guarded.max_step = cfg.max_step
        return guarded

    if cfg.num == 0:
        actions = jnp.asarray(
            [
                [[0.0, 5.0], [0.0, 0.1], [0.0, -0.05]],
                [[0.0, 5.0], [0.0, 0.1], [0.0, -100.0]],
            ],
            jnp.float32,
        )

        def sample(step: jax.Array) -> jax.Array:
            del step
            return actions

        return bounded(sample)

    if cfg.num == 1:
        turn = math.radians(1.8)
        first = jnp.asarray(
            [
                [[-math.pi / 6, 0.0], [0.0, 0.0], [math.pi / 6, 0.0]],
                [[-0.5 * turn, 0.0], [0.0, 0.0], [0.5 * turn, 0.0]],
            ],
            jnp.float32,
        )
        rest = jnp.asarray(
            [
                [[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
                [[-turn, 0.0], [0.0, 0.0], [turn, 0.0]],
            ],
            jnp.float32,
        )

        def sample(step: jax.Array) -> jax.Array:
            return jnp.where(step == 0, first, rest)

        return bounded(sample)

    raise ValueError(f"unknown mock sampler {cfg.num}")


def make_action_sampler(cfg) -> SamplerFn | None:
    """Factory dispatch (reference utils.py:488-497).  ``None`` config means
    actions come from a policy instead."""
    if cfg is None:
        return None
    if isinstance(cfg, ConstantSamplerConfig):
        return make_constant_sampler(cfg)
    if isinstance(cfg, MockSamplerConfig):
        return make_mock_sampler(cfg)
    raise TypeError(f"unknown sampler config: {type(cfg).__name__}")
