"""Environment state and observation pytrees.

The reference keeps mutable tensors on an ``Env`` object
(reference environment.py:28-45); here the same quantities form an
immutable ``EnvState`` pytree threaded through a pure ``step`` function, so
the whole rollout can live inside one ``lax.scan`` under ``jit`` and the
batch axis can be sharded across a device mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Observations(NamedTuple):
    """Per-agent egocentric observations.

    Field order is the concatenation order used by the obs normalizer and
    its bounds builder (reference utils.py:13-15, 117-140, 530-532).

    Shapes (P = parallel envs, A = agents, O = obstacles):
      target_angle        (P, A, 1)
      target_distance     (P, A, 1)
      obstacles_angles    (P, A, O)
      obstacles_distances (P, A, O)
      others_angles       (P, A, A-1)
      others_distances    (P, A, A-1)
    """

    target_angle: jax.Array
    target_distance: jax.Array
    obstacles_angles: jax.Array
    obstacles_distances: jax.Array
    others_angles: jax.Array
    others_distances: jax.Array

    def concat(self) -> jax.Array:
        """(P, A, 2 + 2O + 2(A-1)) flat observation tensor."""
        return jnp.concatenate(self, axis=2)


class EpisodeStats(NamedTuple):
    """On-device episode-ending counters.

    The reference syncs these to the host every step via ``.item()``
    (reference environment.py:98, 210-211); keeping them on device removes
    that per-step round trip — they are fetched once per rollout.
    """

    num_trunc: jax.Array  # () int32 — truncations seen
    num_col: jax.Array  # () int32 — collision terminations seen
    num_tar: jax.Array  # () int32 — env-steps with all agents in target

    @staticmethod
    def zeros() -> "EpisodeStats":
        z = jnp.zeros((), jnp.int32)
        return EpisodeStats(z, z, z)


class EnvState(NamedTuple):
    """Complete environment state.

    states     (P, A, 5) float32 — [x, y, dir_x, dir_y, speed]
    obstacles  (P, O, 2) float32
    target     (P, 1, 2) float32
    step_num   (P,)      int32   — per-env step counter
    terminates (P,)      bool    — delayed target-reach latch
                                   (reference environment.py:216-221)
    stats      EpisodeStats
    rng        PRNG key threaded through the per-step auto-reset draws
    """

    states: jax.Array
    obstacles: jax.Array
    target: jax.Array
    step_num: jax.Array
    terminates: jax.Array
    stats: EpisodeStats
    rng: jax.Array
    # Mock-init only: emulation of a reference aliasing bug.  The reference's
    # MockInitializer returns the SAME tensor object every call
    # (reference utils.py:310-319) and env construction aliases it as the
    # live state (reference environment.py:26-28); the first step's in-place
    # ``_move_agents`` (reference environment.py:113-137) therefore corrupts
    # the initializer's stored states before the first ``_reinit`` breaks the
    # alias — so every subsequent auto-reset re-initializes agents to the
    # ONCE-MOVED states ("init + one step of the t=0 actions").  Verified
    # empirically against the reference; the golden fixtures encode it.
    # ``reset_states`` carries the (corrupted-after-first-step) reset pool,
    # ``virgin`` is True until the first step has run.  Both are None for
    # non-mock initializers (which rebuild fresh tensors per call and are
    # unaffected).
    reset_states: jax.Array | None = None
    virgin: jax.Array | None = None


class StepOutput(NamedTuple):
    """What ``step`` returns alongside the new state
    (reference environment.py:107)."""

    obs: Observations
    rewards: jax.Array  # (P,) float32
    terminated: jax.Array  # (P,) bool
    truncated: jax.Array  # (P,) bool
