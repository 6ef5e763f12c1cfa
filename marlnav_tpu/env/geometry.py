"""Vectorized pairwise geometry: distances and signed view angles.

This replaces the reference's per-agent / per-obstacle Python list
comprehensions (reference environment.py:139-165 — O(A*(O+2)) small kernel
launches per call) with one broadcasted computation over
``(P, A, K)`` pairs, which XLA fuses into a handful of VPU kernels.

Semantics are kept op-for-op compatible with the reference:

* distances: Euclidean norm of position differences
  (``torch.cdist``, reference environment.py:271-274);
* angles (reference environment.py:276-286): normalize the offset with an
  eps-guarded norm (``torch.nn.functional.normalize`` default eps=1e-12),
  dot with the unit heading clamped to ``[-1+1e-8, 1-1e-8]`` (so an angle of
  exactly 0 is impossible), ``arccos``, and sign = -1 where the x-component
  of the orthogonal part of the offset is > 0, else +1.  Note the verified
  degenerate branch: when the heading is exactly (±1, 0) the orthogonal
  x-component is exactly 0 and the sign is always +1 (SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NORMALIZE_EPS = 1e-12  # torch F.normalize default
_ACOS_CLAMP = 1e-8  # reference environment.py:281


def angles_and_distances(
    positions: jax.Array,  # (P, A, 2) agent positions
    headings: jax.Array,  # (P, A, 2) unit heading vectors
    points: jax.Array,  # (P, A, K, 2) or (P, K, 2) observed points
):
    """Signed view angles and distances from each agent to each point.

    Returns ``(angles, distances)`` with shape (P, A, K).  ``points`` may be
    shared across agents (P, K, 2) — e.g. obstacles or the target — or
    per-agent (P, A, K, 2) — e.g. the other agents.
    """
    if points.ndim == 3:
        points = points[:, None, :, :]  # (P, 1, K, 2) broadcasts over A

    diff = points - positions[:, :, None, :]  # (P, A, K, 2)
    distances = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # (P, A, K)

    unit = diff / jnp.maximum(distances, _NORMALIZE_EPS)[..., None]
    dot = jnp.sum(headings[:, :, None, :] * unit, axis=-1)
    dot = jnp.clip(dot, -1.0 + _ACOS_CLAMP, 1.0 - _ACOS_CLAMP)

    # Orthogonal component of the unit offset w.r.t. the heading; only its
    # x-coordinate decides the sign (reference environment.py:282-284).
    orth_x = unit[..., 0] - dot * headings[:, :, None, 0]
    signs = jnp.where(orth_x > 0.0, -1.0, 1.0)

    angles = signs * jnp.arccos(dot)
    return angles, distances


def others_indices(num_agents: int) -> jnp.ndarray:
    """(A, A-1) int32 — for each agent, the indices of the other agents
    (reference environment.py:22-24)."""
    idx = [[i for i in range(num_agents) if i != j] for j in range(num_agents)]
    return jnp.asarray(idx, jnp.int32)


def rotate(directions: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate 2-D vectors by per-element angles.

    The reference applies a per-agent 2x2 rotation matrix under a double
    ``torch.vmap`` (reference environment.py:125-137); elementwise
    sin/cos arithmetic is the same math with no tiny matmuls:
    ``[[cos, -sin], [sin, cos]] @ [dx, dy]``.

    directions (..., 2), angles (...,) -> (..., 2)
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    dx, dy = directions[..., 0], directions[..., 1]
    return jnp.stack([c * dx - s * dy, s * dx + c * dy], axis=-1)
