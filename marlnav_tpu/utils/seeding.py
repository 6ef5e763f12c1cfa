"""Seeding.

The reference seeds four global RNGs and flips cuDNN into deterministic
mode (reference utils.py:550-559).  JAX has no global RNG: a single
``PRNGKey`` is split functionally everywhere, so seeding is just key
construction — and runs are reproducible by construction.
"""

from __future__ import annotations

from typing import Optional

import jax


def make_rng(seed: Optional[int]) -> jax.Array:
    """PRNG key from an optional seed (None -> seed 0, matching the
    reference's unseeded-default determinism story as closely as a
    counter-based RNG allows)."""
    return jax.random.PRNGKey(0 if seed is None else seed)
