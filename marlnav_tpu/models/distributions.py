"""Diagonal-covariance Gaussian policy distribution.

The reference wraps the actor heads in
``MultivariateNormal(mu, diag(softplus(...)))`` (reference models.py:30-36)
— i.e. the softplus head parameterizes the *covariance* diagonal (the
variance, not the standard deviation).  This module reproduces that
distribution's ``sample`` / ``log_prob`` / ``entropy`` in closed form for
the diagonal case, avoiding the reference's per-row ``torch.vmap(diag)``
matrix construction and the dense-covariance Cholesky path entirely —
everything is elementwise VPU work.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


class DiagGaussian(NamedTuple):
    """Batch of independent Gaussians with diagonal covariance.

    mean (..., K); var (..., K) — the covariance diagonal.
    """

    mean: jax.Array
    var: jax.Array

    def sample(self, rng: jax.Array) -> jax.Array:
        eps = jax.random.normal(rng, self.mean.shape, self.mean.dtype)
        return self.mean + jnp.sqrt(self.var) * eps

    def log_prob(self, x: jax.Array) -> jax.Array:
        """(...,) — matches MultivariateNormal.log_prob with diag covariance."""
        k = self.mean.shape[-1]
        diff = x - self.mean
        maha = jnp.sum(diff * diff / self.var, axis=-1)
        logdet = jnp.sum(jnp.log(self.var), axis=-1)
        return -0.5 * (k * _LOG_2PI + logdet + maha)

    def entropy(self) -> jax.Array:
        """(...,) — 0.5*k*(1 + log 2pi) + 0.5*log det(cov)."""
        k = self.mean.shape[-1]
        logdet = jnp.sum(jnp.log(self.var), axis=-1)
        return 0.5 * k * (1.0 + _LOG_2PI) + 0.5 * logdet

    @property
    def mode(self) -> jax.Array:
        """The distribution mean (``dist.loc`` in the reference renderer,
        reference animation.py:48)."""
        return self.mean
