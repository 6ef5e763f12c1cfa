"""Actor and centralized-critic MLPs as parameter pytrees.

Architectures replicate the reference exactly (reference models.py:14-56),
including the actor's *missing* hidden activation (reference models.py:29
applies fc1 with no nonlinearity — verified quirk, SURVEY.md §2.5):

  Actor : (P, A, obs) -> flatten agents into batch -> Linear(obs, H)
          -> heads tanh(Linear(H, 2)) = mean, softplus(Linear(H, 2)) = var
  Critic: (P, A, obs) -> flatten agents into features (CTDE: sees all
          agents' observations jointly) -> Linear(A*obs, H) -> ReLU
          -> Linear(H, 1)

Initialization matches torch: orthogonal weight matrices
(reference models.py:21-25, 46-49) and uniform(-1/sqrt(fan_in),
+1/sqrt(fan_in)) biases (torch.nn.Linear default).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Dense(NamedTuple):
    w: jax.Array  # (in, out)
    b: jax.Array  # (out,)

    def __call__(self, x: jax.Array) -> jax.Array:
        # Always accumulate in float32: a no-op for f32 operands, and the
        # MXU-native mode for bf16 operands (bf16 inputs, f32 accumulator)
        # used by the bf16_updates training path.
        return jnp.dot(x, self.w, preferred_element_type=jnp.float32) + self.b

    def cast(self, dtype) -> "Dense":
        """Matmul operands in ``dtype``; the bias stays f32 (it adds into
        the f32 accumulator output)."""
        return Dense(self.w.astype(dtype), self.b)


class ActorParams(NamedTuple):
    fc1: Dense
    fc_mu: Dense
    fc_var: Dense


class CriticParams(NamedTuple):
    fc1: Dense
    fc2: Dense


def _dense_init(rng: jax.Array, in_size: int, out_size: int) -> Dense:
    k_w, k_b = jax.random.split(rng)
    # torch stores Linear weights as (out, in) and orthogonalizes that view;
    # we keep (in, out) so the forward pass is a plain row-major matmul.
    w = jax.nn.initializers.orthogonal()(k_w, (out_size, in_size), jnp.float32).T
    bound = 1.0 / jnp.sqrt(jnp.float32(in_size))
    b = jax.random.uniform(k_b, (out_size,), jnp.float32, -bound, bound)
    return Dense(w, b)


def actor_init(rng: jax.Array, obs_size: int, hidden_size: int,
               action_size: int = 2) -> ActorParams:
    k1, k2, k3 = jax.random.split(rng, 3)
    return ActorParams(
        fc1=_dense_init(k1, obs_size, hidden_size),
        fc_mu=_dense_init(k2, hidden_size, action_size),
        fc_var=_dense_init(k3, hidden_size, action_size),
    )


def critic_init(rng: jax.Array, obs_size: int, num_agents: int,
                hidden_size: int) -> CriticParams:
    k1, k2 = jax.random.split(rng)
    return CriticParams(
        fc1=_dense_init(k1, obs_size * num_agents, hidden_size),
        fc2=_dense_init(k2, hidden_size, 1),
    )


def actor_apply(params: ActorParams, obs: jax.Array, compute_dtype=None):
    """obs (..., A, obs_size) -> (mean, var) each (...*A, action_size).

    Agents fold into the batch axis (reference models.py:19, 27-28), so one
    matmul serves every agent of every env — MXU-friendly at any batch size.
    The ``var`` head is the covariance diagonal (see distributions.py).

    ``compute_dtype=jnp.bfloat16`` runs the matmuls with bf16 operands and
    f32 accumulation (the MXU's 2x-throughput mode) and stores the hidden
    activations bf16 (halving the dominant HBM traffic of the update
    phase); parameters, nonlinearities and outputs stay f32.
    """
    x = obs.reshape(-1, obs.shape[-1])
    fc1, fmu, fvar = params.fc1, params.fc_mu, params.fc_var
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        fc1, fmu, fvar = (d.cast(compute_dtype) for d in (fc1, fmu, fvar))
    h = fc1(x)  # NB: no activation (reference models.py:29)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    mean = jnp.tanh(fmu(h))
    var = jax.nn.softplus(fvar(h))
    return mean, var


def critic_apply(params: CriticParams, obs: jax.Array,
                 compute_dtype=None) -> jax.Array:
    """obs (..., A, obs_size) -> values (..., 1).

    Agents fold into the feature axis — the centralized critic
    (reference models.py:44, 51-55).  ``compute_dtype`` as in
    ``actor_apply``.
    """
    x = obs.reshape(obs.shape[0], -1)
    fc1, fc2 = params.fc1, params.fc2
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        fc1, fc2 = fc1.cast(compute_dtype), fc2.cast(compute_dtype)
    h = jax.nn.relu(fc1(x))
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    return fc2(h)
