"""Model-layer parity: distribution math and network semantics vs torch.

The reference policy is ``MultivariateNormal(mu, diag(softplus))``
(reference models.py:30-36); these tests check our closed-form diagonal
implementation against ``torch.distributions`` on random data, and the
network forward passes against a minimal torch replica with copied weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marlnav_tpu.models import (
    DiagGaussian,
    actor_apply,
    actor_init,
    critic_apply,
    critic_init,
)

torch = pytest.importorskip("torch")


def test_diag_gaussian_matches_torch_mvn():
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(64, 2)).astype(np.float32)
    var = rng.uniform(0.1, 2.0, size=(64, 2)).astype(np.float32)
    x = rng.normal(size=(64, 2)).astype(np.float32)

    dist = DiagGaussian(jnp.asarray(mean), jnp.asarray(var))
    lp = np.asarray(dist.log_prob(jnp.asarray(x)))
    ent = np.asarray(dist.entropy())

    cov = torch.vmap(torch.diag)(torch.from_numpy(var))
    tdist = torch.distributions.MultivariateNormal(torch.from_numpy(mean), cov)
    np.testing.assert_allclose(lp, tdist.log_prob(torch.from_numpy(x)).numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ent, tdist.entropy().numpy(), rtol=1e-5, atol=1e-5)


def test_diag_gaussian_sample_stats():
    dist = DiagGaussian(jnp.asarray([1.0, -2.0]), jnp.asarray([0.25, 4.0]))
    samples = jax.vmap(dist.sample)(jax.random.split(jax.random.PRNGKey(0), 20000))
    np.testing.assert_allclose(np.asarray(samples.mean(0)), [1.0, -2.0], atol=0.05)
    np.testing.assert_allclose(np.asarray(samples.std(0)), [0.5, 2.0], atol=0.05)


def _copy_dense(torch_linear, dense):
    torch_linear.weight.data = torch.from_numpy(np.asarray(dense.w).T.copy())
    torch_linear.bias.data = torch.from_numpy(np.asarray(dense.b).copy())


def test_actor_forward_matches_torch():
    """Same weights -> same (mean, var), including the missing hidden
    activation (reference models.py:27-31)."""
    params = actor_init(jax.random.PRNGKey(1), obs_size=12, hidden_size=50)
    obs = np.random.default_rng(1).normal(size=(8, 3, 12)).astype(np.float32)
    mean, var = actor_apply(params, jnp.asarray(obs))

    fc1 = torch.nn.Linear(12, 50)
    fc_mu = torch.nn.Linear(50, 2)
    fc_var = torch.nn.Linear(50, 2)
    _copy_dense(fc1, params.fc1)
    _copy_dense(fc_mu, params.fc_mu)
    _copy_dense(fc_var, params.fc_var)
    with torch.no_grad():
        x = torch.from_numpy(obs).flatten(0, 1)
        h = fc1(x)  # no activation, as in the reference
        t_mean = torch.tanh(fc_mu(h))
        t_var = torch.nn.functional.softplus(fc_var(h))

    np.testing.assert_allclose(np.asarray(mean), t_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), t_var.numpy(), rtol=1e-5, atol=1e-6)


def test_critic_forward_matches_torch():
    """Centralized critic: agents flattened into features
    (reference models.py:39-56)."""
    params = critic_init(jax.random.PRNGKey(2), obs_size=12, num_agents=3,
                         hidden_size=50)
    obs = np.random.default_rng(2).normal(size=(8, 3, 12)).astype(np.float32)
    values = critic_apply(params, jnp.asarray(obs))

    fc1 = torch.nn.Linear(36, 50)
    fc2 = torch.nn.Linear(50, 1)
    _copy_dense(fc1, params.fc1)
    _copy_dense(fc2, params.fc2)
    with torch.no_grad():
        x = torch.from_numpy(obs).flatten(1)
        t_val = fc2(torch.relu(fc1(x)))
    np.testing.assert_allclose(np.asarray(values), t_val.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_orthogonal_init():
    params = actor_init(jax.random.PRNGKey(3), obs_size=12, hidden_size=50)
    w = np.asarray(params.fc1.w)  # (12, 50); torch view is (50, 12)
    gram = w.T @ w  # rows of the torch-view are orthonormal for out > in
    assert np.abs(gram - np.eye(50)).max() > 0.5  # (50,12) can't be full rank
    gram_in = w @ w.T
    np.testing.assert_allclose(gram_in, np.eye(12), atol=1e-5)
