"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Checks that the full MAPPO pipeline (collect -> train actor -> train
critic) runs with the env batch sharded over a ('data', 'model') mesh,
that outputs keep the expected shardings, and that sharded execution
matches single-device execution numerically (XLA's inserted collectives
don't change semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from marlnav_tpu.algo import make_mappo
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.parallel import (
    make_mesh,
    shard_env_state,
    shard_train_state,
)

NUM_ENVS = 32
T = 8


def build(num_parallel=NUM_ENVS):
    cfg = MAPPOConfig(
        num_parallel=num_parallel, buffer_len=T, batch_size=T, num_epochs=2,
        num_total=T * num_parallel, hidden_size=16,
    )
    env = make_env(
        EnvParams(num_parallel=num_parallel, episode_len=6),
        TriangleInitConfig(num_parallel=num_parallel, num_obstacles=3),
        None,
    )
    return cfg, make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(num_data=4, num_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(num_data=16, num_model=2)


def test_sharded_pipeline_matches_unsharded():
    cfg, mappo = build()
    ts, env_state = mappo.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    # Single-device baseline.
    es1, buf1, met1 = jax.jit(mappo.collect)(ts, env_state, rng)
    ts1, al1 = jax.jit(mappo.train_actor)(ts, buf1)
    ts1, cl1 = jax.jit(mappo.train_critic)(ts1, buf1)

    # Sharded over 8 data devices.
    mesh = make_mesh()
    s_env = shard_env_state(env_state, mesh)
    s_ts = shard_train_state(ts, mesh)
    es2, buf2, met2 = jax.jit(mappo.collect)(s_ts, s_env, rng)
    ts2, al2 = jax.jit(mappo.train_actor)(s_ts, buf2)
    ts2, cl2 = jax.jit(mappo.train_critic)(ts2, buf2)

    # The env axis must remain sharded through the rollout.
    assert not buf2.obs.sharding.is_fully_replicated
    assert es2.states.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", None, None)), ndim=3)

    np.testing.assert_allclose(np.asarray(met1.mean_rew),
                               np.asarray(met2.mean_rew), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(buf1.returns), np.asarray(buf2.returns),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al1), np.asarray(al2),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cl1), np.asarray(cl2),
                               rtol=2e-4, atol=1e-5)
    for w1, w2 in zip(jax.tree.leaves(ts1), jax.tree.leaves(ts2)):
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   rtol=2e-4, atol=1e-5)


def test_tensor_parallel_params():
    """2-way model axis: hidden dims shard, forward results unchanged."""
    cfg, mappo = build()
    ts, env_state = mappo.init(jax.random.PRNGKey(0))
    mesh = make_mesh(num_data=4, num_model=2)

    s_ts = shard_train_state(ts, mesh, tensor_parallel=True)
    assert s_ts.actor.fc1.w.sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, "model")), ndim=2)

    from marlnav_tpu.models import actor_apply
    obs = jax.random.normal(jax.random.PRNGKey(2), (NUM_ENVS, 3, 12))
    m1, v1 = jax.jit(actor_apply)(ts.actor, obs)
    m2, v2 = jax.jit(actor_apply)(s_ts.actor, obs)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5,
                               atol=1e-6)
