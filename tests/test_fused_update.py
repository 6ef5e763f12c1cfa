"""Fused PPO-update kernels (ops/fused_update.py): gradient and loss parity
vs jax.value_and_grad of the XLA losses, multi-block accumulation, and full
train-phase equivalence.

Unlike the collect kernels, no PRNG is involved, so interpret mode on CPU
exercises the exact production math (host noise injection unnecessary).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marlnav_tpu.algo import Buffer, make_mappo
from marlnav_tpu.algo.mappo import actor_loss, critic_loss, minibatch_slices
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.models import actor_init, critic_init
from marlnav_tpu.ops.fused_update import (
    make_fused_actor_grad,
    make_fused_critic_grad,
    stage_actor_minibatch,
    stage_critic_minibatch,
)

A, OBS, H = 3, 12, 16


def cfg_for(p, t, **kw):
    defaults = dict(num_agents=A, num_parallel=p, obs_size=OBS,
                    hidden_size=H, num_total=t * p, buffer_len=t,
                    num_epochs=2, batch_size=t)
    defaults.update(kw)
    return MAPPOConfig(**defaults)


def rand_buffer(seed, t, p):
    rng = np.random.default_rng(seed)
    return Buffer(
        obs=jnp.asarray(rng.normal(size=(t, p, A, OBS)), jnp.float32),
        actions=jnp.asarray(rng.uniform(-1, 1, (t, p, A, 2)), jnp.float32),
        log_probs=jnp.asarray(rng.normal(size=(t, p * A)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(t, p, 1)), jnp.float32),
        returns=jnp.asarray(rng.normal(size=(t, p)), jnp.float32),
        done=jnp.asarray(rng.uniform(size=(t, p)) < 0.2),
    )


def assert_tree_close(a, b, rtol=2e-5, atol=2e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("p", [4, 128], ids=["one-block", "multi-block"])
@pytest.mark.parametrize("faithful", [True, False])
def test_actor_grad_parity(p, faithful):
    """Kernel loss + grads == jax.value_and_grad(actor_loss) on every
    minibatch slice (including the faithful dropped-tail slice)."""
    t = 12
    cfg = cfg_for(p, t, batch_size=6, faithful=faithful)
    buf = rand_buffer(0, t, p)
    actor = actor_init(jax.random.PRNGKey(1), OBS, H, 2)
    kernel = make_fused_actor_grad(cfg, interpret=True)

    for mb in minibatch_slices(buf, cfg):
        loss_ref, grads_ref = jax.value_and_grad(actor_loss)(actor, mb, cfg)
        staged, n_rows = stage_actor_minibatch(mb, cfg)
        loss_k, grads_k = jax.jit(
            kernel, static_argnums=2)(actor, staged, n_rows)
        np.testing.assert_allclose(float(loss_k), float(loss_ref),
                                   rtol=2e-5, atol=2e-5)
        assert_tree_close(grads_k, grads_ref)


@pytest.mark.parametrize("p", [4, 128], ids=["one-block", "multi-block"])
def test_critic_grad_parity(p):
    """Kernel loss + grads == jax.value_and_grad(critic_loss), including
    the common both-branches-tie case (value inside the clip band)."""
    t = 12
    cfg = cfg_for(p, t, batch_size=6)
    buf = rand_buffer(2, t, p)
    critic = critic_init(jax.random.PRNGKey(3), OBS, A, H)
    kernel = make_fused_critic_grad(cfg, interpret=True)

    for mb in minibatch_slices(buf, cfg):
        loss_ref, grads_ref = jax.value_and_grad(critic_loss)(critic, mb, cfg)
        staged, n_rows = stage_critic_minibatch(mb, cfg)
        loss_k, grads_k = jax.jit(
            kernel, static_argnums=2)(critic, staged, n_rows)
        np.testing.assert_allclose(float(loss_k), float(loss_ref),
                                   rtol=2e-5, atol=2e-5)
        assert_tree_close(grads_k, grads_ref)


def test_critic_grad_parity_inside_clip_band():
    """Force values where new v is certain to sit inside the old-value clip
    band (exact d1 == d2 ties) — the balanced-tie rule must match JAX."""
    t, p = 8, 8
    cfg = cfg_for(p, t)
    buf = rand_buffer(4, t, p)
    critic = critic_init(jax.random.PRNGKey(5), OBS, A, H)
    # Make old values EQUAL to the critic's current outputs -> clamped == v
    # everywhere -> every row ties.
    from marlnav_tpu.models import critic_apply

    v_now = critic_apply(critic, buf.obs.reshape(t * p, A, OBS))
    buf = buf._replace(values=v_now.reshape(t, p, 1))
    mb = minibatch_slices(buf, cfg)[0]
    loss_ref, grads_ref = jax.value_and_grad(critic_loss)(critic, mb, cfg)
    staged, n_rows = stage_critic_minibatch(mb, cfg)
    loss_k, grads_k = make_fused_critic_grad(cfg, interpret=True)(
        critic, staged, n_rows)
    np.testing.assert_allclose(float(loss_k), float(loss_ref),
                               rtol=2e-5, atol=2e-5)
    assert_tree_close(grads_k, grads_ref)


@pytest.mark.parametrize("faithful", [True, False])
def test_fused_phase_under_mesh_matches_xla(faithful):
    """fused_updates on a 2-shard 'data' mesh (shard_mapped phase, psum'd
    gradient sums): same losses and parameters as the unsharded XLA path
    on the same buffer.  Faithful semantics cross shard boundaries (the
    reference's advantage tile mis-pairing is a GLOBAL flat pattern,
    reference models.py:285-286) — staging all_gathers the (size, P)
    returns - values and applies the global tile per shard
    (_pair_rows_sharded), so this must match the single-device faithful
    XLA path too."""
    from marlnav_tpu.parallel import make_mesh

    t, p = 10, 8
    env = make_env(EnvParams(num_parallel=p, episode_len=8),
                   TriangleInitConfig(num_parallel=p, num_obstacles=3), None)
    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    cfg_x = cfg_for(p, t, batch_size=5, num_epochs=2, faithful=faithful)
    cfg_f = cfg_for(p, t, batch_size=5, num_epochs=2, faithful=faithful,
                    fused_updates=True)
    mx = make_mappo(cfg_x, env, NormalizerConfig(), ScalerConfig())
    mf = make_mappo(cfg_f, env, NormalizerConfig(), ScalerConfig(),
                    mesh=mesh)
    ts, es = mx.init(jax.random.PRNGKey(7))
    _, buf, _ = jax.jit(mx.collect)(ts, es, jax.random.PRNGKey(8))

    ts_x, al_x = jax.jit(mx.train_actor)(ts, buf)
    ts_f, al_f = jax.jit(mf.train_actor)(ts, buf)
    np.testing.assert_allclose(np.asarray(al_f), np.asarray(al_x),
                               rtol=1e-4, atol=1e-4)
    assert_tree_close(ts_f.actor, ts_x.actor, rtol=1e-4, atol=1e-4)
    ts_x2, cl_x = jax.jit(mx.train_critic)(ts_x, buf)
    ts_f2, cl_f = jax.jit(mf.train_critic)(ts_f, buf)
    np.testing.assert_allclose(np.asarray(cl_f), np.asarray(cl_x),
                               rtol=1e-4, atol=1e-4)
    assert_tree_close(ts_f2.critic, ts_x2.critic, rtol=1e-4, atol=1e-4)


def test_pair_rows_sharded_matches_global():
    """_pair_rows_sharded under a 4-shard shard_map reproduces the global
    _pair_rows slice for slice, in both pairing modes (pure XLA — no
    Pallas involved, so any shard count is safe under interpretation)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from marlnav_tpu.ops.fused_update import _pair_rows, _pair_rows_sharded

    size, p, a, shards = 5, 16, 3, 4
    rng = np.random.default_rng(11)
    d = jnp.asarray(rng.normal(size=(size, p)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:shards]), ("data",))
    for faithful in (True, False):
        want = np.asarray(_pair_rows(d.reshape(-1), a, faithful)).reshape(
            size, p, a)
        got = jax.jit(jax.shard_map(
            lambda dl: _pair_rows_sharded(dl, a, faithful, "data")
            .reshape(size, p // shards, a),
            mesh=mesh, in_specs=P(None, "data"),
            out_specs=P(None, "data")))(d)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_fused_train_phase_matches_xla():
    """make_mappo(fused_updates=True) trains to the same parameters and
    losses as the XLA path on the same collected buffer (same optax Adam
    consuming kernel-vs-autodiff gradients)."""
    t, p = 10, 8
    env = make_env(EnvParams(num_parallel=p, episode_len=8),
                   TriangleInitConfig(num_parallel=p, num_obstacles=3), None)
    cfg_x = cfg_for(p, t, batch_size=5, num_epochs=3)
    cfg_f = cfg_for(p, t, batch_size=5, num_epochs=3, fused_updates=True)
    mx = make_mappo(cfg_x, env, NormalizerConfig(), ScalerConfig())
    mf = make_mappo(cfg_f, env, NormalizerConfig(), ScalerConfig())
    ts, es = mx.init(jax.random.PRNGKey(7))
    _, buf, _ = jax.jit(mx.collect)(ts, es, jax.random.PRNGKey(8))

    ts_x, al_x = jax.jit(mx.train_actor)(ts, buf)
    ts_f, al_f = jax.jit(mf.train_actor)(ts, buf)
    np.testing.assert_allclose(np.asarray(al_f), np.asarray(al_x),
                               rtol=1e-4, atol=1e-4)
    assert_tree_close(ts_f.actor, ts_x.actor, rtol=1e-4, atol=1e-4)

    ts_x2, cl_x = jax.jit(mx.train_critic)(ts_x, buf)
    ts_f2, cl_f = jax.jit(mf.train_critic)(ts_f, buf)
    np.testing.assert_allclose(np.asarray(cl_f), np.asarray(cl_x),
                               rtol=1e-4, atol=1e-4)
    assert_tree_close(ts_f2.critic, ts_x2.critic, rtol=1e-4, atol=1e-4)
