"""MAPPO math parity vs the reference formulas (reimplemented in torch from
the spec in SURVEY.md §2.5) plus an end-to-end training smoke test.

These guard every quirk the reference's trainer carries: zero-at-done
returns with whole-buffer sample-std normalization, the tile-vs-interleave
advantage mis-pairing, the maximized actor objective, the clipped-value
critic loss, and the last-buffer-step drop in minibatching.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marlnav_tpu.algo import Buffer, make_mappo
from marlnav_tpu.algo.mappo import (
    _sample_std,
    actor_loss,
    critic_loss,
    discounted_returns,
    minibatch_slices,
)
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env

torch = pytest.importorskip("torch")

T, P, A, OBS = 12, 4, 3, 12


def small_cfg(**kw):
    defaults = dict(
        num_agents=A, num_parallel=P, obs_size=OBS, hidden_size=16,
        num_total=T * P, buffer_len=T, num_epochs=2, batch_size=T,
    )
    defaults.update(kw)
    return MAPPOConfig(**defaults)


def rand_buffer(rng, steps=T):
    return Buffer(
        obs=jnp.asarray(rng.normal(size=(steps, P, A, OBS)), jnp.float32),
        actions=jnp.asarray(rng.uniform(-1, 1, size=(steps, P, A, 2)), jnp.float32),
        log_probs=jnp.asarray(rng.normal(size=(steps, P * A)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(steps, P, 1)), jnp.float32),
        returns=jnp.asarray(rng.normal(size=(steps, P)), jnp.float32),
        done=jnp.asarray(rng.uniform(size=(steps, P)) < 0.2),
    )


def make_small_env():
    return make_env(
        EnvParams(num_parallel=P, episode_len=8),
        TriangleInitConfig(num_parallel=P, num_obstacles=3),
        None,
    )


def test_discounted_returns_match_reference_loop():
    """Backward loop with zero-at-done (reference models.py:131-148)."""
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, P)).astype(np.float32)
    done = rng.uniform(size=(T, P)) < 0.3
    gamma = 0.9

    # NB: the reference accumulates returns in float64 (torch dtype=float,
    # reference models.py:133); we keep the device-native float32.  The
    # manual loop below therefore also runs in float32.
    curr = np.zeros(P, np.float32)
    expected = np.zeros_like(rewards)
    for t in range(T - 1, -1, -1):
        curr = np.where(done[t], np.float32(0), rewards[t] + np.float32(gamma) * curr)
        expected[t] = curr

    got = np.asarray(discounted_returns(jnp.asarray(rewards), jnp.asarray(done), gamma))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    # whole-buffer normalization uses the unbiased sample std (torch.std_mean)
    t_std, _ = torch.std_mean(torch.from_numpy(expected))
    np.testing.assert_allclose(float(_sample_std(jnp.asarray(expected))),
                               float(t_std), rtol=1e-5)


@pytest.fixture(scope="module")
def mappo_setup():
    cfg = small_cfg()
    mappo = make_mappo(cfg, make_small_env(), NormalizerConfig(), ScalerConfig())
    ts, env_state = mappo.init(jax.random.PRNGKey(0))
    return cfg, mappo, ts, env_state


def _torch_actor_dist(params, obs):
    """Reference Actor forward (reference models.py:14-36) in torch with our
    weights — returns a MultivariateNormal over the flattened batch."""
    t = lambda v: torch.from_numpy(np.asarray(v))
    x = obs.flatten(0, 1)
    h = x @ t(params.fc1.w) + t(params.fc1.b)
    mu = torch.tanh(h @ t(params.fc_mu.w) + t(params.fc_mu.b))
    var = torch.nn.functional.softplus(h @ t(params.fc_var.w) + t(params.fc_var.b))
    return torch.distributions.MultivariateNormal(mu, torch.vmap(torch.diag)(var))


def test_actor_loss_matches_reference_semantics(mappo_setup):
    """PPO-clip + entropy, maximized, with the faithful tile mis-pairing
    (reference models.py:270-299)."""
    cfg, _, ts, _ = mappo_setup
    buf = rand_buffer(np.random.default_rng(1))

    dist = _torch_actor_dist(
        ts.actor, torch.from_numpy(np.asarray(buf.obs)).reshape(T * P, A, OBS))
    actions = torch.from_numpy(np.asarray(buf.actions)).reshape(T * P * A, 2)
    new_lp = dist.log_prob(actions)
    ratios = torch.exp(new_lp - torch.from_numpy(np.asarray(buf.log_probs)).reshape(-1))
    # .repeat() tiling — the reference's advantage mis-pairing
    rewards = torch.from_numpy(np.asarray(buf.returns)).reshape(-1).repeat(A)
    values = torch.from_numpy(np.asarray(buf.values)).reshape(-1).repeat(A)
    advantages = rewards - values
    clip = torch.mean(torch.minimum(
        ratios * advantages,
        torch.clip(ratios, 1 - cfg.epsilon, 1 + cfg.epsilon) * advantages))
    expected_objective = clip + cfg.ent_const * torch.mean(dist.entropy())

    ours = actor_loss(ts.actor, buf, cfg)  # negated (minimized) objective
    np.testing.assert_allclose(-float(ours), float(expected_objective), rtol=1e-4)


def test_actor_loss_fixed_pairing():
    """fixed mode pairs advantages with repeat-interleave order."""
    cfg_f = small_cfg(faithful=False)
    mappo = make_mappo(cfg_f, make_small_env(), NormalizerConfig(), ScalerConfig())
    ts, _ = mappo.init(jax.random.PRNGKey(2))
    buf = rand_buffer(np.random.default_rng(3))
    l_fixed = float(actor_loss(ts.actor, buf, cfg_f))
    l_faith = float(actor_loss(ts.actor, buf, small_cfg()))
    assert np.isfinite(l_fixed) and np.isfinite(l_faith)
    assert l_fixed != pytest.approx(l_faith)  # the pairings genuinely differ


def test_critic_loss_matches_reference_semantics(mappo_setup):
    """Clipped-value loss (reference models.py:301-316)."""
    cfg, _, ts, _ = mappo_setup
    buf = rand_buffer(np.random.default_rng(2))

    t = lambda v: torch.from_numpy(np.asarray(v))
    obs = t(buf.obs).reshape(T * P, A, OBS).flatten(1)
    new_values = (torch.relu(obs @ t(ts.critic.fc1.w) + t(ts.critic.fc1.b))
                  @ t(ts.critic.fc2.w) + t(ts.critic.fc2.b)).squeeze()
    values = t(buf.values).reshape(-1)
    rewards = t(buf.returns).reshape(-1)
    diff = (new_values - rewards) ** 2
    clamped = torch.clamp(new_values, min=values - cfg.epsilon,
                          max=values + cfg.epsilon)
    expected = torch.mean(torch.maximum(diff, (clamped - rewards) ** 2))

    ours = critic_loss(ts.critic, buf, cfg)
    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-4)


def test_minibatch_slicing_faithful_vs_fixed():
    """faithful: the batch reaching the buffer end drops the final step
    (reference models.py:167-171); fixed: full batches."""
    buf = rand_buffer(np.random.default_rng(4))
    sl = minibatch_slices(buf, small_cfg())  # bs == buffer_len == T
    assert [s.obs.shape[0] for s in sl] == [T - 1]
    sl = minibatch_slices(buf, small_cfg(faithful=False))
    assert [s.obs.shape[0] for s in sl] == [T]
    sl = minibatch_slices(buf, small_cfg(batch_size=T // 2))
    assert [s.obs.shape[0] for s in sl] == [T // 2, T // 2 - 1]
    sl = minibatch_slices(buf, small_cfg(batch_size=T // 2, faithful=False))
    assert [s.obs.shape[0] for s in sl] == [T // 2, T // 2]


def test_full_repeat_trains(mappo_setup):
    """collect -> train_actor -> train_critic runs jitted end-to-end,
    losses are finite, parameters actually move."""
    cfg, mappo, ts, env_state = mappo_setup
    env_state, buf, metrics = jax.jit(mappo.collect)(ts, env_state,
                                                     jax.random.PRNGKey(3))
    assert buf.obs.shape == (T, P, A, OBS)
    assert np.isfinite(float(metrics.mean_rew))
    # normalized returns: mean ~0, sample std ~1 over the whole buffer
    assert abs(float(buf.returns.mean())) < 1e-4

    ts2, a_losses = jax.jit(mappo.train_actor)(ts, buf)
    ts2, c_losses = jax.jit(mappo.train_critic)(ts2, buf)
    assert a_losses.shape == (cfg.num_epochs * cfg.num_minibatches,)
    assert np.isfinite(np.asarray(a_losses)).all()
    assert np.isfinite(np.asarray(c_losses)).all()
    assert not np.allclose(np.asarray(ts2.actor.fc1.w), np.asarray(ts.actor.fc1.w))
    assert not np.allclose(np.asarray(ts2.critic.fc1.w), np.asarray(ts.critic.fc1.w))


def test_returns_f64_matches_reference_accumulator():
    """returns_f64 reproduces the reference's float64 return pipeline
    (reference models.py:131-148, accumulator ``dtype=float``) exactly, at
    reward magnitudes (~1e3) where the f32 path visibly deviates."""
    from marlnav_tpu.algo.mappo import reference_returns

    rng = np.random.default_rng(0)
    t, p = 400, 8
    rewards = jnp.asarray(rng.normal(scale=1000.0, size=(t, p)), jnp.float32)
    done = jnp.asarray(rng.uniform(size=(t, p)) < 0.01)
    cfg = small_cfg(returns_f64=True)

    with pytest.raises(ValueError, match="x64"):
        reference_returns(rewards, done, cfg)

    try:
        jax.config.update("jax_enable_x64", True)
        normed64, mean64 = jax.jit(reference_returns, static_argnums=2)(
            rewards, done, cfg)
    finally:
        jax.config.update("jax_enable_x64", False)

    # numpy float64 mirror of the reference backward loop + z-norm.
    r, d = np.asarray(rewards, np.float64), np.asarray(done)
    curr, rets = np.zeros(p), np.zeros((t, p))
    for i in range(t - 1, -1, -1):
        curr = np.where(d[i], 0.0, r[i] + cfg.gamma * curr)
        rets[i] = curr
    expect = (rets - rets.mean()) / (rets.std(ddof=1) + 1e-12)

    assert normed64.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(normed64, np.float64), expect,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(mean64), rets.mean(), rtol=1e-12)

    # The f32 path deviates from the f64 truth by more than f32 rounding of
    # the result — i.e. the accumulation dtype genuinely matters here.
    normed32, _ = reference_returns(rewards, done, small_cfg())
    dev32 = np.abs(np.asarray(normed32, np.float64) - expect).max()
    dev64 = np.abs(np.asarray(normed64, np.float64) - expect).max()
    assert dev64 < dev32


def test_bf16_updates_parity():
    """bf16_updates changes only matmul operand precision (f32 accumulate):
    losses and gradients must track the f32 path to bf16 input-rounding
    tolerance, and a full update phase must train to a nearby state."""
    rng = np.random.default_rng(11)
    buf = rand_buffer(rng)
    cfg32 = small_cfg()
    cfg16 = small_cfg(bf16_updates=True)

    from marlnav_tpu.models import actor_init, critic_init

    actor = actor_init(jax.random.PRNGKey(0), OBS, 16, 2)
    critic = critic_init(jax.random.PRNGKey(1), OBS, A, 16)

    la32, ga32 = jax.value_and_grad(actor_loss)(actor, buf, cfg32)
    la16, ga16 = jax.value_and_grad(actor_loss)(actor, buf, cfg16)
    # bf16 has ~8 mantissa bits -> relative rounding ~4e-3 per operand.
    np.testing.assert_allclose(float(la16), float(la32), rtol=2e-2, atol=2e-2)
    for g32, g16 in zip(jax.tree.leaves(ga32), jax.tree.leaves(ga16)):
        denom = np.maximum(np.abs(np.asarray(g32)), 1e-2)
        assert (np.abs(np.asarray(g16) - np.asarray(g32)) / denom).max() < 0.15

    lc32 = critic_loss(critic, buf, cfg32)
    lc16 = critic_loss(critic, buf, cfg16)
    np.testing.assert_allclose(float(lc16), float(lc32), rtol=2e-2, atol=2e-2)

    # Full update phase: both precisions train from the same start to
    # nearby parameters (and all-f32 state dtypes are preserved).
    env = make_small_env()
    m32 = make_mappo(cfg32, env, NormalizerConfig(), ScalerConfig())
    m16 = make_mappo(cfg16, env, NormalizerConfig(), ScalerConfig())
    ts, env_state = m32.init(jax.random.PRNGKey(5))
    _, buf2, _ = jax.jit(m32.collect)(ts, env_state, jax.random.PRNGKey(6))
    ts32, _ = jax.jit(m32.train_actor)(ts, buf2)
    ts16, _ = jax.jit(m16.train_actor)(ts, buf2)
    for p32, p16 in zip(jax.tree.leaves(ts32.actor), jax.tree.leaves(ts16.actor)):
        assert p16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                                   rtol=0.1, atol=5e-3)


def test_gae_mode_runs():
    cfg = small_cfg(faithful=False, use_gae=True)
    mappo = make_mappo(cfg, make_small_env(), NormalizerConfig(), ScalerConfig())
    ts, env_state = mappo.init(jax.random.PRNGKey(5))
    env_state, buf, _ = jax.jit(mappo.collect)(ts, env_state, jax.random.PRNGKey(6))
    ts, losses = jax.jit(mappo.train_actor)(ts, buf)
    assert np.isfinite(np.asarray(losses)).all()


def test_train_many_matches_sequential_repeats():
    """train_many(n) must produce exactly the same final state and metrics
    as n sequential (collect -> actor -> critic) repeats with the same
    per-repeat fold_in streams."""
    import jax

    from marlnav_tpu.config import (
        EnvParams,
        MAPPOConfig,
        NormalizerConfig,
        ScalerConfig,
        TriangleInitConfig,
    )
    from marlnav_tpu.env import make_env

    p, t, n = 8, 10, 3
    cfg = MAPPOConfig(num_parallel=p, buffer_len=t, batch_size=5,
                      num_epochs=2, num_total=t * p * n, hidden_size=16)
    env = make_env(EnvParams(num_parallel=p, episode_len=6),
                   TriangleInitConfig(num_parallel=p, num_obstacles=3), None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts0, es0 = mappo.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    # Sequential host loop.
    ts, es = ts0, es0
    seq_rews = []
    for r in range(n):
        es, buf, met = jax.jit(mappo.collect)(
            ts, es, jax.random.fold_in(rng, r))
        ts, _ = jax.jit(mappo.train_actor)(ts, buf)
        ts, _ = jax.jit(mappo.train_critic)(ts, buf)
        seq_rews.append(float(met.mean_rew))

    ts2, es2, mets, al, cl = jax.jit(mappo.train_many, static_argnums=3)(
        ts0, es0, rng, n)
    np.testing.assert_allclose(np.asarray(mets.mean_rew), seq_rews,
                               rtol=1e-5, atol=1e-5)
    assert al.shape[0] == n and cl.shape[0] == n
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(es), jax.tree.leaves(es2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_train_driver_jit_repeats(tmp_path, monkeypatch):
    """The training driver with --jit-repeats logs the same number of
    per-repeat entries as the host loop."""
    monkeypatch.chdir(tmp_path)
    from marlnav_tpu.config import resolve_run_config
    from marlnav_tpu.train import train
    from marlnav_tpu.__main__ import build_parser

    args = build_parser().parse_args(
        ["-np", "4", "-nt", "320", "-bl", "20", "-bs", "10", "-ne", "2",
         "-se", "3"])  # 4 repeats
    cfg = resolve_run_config(args)
    _, _, logger = train(cfg, verbose=False, jit_repeats=3)
    assert len(logger.logs["mean_rews"]) == 4
    assert len(logger.logs["actor"]) == 4 * 2 * 2  # repeats x epochs x mbs


def test_train_driver_jit_repeats_checkpoints_and_validation(tmp_path,
                                                             monkeypatch):
    """Periodic checkpoints must fire when a block crosses the interval
    even if block ends never land on a multiple; jit_repeats < 1 rejects."""
    monkeypatch.chdir(tmp_path)
    import os

    import pytest as _pytest

    from marlnav_tpu.config import resolve_run_config
    from marlnav_tpu.train import train
    from marlnav_tpu.__main__ import build_parser

    args = build_parser().parse_args(
        ["-np", "4", "-nt", "560", "-bl", "20", "-bs", "10", "-ne", "1",
         "-se", "3"])  # 7 repeats
    cfg = resolve_run_config(args)
    ckpt_dir = str(tmp_path / "ck")
    train(cfg, verbose=False, jit_repeats=3, checkpoint_dir=ckpt_dir,
          checkpoint_interval=2, output_root=str(tmp_path / "a"))
    # Blocks end at repeats 2, 5, 6(tail); intervals 0,2,4,6 all covered:
    # every block crosses a multiple of 2, so every block saved.
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert steps == [2, 5, 6]

    with _pytest.raises(ValueError):
        train(cfg, verbose=False, jit_repeats=0)


def test_associative_returns_match_sequential():
    """The O(log T) associative returns/GAE forms (round 5, the fused
    collect's default post-kernel tail) equal the sequential reverse
    scans at reassociation tolerance — operand order in the affine
    suffix combine is pinned HERE (it is not a convention: the wrong
    order errs O(1), see _affine_suffix_scan)."""
    import jax

    from marlnav_tpu.algo.mappo import (
        discounted_returns,
        discounted_returns_assoc,
        gae_advantages,
        gae_advantages_assoc,
        reference_returns,
        reference_returns_assoc,
    )
    from marlnav_tpu.config import MAPPOConfig

    t, p, gamma, lam = 1000, 64, 0.99, 0.95
    rew = 1e3 * jax.random.normal(jax.random.PRNGKey(0), (t, p))
    done = jax.random.bernoulli(jax.random.PRNGKey(1), 0.02, (t, p))
    vals = jax.random.normal(jax.random.PRNGKey(2), (t, p))
    last = jax.random.normal(jax.random.PRNGKey(3), (p,))

    r_seq = discounted_returns(rew, done, gamma)
    r_asc = discounted_returns_assoc(rew, done, gamma)
    scale = float(jnp.max(jnp.abs(r_seq)))
    np.testing.assert_allclose(np.asarray(r_asc), np.asarray(r_seq),
                               atol=2e-5 * scale, rtol=0)

    cfg = MAPPOConfig(num_parallel=p, buffer_len=t, batch_size=t,
                      num_epochs=1, num_total=t * p)
    n_seq, m_seq = reference_returns(rew, done, cfg)
    n_asc, m_asc = reference_returns_assoc(rew, done, cfg)
    np.testing.assert_allclose(float(m_asc), float(m_seq), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(n_asc), np.asarray(n_seq),
                               atol=1e-4, rtol=0)  # z-normed, O(1) scale

    g_seq = gae_advantages(rew, done, vals, last, gamma, lam)
    g_asc = gae_advantages_assoc(rew, done, vals, last, gamma, lam)
    scale_g = float(jnp.max(jnp.abs(g_seq)))
    np.testing.assert_allclose(np.asarray(g_asc), np.asarray(g_seq),
                               atol=2e-5 * scale_g, rtol=0)

    # degenerate shapes: T=1 and all-done
    r1 = discounted_returns_assoc(rew[:1], done[:1], gamma)
    np.testing.assert_allclose(np.asarray(r1),
                               np.asarray(discounted_returns(rew[:1],
                                                             done[:1],
                                                             gamma)))
    alldone = jnp.ones_like(done, bool)
    np.testing.assert_array_equal(
        np.asarray(discounted_returns_assoc(rew, alldone, gamma)), 0.0)
