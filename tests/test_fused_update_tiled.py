"""Tiled actor-update path (ops/fused_update_tiled.py): the kernel that
consumes the collect kernel's native tile layout must train identically
(to fp-order tolerance) to the staged fused path, and the layout
assumption must match what the collect kernel actually emits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marlnav_tpu.algo import Buffer, make_mappo
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.ops import env_state_to_rows, make_fused_collect
from marlnav_tpu.ops.fused_update_tiled import (
    TiledRollout,
    make_tiled_actor_trainer,
    make_tiled_critic_trainer,
    stage_vr_tiled,
)
from marlnav_tpu.ops.step_math import BLOCK_ENVS, LANE, SUB, StepMath

A, OBS = 3, 12
P, T = BLOCK_ENVS, 8


def tile_env_axis(x):
    """(T, rows, P) -> (T, rows, 8, NB*128), the kernel's env tiling
    (inverse of fused_rollout.untile)."""
    t, rows, p = x.shape
    nb = p // BLOCK_ENVS
    return (x.reshape(t, rows, nb, SUB, LANE).transpose(0, 1, 3, 2, 4)
            .reshape(t, rows, SUB, nb * LANE))


def tiled_from_buffer(buf):
    obs = tile_env_axis(
        buf.obs.transpose(0, 2, 3, 1).reshape(T, A * OBS, P))
    actions = tile_env_axis(
        buf.actions.transpose(0, 2, 3, 1).reshape(T, 2 * A, P))
    log_probs = tile_env_axis(
        buf.log_probs.reshape(T, P, A).transpose(0, 2, 1))
    return TiledRollout(obs, actions, log_probs)


def rand_buffer(seed):
    rng = np.random.default_rng(seed)
    return Buffer(
        obs=jnp.asarray(rng.normal(size=(T, P, A, OBS)), jnp.float32),
        actions=jnp.asarray(rng.uniform(-1, 1, (T, P, A, 2)), jnp.float32),
        log_probs=jnp.asarray(rng.normal(size=(T, P * A)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(T, P, 1)), jnp.float32),
        returns=jnp.asarray(rng.normal(size=(T, P)), jnp.float32),
        done=jnp.asarray(rng.uniform(size=(T, P)) < 0.1),
    )


def test_bd_chan_chan_structure():
    """The channel-channel block-diagonal expansion routes A[c, f] to
    exactly the (c*G+g, f*G+g) entries — the operator the channel-major
    obs rows need."""
    from marlnav_tpu.ops.fused_update_tiled import (
        _bd_chan_chan,
        _unpack_chan_chan,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 12)), jnp.float32)
    g = 8
    bd = np.asarray(_bd_chan_chan(a, g))
    for c in range(4):
        for f in range(12):
            for g1 in range(g):
                for g2 in range(g):
                    want = float(a[c, f]) if g1 == g2 else 0.0
                    assert bd[c * g + g1, f * g + g2] == want
    # unpack inverts the diagonal-block sum
    np.testing.assert_allclose(np.asarray(_unpack_chan_chan(
        jnp.asarray(bd), 4, 12, g)), np.asarray(a) * g, rtol=1e-6)


def test_time_window_divisors():
    """The cap is an explicit argument (resolved from MARLNAV_TILED_TW_CAP
    once per trainer build, never at import), so these assertions hold
    regardless of the caller's environment."""
    from marlnav_tpu.ops.fused_update_tiled import _time_window

    assert _time_window(1000, 8) == 8
    assert _time_window(999, 8) == 3  # faithful default config (T-1)
    assert _time_window(200, 8) == 8
    assert _time_window(7, 8) == 7
    assert _time_window(1, 8) == 1
    assert _time_window(999, 27) == 27  # 999 = 3^3 * 37
    assert _time_window(999, 37) == 37
    assert _time_window(200, 25) == 25


@pytest.mark.parametrize("faithful", [True, False])
def test_tiled_actor_phase_matches_staged(faithful):
    """Full tiled training phase == the staged fused train_actor, to
    fp-summation-order tolerance (same math, different row order)."""
    cfg = MAPPOConfig(num_agents=A, num_parallel=P, obs_size=OBS,
                      num_total=T * P, buffer_len=T, batch_size=T,
                      num_epochs=3, faithful=faithful, fused_updates=True)
    env = make_env(EnvParams(num_parallel=P),
                   TriangleInitConfig(num_parallel=P), None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, _ = mappo.init(jax.random.PRNGKey(0))
    buf = rand_buffer(1)
    tiled = tiled_from_buffer(buf)

    ts_ref, losses_ref = jax.jit(mappo.train_actor)(ts, buf)
    train_tiled = make_tiled_actor_trainer(cfg, interpret=True)
    ts_tiled, losses_tiled = jax.jit(train_tiled)(ts, buf, tiled)

    np.testing.assert_allclose(np.asarray(losses_tiled),
                               np.asarray(losses_ref), rtol=1e-4, atol=1e-5)
    for x, y in zip(jax.tree.leaves(ts_tiled.actor),
                    jax.tree.leaves(ts_ref.actor)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("faithful", [True, False])
def test_tiled_critic_phase_matches_staged(faithful):
    """Full tiled critic phase == the staged fused train_critic, to
    fp-summation-order tolerance (same math, different column layout)."""
    cfg = MAPPOConfig(num_agents=A, num_parallel=P, obs_size=OBS,
                      num_total=T * P, buffer_len=T, batch_size=T,
                      num_epochs=3, faithful=faithful, fused_updates=True)
    env = make_env(EnvParams(num_parallel=P),
                   TriangleInitConfig(num_parallel=P), None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, _ = mappo.init(jax.random.PRNGKey(0))
    buf = rand_buffer(2)
    tiled = tiled_from_buffer(buf)

    ts_ref, losses_ref = jax.jit(mappo.train_critic)(ts, buf)
    train_tiled = make_tiled_critic_trainer(cfg, interpret=True)
    ts_tiled, losses_tiled = jax.jit(train_tiled)(ts, buf, tiled)

    np.testing.assert_allclose(np.asarray(losses_tiled),
                               np.asarray(losses_ref), rtol=1e-4, atol=1e-5)
    for x, y in zip(jax.tree.leaves(ts_tiled.critic),
                    jax.tree.leaves(ts_ref.critic)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_stage_vr_tiled_layout():
    """stage_vr_tiled puts env p = block*1024 + sublane*128 + lane at
    [t, sublane, block*128 + lane] — the collect outputs' tiling (same
    mapping as tile_env_axis on a single-row array)."""
    t, p = 3, 2 * BLOCK_ENVS
    x = jnp.arange(t * p, dtype=jnp.float32).reshape(t, p)
    got = stage_vr_tiled(x)
    want = tile_env_axis(x[:, None, :])[:, 0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_driver_tiled_path(tmp_path, monkeypatch):
    """train(fused_collect+fused_updates, full batch) routes the ACTOR
    through the tiled trainer BY DEFAULT; the tiled CRITIC only wins at
    large env batches (v5e composed benches, BASELINE.md) so at P=1024 it
    stays staged unless MARLNAV_TILED_CRITIC=1 forces it — smoke the
    per-repeat and jit_repeats (train_many) branches end to end
    (interpret on CPU), the forced-critic run, and the opt-out staged
    path.  The routing itself is asserted by spying on the trainer
    factories: a gate regression that silently always-staged (or
    always-tiled) would fail here, not just run."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("MARLNAV_TILED_UPDATES", raising=False)
    monkeypatch.delenv("MARLNAV_TILED_CRITIC", raising=False)
    import marlnav_tpu.ops.fused_update_tiled as fut
    from marlnav_tpu.__main__ import build_parser
    from marlnav_tpu.config import resolve_run_config
    from marlnav_tpu.train import train

    built = []
    real_actor, real_critic = (fut.make_tiled_actor_trainer,
                               fut.make_tiled_critic_trainer)
    monkeypatch.setattr(fut, "make_tiled_actor_trainer",
                        lambda *a, **k: built.append("actor")
                        or real_actor(*a, **k))
    monkeypatch.setattr(fut, "make_tiled_critic_trainer",
                        lambda *a, **k: built.append("critic")
                        or real_critic(*a, **k))

    args = build_parser().parse_args(
        ["-np", "1024", "-nt", "32768", "-bl", "8", "-bs", "8",
         "-ne", "1", "-se", "3", "--fused-updates"])
    cfg = resolve_run_config(args)
    _, _, logger = train(cfg, verbose=False, fused_collect=True,
                         allow_interpret=True)
    assert built == ["actor"]  # tiled actor, staged critic at P=1024
    assert len(logger.logs["mean_rews"]) == 4
    assert np.isfinite(logger.logs["mean_rews"]).all()
    _, _, logger2 = train(cfg, verbose=False, fused_collect=True,
                          allow_interpret=True, jit_repeats=2)
    assert built == ["actor"] * 2
    assert len(logger2.logs["mean_rews"]) == 4
    assert np.isfinite(logger2.logs["mean_rews"]).all()
    # MARLNAV_TILED_CRITIC=1 forces the tiled critic at any batch size.
    monkeypatch.setenv("MARLNAV_TILED_CRITIC", "1")
    _, _, logger4 = train(cfg, verbose=False, fused_collect=True,
                          allow_interpret=True)
    assert built == ["actor"] * 2 + ["actor", "critic"]
    assert len(logger4.logs["mean_rews"]) == 4
    assert np.isfinite(logger4.logs["mean_rews"]).all()
    monkeypatch.delenv("MARLNAV_TILED_CRITIC")
    # Opt-out (any of 0/false/off) keeps the staged update path (same
    # losses modulo fp reassociation; smoke it end to end and assert the
    # tiled trainers were NOT built).
    monkeypatch.setenv("MARLNAV_TILED_UPDATES", "off")
    _, _, logger3 = train(cfg, verbose=False, fused_collect=True,
                          allow_interpret=True)
    assert built == ["actor"] * 2 + ["actor", "critic"]  # unchanged
    assert len(logger3.logs["mean_rews"]) == 4
    assert np.isfinite(logger3.logs["mean_rews"]).all()


@pytest.mark.parametrize("faithful", [True, False])
def test_tiled_trainers_mesh_matches_single_shard(faithful):
    """The tiled update path under a 2-shard data mesh (round-4 verdict
    item 3): make_tiled_{actor,critic}_trainer(mesh=...) shard_map the
    kernels over per-shard tile slices with psum'd gradient sums, and
    must train identically (to psum-reassociation tolerance) to the
    single-shard tiled trainers on the same buffers.  Faithful covers
    stage_adv_tiled's _pair_rows_sharded all_gather (the reference's
    GLOBAL flat advantage tile, reference models.py:285-286).  Both
    sides run the GENERIC Pallas interpreter — the TPU-interpret
    simulator wedges under concurrent shard threads (fused_collect.py
    notes), and generic-vs-simulator is never compared bitwise."""
    from marlnav_tpu.parallel import make_mesh

    p2 = 2 * P
    cfg2 = MAPPOConfig(num_agents=A, num_parallel=p2, obs_size=OBS,
                       num_total=T * p2, buffer_len=T, batch_size=T,
                       num_epochs=3, faithful=faithful, fused_updates=True)
    env = make_env(EnvParams(num_parallel=p2),
                   TriangleInitConfig(num_parallel=p2), None)
    mappo = make_mappo(cfg2, env, NormalizerConfig(), ScalerConfig())
    ts, _ = mappo.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(7)
    buf = Buffer(
        obs=jnp.asarray(rng.normal(size=(T, p2, A, OBS)), jnp.float32),
        actions=jnp.asarray(rng.uniform(-1, 1, (T, p2, A, 2)), jnp.float32),
        log_probs=jnp.asarray(rng.normal(size=(T, p2 * A)), jnp.float32),
        values=jnp.asarray(rng.normal(size=(T, p2, 1)), jnp.float32),
        returns=jnp.asarray(rng.normal(size=(T, p2)), jnp.float32),
        done=jnp.asarray(rng.uniform(size=(T, p2)) < 0.1),
    )
    tiled = TiledRollout(
        obs=tile_env_axis(buf.obs.transpose(0, 2, 3, 1).reshape(
            T, A * OBS, p2)),
        actions=tile_env_axis(buf.actions.transpose(0, 2, 3, 1).reshape(
            T, 2 * A, p2)),
        log_probs=tile_env_axis(buf.log_probs.reshape(T, p2, A)
                                .transpose(0, 2, 1)),
    )

    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    for make_trainer, leaf in ((make_tiled_actor_trainer, "actor"),
                               (make_tiled_critic_trainer, "critic")):
        solo = jax.jit(make_trainer(cfg2, interpret=False,
                                    generic_interpret=True))
        meshed = jax.jit(make_trainer(cfg2, interpret=False,
                                      generic_interpret=True, mesh=mesh))
        ts_s, losses_s = solo(ts, buf, tiled)
        ts_m, losses_m = meshed(ts, buf, tiled)
        np.testing.assert_allclose(np.asarray(losses_m),
                                   np.asarray(losses_s),
                                   rtol=1e-4, atol=1e-5, err_msg=leaf)
        for x, y in zip(jax.tree.leaves(getattr(ts_m, leaf)),
                        jax.tree.leaves(getattr(ts_s, leaf))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5, err_msg=leaf)


def test_collect_return_tiled_matches_buffer():
    """The TiledRollout returned by make_fused_collect(return_tiled=True)
    is exactly the env-tiling of the canonical Buffer fields — the layout
    contract the tiled kernel builds on."""
    t = 2
    cfg = MAPPOConfig(num_agents=A, num_parallel=P, obs_size=OBS,
                      num_total=t * P, buffer_len=t, batch_size=t,
                      num_epochs=1)
    ep = EnvParams(num_parallel=P)
    icfg = TriangleInitConfig(num_parallel=P)
    env = make_env(ep, icfg, None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, s0 = mappo.init(jax.random.PRNGKey(0))
    rows0 = env_state_to_rows(s0)
    sm = StepMath(ep, icfg, NormalizerConfig(), ScalerConfig())
    noise = jax.random.uniform(jax.random.PRNGKey(5),
                               (t, sm.n_draws, SUB, P // SUB), jnp.float32)
    collect = make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                 ScalerConfig(), interpret=True,
                                 noise_input=True, return_tiled=True)
    _, buf, _, tiled = collect(ts, rows0, 7, noise=noise)

    want_obs = tile_env_axis(
        buf.obs.transpose(0, 2, 3, 1).reshape(t, A * OBS, P))
    want_act = tile_env_axis(
        buf.actions.transpose(0, 2, 3, 1).reshape(t, 2 * A, P))
    want_lp = tile_env_axis(
        buf.log_probs.reshape(t, P, A).transpose(0, 2, 1))
    np.testing.assert_array_equal(np.asarray(tiled.obs), np.asarray(want_obs))
    np.testing.assert_array_equal(np.asarray(tiled.actions),
                                  np.asarray(want_act))
    np.testing.assert_array_equal(np.asarray(tiled.log_probs),
                                  np.asarray(want_lp))
