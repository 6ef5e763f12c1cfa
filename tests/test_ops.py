"""Fused Pallas rollout kernel: parity, reset semantics, RNG quality.

All tests run the kernel in TPU-semantics interpret mode on CPU
(``interpret=True`` -> pltpu.InterpretParams), the Pallas analogue of the
virtual-device mesh used by the sharding tests.

Long-horizon bit parity with the XLA path is impossible by construction:
the dynamics are chaotic, so last-ulp differences between transcendental
implementations (e.g. the kernel's Hastings acos vs XLA's) compound and
eventually flip discrete reward flags.  Strategy instead:
  * short-horizon (10-step) trajectory parity at tight tolerance with
    deterministic (policy-mean) actions;
  * exact semantic checks of the auto-reset path (truncation-driven, so
    no drift sensitivity);
  * distribution tests for the in-kernel PRNG (Box-Muller normals,
    uniform obstacle redraws).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from marlnav_tpu.config import (
    EnvParams,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.models import actor_apply, actor_init
from marlnav_tpu.ops import (
    env_state_to_rows,
    make_fused_rollout,
    rows_to_env_arrays,
)
from marlnav_tpu.utils.transforms import make_action_scaler, make_obs_normalizer

P, A, O = 1024, 3, 3


def build(episode_len=200):
    ep = EnvParams(num_parallel=P, num_agents=A, episode_len=episode_len)
    icfg = TriangleInitConfig(num_parallel=P, num_obstacles=O)
    env = make_env(ep, icfg, None)
    return ep, icfg, env


def xla_mean_rollout(env, actor, s0, num_steps):
    normalize = make_obs_normalizer(NormalizerConfig(num_agents=A))
    scale_up = make_action_scaler(ScalerConfig())

    def roll(s):
        obs0 = normalize(env.observations(s))

        def body(carry, _):
            s, obs = carry
            mean, _ = actor_apply(actor, obs)
            acts = scale_up(mean.reshape(P, A, 2))
            s, out = env.step(s, acts)
            return (s, normalize(out.obs)), out.rewards

        (s, _), r = jax.lax.scan(body, (s, obs0), None, length=num_steps)
        return s, r

    return jax.jit(roll)(s0)


def test_row_state_roundtrip():
    _, _, env = build()
    s0 = env.init(jax.random.PRNGKey(0))
    rows = env_state_to_rows(s0)
    st, ob, tg, sn, lat = rows_to_env_arrays(rows)
    np.testing.assert_array_equal(np.asarray(st), np.asarray(s0.states))
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(s0.obstacles))
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(s0.target))
    np.testing.assert_array_equal(np.asarray(sn), np.asarray(s0.step_num))
    np.testing.assert_array_equal(np.asarray(lat), np.asarray(s0.terminates))


def test_short_horizon_parity_vs_xla():
    """Policy-mean steps match the XLA path: ONE step tightly (the
    per-step math contract), 10 steps at a tolerance that admits the
    kernel's bounded-trig polynomials (step_math.sin_pi/cos_pi, round
    5): their <=6e-7 deviation from the XLA env's jnp trig compounds
    through the full policy-feedback loop — a random actor steers up to
    +-pi per step, so per-step heading deltas of ~1e-6 rad amplify over
    10 steps to ~1e-4-relative position drift on a handful of envs
    (worst observed 2.1e-4 rel on 1/15360 elements).  Real physics or
    layout bugs are O(1); the widened band loses no detection power."""
    ep, icfg, env = build()
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    s0 = env.init(jax.random.PRNGKey(0))

    s_ref1, r_ref1 = xla_mean_rollout(env, actor, s0, 1)
    fused1 = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                                ScalerConfig(), 1,
                                deterministic_actions=True, interpret=True)
    rows1, r_f1 = fused1(env_state_to_rows(s0), actor, 7)
    np.testing.assert_allclose(np.asarray(r_f1), np.asarray(r_ref1),
                               rtol=1e-5, atol=1e-3)
    st1, *_ = rows_to_env_arrays(rows1)
    np.testing.assert_allclose(np.asarray(st1), np.asarray(s_ref1.states),
                               rtol=1e-5, atol=1e-4)

    s_ref, r_ref = xla_mean_rollout(env, actor, s0, 10)
    fused = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), 10,
                               deterministic_actions=True, interpret=True)
    rows_f, r_fused = fused(env_state_to_rows(s0), actor, 7)
    np.testing.assert_allclose(np.asarray(r_fused), np.asarray(r_ref),
                               rtol=1e-3, atol=5e-2)
    st, *_ = rows_to_env_arrays(rows_f)
    np.testing.assert_allclose(np.asarray(st), np.asarray(s_ref.states),
                               rtol=1e-3, atol=5e-2)


def test_group_soft_shaping_parity_vs_xla():
    """The potential-based group-convergence shaping
    (10-step tolerance matches test_short_horizon_parity_vs_xla: the
    bounded-trig polynomials compound through the feedback loop)
    (EnvParams.group_soft_factor, TPU-native extension, default off)
    matches between the fused kernel and the XLA env path, and shifts
    rewards by exactly factor * (prev_max_d - new_max_d) / init_dist."""
    ep = EnvParams(num_parallel=P, num_agents=A, group_soft_factor=700.0)
    icfg = TriangleInitConfig(num_parallel=P, num_obstacles=O)
    env = make_env(ep, icfg, None)
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    s0 = env.init(jax.random.PRNGKey(0))
    s_ref, r_ref = xla_mean_rollout(env, actor, s0, 10)

    fused = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), 10,
                               deterministic_actions=True, interpret=True)
    rows_f, r_fused = fused(env_state_to_rows(s0), actor, 7)
    np.testing.assert_allclose(np.asarray(r_fused), np.asarray(r_ref),
                               rtol=1e-3, atol=5e-2)
    st, *_ = rows_to_env_arrays(rows_f)
    np.testing.assert_allclose(np.asarray(st), np.asarray(s_ref.states),
                               rtol=1e-3, atol=5e-2)

    # The term is really present and has the potential form: vs the
    # unshaped env, step-1 rewards differ by
    # factor * (prev_max_d - new_max_d) / init_dist (step 1 sees
    # identical states in both runs, so one step pins the formula).
    ep0 = EnvParams(num_parallel=P, num_agents=A)
    env0 = make_env(ep0, icfg, None)
    _, r0 = xla_mean_rollout(env0, actor, s0, 1)
    diff = np.asarray(r_ref[0]) - np.asarray(r0[0])
    from marlnav_tpu.models import actor_apply as _apply
    from marlnav_tpu.utils.transforms import (make_action_scaler,
                                              make_obs_normalizer)
    norm = make_obs_normalizer(NormalizerConfig(num_agents=A))
    mean, _ = _apply(actor, norm(env.observations(s0)))
    acts = make_action_scaler(ScalerConfig())(mean.reshape(P, A, 2))
    _, out = jax.jit(env0.step)(s0, acts)
    new_max = np.asarray(out.obs.target_distance[:, :, 0]).max(axis=1)
    delta0 = np.asarray(s0.states[:, :, :2]) - np.asarray(s0.target)  # (P,1,2)
    prev_max = np.sqrt((delta0 ** 2).sum(-1)).max(axis=1)
    np.testing.assert_allclose(diff, 700.0 * (prev_max - new_max)
                               / ep.init_dist, rtol=1e-4, atol=1e-3)


def host_noise(key, num_steps, num_envs, n_draws=2 * A + 2 * O):
    """Host-side uniform noise feed for interpret-mode tests (in-kernel
    prng_random_bits is broken under the interpreter in this jax version —
    returns zeros — so tests inject uniforms through ``noise_input``)."""
    return jax.random.uniform(
        key, (num_steps, n_draws, 8, num_envs // 8), jnp.float32)


def tile_to_env(tile):
    """(8, nb*128) noise/output tile -> (P,) env order (fused_rollout.untile
    mapping: env p <-> (block p//1024, sublane (p%1024)//128, lane p%128))."""
    nb = tile.shape[1] // 128
    return np.asarray(tile).reshape(8, nb, 128).transpose(1, 0, 2).reshape(-1)


def test_truncation_reset_semantics():
    """episode_len=4: every env truncates deterministically at step 4 and
    must come back as a fresh triangle draw with step_num 0."""
    ep, icfg, env = build(episode_len=4)
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    s0 = env.init(jax.random.PRNGKey(0))

    fused = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), 4,
                               deterministic_actions=True, interpret=True,
                               noise_input=True)
    rows_f, _ = fused(env_state_to_rows(s0), actor, 7,
                      noise=host_noise(jax.random.PRNGKey(5), 4, P))
    st, ob, tg, sn, lat = rows_to_env_arrays(rows_f)
    st, ob, sn = np.asarray(st), np.asarray(ob), np.asarray(sn)

    # All envs reset: step_num back to 0, agents on the triangle.
    assert (sn == 0).all()
    pos_const = 0.5 * icfg.ags_dist
    r3 = math.sqrt(3.0)
    expect = np.asarray([
        [icfg.ags_cent_x - pos_const / r3, icfg.ags_cent_y + pos_const],
        [icfg.ags_cent_x + 2 * pos_const / r3, icfg.ags_cent_y],
        [icfg.ags_cent_x - pos_const / r3, icfg.ags_cent_y - pos_const],
    ], np.float32)
    np.testing.assert_allclose(st[:, :, :2], np.broadcast_to(expect, (P, A, 2)),
                               atol=1e-3)
    np.testing.assert_allclose(st[:, :, 2], 1.0, atol=1e-6)  # heading (1,0)
    np.testing.assert_allclose(st[:, :, 3], 0.0, atol=1e-6)
    np.testing.assert_allclose(st[:, :, 4], icfg.init_speed, atol=1e-6)
    # Obstacles redrawn inside the configured rectangle.
    assert (ob[:, :, 0] >= icfg.obst_min_x).all()
    assert (ob[:, :, 0] <= icfg.obst_max_x).all()
    assert (ob[:, :, 1] >= icfg.obst_min_y).all()
    assert (ob[:, :, 1] <= icfg.obst_max_y).all()
    # Fresh draws must differ across envs (not a constant fill).
    assert np.std(ob[:, 0, 0]) > 10.0


def test_noisy_ags_reset_exact():
    """noisy_ags resets: after a deterministic truncation, every env's
    fresh agents must carry EXACTLY the Gaussian position noise and the
    heading rotation implied by the injected reset uniforms, matching the
    XLA initializer math (env/initializers.py <- reference
    utils.py:370-388)."""
    ep = EnvParams(num_parallel=P, num_agents=A, episode_len=4)
    icfg = TriangleInitConfig(num_parallel=P, num_obstacles=O,
                              noisy_ags=True)
    env = make_env(ep, icfg, None)
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    s0 = env.init(jax.random.PRNGKey(0))

    n_draws = 2 * A + 2 * O + 3 * A
    noise = host_noise(jax.random.PRNGKey(5), 4, P, n_draws=n_draws)
    fused = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), 4,
                               deterministic_actions=True, interpret=True,
                               noise_input=True)
    rows_f, _ = fused(env_state_to_rows(s0), actor, 7, noise=noise)
    st, ob, tg, sn, lat = rows_to_env_arrays(rows_f)
    st = np.asarray(st)
    assert (np.asarray(sn) == 0).all()  # all envs truncated + reset

    # Reconstruct the expected reset from the last step's reset draws
    # (slots 2A.. of t=3), exactly as StepMath.reset_blend consumes them.
    from marlnav_tpu.ops.step_math import box_muller

    u = np.stack([tile_to_env(np.asarray(noise[3, 2 * A + k]))
                  for k in range(2 * O + 3 * A)])  # (draws, P)
    pos_const = 0.5 * icfg.ags_dist
    r3 = math.sqrt(3.0)
    base = np.asarray([
        [icfg.ags_cent_x - pos_const / r3, icfg.ags_cent_y + pos_const],
        [icfg.ags_cent_x + 2 * pos_const / r3, icfg.ags_cent_y],
        [icfg.ags_cent_x - pos_const / r3, icfg.ags_cent_y - pos_const],
    ], np.float32)
    pos_std = icfg.ags_dist * math.sqrt(icfg.ags_std)
    k = 2 * O
    for i in range(A):
        z0, z1 = box_muller(jnp.asarray(u[k + 3 * i]),
                            jnp.asarray(u[k + 3 * i + 1]))
        ang = icfg.angle_range * (u[k + 3 * i + 2] - 0.5)
        np.testing.assert_allclose(st[:, i, 0],
                                   base[i, 0] + pos_std * np.asarray(z0),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(st[:, i, 1],
                                   base[i, 1] + pos_std * np.asarray(z1),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(st[:, i, 2], np.cos(ang),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(st[:, i, 3], np.sin(ang),
                                   rtol=1e-5, atol=1e-5)
    # Headings actually vary (the noise is live, not a constant fill).
    assert np.std(st[:, 0, 3]) > 0.05
    np.testing.assert_allclose(st[:, :, 4], icfg.init_speed, atol=1e-6)


def test_sampled_actions_distribution():
    """With sampling on, trajectories stay finite and differ per seed;
    rewards distribution roughly matches the XLA sampled path."""
    ep, icfg, env = build()
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    s0 = env.init(jax.random.PRNGKey(0))
    rows0 = env_state_to_rows(s0)

    fused = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), 20, interpret=True,
                               noise_input=True)
    n1 = host_noise(jax.random.PRNGKey(5), 20, P)
    n2 = host_noise(jax.random.PRNGKey(6), 20, P)
    _, r1 = fused(rows0, actor, 7, noise=n1)
    _, r1b = fused(rows0, actor, 7, noise=n1)
    _, r2 = fused(rows0, actor, 7, noise=n2)
    r1, r1b, r2 = np.asarray(r1), np.asarray(r1b), np.asarray(r2)
    assert np.isfinite(r1).all() and np.isfinite(r2).all()
    np.testing.assert_array_equal(r1, r1b)  # same noise -> bit-identical
    assert not np.allclose(r1, r2)  # different noise -> different rollouts

    # Compare against the deterministic-mean rollout: sampled mean reward
    # should sit near it (noise is small early on).
    det = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                             ScalerConfig(), 20,
                             deterministic_actions=True, interpret=True,
                             noise_input=True)
    _, r_mean = det(rows0, actor, 7, noise=n1)
    assert abs(r1.mean() - np.asarray(r_mean).mean()) < 30.0


def test_box_muller_statistics():
    """The kernel's normal-generation math (bits -> uniform -> Box-Muller)
    has ~N(0,1) moments.  Tested as pure functions on host bits — the exact
    code the kernel traces."""
    from marlnav_tpu.ops.fused_rollout import _bits_to_uniform, _box_muller

    bits = jax.random.bits(jax.random.PRNGKey(3), (2, 65536),
                           jnp.uint32).astype(jnp.int32)
    u1, u2 = _bits_to_uniform(bits)
    assert float(u1.min()) >= 0.0 and float(u1.max()) < 1.0
    z0, z1 = _box_muller(u1, u2)
    z = np.concatenate([np.asarray(z0), np.asarray(z1)])
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    assert abs((np.abs(z) < 1.0).mean() - 0.6827) < 0.01


def test_kernel_acos_accuracy():
    from marlnav_tpu.ops.fused_rollout import _acos

    x = jnp.linspace(-1.0, 1.0, 100001)
    err = jnp.max(jnp.abs(_acos(x) - jnp.arccos(x)))
    assert float(err) < 5e-7


def test_rejects_unsupported_configs():
    ep, icfg, _ = build()
    # noisy_ags is supported since round 2 (test_noisy_ags_reset_exact);
    # non-3-agent (mock/diagnostic) scenarios remain XLA-only.
    with pytest.raises(NotImplementedError):
        make_fused_rollout(
            EnvParams(num_parallel=P, num_agents=2),
            icfg, NormalizerConfig(), ScalerConfig(), 4)
    fused = make_fused_rollout(ep, icfg, NormalizerConfig(), ScalerConfig(), 4)
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    bad = jax.tree.map(lambda x: x[..., :100], env_state_to_rows(
        make_env(ep, icfg, None).init(jax.random.PRNGKey(0))))
    with pytest.raises(ValueError):
        fused(bad, actor, 0)


def test_sharded_fused_rollout_matches_unsharded():
    """shard_map over a 2-device 'data' axis is bit-identical to the
    single-program kernel when fed the same host noise (rollouts have no
    cross-device communication, so sharding must not change semantics)."""
    from marlnav_tpu.ops.sharded import make_sharded_fused_rollout
    from marlnav_tpu.parallel import make_mesh

    p_env, t = 2048, 4
    ep = EnvParams(num_parallel=p_env, num_agents=A, episode_len=4)
    icfg = TriangleInitConfig(num_parallel=p_env, num_obstacles=O)
    env = make_env(ep, icfg, None)
    actor = actor_init(jax.random.PRNGKey(1), ep.obs_size, 50, 2)
    rows0 = env_state_to_rows(env.init(jax.random.PRNGKey(0)))
    noise = host_noise(jax.random.PRNGKey(5), t, p_env)

    kw = dict(deterministic_actions=True, interpret=True, noise_input=True)
    mesh = make_mesh(num_data=2, num_model=1, devices=jax.devices()[:2])
    sharded = make_sharded_fused_rollout(
        ep, icfg, NormalizerConfig(num_agents=A), ScalerConfig(), t, mesh,
        **kw)
    rows_s, rew_s = sharded(rows0, actor, 7, noise=noise)
    plain = make_fused_rollout(ep, icfg, NormalizerConfig(num_agents=A),
                               ScalerConfig(), t, **kw)
    rows_p, rew_p = plain(rows0, actor, 7, noise=noise)

    np.testing.assert_array_equal(np.asarray(rew_s), np.asarray(rew_p))
    for got, want in zip(rows_s, rows_p):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert not rew_s.sharding.is_fully_replicated

    with pytest.raises(ValueError):
        sharded(jax.tree.map(lambda x: x[..., :1024], rows0), actor, 7,
                noise=noise)


def test_bounded_trig_polynomials():
    """sin_pi/cos_pi (round 5): |err| <= 7e-7 across [-pi, pi] in f32 —
    the kernels' replacement for the ~130x-costlier generic cos/sin
    lowering (scripts/roofline.py measurement).  Also pins the
    box_muller range-shift identity (theta-pi negation fold)."""
    import numpy as np

    from marlnav_tpu.ops.step_math import box_muller, cos_pi, sin_pi

    x = jnp.asarray(np.linspace(-np.pi, np.pi, 200_001), jnp.float32)
    np.testing.assert_allclose(np.asarray(sin_pi(x)),
                               np.sin(np.asarray(x, np.float64)),
                               atol=7e-7, rtol=0)
    np.testing.assert_allclose(np.asarray(cos_pi(x)),
                               np.cos(np.asarray(x, np.float64)),
                               atol=7e-7, rtol=0)

    u1 = jnp.asarray(np.linspace(1e-6, 1 - 1e-6, 4001), jnp.float32)
    u2 = jnp.asarray(np.linspace(0.0, 1 - 1e-6, 4001), jnp.float32)
    z0, z1 = box_muller(u1, u2)
    r = np.sqrt(-2.0 * np.log(np.maximum(np.asarray(u1, np.float64), 1e-12)))
    th = 2.0 * np.pi * np.asarray(u2, np.float64)
    np.testing.assert_allclose(np.asarray(z0), r * np.cos(th),
                               atol=4e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z1), r * np.sin(th),
                               atol=4e-5, rtol=1e-5)
