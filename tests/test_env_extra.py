"""Env behaviors beyond golden parity: noisy init distribution, seed
determinism, and the `-sn -1` constant-sampler scenario semantics."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from marlnav_tpu.config import (
    ConstantSamplerConfig,
    EnvParams,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.env.initializers import make_triangle_initializer


def rollout(env, num_steps, rng):
    """Scripted-sampler rollout as one jitted scan."""

    @jax.jit
    def run(rng):
        state = env.init(rng)

        def body(carry, step):
            state = carry
            state, out = env.step(state, env.sample_actions(step))
            return state, (state.states, out.rewards, out.terminated)

        return jax.lax.scan(body, state,
                            jnp.arange(num_steps, dtype=jnp.int32))

    return run(rng)


def test_noisy_triangle_init_distribution():
    """noisy_ags: position noise std = ags_dist*sqrt(ags_std) per coord,
    headings rotated within +-angle_range/2 and still unit length
    (reference utils.py:370-388 semantics)."""
    cfg = TriangleInitConfig(num_parallel=4096, num_obstacles=3,
                             noisy_ags=True)
    init = make_triangle_initializer(cfg)
    states, obstacles, target = init(jax.random.PRNGKey(0))
    states = np.asarray(states)

    base = make_triangle_initializer(
        TriangleInitConfig(num_parallel=4096, num_obstacles=3))
    base_states = np.asarray(base(jax.random.PRNGKey(0))[0])

    noise = states[:, :, :2] - base_states[:, :, :2]
    expect_std = cfg.ags_dist * math.sqrt(cfg.ags_std)
    assert abs(noise.std() - expect_std) / expect_std < 0.05
    assert abs(noise.mean()) < 0.5

    headings = states[:, :, 2:4]
    norms = np.linalg.norm(headings, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    angles = np.arctan2(headings[:, :, 1], headings[:, :, 0])
    half = cfg.angle_range / 2
    assert (np.abs(angles) <= half + 1e-5).all()
    assert angles.std() > 0.2 * half  # actually spread, not constant


def test_same_seed_same_trajectory():
    env = make_env(
        EnvParams(num_parallel=64, episode_len=50),
        TriangleInitConfig(num_parallel=64, num_obstacles=3),
        ConstantSamplerConfig(num_parallel=64, num_agents=3),
    )
    _, (s1, r1, t1) = rollout(env, 80, jax.random.PRNGKey(3))
    _, (s2, r2, t2) = rollout(env, 80, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    _, (s3, _, _) = rollout(env, 80, jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_constant_sampler_scenario_semantics():
    """`-sn -1`: [angle=0, accel=1] clamps to +max_accel, so agents run
    straight horizontal tracks and accelerate to max_speed
    (reference utils.py:477-485, environment.py:118-123; SURVEY.md §3.4)."""
    env = make_env(
        EnvParams(num_parallel=32, episode_len=200),
        TriangleInitConfig(num_parallel=32, num_obstacles=3),
        ConstantSamplerConfig(num_parallel=32, num_agents=3),
    )
    _, (states, rewards, term) = rollout(env, 40, jax.random.PRNGKey(0))
    states = np.asarray(states)  # (T, P, A, 5)

    # Pick envs that never finished (no collision in the first 40 steps).
    finished = np.asarray(term).any(axis=0)
    clean = ~finished
    assert clean.any()
    sc = states[:, clean]

    # y constant, heading fixed at (1, 0).
    np.testing.assert_allclose(
        sc[:, :, :, 1], np.broadcast_to(sc[0, :, :, 1], sc.shape[:3]),
        atol=1e-3)
    np.testing.assert_allclose(sc[:, :, :, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(sc[:, :, :, 3], 0.0, atol=1e-6)
    # Speed ramps 3.0 -> 10.0 at +0.5/step, then saturates.
    np.testing.assert_allclose(sc[0, :, :, 4], 3.5, atol=1e-5)
    np.testing.assert_allclose(sc[13, :, :, 4], 10.0, atol=1e-5)
    np.testing.assert_allclose(sc[-1, :, :, 4], 10.0, atol=1e-5)
    # x strictly increasing by the current speed.
    dx = np.diff(sc[:, :, :, 0], axis=0)
    np.testing.assert_allclose(dx, sc[1:, :, :, 4], atol=1e-3)


def test_mock_sampler_exhaustion_semantics():
    """The reference's scripted samplers are generators yielding exactly
    max_step tensors — one more draw raises StopIteration (reference
    utils.py:428-448).  The rebuild enforces the same bound on concrete
    step indices and at trajectory-build time."""
    import pytest

    from marlnav_tpu.config import MockSamplerConfig, mock_init_scenario
    from marlnav_tpu.diagnostics.trajectory import rollout_trajectory
    from marlnav_tpu.env.samplers import make_mock_sampler

    sampler = make_mock_sampler(MockSamplerConfig(num=0, max_step=5))
    assert sampler(4).shape == (2, 3, 2)
    with pytest.raises(StopIteration):
        sampler(5)

    init = mock_init_scenario(0)
    env = make_env(
        EnvParams(num_parallel=2, num_obstacles=1, episode_len=200),
        init, MockSamplerConfig(num=0, max_step=5))
    rollout_trajectory(env, 5, jax.random.PRNGKey(0))  # at the bound: fine
    with pytest.raises(StopIteration):
        rollout_trajectory(env, 6, jax.random.PRNGKey(0))

    # Unbounded config (library use): a total step function, as before.
    unbounded = make_mock_sampler(MockSamplerConfig(num=0))
    assert unbounded(10_000).shape == (2, 3, 2)


def test_staggered_resets_decorrelate_truncations():
    """With staggered_resets, initial phases are spread over the episode and
    truncations arrive steadily instead of in one synchronized wave."""
    p, ep_len = 512, 50
    env_s = make_env(
        EnvParams(num_parallel=p, episode_len=ep_len, staggered_resets=True),
        TriangleInitConfig(num_parallel=p, num_obstacles=3),
        ConstantSamplerConfig(num_parallel=p, num_agents=3),
    )
    s0 = env_s.init(jax.random.PRNGKey(0))
    sn = np.asarray(s0.step_num)
    assert sn.min() >= 0 and sn.max() < ep_len and np.unique(sn).size > 20

    # Default env: all envs share phase 0 -> first truncation wave is
    # synchronized; staggered env truncates a bit every step.
    @jax.jit
    def truncs(e_init):
        def body(carry, step):
            state = carry
            state, out = env_s.step(state, env_s.sample_actions(step))
            return state, jnp.sum(out.truncated)
        return jax.lax.scan(body, e_init, jnp.arange(ep_len, dtype=jnp.int32))

    _, per_step = truncs(s0)
    per_step = np.asarray(per_step)
    assert (per_step > 0).mean() > 0.9  # truncations nearly every step
    assert per_step.max() < p / 4  # no synchronized wave
