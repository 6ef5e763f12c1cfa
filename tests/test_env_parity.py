"""Golden-trajectory parity: the rebuilt env must reproduce the reference.

Fixtures in tests/goldens/ were produced by RUNNING the upstream reference
(see tests/make_goldens.py) on its RNG-free scenarios, so every step is
deterministic and the comparison is tight float32 (the two frameworks'
op implementations differ in last-ulp rounding, hence tolerances rather
than bit equality; SURVEY.md §7 "hard parts").

Covered end-to-end per step, for hundreds of steps per scenario:
observations (all 6 channels), rewards, terminated/truncated flags,
post-reinit states, and the episode-ending stats counters — across
truncation (sn0), collision + target-reach + delayed-terminate latch
(sn1, tri_fix) and auto-reset.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlnav_tpu.config import (
    ConstantSamplerConfig,
    EnvParams,
    MockInitConfig,
    MockSamplerConfig,
    mock_init_scenario,
)
from marlnav_tpu.env import make_env

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

OBS_FIELDS = [
    "target_angle",
    "target_distance",
    "obstacles_angles",
    "obstacles_distances",
    "others_angles",
    "others_distances",
]


def _tri_fix_init() -> MockInitConfig:
    """Same fixed scenario as tests/make_goldens.py golden_tri_fix."""
    pos_const = 0.5 * 40.0
    r3 = math.sqrt(3.0)
    base = [[-1 / r3, 1.0], [2 / r3, 0.0], [-1 / r3, -1.0]]
    agents = tuple(
        (150.0 + pos_const * bx, 375.0 + pos_const * by, 1.0, 0.0, 3.0)
        for bx, by in base
    )
    obstacles0 = ((700.0, 375.0), (600.0, 100.0), (900.0, 600.0))
    obstacles1 = ((700.0, 100.0), (600.0, 650.0), (900.0, 625.0))
    return MockInitConfig(
        states=(agents, agents),
        obstacles=(obstacles0, obstacles1),
        target=(((1350.0, 375.0),), ((1350.0, 375.0),)),
    )


def _run_env(env, sampler, num_steps):
    """Roll the env for num_steps with the scripted sampler, jitted as one
    lax.scan — the same code path the training rollout uses."""

    def body(state, t):
        actions = sampler(t)
        state, out = env.step(state, actions)
        return state, (out.obs, out.rewards, out.terminated, out.truncated,
                       state.states)

    state = env.init(jax.random.PRNGKey(0))
    state, (obs, rew, term, trunc, states) = jax.lax.scan(
        body, state, jnp.arange(num_steps, dtype=jnp.int32)
    )
    return state, obs, rew, term, trunc, states


CASES = {
    "sn0": dict(
        init=lambda: mock_init_scenario(0),
        sampler=MockSamplerConfig(num=0),
        num_obstacles=1,
        steps=400,
    ),
    "sn1": dict(
        init=lambda: mock_init_scenario(1),
        sampler=MockSamplerConfig(num=1),
        num_obstacles=1,
        steps=400,
    ),
    "tri_fix": dict(
        init=_tri_fix_init,
        sampler=ConstantSamplerConfig(num_parallel=2, num_agents=3),
        num_obstacles=3,
        steps=300,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_parity(name):
    case = CASES[name]
    golden = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    params = EnvParams(num_parallel=2, num_obstacles=case["num_obstacles"])
    env = make_env(params, case["init"](), case["sampler"])

    state, obs, rew, term, trunc, states = jax.jit(
        lambda: _run_env(env, env.sample_actions, case["steps"])
    )()

    np.testing.assert_array_equal(np.asarray(term), golden["terminated"])
    np.testing.assert_array_equal(np.asarray(trunc), golden["truncated"])

    # Positions grow to ~1e3; distances/angles are float32 — compare with a
    # tight absolute+relative tolerance.
    for i, field in enumerate(OBS_FIELDS):
        np.testing.assert_allclose(
            np.asarray(obs[i]), golden[field], rtol=2e-5, atol=2e-3,
            err_msg=f"{name}:{field}",
        )
    np.testing.assert_allclose(
        np.asarray(states), golden["states"], rtol=2e-5, atol=2e-3,
        err_msg=f"{name}:states",
    )
    np.testing.assert_allclose(
        np.asarray(rew), golden["rewards"], rtol=2e-5, atol=2e-3,
        err_msg=f"{name}:rewards",
    )

    assert int(state.stats.num_trunc) == int(golden["num_trunc"])
    assert int(state.stats.num_col) == int(golden["num_col"])
    assert int(state.stats.num_tar) == int(golden["num_tar"])
