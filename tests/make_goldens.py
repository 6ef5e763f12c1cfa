"""Generate golden parity fixtures by RUNNING the reference implementation.

This script executes the upstream MARL-nav reference (PyTorch, CPU) on its
deterministic scenarios and records per-step observations / rewards /
termination flags / states to ``tests/goldens/*.npz``.  The fixtures are
pure data — the rebuild's parity tests assert against them without ever
importing torch at test time.

Scenarios (all RNG-free, hence exactly reproducible — SURVEY.md §4):
  sn0      mock init 0 + mock sampler 0 (straight lines, one max-decel agent)
  sn1      mock init 1 + mock sampler 1 (circular orbits)
  tri_fix  triangle agent geometry with FIXED obstacles + constant sampler:
           env 0 collides with an obstacle mid-path; env 1 has a clear path
           and reaches the target disk, exercising the delayed-terminate
           latch and auto-reset.

Run:  python tests/make_goldens.py
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
from marlnav.environment import Env  # noqa: E402
from marlnav.utils import (  # noqa: E402
    mock_params0,
    mock_params1,
    sampler0_params,
    sampler1_params,
)

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "goldens")

BASE_ENV = dict(
    device="cpu",
    num_agents=3,
    max_step=1000,
    episode_len=200,
    min_speed=3.0,
    max_speed=10.0,
    min_accel=-0.5,
    max_accel=0.5,
    risk_factor=0.0,
    distance_factor=0.0,
    heading_factor=500.0,
    target_factor=500.0,
    soft_factor=500.0,
    bond_factor=10.0,
)


def run(env, num_steps):
    rec = {k: [] for k in [
        "target_angle", "target_distance", "obstacles_angles",
        "obstacles_distances", "others_angles", "others_distances",
        "rewards", "terminated", "truncated", "states",
    ]}
    for _ in range(num_steps):
        actions = env.sample_actions()
        obs, rew, term, trunc = env.step(actions)
        for name in rec:
            if name == "rewards":
                rec[name].append(rew.numpy().copy())
            elif name == "terminated":
                rec[name].append(term.numpy().copy())
            elif name == "truncated":
                rec[name].append(trunc.numpy().copy())
            elif name == "states":
                rec[name].append(env.states.numpy().copy())
            else:
                rec[name].append(getattr(obs, name).numpy().copy())
    out = {k: np.stack(v) for k, v in rec.items()}
    out["num_trunc"] = np.int64(env._num_trunc)
    out["num_col"] = np.int64(env._num_col)
    out["num_tar"] = np.int64(env._num_tar)
    return out


def golden_mock(num, steps=400):
    init = dict(mock_params0 if num == 0 else mock_params1)
    init["device"] = "cpu"
    sampler = dict(sampler0_params if num == 0 else sampler1_params)
    sampler["device"] = "cpu"
    sampler["max_step"] = steps
    params = dict(BASE_ENV)
    params.update(
        num_parallel=2,
        # CLI default is 3, but the mock arrays carry 1 obstacle; the
        # reference's out-of-range slices silently vanish, so effective O=1
        # (SURVEY.md §2.3).  Pass 1 to make the reference loops well-formed;
        # the produced observations are identical.
        num_obstacles=1,
        init=init,
        sampler=sampler,
    )
    env = Env(params)
    data = run(env, steps)
    np.savez_compressed(os.path.join(OUT, f"sn{num}.npz"), **data)
    print(f"sn{num}: states {data['states'].shape}, "
          f"trunc={data['num_trunc']}, col={data['num_col']}, tar={data['num_tar']}")


def triangle_mock_init():
    """Triangle agent geometry (as TriangleIntitializer computes it,
    reference utils.py:349-368) + hand-picked fixed obstacles."""
    pos_const = 0.5 * 40.0
    r3 = math.sqrt(3.0)
    base = [[-1 / r3, 1.0], [2 / r3, 0.0], [-1 / r3, -1.0]]
    agents = [
        [150.0 + pos_const * bx, 375.0 + pos_const * by, 1.0, 0.0, 3.0]
        for bx, by in base
    ]
    # env 0: obstacle directly on the corridor -> collision termination.
    # env 1: obstacles far off the corridor -> clear run to the target.
    obstacles0 = [[700.0, 375.0], [600.0, 100.0], [900.0, 600.0]]
    obstacles1 = [[700.0, 100.0], [600.0, 650.0], [900.0, 625.0]]
    return {
        "init_method": "mock_init",
        "device": "cpu",
        "mock_states": [agents, agents],
        "mock_obstacles": [obstacles0, obstacles1],
        "mock_target": [[[1350.0, 375.0]], [[1350.0, 375.0]]],
    }


def golden_tri_fix(steps=300):
    params = dict(BASE_ENV)
    params.update(
        num_parallel=2,
        num_obstacles=3,
        init=triangle_mock_init(),
        sampler={
            "sample_method": "const_sampler",
            "num_parallel": 2,
            "num_agents": 3,
            "device": "cpu",
        },
    )
    env = Env(params)
    data = run(env, steps)
    np.savez_compressed(os.path.join(OUT, "tri_fix.npz"), **data)
    print(f"tri_fix: states {data['states'].shape}, "
          f"trunc={data['num_trunc']}, col={data['num_col']}, tar={data['num_tar']}")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    torch.manual_seed(0)
    golden_mock(0)
    golden_mock(1)
    golden_tri_fix()
