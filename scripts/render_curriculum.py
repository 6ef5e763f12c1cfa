"""Render the curriculum-trained policy reaching the target disk.

The adaptive radius curriculum (docs/curriculum_r2.md) produced the first
policy across both frameworks whose episodes end in GROUP TARGET REACHES
(all agents simultaneously inside the disk).  This script replays that
policy (docs/curriculum_r2_actor.npz, trained at the stage-5 radius 255)
over a batch of stochastic rollouts, finds an episode with a group reach,
and saves it as an animation via the standard renderer
(diagnostics/animation.py) — plus a JSON line of reach statistics.

Usage: python scripts/render_curriculum.py [--radius 255] [--envs 256]
       [--steps 200] [--weights docs/curriculum_r2_actor.npz]
       [--out docs/curriculum_policy.gif]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from marlnav_tpu.config import (
    AnimationConfig,
    EnvParams,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.diagnostics.animation import Animation, load_actor_weights
from marlnav_tpu.diagnostics.trajectory import rollout_trajectory
from marlnav_tpu.env import make_env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--radius", type=float, default=255.0)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--episode-len", type=int, default=200,
                    help="match the training truncation horizon (the r4/r5 "
                         "small-radius recipe trains at 400)")
    ap.add_argument("--weights", type=str,
                    default="docs/curriculum_r2_actor.npz")
    ap.add_argument("--out", type=str, default="docs/curriculum_policy.gif")
    ns = ap.parse_args()

    p = ns.envs
    env = make_env(EnvParams(num_parallel=p, risk_factor=250.0,
                             target_radius=ns.radius,
                             episode_len=ns.episode_len),
                   TriangleInitConfig(num_parallel=p, num_obstacles=3),
                   None)
    actor = load_actor_weights(ns.weights, env.params.obs_size)
    traj = rollout_trajectory(env, ns.steps, jax.random.PRNGKey(ns.seed),
                              actor=actor, normalizer_cfg=NormalizerConfig(),
                              scaler_cfg=ScalerConfig(), sample=True)

    # Group reach: every agent inside the disk on the same frame (the env's
    # own criterion, env/reward.py target detection).
    pos = traj.states[..., :2]  # (T, P, A, 2)
    dist = np.linalg.norm(pos - traj.target, axis=-1)  # (T, P, A)
    group_in = (dist < ns.radius).all(axis=-1)  # (T, P)
    reached = group_in.any(axis=0)  # (P,)
    stats = {
        "radius": ns.radius, "envs": p, "steps": ns.steps,
        "envs_with_group_reach": int(reached.sum()),
        "closest_group_approach": float(dist.max(axis=-1).min()),
    }
    if reached.any():
        # Episode with the earliest reach renders best.
        first_t = np.where(group_in.any(axis=1))[0][0]
        pi = int(np.where(group_in[first_t])[0][0])
        stats["rendered_env"] = pi
        stats["reach_frame"] = int(first_t)
    else:
        pi = int(dist.max(axis=-1).min(axis=0).argmin())
        stats["rendered_env"] = pi
    print(json.dumps(stats), flush=True)

    cfg = AnimationConfig(parallel_index=pi, max_step=ns.steps)
    anim = Animation(env, cfg, traj).run(show=False, save_path=None)
    anim.save(ns.out, writer="pillow", fps=25, dpi=50)
    print("wrote", ns.out, flush=True)


if __name__ == "__main__":
    main()
