"""Reward-check harness: golden-trajectory plots for scripted scenarios.

Equivalent of the reference's ``check_rews`` (reference utils.py:579-666):
step the env ``num_steps`` times with scripted actions, then save

  plots/states_array_{p}_agent_{a}.png   — 4x2 grid of 8 observation
                                           channels for one (env, agent)
  plots/rewards_B{p}A{a}T{t}H{h}D{d}R{r}S{s}.png — the reward curve

The reward filename reproduces the reference's quirk of silently dropping
the bond factor: its format string has 7 placeholders for 8 arguments
(reference utils.py:659-662; SURVEY.md §3.4 [verified]) — kept so runs
produce directly comparable artifact sets.

TPU-native difference: the trajectory is ONE jitted scan fetched once
(reference: a Python loop with 9 ``.item()`` host syncs per step,
utils.py:595-614).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from marlnav_tpu.diagnostics.trajectory import rollout_trajectory
from marlnav_tpu.env.env import Env


def _save_plot(fig, filename: str, directory: str) -> None:
    """(reference utils.py:571-576)"""
    import matplotlib.pyplot as plt

    os.makedirs(directory, exist_ok=True)
    fig.savefig(os.path.join(directory, filename))
    plt.close(fig)


def check_rews(env: Env, num_steps: int, parallel_ind: int, agent_ind: int,
               rng=None, plots_dir: str = "plots") -> dict:
    """Save the state/reward diagnostic plots; returns the collected series.

    Signature mirrors the reference (env, num_steps, parallel_ind,
    agent_ind — reference utils.py:579).  ``rng`` seeds the env init (only
    consumed by the triangle initializer's obstacle draw; the mock paths
    are RNG-free).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = jax.random.PRNGKey(0) if rng is None else rng
    traj = rollout_trajectory(env, num_steps, rng)
    obs = traj.obs

    neighbour_inds = sorted(set(range(env.params.num_agents)) - {agent_ind})
    first, second = neighbour_inds[0], neighbour_inds[1]

    series = {
        "target_angles": obs.target_angle[:, parallel_ind, agent_ind, 0],
        "target_distances": obs.target_distance[:, parallel_ind, agent_ind, 0],
        "obs_angles": obs.obstacles_angles[:, parallel_ind, agent_ind, 0],
        "obs_distances": obs.obstacles_distances[:, parallel_ind, agent_ind, 0],
        "angles_to_first": obs.others_angles[:, parallel_ind, agent_ind, 0],
        "distances_to_first": obs.others_distances[:, parallel_ind, agent_ind, 0],
        "angles_to_second": obs.others_angles[:, parallel_ind, agent_ind, 1],
        "distances_to_second": obs.others_distances[:, parallel_ind, agent_ind, 1],
        "rewards": traj.rewards[:, parallel_ind],
    }
    series = {k: np.asarray(v) for k, v in series.items()}

    # 4x2 observation-channel grid (reference utils.py:616-646).
    pi_plus = 3.5
    fig, axs = plt.subplots(4, 2, figsize=(10, 10))
    panels = [
        ("target_angles", "Angle to target (rad)", True),
        ("target_distances", "Distance to target", False),
        ("obs_angles", "Angle to obstacle (rad)", True),
        ("obs_distances", "Distance to obstacle", False),
        ("angles_to_first", f"Angle to agent {first} (rad)", True),
        ("distances_to_first", f"Distance to agent {first}", False),
        ("angles_to_second", f"Angle to agent {second} (rad)", True),
        ("distances_to_second", f"Distance to agent {second}", False),
    ]
    for ax, (key, title, is_angle) in zip(axs.flat, panels):
        ax.plot(series[key])
        ax.set_title(title)
        if is_angle:
            ax.set_ylim([-pi_plus, pi_plus])
        ax.set(xlabel="step number", ylabel="value")
    fig.tight_layout(pad=5.0)
    fig.suptitle(
        f"States, parallel index: {parallel_ind}, agent index: {agent_ind}")
    _save_plot(fig, f"states_array_{parallel_ind}_agent_{agent_ind}.png",
               plots_dir)

    # Reward curve (reference utils.py:648-666).
    p = env.params
    fig, ax = plt.subplots(1, 1)
    ax.set(xlabel="step number", ylabel="value")
    ax.plot(series["rewards"])
    fig.suptitle(
        f"Rewards, parallel index: {parallel_ind}, agent index: {agent_ind}"
        + f"\n Factors: tar {p.target_factor}, hea {p.heading_factor}"
        + f", dis {p.distance_factor}, ris {p.risk_factor},"
        + f" sof {p.soft_factor} bof {p.bond_factor}"
    )
    # 7 placeholders / 8 factors: bond factor intentionally absent from the
    # filename, matching the reference byte-for-byte (utils.py:659-662).
    _save_plot(
        fig,
        "rewards_B{0}A{1}T{2}H{3}D{4}R{5}S{6}.png".format(
            parallel_ind, agent_ind, p.target_factor, p.heading_factor,
            p.distance_factor, p.risk_factor, p.soft_factor, p.bond_factor),
        plots_dir,
    )
    return series
