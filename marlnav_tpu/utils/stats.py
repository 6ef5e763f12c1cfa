"""Training statistics, plots, CSV logs and weight persistence.

Produces the same artifact set as the reference trainer
(reference models.py:200-268): per-run timestamped

  plots/<ts>_mean_rews.png   plots/<ts>_act_loss.png
  plots/<ts>_cri_loss.png    plots/<ts>_epi_stats.png
  logs/<ts>_mean_rews.csv    logs/<ts>_act_loss.csv
  logs/<ts>_cri_loss.csv     logs/<ts>_epi_stats.csv
  logs/<ts>_params.json
  weights/<ts>_{actor,critic}.npz

Metrics are accumulated on-device inside the jitted rollout/update
programs and fetched once per rollout — the design that replaces the
reference's per-step ``.item()`` host syncs (SURVEY.md §5).
"""

from __future__ import annotations

import csv
import json
import os
from datetime import datetime
from typing import Optional

import jax
import numpy as np


def _plot(stats, xlabel: str, title: str, filename: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1)
    ax.set(xlabel=xlabel, ylabel="value")
    ax.plot(stats)
    fig.suptitle(title)
    fig.savefig(filename)
    plt.close(fig)


class StatsLogger:
    """Accumulates per-rollout / per-batch training statistics on host.

    Mirrors the reference's ``MAPPO._logs`` dict and persistence methods
    (reference models.py:84-104, 145-158, 200-268) as a standalone object —
    the TPU trainer is pure functions, so logging lives outside it.
    """

    def __init__(self, root: Optional[str] = None, timestamp: Optional[str] = None):
        root = root or os.getcwd()
        self.wpath = os.path.join(root, "weights")
        self.ppath = os.path.join(root, "plots")
        self.lpath = os.path.join(root, "logs")
        for p in (self.wpath, self.ppath, self.lpath):
            os.makedirs(p, exist_ok=True)
        self.time = timestamp or datetime.now().strftime("%Y%m%d%H%M%S")
        self.logs = {
            "epi_stats": {"trunc": [], "col": [], "tar": []},
            "mean_rews": [],
            "actor": [],
            "critic": [],
        }

    # -- accumulation ------------------------------------------------------

    def log_rollout(self, metrics) -> None:
        """Record one rollout's mean return + episode-ending counters
        (reference models.py:145-158)."""
        self.logs["mean_rews"].append(float(metrics.mean_rew))
        self.logs["epi_stats"]["trunc"].append(int(metrics.stats.num_trunc))
        self.logs["epi_stats"]["col"].append(int(metrics.stats.num_col))
        self.logs["epi_stats"]["tar"].append(int(metrics.stats.num_tar))

    def log_losses(self, actor_losses, critic_losses) -> None:
        """Record per-minibatch losses.  The actor losses are negated back to
        the maximized objective the reference logs (reference models.py:178)."""
        self.logs["actor"].extend((-np.asarray(actor_losses)).tolist())
        self.logs["critic"].extend(np.asarray(critic_losses).tolist())

    # -- persistence -------------------------------------------------------

    def save_weights(self, train_state) -> None:
        """Flat-array .npz weight files, one per network — the renderer's
        load format (reference models.py:127-129 saves torch state_dicts;
        here each Dense leaf saves under its tree path)."""
        for name, params in (("actor", train_state.actor),
                             ("critic", train_state.critic)):
            flat = {
                f"{'.'.join(str(getattr(k, 'name', k)) for k in path)}": np.asarray(v)
                for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
            }
            np.savez(os.path.join(self.wpath, f"{self.time}_{name}.npz"), **flat)

    def save_stats(self, params_json: str) -> None:
        """Write all plot/CSV/params artifacts (reference models.py:200-231)."""
        t = self.time
        _plot(self.logs["mean_rews"], "rollout_num", "Mean Rewards",
              os.path.join(self.ppath, f"{t}_mean_rews.png"))
        _plot(self.logs["actor"], "batch_num", "Actor Losses",
              os.path.join(self.ppath, f"{t}_act_loss.png"))
        _plot(self.logs["critic"], "batch_num", "Critic Losses",
              os.path.join(self.ppath, f"{t}_cri_loss.png"))

        with open(os.path.join(self.lpath, f"{t}_params.json"), "w") as f:
            f.write(params_json)

        for key, fname in (("mean_rews", "mean_rews"), ("actor", "act_loss"),
                           ("critic", "cri_loss")):
            with open(os.path.join(self.lpath, f"{t}_{fname}.csv"), "w",
                      newline="") as f:
                writer = csv.writer(f)
                writer.writerow(["Value"])
                writer.writerows([[v] for v in self.logs[key]])

        self._save_epi_stats(
            os.path.join(self.ppath, f"{t}_epi_stats.png"),
            os.path.join(self.lpath, f"{t}_epi_stats.csv"),
        )

    def _save_epi_stats(self, plotfile: str, logfile: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epi = self.logs["epi_stats"]
        fig, ax = plt.subplots(1, 1)
        ax.set(xlabel="rollout", ylabel="value")
        ax.plot(epi["trunc"], color="blue", label="truncated")
        ax.plot(epi["col"], color="red", label="collisions")
        ax.plot(epi["tar"], color="green", label="target reached")
        ax.legend()
        fig.suptitle("Episode endings")
        fig.savefig(plotfile)
        plt.close(fig)

        with open(logfile, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["Truncated", "Collisions", "Target reached"])
            writer.writerows(
                [[epi["trunc"][i], epi["col"][i], epi["tar"][i]]
                 for i in range(len(epi["trunc"]))]
            )

    # -- checkpoint round trip (for resume) ---------------------------------

    def state_dict(self) -> dict:
        return {"time": self.time, "logs": self.logs}

    def load_state_dict(self, state: dict) -> None:
        self.time = state["time"]
        self.logs = state["logs"]


def load_weights(path: str, template):
    """Load a .npz weight file back into a params pytree (inverse of
    ``StatsLogger.save_weights``) — used by the renderer."""
    with np.load(path) as data:
        flat = dict(data)
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = ".".join(str(getattr(k, "name", k)) for k in path)
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"weight {key}: file shape {arr.shape} != model {leaf.shape}")
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
