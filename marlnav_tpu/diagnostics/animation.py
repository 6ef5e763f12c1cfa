"""Trajectory renderer: matplotlib animation of agent movements.

Equivalent of the reference's ``Animation``/``init_render``
(reference animation.py:12-96) with the TPU-native split the survey
prescribes (SURVEY.md §7.5): the whole trajectory is rolled out on device
first (one jitted scan, one fetch) and the GUI merely replays host arrays
— no per-frame device stepping or device->host copies
(reference animation.py:55-69 does both every frame).

Policy mode loads ``weights/<ts>_actor.npz`` files written by the trainer
(reference loads torch state_dicts, animation.py:84-89) and drives the env
with the policy mean, or with samples when ``random``
(reference animation.py:42-50).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from marlnav_tpu.config import AnimationConfig, NormalizerConfig, ScalerConfig
from marlnav_tpu.diagnostics.trajectory import Trajectory, rollout_trajectory
from marlnav_tpu.env.env import Env


def _init_figure(cfg: AnimationConfig, agents_pos, obstacles_pos, target_pos):
    """Arena figure + scatter artists (reference utils.py:500-516)."""
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(cfg.fig_size_x, cfg.fig_size_y))
    ax = fig.add_axes([0, 0, 1, 1], frameon=False)
    ax.set_xlim(0, cfg.max_x_value)
    ax.set_xticks([])
    ax.set_ylim(0, cfg.max_y_value)
    ax.set_yticks([])

    agents_scatter = ax.scatter(agents_pos[:, 0], agents_pos[:, 1],
                                s=10, lw=0.5, c=np.array([(0.0, 0.0, 0.0, 1.0)]))
    obs_scatter1 = ax.scatter(obstacles_pos[:, 0], obstacles_pos[:, 1],
                              s=2200, lw=0.5, c=np.array([(1.0, 0.5, 0.5, 1.0)]))
    obs_scatter2 = ax.scatter(obstacles_pos[:, 0], obstacles_pos[:, 1],
                              s=1500, lw=0.5, c=np.array([(1.0, 0.0, 0.0, 1.0)]))
    target_scatter = ax.scatter(target_pos[:, 0], target_pos[:, 1],
                                s=2000, facecolors="w", lw=1.5,
                                edgecolors="k", linestyle=":")
    return fig, agents_scatter, obs_scatter1, obs_scatter2, target_scatter


class Animation:
    """Replay a precomputed trajectory for one parallel-env index."""

    def __init__(self, env: Env, cfg: AnimationConfig, trajectory: Trajectory):
        self.cfg = cfg
        self.traj = trajectory
        pi = cfg.parallel_index
        fig, agents_sca, obs_sca1, obs_sca2, target_sca = _init_figure(
            cfg,
            trajectory.states[0, pi, :, :2],
            trajectory.obstacles[0, pi],
            trajectory.target[0, pi],
        )
        try:
            fig.canvas.manager.set_window_title("marlnav-tpu")
        except AttributeError:
            pass  # headless backends
        self.fig = fig
        self.agents_scatter = agents_sca
        self.obs_scatter1 = obs_sca1
        self.obs_scatter2 = obs_sca2
        self.target_scatter = target_sca

    def update(self, frame_number: int):
        """Move scatter artists to frame ``frame_number``'s positions
        (the post-step state, as in reference animation.py:64-69)."""
        pi = self.cfg.parallel_index
        self.agents_scatter.set_offsets(self.traj.states[frame_number, pi, :, :2])
        obstacles = self.traj.obstacles[frame_number, pi]
        self.obs_scatter1.set_offsets(obstacles)
        self.obs_scatter2.set_offsets(obstacles)
        self.target_scatter.set_offsets(self.traj.target[frame_number, pi])
        return (self.agents_scatter, self.obs_scatter1, self.obs_scatter2,
                self.target_scatter)

    def run(self, show: bool = True, save_path: Optional[str] = None):
        """Run the animation; optionally save to a movie/GIF file instead of
        opening a window (the headless path the reference lacks)."""
        import matplotlib.pyplot as plt
        from matplotlib.animation import FuncAnimation

        anim = FuncAnimation(
            self.fig, self.update, frames=self.traj.states.shape[0],
            repeat=False, interval=self.cfg.interval, blit=True,
        )
        if save_path is not None:
            anim.save(save_path)
        elif show:
            plt.show()
        return anim


def load_actor_weights(weights_file: str, obs_size: int, hidden_size: int = 50,
                       action_size: int = 2):
    """Build an ActorParams pytree from a trainer-written .npz file.

    ``weights_file`` resolves relative to ``./weights`` as in the reference
    (reference animation.py:85-86)."""
    from marlnav_tpu.models import actor_init
    from marlnav_tpu.utils.stats import load_weights

    path = weights_file
    if not os.path.isabs(path) and not os.path.exists(path):
        path = os.path.join(os.getcwd(), "weights", weights_file)
    template = actor_init(jax.random.PRNGKey(0), obs_size, hidden_size,
                          action_size)
    return load_weights(path, template)


def init_render(
    env: Env,
    cfg: AnimationConfig,
    normalizer_cfg: Optional[NormalizerConfig] = None,
    scaler_cfg: Optional[ScalerConfig] = None,
    hidden_size: int = 50,
    rng=None,
) -> Animation:
    """Build the renderer (reference animation.py:80-96): policy mode loads
    trained weights and rolls out mean/sampled actions; sampler mode uses
    the env's scripted sampler."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    if cfg.sampling_style == "policy":
        if cfg.weights_file is None:
            raise ValueError("policy rendering needs a weights_file")
        actor = load_actor_weights(cfg.weights_file, env.params.obs_size,
                                   hidden_size)
        traj = rollout_trajectory(
            env, cfg.max_step, rng, actor=actor,
            normalizer_cfg=normalizer_cfg, scaler_cfg=scaler_cfg,
            sample=cfg.random,
        )
    elif cfg.sampling_style == "sampler":
        traj = rollout_trajectory(env, cfg.max_step, rng)
    else:
        raise NotImplementedError(f"sampling_style {cfg.sampling_style!r}")
    return Animation(env, cfg, traj)
