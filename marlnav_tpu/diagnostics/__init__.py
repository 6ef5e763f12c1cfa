"""Diagnostics: reward-check harness and trajectory renderer.

Both run the entire trajectory as ONE jitted ``lax.scan`` on device and
fetch the stacked result once; plotting/animation then run from host
arrays (the reference instead steps the env per frame with per-step
device->host copies, reference animation.py:40-71, utils.py:595-614).
"""

from marlnav_tpu.diagnostics.trajectory import rollout_trajectory
from marlnav_tpu.diagnostics.reward_check import check_rews
from marlnav_tpu.diagnostics.animation import Animation, init_render

__all__ = ["rollout_trajectory", "check_rews", "Animation", "init_render"]
