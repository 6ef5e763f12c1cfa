"""MAPPO: on-device rollout, returns, PPO-clip updates."""

from marlnav_tpu.algo.mappo import MAPPO, Buffer, TrainState, make_mappo

__all__ = ["MAPPO", "Buffer", "TrainState", "make_mappo"]
