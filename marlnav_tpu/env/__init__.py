"""Pure-functional batched navigation environment."""

from marlnav_tpu.env.types import EnvState, EpisodeStats, Observations
from marlnav_tpu.env.env import make_env, Env

__all__ = ["EnvState", "EpisodeStats", "Observations", "make_env", "Env"]
