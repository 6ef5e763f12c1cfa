"""Transforms, seeding, persistence and checkpointing utilities."""

from marlnav_tpu.utils.profiling import Throughput, annotate, checked_step, trace
from marlnav_tpu.utils.seeding import make_rng
from marlnav_tpu.utils.stats import StatsLogger, load_weights
from marlnav_tpu.utils.transforms import make_action_scaler, make_obs_normalizer

__all__ = [
    "Throughput",
    "annotate",
    "checked_step",
    "trace",
    "make_rng",
    "StatsLogger",
    "load_weights",
    "make_action_scaler",
    "make_obs_normalizer",
]
