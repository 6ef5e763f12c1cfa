"""Actor / critic networks and the Gaussian policy distribution."""

from marlnav_tpu.models.distributions import DiagGaussian
from marlnav_tpu.models.networks import (
    ActorParams,
    CriticParams,
    actor_apply,
    actor_init,
    critic_apply,
    critic_init,
)

__all__ = [
    "DiagGaussian",
    "ActorParams",
    "CriticParams",
    "actor_apply",
    "actor_init",
    "critic_apply",
    "critic_init",
]
