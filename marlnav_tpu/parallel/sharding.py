"""Sharding rules for every pytree in the system.

Data parallelism: every per-env leaf (leading P axis) shards over 'data';
scalars / RNG keys / stats replicate.  The rollout buffer (T, P, ...)
shards its env axis.  Parameters replicate by default; with a >1 'model'
axis the MLP hidden dimension shards (tensor parallelism): fc1 column-
parallel, output heads row-parallel — XLA inserts the all-reduce on the
head matmuls.

Placement uses ``jax.device_put`` with NamedShardings; jitted programs
then propagate/preserve them, with XLA deriving the collectives (the
gradient psum of data parallelism, the buffer-wide mean/std reductions of
return normalization).  This is the design SURVEY.md §2.6 prescribes: no
explicit transport code anywhere.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from marlnav_tpu.algo.mappo import Buffer, TrainState
from marlnav_tpu.env.types import EnvState, EpisodeStats


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def env_state_shardings(mesh: Mesh, state: EnvState) -> EnvState:
    """Sharding tree matching an EnvState: P-leading leaves over 'data'."""
    data = _ns(mesh, "data")
    rep = _ns(mesh)
    return EnvState(
        states=_ns(mesh, "data", None, None),
        obstacles=_ns(mesh, "data", None, None),
        target=_ns(mesh, "data", None, None),
        step_num=data,
        terminates=data,
        stats=EpisodeStats(rep, rep, rep),
        rng=rep,
        reset_states=None if state.reset_states is None
        else _ns(mesh, "data", None, None),
        virgin=None if state.virgin is None else rep,
    )


def buffer_shardings(mesh: Mesh) -> Buffer:
    """(T, P, ...) buffer leaves shard the env axis over 'data'.

    log_probs is (T, P*A) with agents minor in the flattened axis, so
    sharding its second axis over 'data' keeps each env's A entries on one
    shard (P*A % (A*data) == 0 holds whenever P % data == 0)."""
    return Buffer(
        obs=_ns(mesh, None, "data", None, None),
        actions=_ns(mesh, None, "data", None, None),
        log_probs=_ns(mesh, None, "data"),
        values=_ns(mesh, None, "data", None),
        returns=_ns(mesh, None, "data"),
        done=_ns(mesh, None, "data"),
    )


def train_state_shardings(mesh: Mesh, ts: TrainState,
                          tensor_parallel: bool = False) -> TrainState:
    """Replicated params by default; hidden-dim sharding over 'model' when
    ``tensor_parallel`` (column-parallel fc1, row-parallel heads)."""
    if not tensor_parallel:
        rep = _ns(mesh)
        return jax.tree.map(lambda _: rep, ts)

    def actor_spec(p):
        return type(p)(
            fc1=type(p.fc1)(w=_ns(mesh, None, "model"), b=_ns(mesh, "model")),
            fc_mu=type(p.fc_mu)(w=_ns(mesh, "model", None), b=_ns(mesh)),
            fc_var=type(p.fc_var)(w=_ns(mesh, "model", None), b=_ns(mesh)),
        )

    def critic_spec(p):
        return type(p)(
            fc1=type(p.fc1)(w=_ns(mesh, None, "model"), b=_ns(mesh, "model")),
            fc2=type(p.fc2)(w=_ns(mesh, "model", None), b=_ns(mesh)),
        )

    rep = _ns(mesh)
    return TrainState(
        actor=actor_spec(ts.actor),
        critic=critic_spec(ts.critic),
        # Adam moments mirror their parameters' shardings.
        actor_opt=jax.tree.map(
            lambda _: rep, ts.actor_opt,
        ),
        critic_opt=jax.tree.map(lambda _: rep, ts.critic_opt),
    )


def shard_env_state(state: EnvState, mesh: Mesh) -> EnvState:
    return jax.device_put(state, env_state_shardings(mesh, state))


def shard_train_state(ts: TrainState, mesh: Mesh,
                      tensor_parallel: bool = False) -> TrainState:
    if tensor_parallel:
        param_specs = train_state_shardings(mesh, ts, True)
        return TrainState(
            actor=jax.device_put(ts.actor, param_specs.actor),
            critic=jax.device_put(ts.critic, param_specs.critic),
            actor_opt=_put_opt_like(ts.actor_opt, ts.actor, param_specs.actor,
                                    mesh),
            critic_opt=_put_opt_like(ts.critic_opt, ts.critic,
                                     param_specs.critic, mesh),
        )
    return jax.device_put(ts, train_state_shardings(mesh, ts, False))


def _put_opt_like(opt_state, params, param_specs, mesh):
    """Shard optimizer moments like their parameters (Adam's mu/nu mirror
    the param tree); everything else (step counters) replicates.

    Matching is by array shape, which is exact for these MLPs: layers with
    equal shapes (the two actor heads) also share a sharding spec."""
    shape_specs = {}
    for p, s in zip(jax.tree.leaves(params), jax.tree.leaves(param_specs)):
        shape_specs.setdefault(p.shape, s)

    def put(leaf):
        spec = shape_specs.get(getattr(leaf, "shape", None), _ns(mesh))
        return jax.device_put(leaf, spec)

    return jax.tree.map(put, opt_state)
