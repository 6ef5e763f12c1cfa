"""Tiled actor-update path: consume the collect kernel's outputs directly.

The fused collect kernel (ops/fused_collect.py) emits its per-step
observations/actions/log-probs in its NATIVE tile layout — e.g. obs as
``(T, A*F, 8, NB*128)`` with rows a*F+f over (sublane, lane) env tiles.
The staged-update path converts that to the canonical Buffer layout
(untile) and then to the update kernels' sublane-packed layout
(stage_actor_minibatch) — two full-array relayout pipelines that measure
~15.6 ms of the 63 ms default-config repeat (BASELINE.md, staging
ablation), while BOTH relayout strategies tried for making them cheaper
measured slower than XLA's (BASELINE.md negative results).

This module removes the relayouts instead of optimizing them: a variant
of the affine actor kernel (ops/fused_update.py ACTOR_LAYOUT="affine")
reads the collect outputs as-is.  The key observation is that the tile
layout already IS a valid sublane packing under the row mapping
(group = env-tile sublane, column = (t, agent, env block, lane)):

  * per (t, agent): obs rows [a*F, (a+1)*F) of the (A*F, 8, 128) tile
    reshape — purely, row-major — to (F*8, 128) with rows f*8+s: the
    CHANNEL-major feature packing, served by a channel-channel
    block-diagonal expansion of the affine operator (_bd_chan_chan);
  * actions rows [2a, 2a+2) reshape to (2*8, 128) rows ch*8+s — exactly
    the chain's channel-major action layout;
  * log-probs row a is already the (8, 128) per-row tile;
  * there is NO padding (T*P*A rows exactly), so the chain mask is 1.

Only the advantages need staging (they derive from the post-collect
return normalization): one 12 MB relayout into (T, A, 8, NB*128), with
the faithful/fixed pairing applied in the reference's flat order first
(bit-identical advantage values to the staged path).

The kernel itself is the affine kernel re-gridded over (time-window,
env-block) with the agent loop unrolled inside — identical math, MACs,
and VPU work per element; parity vs jax.value_and_grad holds to the same
tolerance class as the affine layout.  Used by train.py automatically
when --fused-collect --fused-updates run full-batch minibatches on one
chip (the eligibility the staged path keeps covering otherwise).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlnav_tpu.config import MAPPOConfig
from marlnav_tpu.ops.fused_update import (
    _affine_compose,
    _affine_recompose,
    _critic_chain,
    _dot,
    _pair_rows,
    _pair_rows_sharded,
    _ppo_chain,
)
from marlnav_tpu.ops.step_math import LANE, SUB


class TiledRollout(NamedTuple):
    """The collect kernel's raw per-step outputs (pre-untile)."""

    obs: jax.Array  # (T, A*F, 8, NB*128) rows a*F+f
    actions: jax.Array  # (T, 2A, 8, NB*128) rows 2a+ch
    log_probs: jax.Array  # (T, A, 8, NB*128) row a


def _bd_chan_chan(wt: jax.Array, g: int) -> jax.Array:
    """Transposed weight (out, in) -> (out*g, in*g) with BOTH axes
    channel-major — the affine operator for channel-major obs rows."""
    out, inn = wt.shape
    eye = jnp.eye(g, dtype=wt.dtype)
    return (wt[:, None, :, None] * eye[None, :, None, :]).reshape(
        out * g, inn * g)


def _unpack_chan_chan(dz: jax.Array, out: int, inn: int, g: int):
    """(out*g, in*g) channel-channel block accumulator -> (out, in)."""
    return jnp.einsum("cgfg->cf", dz.reshape(out, g, inn, g))


import os as _os

# Time steps per grid step (the kernels' first grid dimension).  Larger
# windows mean fewer, larger grid steps at the cost of VMEM window size:
# at A=3 the four input tiles (obs 36 + actions 6 + log-probs 3 + adv 3 =
# 48 rows) cost 48*8*128*4 B ~ 197 KB per time step, and double buffering
# doubles it, so the 16 MB scoped-VMEM budget admits windows up to ~40
# (measured: window 50 OOMs at every config, window 37 is the largest
# divisor-reachable survivor).  Default measured on v5e (round 4,
# scripts/bench_composed.py sweep — BASELINE.md "tiled time-window
# tuning": composed repeats improve monotonically up to the VMEM edge,
# default config 48.03 -> 44.05 ms across windows 3 -> 37, GAE-16k
# 34.26 -> 32.16 ms from window 8 -> 25); override per run with
# MARLNAV_TILED_TW_CAP.  The cap travels as an ARGUMENT from the trainer
# factories down to _time_window — resolved from the environment once
# per factory call, never at import — so tests and concurrent configs
# don't depend on process-global state.
TW_CAP_DEFAULT = 37


def _tw_cap() -> int:
    return int(_os.environ.get("MARLNAV_TILED_TW_CAP", str(TW_CAP_DEFAULT)))


def _time_window(t: int, cap: int) -> int:
    """Largest divisor of ``t`` that is <= cap."""
    for d in range(min(t, cap), 0, -1):
        if t % d == 0:
            return d
    return 1


def stage_adv_tiled(returns, values, cfg: MAPPOConfig,
                    pair_axis: str | None = None) -> jax.Array:
    """(T, P) returns / (T, P, 1) values -> advantages in the tile layout
    (T, A, 8, NB*128), with the faithful/fixed pairing applied in the
    reference's flat (t, p, a) order first so the VALUES are bit-identical
    to stage_actor_minibatch's.

    With ``pair_axis`` (inside shard_map over a data mesh) the faithful
    pairing follows the reference's GLOBAL flat tile via
    ``_pair_rows_sharded`` — the tiny (T, P) returns - values difference
    is all_gathered and each shard gathers exactly its own rows — and
    the relayout below stays per-shard local (the tile layout under
    shard_map IS the per-shard kernel layout)."""
    t, p = returns.shape
    a = cfg.num_agents
    nb = p // (SUB * LANE)
    if pair_axis is not None:
        adv = _pair_rows_sharded(returns - values.reshape(t, p), a,
                                 cfg.faithful, pair_axis)
    else:
        adv = (_pair_rows(returns.reshape(t * p), a, cfg.faithful)
               - _pair_rows(values.reshape(t * p), a, cfg.faithful))
    # flat (t, p, a) -> (T, A, P) -> tile the env axis (inverse of
    # fused_rollout.untile: p = block*1024 + sublane*128 + lane)
    adv = adv.reshape(t, p, a).transpose(0, 2, 1)
    return (adv.reshape(t, a, nb, SUB, LANE).transpose(0, 1, 3, 2, 4)
            .reshape(t, a, SUB, nb * LANE))


def _interp_param(interpret: bool, generic_interpret: bool):
    """pallas_call ``interpret`` argument: the GENERIC interpreter (pure
    traced JAX) for multi-shard CPU tests — the TPU-interpret simulator
    wedges under concurrent shard threads (fused_collect.py notes) —
    else the TPU-semantics simulator, else compiled."""
    if generic_interpret:
        return True
    return pltpu.InterpretParams() if interpret else False


def make_tiled_actor_grad(cfg: MAPPOConfig, interpret: bool = False,
                          tw_cap: int | None = None,
                          psum_axis: str | None = None,
                          n_shards: int = 1,
                          generic_interpret: bool = False):
    """Build ``grad(params, tiled, adv_t) -> (loss, ActorParams grads)``
    over the FULL buffer (the tiled path is full-batch only).

    With ``psum_axis`` (inside shard_map) the kernel's loss/grad SUMS
    are all-reduced over that mesh axis before the 1/n_rows scaling, and
    ``n_shards`` scales the locally-visible row count to the GLOBAL one
    — the data-parallel gradient exactly as the staged kernels produce
    it (fused_update.make_fused_actor_grad)."""
    a_ag, obs_size = cfg.num_agents, cfg.obs_size
    eps, ent_c = cfg.epsilon, cfg.ent_const
    g = SUB
    tw_cap = _tw_cap() if tw_cap is None else tw_cap
    dtype = jnp.bfloat16 if cfg.bf16_updates else None

    def kernel(obs_ref, act_ref, lp_ref, adv_ref, abd, cp,
               loss_out, dzbd, dzsum):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            for o in (loss_out, dzbd, dzsum):
                o[:] = jnp.zeros_like(o)

        tw = obs_ref.shape[0]
        ones = jnp.ones((g, LANE), jnp.float32)  # no padding: mask == 1
        for t in range(tw):
            for ag in range(a_ag):
                x = obs_ref[t, ag * obs_size:(ag + 1) * obs_size].reshape(
                    g * obs_size, LANE)  # rows f*8+s (channel-major)
                z = jax.lax.dot_general(
                    abd[:], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + cp[:]  # (4G, LANE) rows c*8+s
                act = act_ref[t, 2 * ag:2 * ag + 2].reshape(2 * g, LANE)
                loss_sum, g_u, g_s = _ppo_chain(
                    z[:2 * g], z[2 * g:], act, lp_ref[t, ag],
                    adv_ref[t, ag], ones, g, eps, ent_c)
                loss_out[:] += loss_sum
                g_z = jnp.concatenate([g_u, g_s])  # (4G, LANE)
                if dtype is not None:
                    g_z, x = g_z.astype(dtype), x.astype(dtype)
                dzbd[:] += jax.lax.dot_general(
                    g_z, x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (4G, G*obs)
                dzsum[:] += jnp.sum(g_z.astype(jnp.float32), axis=1,
                                    keepdims=True)

    def grad(params, tiled: TiledRollout, adv_t: jax.Array):
        t, rows, sub, nbl = tiled.obs.shape
        assert rows == a_ag * obs_size and sub == SUB
        nb = nbl // LANE
        tw = _time_window(t, tw_cap)
        grid = (t // tw, nb)
        n_rows = t * nbl * SUB * a_ag * n_shards
        a_comp, c_comp = _affine_compose(params)
        go = g * obs_size

        def tile_spec(rdim):
            return pl.BlockSpec((tw, rdim, SUB, LANE),
                                lambda i, j: (i, 0, 0, j),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        loss, dzbd, dzsum = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile_spec(a_ag * obs_size), tile_spec(2 * a_ag),
                      tile_spec(a_ag), tile_spec(a_ag),
                      full((4 * g, go)), full((4 * g, 1))],
            out_specs=[full((1, 1)), full((4 * g, go)), full((4 * g, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (4 * g, go), (4 * g, 1))],
            interpret=_interp_param(interpret, generic_interpret),
        )(
            tiled.obs, tiled.actions, tiled.log_probs, adv_t,
            _bd_chan_chan(a_comp, g),
            jnp.repeat(c_comp, g)[:, None],
        )
        dz = _unpack_chan_chan(dzbd, 4, obs_size, g)
        dzs = jnp.sum(dzsum.reshape(4, g), axis=1)
        sums = (loss[0, 0], _affine_recompose(params, dz, dzs))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g_: g_ * inv_n, gsums)

    return grad


def stage_vr_tiled(x: jax.Array) -> jax.Array:
    """(T, P) per-(step, env) scalars (values / returns) -> the tile layout
    (T, 8, NB*128) the collect kernel's outputs use (inverse of
    fused_rollout.untile: p = block*1024 + sublane*128 + lane).  A 4 MB
    relayout at the default config — vs the 147 MB obs stream the tiled
    path avoids staging."""
    t, p = x.shape
    nb = p // (SUB * LANE)
    return (x.reshape(t, nb, SUB, LANE).transpose(0, 2, 1, 3)
            .reshape(t, SUB, nb * LANE))


def make_tiled_critic_grad(cfg: MAPPOConfig, interpret: bool = False,
                           tw_cap: int | None = None,
                           psum_axis: str | None = None,
                           n_shards: int = 1,
                           generic_interpret: bool = False):
    """Build ``grad(params, obs_tiles, vold_t, ret_t) -> (loss,
    CriticParams grads)`` over the FULL buffer — the tiled counterpart of
    ops/fused_update.make_fused_critic_grad (clipped-value loss, reference
    models.py:301-316), consuming the collect kernel's native obs tiles.

    The critic's measured-best staged layout is G=1 (no sublane packing:
    it is matmul-bound and block-diagonal dilation only multiplies its
    MACs — fused_update.py module notes).  The tile layout reaches that
    same undilated shape FOR FREE: per (t, env block), the (A*F, 8, 128)
    obs tile reshapes row-major to (A*F, 1024) — features on rows, the
    8x128 envs unrolled onto lanes — which is exactly the G=1 kernel's
    feature-major operand, so the matmuls run PLAIN weights with no
    dilation and no staging relayout.  The per-row tensors (values,
    returns) stage through the 4 MB ``stage_vr_tiled`` relayout and the
    elementwise chain runs on full-density (8, 128) tiles (the (1, 1024)
    head row refolds to (8, 128) by another pure reshape).
    """
    a_ag, obs_size = cfg.num_agents, cfg.obs_size
    in_size = a_ag * obs_size
    eps = cfg.epsilon
    tw_cap = _tw_cap() if tw_cap is None else tw_cap
    dtype = jnp.bfloat16 if cfg.bf16_updates else None

    def kernel(obs_ref, vold_ref, ret_ref, w1t, b1, w2t, b2,
               loss_out, dw1, db1, dw2, db2):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            for o in (loss_out, dw1, db1, dw2, db2):
                o[:] = jnp.zeros_like(o)

        tw = obs_ref.shape[0]
        ones = jnp.ones((SUB, LANE), jnp.float32)  # no padding: mask == 1
        for t in range(tw):
            x = obs_ref[t].reshape(in_size, SUB * LANE)  # (A*F, 1024)
            pre = _dot(w1t[:], x, ((1,), (0,)), dtype) + b1[:]  # (H, 1024)
            h = jnp.maximum(pre, 0.0)
            v_l = _dot(w2t[:], h, ((1,), (0,)), dtype) + b2[:]  # (1, 1024)

            loss_sum, g_v = _critic_chain(
                v_l.reshape(SUB, LANE), vold_ref[t], ret_ref[t], ones, eps)
            loss_out[:] += loss_sum
            g_v_l = g_v.reshape(1, SUB * LANE)  # sublane->lane refold back

            g_h = _dot(w2t[:], g_v_l, ((0,), (0,)), dtype)  # (H, 1024)
            # (h > 0) == (pre > 0) exactly for relu; relu'(0) = 0.
            g_pre = g_h * (h > 0.0).astype(jnp.float32)

            dw2[:] += _dot(g_v_l, h, ((1,), (1,)), dtype)  # (1, H)
            db2[:] += jnp.sum(g_v_l, axis=1, keepdims=True)
            dw1[:] += _dot(g_pre, x, ((1,), (1,)), dtype)  # (H, A*F)
            db1[:] += jnp.sum(g_pre, axis=1, keepdims=True)

    def grad(params, obs_tiles: jax.Array, vold_t: jax.Array,
             ret_t: jax.Array):
        from marlnav_tpu.models.networks import CriticParams, Dense

        h_size = params.fc1.w.shape[1]
        t, rows, sub, nbl = obs_tiles.shape
        assert rows == in_size and sub == SUB
        nb = nbl // LANE
        tw = _time_window(t, tw_cap)
        grid = (t // tw, nb)
        n_rows = t * nbl * SUB * n_shards

        def tile_spec(rdim):
            return pl.BlockSpec((tw, rdim, SUB, LANE),
                                lambda i, j: (i, 0, 0, j),
                                memory_space=pltpu.VMEM)

        def vr_spec():
            return pl.BlockSpec((tw, SUB, LANE), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tile_spec(in_size), vr_spec(), vr_spec(),
                      full((h_size, in_size)), full((h_size, 1)),
                      full((1, h_size)), full((1, 1))],
            out_specs=[full((1, 1)),
                       full((h_size, in_size)), full((h_size, 1)),
                       full((1, h_size)), full((1, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (h_size, in_size), (h_size, 1),
                        (1, h_size), (1, 1))],
            interpret=_interp_param(interpret, generic_interpret),
        )(
            obs_tiles, vold_t, ret_t,
            params.fc1.w.T, params.fc1.b[:, None],
            params.fc2.w.T, params.fc2.b[:, None],
        )
        loss, dw1, db1, dw2, db2 = outs
        sums = (loss[0, 0],
                CriticParams(fc1=Dense(dw1.T, db1[:, 0]),
                             fc2=Dense(dw2.T, db2[0, :])))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g_: g_ * inv_n, gsums)

    return grad


def _shard_phase(phase, mesh, axis):
    """shard_map a tiled-update phase: params/opt replicated, the tile
    leaves sharded on their env (last) axis, the (T, P) per-row tensors
    on their env axis — the per-shard slices ARE the per-shard collect
    kernel's outputs, so no relayout happens at the boundary."""
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        phase,
        mesh=mesh,
        in_specs=(P(), P(), TiledRollout(*([P(None, None, None, axis)] * 3)),
                  P(None, axis), P(None, axis, None)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # pallas outs carry no vma metadata
    )


def make_tiled_critic_trainer(cfg: MAPPOConfig, interpret: bool | None = None,
                              mesh=None, axis: str = "data",
                              tw_cap: int | None = None,
                              generic_interpret: bool = False):
    """Build ``train(ts, buffer, tiled) -> (ts, losses)`` — the drop-in
    for ``MAPPO.train_critic`` when the buffer came from
    ``make_fused_collect(..., return_tiled=True)``.  Full-batch only,
    like the tiled actor trainer.  With BOTH tiled trainers active the
    canonical buffer's obs/actions/log_probs become dead values inside
    the jitted repeat, so XLA drops the collect's big untile relayouts
    entirely (returns processing needs only rewards/values/done).

    With ``mesh`` the phase shard_maps over ``axis``: the kernel runs on
    each shard's own tile slice (exactly what the meshed collect kernel
    emitted — zero cross-shard staging) and the loss/grad sums psum
    before Adam, like the staged kernels (make_mappo)."""
    if cfg.batch_size != cfg.buffer_len:
        raise NotImplementedError(
            "the tiled update path is full-batch only "
            f"(batch_size {cfg.batch_size} != buffer_len {cfg.buffer_len})")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tx = optax.adam(cfg.lr)  # same construction as make_mappo's critic_tx
    n_shards = 1 if mesh is None else mesh.shape[axis]
    kernel_grad = make_tiled_critic_grad(
        cfg, interpret=interpret, tw_cap=tw_cap,
        psum_axis=axis if mesh is not None else None, n_shards=n_shards,
        generic_interpret=generic_interpret)

    # Faithful last-step drop (reference models.py:167-171, replicated by
    # algo/mappo.py minibatch_slices): the full-batch slice ends at -1.
    size = cfg.buffer_len - 1 if cfg.faithful else cfg.buffer_len

    def phase(params, opt, tiled: TiledRollout, returns, values):
        obs_tiles = tiled.obs[:size]
        vold_t = stage_vr_tiled(values[:size, :, 0])
        ret_t = stage_vr_tiled(returns[:size])

        def epoch(carry, _):
            params, opt = carry
            loss, grads = kernel_grad(params, obs_tiles, vold_t, ret_t)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            epoch, (params, opt), None, length=cfg.num_epochs)
        return params, opt, losses

    if mesh is not None:
        phase = _shard_phase(phase, mesh, axis)

    def train(ts, buffer, tiled: TiledRollout):
        params, opt, losses = phase(ts.critic, ts.critic_opt, tiled,
                                    buffer.returns, buffer.values)
        return ts._replace(critic=params, critic_opt=opt), losses

    return train


def make_tiled_actor_trainer(cfg: MAPPOConfig, interpret: bool | None = None,
                             mesh=None, axis: str = "data",
                             tw_cap: int | None = None,
                             generic_interpret: bool = False):
    """Build ``train(ts, buffer, tiled) -> (ts, losses)`` — the drop-in
    for ``MAPPO.train_actor`` when the buffer came from
    ``make_fused_collect(..., return_tiled=True)``.  Full-batch only
    (time-sliced minibatches would need window-aligned slicing of the
    tiled arrays; the staged path covers that case).

    With ``mesh`` the phase shard_maps over ``axis`` (see
    make_tiled_critic_trainer); faithful advantage pairing follows the
    reference's GLOBAL flat tile via stage_adv_tiled's ``pair_axis``
    (a KB-scale all_gather of the (T, P) returns - values — the same
    treatment the staged path got in _pair_rows_sharded)."""
    if cfg.batch_size != cfg.buffer_len:
        raise NotImplementedError(
            "the tiled update path is full-batch only "
            f"(batch_size {cfg.batch_size} != buffer_len {cfg.buffer_len})")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tx = optax.adam(cfg.lr)  # same construction as make_mappo's actor_tx
    n_shards = 1 if mesh is None else mesh.shape[axis]
    pair_axis = axis if (mesh is not None and cfg.faithful) else None
    kernel_grad = make_tiled_actor_grad(
        cfg, interpret=interpret, tw_cap=tw_cap,
        psum_axis=axis if mesh is not None else None, n_shards=n_shards,
        generic_interpret=generic_interpret)

    # Faithful last-step drop (reference models.py:167-171, replicated by
    # algo/mappo.py minibatch_slices): the full-batch slice ends at -1.
    size = cfg.buffer_len - 1 if cfg.faithful else cfg.buffer_len

    def phase(params, opt, tiled: TiledRollout, returns, values):
        tiled = TiledRollout(*(x[:size] for x in tiled))
        # Pairing runs WITHIN the slice (the reference tiles the sliced
        # minibatch, so the faithful wrap is modulo size*P).
        adv_t = stage_adv_tiled(returns[:size], values[:size], cfg,
                                pair_axis=pair_axis)

        def epoch(carry, _):
            params, opt = carry
            loss, grads = kernel_grad(params, tiled, adv_t)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            epoch, (params, opt), None, length=cfg.num_epochs)
        return params, opt, losses

    if mesh is not None:
        phase = _shard_phase(phase, mesh, axis)

    def train(ts, buffer, tiled: TiledRollout):
        params, opt, losses = phase(ts.actor, ts.actor_opt, tiled,
                                    buffer.returns, buffer.values)
        return ts._replace(actor=params, actor_opt=opt), losses

    return train
