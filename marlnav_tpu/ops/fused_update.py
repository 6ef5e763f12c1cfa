"""Pallas TPU kernels: PPO update gradients fused into one pass per batch.

Round-1 profiling showed the PPO update phase dominating training
wall-clock (actor 77%, critic 14% at the default config — BASELINE.md)
while the XLA program ran ~3x off HBM speed-of-light: each epoch
materializes the (rows, hidden) activations plus a dozen (rows,)
temporaries (log-probs, ratios, entropies, advantages, branch objectives)
through HBM, and the K=12 matmuls can't amortize any of it.

These kernels compute the per-minibatch loss AND all parameter gradients
of the actor / critic objectives (algo/mappo.py actor_loss / critic_loss,
which replicate reference models.py:270-316) in ONE streaming pass:

  * inputs live in a feature-major ``(features, rows)`` layout, so the row
    axis rides the TPU lanes at full density (the row-major ``(rows, 12)``
    layout would pad 12 -> 128 lanes and waste ~10x of the bandwidth);
  * each grid step loads a ``(features, BLK)`` tile, runs forward AND
    hand-derived backward entirely in VMEM/registers, and accumulates the
    (out, in)-shaped parameter-gradient sums plus the loss sum into
    VMEM-resident output refs — nothing row-sized ever returns to HBM;
  * the optimizer stays OUTSIDE (optax Adam on the returned grads): exact
    optimizer-semantics parity with the XLA path, and under a device mesh
    the gradient ``psum`` slots between kernel and Adam exactly as for any
    XLA-computed gradient.

Gradient semantics replicate jax.value_and_grad of the XLA losses
op-for-op, including JAX's balanced-tie rules (min/max ties propagate 0.5
to each branch — the COMMON case here: an unclipped PPO ratio makes both
actor objectives equal, a value inside the clip band makes both critic
branches equal) and relu'(0) = 0.  No PRNG is involved, so interpret mode
on CPU is fully functional (unlike the collect kernels).

Staging (transposes + advantage pairing + padding) happens once per
training phase — NOT per epoch — via ``stage_actor_minibatch`` /
``stage_critic_minibatch``; the epoch loop then re-consumes the staged
tensors.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlnav_tpu.config import MAPPOConfig

_LOG_2PI = math.log(2.0 * math.pi)

BLK = 4096  # rows (lanes) per grid step; ~1MB VMEM at H=50 incl. temporaries


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pick_blk(n_rows: int) -> int:
    """Full BLK for big batches; one padded block for small (test) ones."""
    return min(BLK, _round_up(max(n_rows, 1), 128))


class StagedActorBatch(NamedTuple):
    """Feature-major actor minibatch (one row per (step, env, agent)).
    Arrays only — the static real-row count travels separately so staged
    batches can be stacked and scanned."""

    obs: jax.Array  # (obs_size, N) f32
    actions: jax.Array  # (2, N)
    log_probs: jax.Array  # (1, N) behavior log-probs
    adv: jax.Array  # (1, N) advantages (pairing quirk already applied)
    mask: jax.Array  # (1, N) 1.0 for real rows, 0.0 for padding


class StagedCriticBatch(NamedTuple):
    """Feature-major critic minibatch (one row per (step, env))."""

    obs: jax.Array  # (A*obs_size, N)
    values: jax.Array  # (1, N) behavior values
    returns: jax.Array  # (1, N)
    mask: jax.Array  # (1, N)


def _pair_rows(x: jax.Array, num_agents: int, faithful: bool) -> jax.Array:
    """(size*P,) -> (size*P*A,) paired with agent-minor row order — the
    reference's ``Tensor.repeat`` tiling when faithful (the verified
    mis-pairing, reference models.py:285-286), repeat-interleave when not
    (same as algo/mappo.py _pair_per_agent)."""
    if faithful:
        return jnp.tile(x, num_agents)
    return jnp.repeat(x, num_agents)


def _pad_rows(x: jax.Array, n_pad: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1])))


def stage_actor_minibatch(mb, cfg: MAPPOConfig):
    """Buffer minibatch (leaves (size, P, ...)) -> (kernel layout, n_rows).

    Shapes are inferred from the minibatch itself (not cfg.num_parallel),
    so the same staging serves a per-shard buffer slice under shard_map."""
    size, p, a = mb.obs.shape[0], mb.obs.shape[1], mb.obs.shape[2]
    n = size * p * a
    n_pad = _round_up(n, _pick_blk(n))
    obs = _pad_rows(mb.obs.reshape(n, cfg.obs_size).T, n_pad)
    actions = _pad_rows(mb.actions.reshape(n, cfg.action_size).T, n_pad)
    log_probs = _pad_rows(mb.log_probs.reshape(1, n), n_pad)
    adv = (_pair_rows(mb.returns.reshape(size * p), a, cfg.faithful)
           - _pair_rows(mb.values.reshape(size * p), a, cfg.faithful))
    adv = _pad_rows(adv.reshape(1, n), n_pad)
    mask = (jnp.arange(n_pad, dtype=jnp.int32) < n).astype(jnp.float32)
    return StagedActorBatch(obs, actions, log_probs, adv, mask[None]), n


def stage_critic_minibatch(mb, cfg: MAPPOConfig):
    size, p = mb.obs.shape[0], mb.obs.shape[1]
    n = size * p
    n_pad = _round_up(n, _pick_blk(n))
    obs = _pad_rows(mb.obs.reshape(n, cfg.num_agents * cfg.obs_size).T, n_pad)
    values = _pad_rows(mb.values.reshape(1, n), n_pad)
    returns = _pad_rows(mb.returns.reshape(1, n), n_pad)
    mask = (jnp.arange(n_pad, dtype=jnp.int32) < n).astype(jnp.float32)
    return StagedCriticBatch(obs, values, returns, mask[None]), n


def _balanced_sel(a: jax.Array, b: jax.Array):
    """JAX's min/max tie rule: (weight on a-branch, weight on b-branch)
    for min(a, b); swap for max."""
    lt = (a < b).astype(jnp.float32)
    eq = (a == b).astype(jnp.float32)
    wa = lt + 0.5 * eq
    return wa, 1.0 - wa


def _dot(a: jax.Array, b: jax.Array, dims, dtype=None):
    if dtype is not None:
        a, b = a.astype(dtype), b.astype(dtype)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make_fused_actor_grad(cfg: MAPPOConfig, interpret: bool = False,
                          psum_axis: str | None = None):
    """Build ``grad(params, staged, n_rows) -> (loss, ActorParams-grads)``
    — the fused equivalent of ``jax.value_and_grad(actor_loss)``
    (algo/mappo.py).

    With ``psum_axis`` (inside shard_map) the kernel's loss/grad SUMS are
    all-reduced over that mesh axis before the 1/n_rows scaling, so
    ``n_rows`` must then be the GLOBAL row count — the data-parallel
    gradient exactly as the XLA path would produce it."""
    obs_size, eps, ent_c = cfg.obs_size, cfg.epsilon, cfg.ent_const
    dtype = jnp.bfloat16 if cfg.bf16_updates else None

    def kernel(obs_ref, act_ref, lp_ref, adv_ref, mask_ref,
               w1t, b1, wmut, bmu, wvart, bvar,
               loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
        h_size = w1t.shape[0]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (obs, BLK)
        mask = mask_ref[:]  # (1, BLK)

        # ---- forward (models/networks.py actor_apply; no fc1 activation,
        # reference models.py:29) ----
        h = _dot(w1t[:], x, ((1,), (0,)), dtype) + b1[:]  # (H, BLK)
        u = _dot(wmut[:], h, ((1,), (0,)), dtype) + bmu[:]  # (2, BLK)
        s = _dot(wvart[:], h, ((1,), (0,)), dtype) + bvar[:]
        mu = jnp.tanh(u)
        var = jax.nn.softplus(s)

        diff = act_ref[:] - mu  # (2, BLK)
        inv_var = 1.0 / var
        log_var = jnp.log(var)
        lp_new = -0.5 * (2.0 * _LOG_2PI
                         + jnp.sum(log_var + diff * diff * inv_var,
                                   axis=0, keepdims=True))  # (1, BLK)
        ent = (1.0 + _LOG_2PI) + 0.5 * jnp.sum(log_var, axis=0,
                                               keepdims=True)

        adv = adv_ref[:]
        ratio = jnp.exp(lp_new - lp_ref[:])
        clipped = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
        o1 = ratio * adv
        o2 = clipped * adv
        obj = jnp.minimum(o1, o2)

        loss_rows = -(obj + ent_c * ent) * mask
        loss_out[:] += jnp.sum(loss_rows, axis=1, keepdims=True)

        # ---- backward (mirrors jax.value_and_grad of actor_loss,
        # including balanced tie weights and clip-boundary halves) ----
        w_o1, w_o2 = _balanced_sel(o1, o2)
        lo, hi = 1.0 - eps, 1.0 + eps
        # d clip/d ratio: 1 inside, 0 outside, 0.5 exactly on a bound
        # (clip = min(max(r, lo), hi) under JAX's balanced ties).
        inside = ((ratio > lo).astype(jnp.float32)
                  * (ratio < hi).astype(jnp.float32))
        on_edge = ((ratio == lo).astype(jnp.float32)
                   + (ratio == hi).astype(jnp.float32))
        dclip = inside + 0.5 * on_edge
        g_obj = -mask  # d loss_row / d obj (row sums; /N outside)
        g_ratio = g_obj * adv * (w_o1 + w_o2 * dclip)
        g_lp = g_ratio * ratio  # (1, BLK)

        g_mu = g_lp * diff * inv_var  # (2, BLK)
        g_var = (g_lp * 0.5 * (diff * diff * inv_var - 1.0) * inv_var
                 - (ent_c * 0.5) * mask * inv_var)
        g_u = g_mu * (1.0 - mu * mu)
        g_s = g_var * jax.nn.sigmoid(s)

        g_h = (_dot(wmut[:], g_u, ((0,), (0,)), dtype)
               + _dot(wvart[:], g_s, ((0,), (0,)), dtype))  # (H, BLK)

        dwmu[:] += _dot(g_u, h, ((1,), (1,)), dtype)  # (2, H)
        dbmu[:] += jnp.sum(g_u, axis=1, keepdims=True)
        dwvar[:] += _dot(g_s, h, ((1,), (1,)), dtype)
        dbvar[:] += jnp.sum(g_s, axis=1, keepdims=True)
        dw1[:] += _dot(g_h, x, ((1,), (1,)), dtype)  # (H, obs)
        db1[:] += jnp.sum(g_h, axis=1, keepdims=True)

    def grad(params, staged: StagedActorBatch, n_rows: int):
        from marlnav_tpu.models.networks import ActorParams, Dense

        h_size = params.fc1.w.shape[1]
        n_pad = staged.obs.shape[1]
        blk = min(BLK, n_pad)
        grid = (n_pad // blk,)

        def row_spec(rows_dim):
            return pl.BlockSpec((rows_dim, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec(obs_size), row_spec(2), row_spec(1),
                      row_spec(1), row_spec(1),
                      full((h_size, obs_size)), full((h_size, 1)),
                      full((2, h_size)), full((2, 1)),
                      full((2, h_size)), full((2, 1))],
            out_specs=[full((1, 1)),
                       full((h_size, obs_size)), full((h_size, 1)),
                       full((2, h_size)), full((2, 1)),
                       full((2, h_size)), full((2, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (h_size, obs_size), (h_size, 1),
                        (2, h_size), (2, 1), (2, h_size), (2, 1))],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            staged.obs, staged.actions, staged.log_probs, staged.adv,
            staged.mask,
            params.fc1.w.T, params.fc1.b[:, None],
            params.fc_mu.w.T, params.fc_mu.b[:, None],
            params.fc_var.w.T, params.fc_var.b[:, None],
        )
        loss, dw1, db1, dwmu, dbmu, dwvar, dbvar = outs
        sums = (loss[0, 0], ActorParams(
            fc1=Dense(dw1.T, db1[:, 0]),
            fc_mu=Dense(dwmu.T, dbmu[:, 0]),
            fc_var=Dense(dwvar.T, dbvar[:, 0]),
        ))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g: g * inv_n, gsums)

    return grad


def make_fused_critic_grad(cfg: MAPPOConfig, interpret: bool = False,
                           psum_axis: str | None = None):
    """Build ``grad(params, staged, n_rows) -> (loss, CriticParams-grads)``
    — the fused equivalent of ``jax.value_and_grad(critic_loss)``
    (algo/mappo.py; clipped-value loss, reference models.py:301-316).
    ``psum_axis`` as in ``make_fused_actor_grad``."""
    in_size = cfg.num_agents * cfg.obs_size
    eps = cfg.epsilon
    dtype = jnp.bfloat16 if cfg.bf16_updates else None

    def kernel(obs_ref, vold_ref, ret_ref, mask_ref,
               w1t, b1, w2t, b2,
               loss_out, dw1, db1, dw2, db2):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dw1, db1, dw2, db2):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (A*obs, BLK)
        mask = mask_ref[:]

        pre = _dot(w1t[:], x, ((1,), (0,)), dtype) + b1[:]  # (H, BLK)
        h = jnp.maximum(pre, 0.0)
        v = _dot(w2t[:], h, ((1,), (0,)), dtype) + b2[:]  # (1, BLK)

        ret = ret_ref[:]
        vold = vold_ref[:]
        lo, hi = vold - eps, vold + eps
        clamped = jnp.clip(v, lo, hi)
        e1 = v - ret
        e2 = clamped - ret
        d1 = e1 * e1
        d2 = e2 * e2
        loss_out[:] += jnp.sum(jnp.maximum(d1, d2) * mask,
                               axis=1, keepdims=True)

        # max ties balanced; d clamp/d v with boundary halves as in clip.
        w_d2, w_d1 = _balanced_sel(d1, d2)  # max: weight on larger
        inside = ((v > lo).astype(jnp.float32)
                  * (v < hi).astype(jnp.float32))
        on_edge = ((v == lo).astype(jnp.float32)
                   + (v == hi).astype(jnp.float32))
        dclamp = inside + 0.5 * on_edge
        g_v = mask * 2.0 * (w_d1 * e1 + w_d2 * e2 * dclamp)  # (1, BLK)

        g_h = _dot(w2t[:], g_v, ((0,), (0,)), dtype)  # (H, BLK)
        g_pre = g_h * (pre > 0.0).astype(jnp.float32)  # relu'(0) = 0

        dw2[:] += _dot(g_v, h, ((1,), (1,)), dtype)  # (1, H)
        db2[:] += jnp.sum(g_v, axis=1, keepdims=True)
        dw1[:] += _dot(g_pre, x, ((1,), (1,)), dtype)  # (H, A*obs)
        db1[:] += jnp.sum(g_pre, axis=1, keepdims=True)

    def grad(params, staged: StagedCriticBatch, n_rows: int):
        from marlnav_tpu.models.networks import CriticParams, Dense

        h_size = params.fc1.w.shape[1]
        n_pad = staged.obs.shape[1]
        blk = min(BLK, n_pad)
        grid = (n_pad // blk,)

        def row_spec(rows_dim):
            return pl.BlockSpec((rows_dim, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec(in_size), row_spec(1), row_spec(1),
                      row_spec(1),
                      full((h_size, in_size)), full((h_size, 1)),
                      full((1, h_size)), full((1, 1))],
            out_specs=[full((1, 1)),
                       full((h_size, in_size)), full((h_size, 1)),
                       full((1, h_size)), full((1, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (h_size, in_size), (h_size, 1),
                        (1, h_size), (1, 1))],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            staged.obs, staged.values, staged.returns, staged.mask,
            params.fc1.w.T, params.fc1.b[:, None],
            params.fc2.w.T, params.fc2.b[:, None],
        )
        loss, dw1, db1, dw2, db2 = outs
        sums = (loss[0, 0], CriticParams(
            fc1=Dense(dw1.T, db1[:, 0]),
            fc2=Dense(dw2.T, db2[:, 0]),
        ))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g: g * inv_n, gsums)

    return grad
