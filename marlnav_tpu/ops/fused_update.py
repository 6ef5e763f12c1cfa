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

  * each grid step loads a feature-major tile, runs forward AND
    hand-derived backward entirely in VMEM/registers, and accumulates the
    parameter-gradient sums plus the loss sum into VMEM-resident output
    refs — nothing row-sized ever returns to HBM;
  * the optimizer stays OUTSIDE (optax Adam on the returned grads): exact
    optimizer-semantics parity with the XLA path, and under a device mesh
    the gradient ``psum`` slots between kernel and Adam exactly as for any
    XLA-computed gradient.

Sublane packing (round-2 rev 2): the first cut used ``(features, rows)``
tiles with rows on lanes, which put every per-row temporary on (1, BLK)
or (2, BLK) tiles — 1/8 to 1/4 of the 8 VPU sublanes doing work, and the
kernel measured VPU-bound exactly there.  This version packs G=8 row
GROUPS onto the sublanes: the row axis splits as (G, cols), inputs are
staged to ``(G*features, cols)``, and the tiny MLP weights are expanded
once per call into block-diagonal form (``kron(I_G, W)``, a few hundred
KB) so ONE matmul processes all 8 groups:

    h  = W1_bd  @ x   : (G*H, C)      e.g. (400, C) for H=50
    u  = Wmu_bd @ h   : (2*G, C)      heads channel-major: row c*G+g
    ...every per-row elementwise op now runs on (8, C) / (16, C) tiles
    at FULL sublane density...
    dW accumulators keep the block layout; the true (out, in) grads are
    the diagonal-block sums, extracted by one einsum outside the kernel.

The block-diagonal matmuls do up to G x the MACs of the per-group ideal,
but at K = G*features = 96 (vs 12) and M = G*H = 400 (vs 50) they tile
the 128x128 MXU far better, and the VPU-bound elementwise chain — the
measured bottleneck — gets the full 8x density win.  Measured v5e,
default config (3.07M rows x 50 epochs): actor phase 127 -> 95 ms at
G=8 (the packing moved the bound to the now-dilated f32 matmuls: the
~95 ms matches their MAC count at MXU speed-of-light).  The CRITIC is
matmul-bound from the start (its elementwise chain is short and its
input width A*obs = 36 already tiles lanes 3x better), so packing only
dilates its dominant cost: G=1 (no packing) measured fastest
(32 / 38 / 41 ms at G = 1 / 2 / 4) and is the critic default.

Affine collapse (round-2 rev 3, the current actor default): the
reference actor applies NO activation on its hidden layer (reference
models.py:29 — a replicated quirk), which makes the obs -> head
preactivations map AFFINE.  The ACTOR_LAYOUT="affine" kernel therefore
precomposes the two layers into one (4, 12) operator per minibatch call,
runs ONE small block-diagonal matmul forward + ONE outer-product
accumulator backward, and recomposes the five true parameter gradients
outside by the chain rule.  The kernel becomes streaming-bound: measured
DEVICE time 15.3 ms vs 67.8 ms for "packed" (4.4x) at the default config
— see ACTOR_LAYOUT below for the layout taxonomy and the measured
numbers, including the instructive failure of the intermediate
"undilated" layout.

Gradient semantics replicate jax.value_and_grad of the XLA losses
op-for-op, including JAX's balanced-tie rules (min/max ties propagate 0.5
to each branch — the COMMON case here: an unclipped PPO ratio makes both
actor objectives equal, a value inside the clip band makes both critic
branches equal) and relu'(0) = 0.  The affine layout's loss/grads match
to fp tolerance rather than bitwise (composite-product rounding).  No
PRNG is involved, so interpret mode on CPU is fully functional (unlike
the collect kernels).

Staging (transposes + advantage pairing + group packing + padding)
happens once per training phase — NOT per epoch — via
``stage_actor_minibatch`` / ``stage_critic_minibatch``; the epoch loop
then re-consumes the staged tensors.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marlnav_tpu.config import MAPPOConfig

_LOG_2PI = math.log(2.0 * math.pi)

import os

# Row groups packed onto the 8 VPU sublanes.  The packing multiplies the
# parameter-gradient matmul MACs by G (block-diagonal dilation) while
# multiplying elementwise VPU density by G — the best G per kernel depends
# on which side bounds it.  Measured v5e (default config): actor is
# VPU-chain-bound -> G=8; critic is matmul-bound -> G=1 (no packing).
# Env overrides for tuning: MARLNAV_ACTOR_G / MARLNAV_CRITIC_G.  The
# stage_* / make_* functions also take an explicit ``g`` (kernel and
# staging must agree) — used by make_mappo to cap G under the interpret-
# mode simulator, where large-G multi-shard runs can deadlock (below).
ACTOR_G = int(os.environ.get("MARLNAV_ACTOR_G", "8"))
CRITIC_G = int(os.environ.get("MARLNAV_CRITIC_G", "1"))
# A bf16-staged-obs variant for the critic (halving its staged HBM
# stream at the cost of one bf16 input rounding) was MEASURED on v5e and
# REMOVED: 0.0 ms change on the isolated phase (25.8 vs 25.8 device —
# the kernel is compute/pipeline-bound, not input-IO-bound) and only a
# 1-3% composed-repeat win from the halved staging relayout, on a path
# the tiled updates made non-default anyway (BASELINE.md r3 notes).
# Actor kernel layout (staging and kernel must agree):
#   "packed"    — every matmul block-diagonal-dilated (kron(I_G, W)), all
#                 tensors sublane-packed end to end.
#   "undilated" — matmuls run on PLAIN weights over a (features, G*cols)
#                 lane-major layout (G x fewer MACs: no block-diagonal
#                 dilation, and the dW accumulators are the true (out, in)
#                 shapes with the group sum absorbed into the contraction);
#                 the elementwise PPO chain still runs sublane-packed via
#                 the (2, G*C) <-> (2G, C) row-major reshape, which is a
#                 pure lane->sublane refold of the SAME row order.
#                 Measured v5e: SLOWER than packed (115.7 vs 94.7 ms) —
#                 the four refolds + narrow-M matmuls cost more than the
#                 8x MAC dilation they remove.  Kept for the record.
#   "affine"    — exploits the reference actor's missing hidden
#                 activation (reference models.py:29): the network is
#                 AFFINE from obs to head preactivations, so forward
#                 collapses to ONE (4G, 12G) block-diagonal matmul
#                 z = A_bd x with A = [[W1@Wmu]^T; [W1@Wvar]^T], and
#                 backward to ONE (4G, 12G) accumulator g_z x^T; the true
#                 five parameter gradients are recomposed OUTSIDE the
#                 kernel from the (4, 12) diagonal-block sum by the chain
#                 rule (tiny matmuls).  ~19x fewer kernel MACs than
#                 "packed", no refolds, no (G*H, cols) VMEM intermediate.
#                 Same math, different fp rounding (composite A vs two
#                 chained matmuls) — parity vs jax.value_and_grad holds
#                 to test tolerance, not bitwise.
# Measured v5e, default config, DEVICE time (5 phases scanned into one
# dispatch so the ~27 ms/dispatch tunnel latency is excluded): packed
# 67.8 ms/phase, affine 15.3 ms/phase (4.4x) — affine is the default.
ACTOR_LAYOUT = os.environ.get("MARLNAV_ACTOR_LAYOUT", "affine")
# G * columns per grid step, per kernel.  The packed layout's VMEM budget
# (the (G*H, cols) h / g_h intermediates) capped it at 8192; the affine
# kernel has no (G*H, cols) intermediate and measured best at 32768
# (15.7/15.3/15.5 ms at 16384/32768/65536).  The critic keeps 8192
# (its (H, cols) relu activations still dominate VMEM; 32768 overflows).
_ROWS_DEFAULT = os.environ.get("MARLNAV_UPDATE_ROWS_PER_STEP")
ACTOR_ROWS_PER_STEP = int(os.environ.get(
    "MARLNAV_ACTOR_ROWS_PER_STEP",
    _ROWS_DEFAULT or ("8192" if ACTOR_LAYOUT == "packed" else "32768")))
CRITIC_ROWS_PER_STEP = int(os.environ.get(
    "MARLNAV_CRITIC_ROWS_PER_STEP", _ROWS_DEFAULT or "8192"))


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pick_cols(n_rows: int, g: int, rows_per_step: int) -> tuple[int, int]:
    """Total packed columns (multiple of the lane tile) and the per-grid-
    step column block; a full rows_per_step block for big batches, one
    padded block for small (test) ones."""
    c = _round_up(max(n_rows, 1), g * 128) // g
    blk = min(rows_per_step // g, c)
    return _round_up(c, blk), blk


class StagedActorBatch(NamedTuple):
    """Sublane-packed actor minibatch (one row per (step, env, agent);
    row r lives at group g = r // C, column j = r % C).  Arrays only —
    the static real-row count travels separately so staged batches can be
    stacked and scanned."""

    obs: jax.Array  # (G*obs_size, C) group-major rows g*obs+f
    actions: jax.Array  # (2*G, C) channel-major rows c*G+g
    log_probs: jax.Array  # (G, C) behavior log-probs
    adv: jax.Array  # (G, C) advantages (pairing quirk already applied)
    mask: jax.Array  # (G, C) 1.0 for real rows, 0.0 for padding


class StagedCriticBatch(NamedTuple):
    """Sublane-packed critic minibatch (one row per (step, env))."""

    obs: jax.Array  # (G*A*obs_size, C)
    values: jax.Array  # (G, C) behavior values
    returns: jax.Array  # (G, C)
    mask: jax.Array  # (G, C)


def _pair_rows(x: jax.Array, num_agents: int, faithful: bool) -> jax.Array:
    """(size*P,) -> (size*P*A,) paired with agent-minor row order — the
    reference's ``Tensor.repeat`` tiling when faithful (the verified
    mis-pairing, reference models.py:285-286), repeat-interleave when not
    (same as algo/mappo.py _pair_per_agent)."""
    if faithful:
        return jnp.tile(x, num_agents)
    return jnp.repeat(x, num_agents)


def _pair_rows_sharded(d_local: jax.Array, num_agents: int, faithful: bool,
                       pair_axis: str) -> jax.Array:
    """Per-shard slice of ``_pair_rows`` over the GLOBAL env batch, for
    staging inside a shard_map over ``pair_axis``.

    ``d_local`` is this shard's (size, P_local) returns - values.  The
    fixed (repeat-interleave) pairing is shard-local: global row
    (t, p, a) reads d[t, p], which every shard owns for its own rows.
    The FAITHFUL pairing is the reference's flat tile over the global
    (size*P,) vector (reference models.py:285-286): global actor row
    j = (t*P + p)*A + a reads d_flat[j mod size*P] — a pattern that
    crosses shard boundaries, so the (tiny, (size, P) f32) d is
    all_gathered and each shard gathers exactly its own rows' entries.
    Returns this shard's (size*P_local*A,) advantage vector in the
    local (t, p_local, a) row order ``stage_actor_minibatch`` packs."""
    if not faithful:
        return jnp.repeat(d_local.reshape(-1), num_agents)
    size, p_local = d_local.shape
    d_global = jax.lax.all_gather(d_local, pair_axis, axis=1, tiled=True)
    p_global = d_global.shape[1]
    p0 = jax.lax.axis_index(pair_axis) * p_local
    j = ((jnp.arange(size)[:, None, None] * p_global
          + (p0 + jnp.arange(p_local))[None, :, None]) * num_agents
         + jnp.arange(num_agents)[None, None, :])
    return d_global.reshape(-1)[j.reshape(-1) % (size * p_global)]


def _pack_group(x: jax.Array, c: int, g: int) -> jax.Array:
    """(R, n) feature-major -> (G*R, c) with rows g*R+f: column j of
    group g holds source row g*c + j."""
    r = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, g * c - x.shape[1])))
    return x.reshape(r, g, c).transpose(1, 0, 2).reshape(g * r, c)


def _pack_chan(x: jax.Array, c: int, g: int) -> jax.Array:
    """(R, n) -> (R*G, c) with rows f*G+g (channel-major) — the head
    layout, so per-channel slices are contiguous sublane runs."""
    r = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, g * c - x.shape[1])))
    return x.reshape(r, g, c).reshape(r * g, c)


def _pack_lanes(x: jax.Array, c: int, blk: int, g: int) -> jax.Array:
    """(R, n) feature-major -> (R, G*c) lane-major for the undilated
    layout: per grid-step block i, the G groups' column windows sit side
    by side on lanes — column i*G*blk + grp*blk + j holds source row
    grp*c + i*blk + j, the SAME row the packed layout's block i places at
    (sublane grp, lane j)."""
    r = x.shape[0]
    x = jnp.pad(x, ((0, 0), (0, g * c - x.shape[1])))
    return (x.reshape(r, g, c // blk, blk).transpose(0, 2, 1, 3)
            .reshape(r, g * c))


def _pack_mask(n: int, c: int, g: int) -> jax.Array:
    rows = jnp.arange(g, dtype=jnp.int32)[:, None] * c \
        + jnp.arange(c, dtype=jnp.int32)[None, :]
    return (rows < n).astype(jnp.float32)


def _bd_group(wt: jax.Array, g: int) -> jax.Array:
    """Transposed weight (out, in) -> block-diagonal (g*out, g*in) with
    BOTH axes group-major — kron(I_g, wt)."""
    out, inn = wt.shape
    eye = jnp.eye(g, dtype=wt.dtype)
    return (eye[:, None, :, None] * wt[None, :, None, :]).reshape(
        g * out, g * inn)


def _bd_chan(wt: jax.Array, g: int) -> jax.Array:
    """Transposed weight (out, in) -> (out*g, g*in): rows channel-major
    (c*g+grp), columns group-major — the head matmul against group-major
    activations, emitting channel-major outputs."""
    out, inn = wt.shape
    eye = jnp.eye(g, dtype=wt.dtype)
    return (wt[:, None, None, :] * eye[None, :, :, None]).reshape(
        out * g, g * inn)


def _unpack_w_group(dw: jax.Array, out: int, inn: int, g: int) -> jax.Array:
    """(g*out, g*in) block accumulator -> true (out, in) grad: sum of the
    diagonal blocks."""
    return jnp.einsum("gkgf->kf", dw.reshape(g, out, g, inn))


def _unpack_w_chan(dw: jax.Array, out: int, inn: int, g: int) -> jax.Array:
    return jnp.einsum("cggk->ck", dw.reshape(out, g, g, inn))


def stage_actor_minibatch(mb, cfg: MAPPOConfig, g: int | None = None,
                          layout: str | None = None,
                          pair_axis: str | None = None):
    """Buffer minibatch (leaves (size, P, ...)) -> (kernel layout, n_rows).

    Shapes are inferred from the minibatch itself (not cfg.num_parallel),
    so the same staging serves a per-shard buffer slice under shard_map —
    with ``pair_axis`` (the mesh axis name, required for faithful
    semantics under a mesh) the advantage pairing follows the reference's
    GLOBAL flat tile via ``_pair_rows_sharded``.  Only ``obs`` depends on
    ``layout`` (the matmul operand); the elementwise-chain tensors are
    sublane-packed in both layouts."""
    size, p, a = mb.obs.shape[0], mb.obs.shape[1], mb.obs.shape[2]
    g = ACTOR_G if g is None else g
    layout = ACTOR_LAYOUT if layout is None else layout
    n = size * p * a
    c, blk = _pick_cols(n, g, ACTOR_ROWS_PER_STEP)
    obs_t = mb.obs.reshape(n, cfg.obs_size).T
    if layout == "undilated":
        obs = _pack_lanes(obs_t, c, blk, g)
    else:  # "packed" and "affine" share the group-major staging
        obs = _pack_group(obs_t, c, g)
    actions = _pack_chan(mb.actions.reshape(n, cfg.action_size).T, c, g)
    log_probs = _pack_group(mb.log_probs.reshape(1, n), c, g)
    d = mb.returns.reshape(size, p) - mb.values.reshape(size, p)
    if pair_axis is not None:
        adv = _pair_rows_sharded(d, a, cfg.faithful, pair_axis)
    else:
        adv = _pair_rows(d.reshape(size * p), a, cfg.faithful)
    adv = _pack_group(adv.reshape(1, n), c, g)
    return StagedActorBatch(obs, actions, log_probs, adv,
                            _pack_mask(n, c, g)), n


def stage_critic_minibatch(mb, cfg: MAPPOConfig, g: int | None = None):
    size, p = mb.obs.shape[0], mb.obs.shape[1]
    g = CRITIC_G if g is None else g
    n = size * p
    c, _ = _pick_cols(n, g, CRITIC_ROWS_PER_STEP)
    obs = _pack_group(
        mb.obs.reshape(n, cfg.num_agents * cfg.obs_size).T, c, g)
    values = _pack_group(mb.values.reshape(1, n), c, g)
    returns = _pack_group(mb.returns.reshape(1, n), c, g)
    return StagedCriticBatch(obs, values, returns, _pack_mask(n, c, g)), n


def _balanced_sel(a: jax.Array, b: jax.Array):
    """JAX's min/max tie rule: (weight on a-branch, weight on b-branch)
    for min(a, b); swap for max."""
    lt = (a < b).astype(jnp.float32)
    eq = (a == b).astype(jnp.float32)
    wa = lt + 0.5 * eq
    return wa, 1.0 - wa


def _ppo_chain(u, s, act, lp_b, adv, mask, g, eps, ent_c):
    """The actor objective's elementwise forward-from-preactivations and
    hand-derived backward on channel-major ``(2G, C)`` tiles (rows c*G+grp;
    per-row quantities on ``(G, C)``).  Shared by both kernel layouts.
    Returns ``(loss_sum (1,1), g_u (2G,C), g_s (2G,C))``."""
    mu = jnp.tanh(u)
    # softplus and its derivative sigmoid(s) (used in the backward pass)
    # share ONE exp via the overflow-safe formulation:
    # softplus(s) = max(s,0) + log1p(e), sigmoid(s) = {1, e}/(1+e)
    # for s {>=, <} 0, with e = exp(-|s|).  Equal to jax.nn.softplus /
    # the logistic to f32 ulps; saves a transcendental per element on
    # the hot (2G, C) tiles.
    e_s = jnp.exp(-jnp.abs(s))
    var = jnp.maximum(s, 0.0) + jnp.log1p(e_s)

    diff = act - mu  # (2G, C)
    inv_var = 1.0 / var
    log_var = jnp.log(var)
    zz = diff * diff * inv_var
    lv_sum = log_var[:g] + log_var[g:]  # (g, C): both action dims
    lp_new = -0.5 * (2.0 * _LOG_2PI + lv_sum + zz[:g] + zz[g:])
    ent = (1.0 + _LOG_2PI) + 0.5 * lv_sum

    ratio = jnp.exp(lp_new - lp_b)
    clipped = jnp.clip(ratio, 1.0 - eps, 1.0 + eps)
    o1 = ratio * adv
    o2 = clipped * adv
    obj = jnp.minimum(o1, o2)

    loss_rows = -(obj + ent_c * ent) * mask
    loss_sum = jnp.sum(loss_rows, axis=(0, 1), keepdims=True)

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
    g_lp = g_ratio * ratio  # (G, C)

    g_lp2 = jnp.concatenate([g_lp, g_lp], axis=0)  # (2G, C)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    g_mu = g_lp2 * diff * inv_var  # (2G, C)
    g_var = (g_lp2 * 0.5 * (zz - 1.0) * inv_var
             - (ent_c * 0.5) * mask2 * inv_var)
    g_u = g_mu * (1.0 - mu * mu)
    r_e = 1.0 / (1.0 + e_s)
    g_s = g_var * jnp.where(s >= 0.0, r_e, e_s * r_e)
    return loss_sum, g_u, g_s


def _critic_chain(v, vold, ret, mask, eps):
    """The clipped-value loss's elementwise forward-from-values and
    hand-derived backward (reference models.py:301-316), on whatever tile
    shape the caller's layout produces.  Shared by the staged critic
    kernel and the tiled one (ops/fused_update_tiled.py).  Returns
    ``(loss_sum (1, 1), g_v same shape as v)``."""
    lo, hi = vold - eps, vold + eps
    clamped = jnp.clip(v, lo, hi)
    e1 = v - ret
    e2 = clamped - ret
    d1 = e1 * e1
    d2 = e2 * e2
    loss_sum = jnp.sum(jnp.maximum(d1, d2) * mask, axis=None,
                       keepdims=False).reshape(1, 1)

    # max ties balanced; d clamp/d v with boundary halves as in clip.
    w_d2, w_d1 = _balanced_sel(d1, d2)  # max: weight on larger
    inside = ((v > lo).astype(jnp.float32)
              * (v < hi).astype(jnp.float32))
    on_edge = ((v == lo).astype(jnp.float32)
               + (v == hi).astype(jnp.float32))
    dclamp = inside + 0.5 * on_edge
    g_v = mask * 2.0 * (w_d1 * e1 + w_d2 * e2 * dclamp)
    return loss_sum, g_v


def _dot(a: jax.Array, b: jax.Array, dims, dtype=None):
    if dtype is not None:
        a, b = a.astype(dtype), b.astype(dtype)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make_fused_actor_grad(cfg: MAPPOConfig, interpret: bool = False,
                          psum_axis: str | None = None,
                          g: int | None = None,
                          layout: str | None = None):
    """Build ``grad(params, staged, n_rows) -> (loss, ActorParams-grads)``
    — the fused equivalent of ``jax.value_and_grad(actor_loss)``
    (algo/mappo.py).

    With ``psum_axis`` (inside shard_map) the kernel's loss/grad SUMS are
    all-reduced over that mesh axis before the 1/n_rows scaling, so
    ``n_rows`` must then be the GLOBAL row count — the data-parallel
    gradient exactly as the XLA path would produce it.  ``g`` must match
    the staging G and ``layout`` the staging layout (defaults: module
    ACTOR_G / ACTOR_LAYOUT)."""
    obs_size, eps, ent_c = cfg.obs_size, cfg.epsilon, cfg.ent_const
    g = ACTOR_G if g is None else g
    layout = ACTOR_LAYOUT if layout is None else layout
    dtype = jnp.bfloat16 if cfg.bf16_updates else None
    if layout == "undilated":
        return _make_actor_grad_undilated(cfg, interpret, psum_axis, g,
                                          obs_size, eps, ent_c, dtype)
    if layout == "affine":
        return _make_actor_grad_affine(cfg, interpret, psum_axis, g,
                                       obs_size, eps, ent_c, dtype)

    def kernel(obs_ref, act_ref, lp_ref, adv_ref, mask_ref,
               w1bd, b1p, wmubd, bmup, wvarbd, bvarp,
               loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (G*obs, C)

        # ---- forward (models/networks.py actor_apply; no fc1 activation,
        # reference models.py:29) ----
        h = _dot(w1bd[:], x, ((1,), (0,)), dtype) + b1p[:]  # (G*H, C)
        u = _dot(wmubd[:], h, ((1,), (0,)), dtype) + bmup[:]  # (2G, C)
        s = _dot(wvarbd[:], h, ((1,), (0,)), dtype) + bvarp[:]

        loss_sum, g_u, g_s = _ppo_chain(u, s, act_ref[:], lp_ref[:],
                                        adv_ref[:], mask_ref[:],
                                        g, eps, ent_c)
        loss_out[:] += loss_sum

        g_h = (_dot(wmubd[:], g_u, ((0,), (0,)), dtype)
               + _dot(wvarbd[:], g_s, ((0,), (0,)), dtype))  # (G*H, C)

        dwmu[:] += _dot(g_u, h, ((1,), (1,)), dtype)  # (2G, G*H)
        dbmu[:] += jnp.sum(g_u, axis=1, keepdims=True)
        dwvar[:] += _dot(g_s, h, ((1,), (1,)), dtype)
        dbvar[:] += jnp.sum(g_s, axis=1, keepdims=True)
        dw1[:] += _dot(g_h, x, ((1,), (1,)), dtype)  # (G*H, G*obs)
        db1[:] += jnp.sum(g_h, axis=1, keepdims=True)

    def grad(params, staged: StagedActorBatch, n_rows: int):
        from marlnav_tpu.models.networks import ActorParams, Dense

        h_size = params.fc1.w.shape[1]
        c = staged.obs.shape[1]
        blk = min(ACTOR_ROWS_PER_STEP // g, c)
        grid = (c // blk,)
        gh, go = g * h_size, g * obs_size

        def col_spec(rows_dim):
            return pl.BlockSpec((rows_dim, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[col_spec(go), col_spec(2 * g), col_spec(g),
                      col_spec(g), col_spec(g),
                      full((gh, go)), full((gh, 1)),
                      full((2 * g, gh)), full((2 * g, 1)),
                      full((2 * g, gh)), full((2 * g, 1))],
            out_specs=[full((1, 1)),
                       full((gh, go)), full((gh, 1)),
                       full((2 * g, gh)), full((2 * g, 1)),
                       full((2 * g, gh)), full((2 * g, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (gh, go), (gh, 1),
                        (2 * g, gh), (2 * g, 1), (2 * g, gh), (2 * g, 1))],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            staged.obs, staged.actions, staged.log_probs, staged.adv,
            staged.mask,
            _bd_group(params.fc1.w.T, g),
            jnp.tile(params.fc1.b, g)[:, None],
            _bd_chan(params.fc_mu.w.T, g),
            jnp.repeat(params.fc_mu.b, g)[:, None],
            _bd_chan(params.fc_var.w.T, g),
            jnp.repeat(params.fc_var.b, g)[:, None],
        )
        loss, dw1, db1, dwmu, dbmu, dwvar, dbvar = outs
        sums = (loss[0, 0], ActorParams(
            fc1=Dense(_unpack_w_group(dw1, h_size, obs_size, g).T,
                      jnp.sum(db1.reshape(g, h_size), axis=0)),
            fc_mu=Dense(_unpack_w_chan(dwmu, 2, h_size, g).T,
                        jnp.sum(dbmu.reshape(2, g), axis=1)),
            fc_var=Dense(_unpack_w_chan(dwvar, 2, h_size, g).T,
                         jnp.sum(dbvar.reshape(2, g), axis=1)),
        ))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g: g * inv_n, gsums)

    return grad


def _make_actor_grad_undilated(cfg, interpret, psum_axis, g,
                               obs_size, eps, ent_c, dtype):
    """The "undilated" actor kernel: matmuls on PLAIN weights over a
    lane-major (features, G*C) layout — G x fewer MACs than the
    block-diagonal form, dW accumulators directly in the true (out, in)
    shapes — with the elementwise PPO chain still sublane-packed via the
    row-major refolds (2, G*C) <-> (2G, C) (see _pack_lanes: block i's
    lane order is (group, j), so the refold lands each group on its
    packed sublane)."""

    def kernel(obs_ref, act_ref, lp_ref, adv_ref, mask_ref,
               w1t, b1, wmut, bmu, wvart, bvar,
               loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dw1, db1, dwmu, dbmu, dwvar, dbvar):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (obs, G*BLK)

        # ---- forward (models/networks.py actor_apply; no fc1 activation,
        # reference models.py:29) ----
        h = _dot(w1t[:], x, ((1,), (0,)), dtype) + b1[:]  # (H, G*BLK)
        u_l = _dot(wmut[:], h, ((1,), (0,)), dtype) + bmu[:]  # (2, G*BLK)
        s_l = _dot(wvart[:], h, ((1,), (0,)), dtype) + bvar[:]

        # lane->sublane refold: (2, G*BLK) -> (2G, BLK) channel-major.
        u = u_l.reshape(2 * g, -1)
        s = s_l.reshape(2 * g, -1)
        loss_sum, g_u, g_s = _ppo_chain(u, s, act_ref[:], lp_ref[:],
                                        adv_ref[:], mask_ref[:],
                                        g, eps, ent_c)
        loss_out[:] += loss_sum
        g_u_l = g_u.reshape(2, -1)  # sublane->lane refold back
        g_s_l = g_s.reshape(2, -1)

        g_h = (_dot(wmut[:], g_u_l, ((0,), (0,)), dtype)
               + _dot(wvart[:], g_s_l, ((0,), (0,)), dtype))  # (H, G*BLK)

        # The lane contraction runs over ALL G groups at once, so each dW
        # accumulates the true group-summed gradient — no diagonal-block
        # extraction.
        dwmu[:] += _dot(g_u_l, h, ((1,), (1,)), dtype)  # (2, H)
        dbmu[:] += jnp.sum(g_u_l, axis=1, keepdims=True)
        dwvar[:] += _dot(g_s_l, h, ((1,), (1,)), dtype)
        dbvar[:] += jnp.sum(g_s_l, axis=1, keepdims=True)
        dw1[:] += _dot(g_h, x, ((1,), (1,)), dtype)  # (H, obs)
        db1[:] += jnp.sum(g_h, axis=1, keepdims=True)

    def grad(params, staged: StagedActorBatch, n_rows: int):
        from marlnav_tpu.models.networks import ActorParams, Dense

        h_size = params.fc1.w.shape[1]
        c = staged.obs.shape[1] // g
        blk = min(ACTOR_ROWS_PER_STEP // g, c)
        grid = (c // blk,)

        def col_spec(rows_dim, cols_dim):
            return pl.BlockSpec((rows_dim, cols_dim), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[col_spec(obs_size, g * blk), col_spec(2 * g, blk),
                      col_spec(g, blk), col_spec(g, blk), col_spec(g, blk),
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
        return loss_sum * inv_n, jax.tree.map(lambda g_: g_ * inv_n, gsums)

    return grad


def _affine_compose(params):
    """Precompose the activation-free actor into the (4, obs) operator
    z = a_comp x + c_comp (column convention; see _make_actor_grad_affine).

    Composed at HIGHEST matmul precision: these are (obs, H) @ (H, 2)
    matmuls — nothing at runtime scale — and the collect kernel samples
    its whole trajectory through this operator, so bf16-pass compose
    error (~1e-3) would otherwise dominate every downstream parity
    tolerance.

    The operator's BITS are program-dependent: the compose is traced
    into every consuming program (solo kernel, meshed shard_map, XLA
    mirror), and XLA compiles it with 1-ulp-different rounding per
    program context.  Measured on CPU (round 4): the dot form, the dot
    behind lax.optimization_barrier, and an unrolled fixed-order
    scalar-chain form ALL produce cross-program ulp differences — there
    is no traced formulation with a cross-program bit guarantee.  Mesh
    parity tests therefore compare cross-PROGRAM results at ulp
    tolerance and reserve bitwise assertions for within-executable
    properties (tests/test_fused_collect.py::
    test_two_shard_mesh_generic_interpret's shard-swap check)."""
    hi = jax.lax.Precision.HIGHEST
    w1, b1 = params.fc1.w, params.fc1.b  # (obs, H), (H,)
    wmu, bmu = params.fc_mu.w, params.fc_mu.b  # (H, 2), (2,)
    wvar, bvar = params.fc_var.w, params.fc_var.b
    a_comp = jnp.concatenate([jnp.matmul(w1, wmu, precision=hi).T,
                              jnp.matmul(w1, wvar, precision=hi).T])  # (4, obs)
    c_comp = jnp.concatenate([
        jnp.matmul(b1, wmu, precision=hi) + bmu,
        jnp.matmul(b1, wvar, precision=hi) + bvar])  # (4,)
    return a_comp, c_comp


def _affine_recompose(params, dz, dzs):
    """Chain-rule the (4, obs) accumulator sums back into the five true
    parameter gradients: dz = [Σ g_u x^T; Σ g_s x^T], dzs = [Σ g_u; Σ g_s]."""
    from marlnav_tpu.models.networks import ActorParams, Dense

    w1, b1 = params.fc1.w, params.fc1.b
    wmu, wvar = params.fc_mu.w, params.fc_var.w
    guxt, gsxt = dz[:2], dz[2:]
    su, ss = dzs[:2], dzs[2:]
    return ActorParams(
        fc1=Dense(guxt.T @ wmu.T + gsxt.T @ wvar.T,
                  wmu @ su + wvar @ ss),
        fc_mu=Dense((guxt @ w1).T + b1[:, None] * su[None, :], su),
        fc_var=Dense((gsxt @ w1).T + b1[:, None] * ss[None, :], ss),
    )


def _make_actor_grad_affine(cfg, interpret, psum_axis, g,
                            obs_size, eps, ent_c, dtype):
    """The "affine" actor kernel (see ACTOR_LAYOUT): because the reference
    actor applies NO hidden activation (reference models.py:29), the map
    from obs to head preactivations is affine —

        u = (W1 Wmu)^T x + (Wmu^T b1 + bmu),   s = likewise,

    so the kernel runs ONE (4G, 12G) block-diagonal matmul forward and
    accumulates ONE (4G, 12G) outer-product backward; the five true
    parameter gradients are recomposed outside by the chain rule:

        dWmu = (Σ g_u x^T) W1 + b1 ⊗ Σ g_u          (then transposed
        dW1  = x-major: (Σ g_u x^T)^T Wmu^T + (Σ g_s x^T)^T Wvar^T
        db1  = Wmu Σ g_u + Wvar Σ g_s                into Dense layout)

    where Σ g_u x^T / Σ g_s x^T are the diagonal-block sums of the
    kernel's accumulator.  Same math as "packed", different fp rounding
    (the composite products) — parity holds to test tolerance."""

    def kernel(obs_ref, act_ref, lp_ref, adv_ref, mask_ref,
               abd, cp, loss_out, dzbd, dzsum):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dzbd, dzsum):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (G*obs, BLK)
        z = _dot(abd[:], x, ((1,), (0,)), dtype) + cp[:]  # (4G, BLK)
        loss_sum, g_u, g_s = _ppo_chain(z[:2 * g], z[2 * g:], act_ref[:],
                                        lp_ref[:], adv_ref[:], mask_ref[:],
                                        g, eps, ent_c)
        loss_out[:] += loss_sum
        g_z = jnp.concatenate([g_u, g_s], axis=0)  # (4G, BLK)
        dzbd[:] += _dot(g_z, x, ((1,), (1,)), dtype)  # (4G, G*obs)
        dzsum[:] += jnp.sum(g_z, axis=1, keepdims=True)

    def grad(params, staged: StagedActorBatch, n_rows: int):
        a_comp, c_comp = _affine_compose(params)
        c = staged.obs.shape[1]
        blk = min(ACTOR_ROWS_PER_STEP // g, c)
        grid = (c // blk,)
        go = g * obs_size

        def col_spec(rows_dim):
            return pl.BlockSpec((rows_dim, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[col_spec(go), col_spec(2 * g), col_spec(g),
                      col_spec(g), col_spec(g),
                      full((4 * g, go)), full((4 * g, 1))],
            out_specs=[full((1, 1)), full((4 * g, go)), full((4 * g, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (4 * g, go), (4 * g, 1))],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            staged.obs, staged.actions, staged.log_probs, staged.adv,
            staged.mask,
            _bd_chan(a_comp, g),
            jnp.repeat(c_comp, g)[:, None],
        )
        loss, dzbd, dzsum = outs
        dz = _unpack_w_chan(dzbd, 4, obs_size, g)  # (4, obs) true sums
        dzs = jnp.sum(dzsum.reshape(4, g), axis=1)  # (4,)
        sums = (loss[0, 0], _affine_recompose(params, dz, dzs))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g_: g_ * inv_n, gsums)

    return grad


def make_fused_critic_grad(cfg: MAPPOConfig, interpret: bool = False,
                           psum_axis: str | None = None,
                           g: int | None = None):
    """Build ``grad(params, staged, n_rows) -> (loss, CriticParams-grads)``
    — the fused equivalent of ``jax.value_and_grad(critic_loss)``
    (algo/mappo.py; clipped-value loss, reference models.py:301-316).
    ``psum_axis`` / ``g`` as in ``make_fused_actor_grad``."""
    in_size = cfg.num_agents * cfg.obs_size
    eps = cfg.epsilon
    g = CRITIC_G if g is None else g
    dtype = jnp.bfloat16 if cfg.bf16_updates else None

    def kernel(obs_ref, vold_ref, ret_ref, mask_ref,
               w1bd, b1p, w2bd, b2p,
               loss_out, dw1, db1, dw2, db2):
        @pl.when(pl.program_id(0) == 0)
        def _():
            for o in (loss_out, dw1, db1, dw2, db2):
                o[:] = jnp.zeros_like(o)

        x = obs_ref[:]  # (G*A*obs, C)
        mask = mask_ref[:]  # (G, C)

        pre = _dot(w1bd[:], x, ((1,), (0,)), dtype) + b1p[:]  # (G*H, C)
        h = jnp.maximum(pre, 0.0)
        v = _dot(w2bd[:], h, ((1,), (0,)), dtype) + b2p[:]  # (G, C)

        loss_sum, g_v = _critic_chain(v, vold_ref[:], ret_ref[:], mask, eps)
        loss_out[:] += loss_sum  # g_v (G, C)

        g_h = _dot(w2bd[:], g_v, ((0,), (0,)), dtype)  # (G*H, C)
        # (h > 0) == (pre > 0) exactly for relu, so pre need not be kept
        # live across the dw2 matmul.
        g_pre = g_h * (h > 0.0).astype(jnp.float32)  # relu'(0) = 0

        dw2[:] += _dot(g_v, h, ((1,), (1,)), dtype)  # (G, G*H)
        db2[:] += jnp.sum(g_v, axis=1, keepdims=True)
        dw1[:] += _dot(g_pre, x, ((1,), (1,)), dtype)  # (G*H, G*A*obs)
        db1[:] += jnp.sum(g_pre, axis=1, keepdims=True)

    def grad(params, staged: StagedCriticBatch, n_rows: int):
        from marlnav_tpu.models.networks import CriticParams, Dense

        h_size = params.fc1.w.shape[1]
        c = staged.obs.shape[1]
        blk = min(CRITIC_ROWS_PER_STEP // g, c)
        grid = (c // blk,)
        gh, gi = g * h_size, g * in_size

        def col_spec(rows_dim):
            return pl.BlockSpec((rows_dim, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        def full(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[col_spec(gi), col_spec(g), col_spec(g), col_spec(g),
                      full((gh, gi)), full((gh, 1)),
                      full((g, gh)), full((g, 1))],
            out_specs=[full((1, 1)),
                       full((gh, gi)), full((gh, 1)),
                       full((g, gh)), full((g, 1))],
            out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in
                       ((1, 1), (gh, gi), (gh, 1), (g, gh), (g, 1))],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            staged.obs, staged.values, staged.returns, staged.mask,
            _bd_group(params.fc1.w.T, g),
            jnp.tile(params.fc1.b, g)[:, None],
            _bd_chan(params.fc2.w.T, g),
            jnp.tile(params.fc2.b, g)[:, None],
        )
        loss, dw1, db1, dw2, db2 = outs
        sums = (loss[0, 0], CriticParams(
            fc1=Dense(_unpack_w_group(dw1, h_size, in_size, g).T,
                      jnp.sum(db1.reshape(g, h_size), axis=0)),
            fc2=Dense(_unpack_w_chan(dw2, 1, h_size, g).T,
                      jnp.sum(db2.reshape(1, g), axis=1)),
        ))
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        loss_sum, gsums = sums
        inv_n = 1.0 / n_rows
        return loss_sum * inv_n, jax.tree.map(lambda g: g * inv_n, gsums)

    return grad
