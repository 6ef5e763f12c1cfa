"""Real-TPU numerics check for the fused PPO-update kernels.

The CPU parity suite (tests/test_fused_update.py) runs the kernels under
the Pallas interpreter; production runs the MOSAIC lowering on hardware,
which is a different compiler path (and the affine layout additionally
reorders fp operations).  This script re-runs the loss+gradient parity
checks against ``jax.value_and_grad`` of the XLA losses ON THE TPU
ITSELF, for every kernel variant that can ship:

  actor: packed / undilated / affine layouts x faithful / fixed pairing
  critic: G=1 x faithful / fixed
  tiled actor + tiled critic x faithful / fixed (multi-step Pallas grids
  in both dimensions — see the tp/tt comment below)

Each check prints one JSON verdict line; the last line is a summary with
``all_ok``.  Run directly (``python scripts/check_tpu_updates.py``) or
via ``pytest -m tpu`` (tests/test_tpu_updates.py).

Tolerances: the XLA reference itself computes its matmuls with the TPU's
default (bf16-pass) precision while the kernels accumulate f32 sums in a
different order, so hardware parity is judged by a LEAF-NORM-SCALED
criterion (see GRAD_TOL) rather than the interpreter suite's 2e-5
entrywise tolerance (there both sides share one host fp path).

Branch robustness: on hardware the two sides' forward values differ by
up to ~6e-3 (measured: bf16-pass matmul precision), so a row whose PPO
ratio / critic value sits within that distance of a clip boundary takes
DIFFERENT branches on the two sides and the gradients legitimately
diverge (with the default eps=0.01 band this is near-certain for random
data).  The test data is therefore constructed branch-robust: eps=0.2,
behavior values/log-probs placed either far outside the clip band or
EXACTLY at the tie point (ties are fp-exact on both sides — clip returns
its argument bitwise inside the band — and JAX's balanced tie rule makes
them parity-safe), and max-branch gaps nudged away from zero via an f64
mirror of the forwards.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from marlnav_tpu.algo import Buffer
from marlnav_tpu.algo.mappo import actor_loss, critic_loss, minibatch_slices
from marlnav_tpu.config import MAPPOConfig
from marlnav_tpu.models import actor_init, critic_init
from marlnav_tpu.ops.fused_update import (
    make_fused_actor_grad,
    make_fused_critic_grad,
    stage_actor_minibatch,
    stage_critic_minibatch,
)

A, OBS, H = 3, 12, 50
T, P, BATCH = 12, 128, 6
# Leaf-norm-scaled gradient criterion: max|k - r| / max|r| per leaf.
# Per-ENTRY relative error is the wrong metric here — bf16-pass matmul
# noise from the larger terms of a sum lands as absolute error on the
# small entries.  Measured scaled errors on v5e: packed/undilated actor
# <= 2.6e-3, affine actor <= 7.9e-3 (composite-product rounding), critic
# <= 2.4e-2 (relu'(pre~0) mask flips under the ~1e-3 bf16-pass shift of
# pre — data-dependent and legitimate).  Thresholds carry ~2-3x headroom;
# an actual lowering bug (mis-indexed block, dropped row group, wrong
# accumulator) produces order-1 scaled errors.
LOSS_TOL = 1e-3
# "critic-tiled" is wider than "critic" because its check runs at 30720
# rows (the multi-grid shapes below) where two measured, data-dependent
# precision effects dominate: (a) relu'(pre~0) mask flips — ~9.3k of the
# 1.54M (row, unit) pre entries sit within 6e-3 of zero (f64 mirror) and
# the worst-case flip contribution alone reaches 0.38 of max|db1|; (b)
# the bias grads are ~1000x-cancelling scalar sums (|sum gv| ~ 0.02 vs
# sum|gv| ~ 3) where CORRELATED bf16-pass rounding of v lands ~0.1 on
# the scaled metric.  Observed on v5e: 0.058-0.105; a highest-precision
# XLA reference does NOT shrink it (kernel-side rounding).  Actual
# lowering bugs are separately excluded by the bitwise grid-
# decomposition checks below, which carry no precision confound.
GRAD_TOL = {"actor": 2e-2, "critic": 5e-2, "critic-tiled": 2.5e-1,
            "decomp": 1e-4}

results = []


def check(name, kernel_loss, kernel_grads, ref_loss, ref_grads):
    tol = GRAD_TOL[name.split("/")[0]]
    errs = []
    if abs(float(kernel_loss) - float(ref_loss)) > LOSS_TOL:
        errs.append(f"loss {float(kernel_loss)} vs {float(ref_loss)}")
    for (path, k), r in zip(
            jax.tree_util.tree_flatten_with_path(kernel_grads)[0],
            jax.tree.leaves(ref_grads)):
        k, r = np.asarray(k), np.asarray(r)
        scaled = float(np.max(np.abs(k - r)) / (np.max(np.abs(r)) + 1e-8))
        if scaled > tol:
            errs.append(f"{jax.tree_util.keystr(path)} "
                        f"scaled-err {scaled:.2e} > {tol}")
    verdict = {"check": name, "ok": not errs}
    if errs:
        verdict["errors"] = errs
    results.append(verdict)
    print(json.dumps(verdict), flush=True)


EPS = 0.2  # clip band wide enough to dominate the ~6e-3 bf16-pass shift
MARGIN = 0.03


def robust_buffer(seed, actor, critic, t=T, p=P):
    """Random buffer with every branch decision at least MARGIN away from
    its boundary (or exactly ON the fp-exact tie point), judged by an f64
    mirror of the forwards."""
    rng = np.random.default_rng(seed)
    obs = rng.normal(size=(t, p, A, OBS)).astype(np.float32)
    actions = rng.uniform(-1, 1, (t, p, A, 2)).astype(np.float32)

    # f64 actor mirror -> true log-probs of the stored actions
    x = obs.reshape(-1, OBS).astype(np.float64)
    h = x @ np.asarray(actor.fc1.w, np.float64) + np.asarray(
        actor.fc1.b, np.float64)
    mu = np.tanh(h @ np.asarray(actor.fc_mu.w, np.float64)
                 + np.asarray(actor.fc_mu.b, np.float64))
    sv = h @ np.asarray(actor.fc_var.w, np.float64) + np.asarray(
        actor.fc_var.b, np.float64)
    var = np.maximum(sv, 0.0) + np.log1p(np.exp(-np.abs(sv)))
    d = actions.reshape(-1, 2).astype(np.float64) - mu
    lp_new = -0.5 * (2.0 * np.log(2 * np.pi) + np.log(var).sum(-1)
                     + (d * d / var).sum(-1))
    # behavior log-probs: ratio = exp(lp_new - lp_b) either deep inside
    # the clip band (ratio ~1, both objectives EXACTLY tie) or far outside
    sign = rng.choice([-1.0, 0.0, 1.0], size=lp_new.shape)
    lp_b = lp_new - sign * 0.5  # ratio in {e^-0.5, 1, e^0.5}
    ratio = np.exp(lp_new - lp_b)
    assert np.all((np.abs(ratio - 1.0) < 1e-12)
                  | (np.abs(ratio - (1 - EPS)) > MARGIN)
                  & (np.abs(ratio - (1 + EPS)) > MARGIN))

    # f64 critic mirror -> per-row values
    xc = obs.reshape(t * p, A * OBS).astype(np.float64)
    hc = np.maximum(xc @ np.asarray(critic.fc1.w, np.float64)
                    + np.asarray(critic.fc1.b, np.float64), 0.0)
    v = (hc @ np.asarray(critic.fc2.w, np.float64)
         + np.asarray(critic.fc2.b, np.float64)).reshape(-1)
    # behavior values: v deep inside the band (clamp is the identity and
    # the max ties EXACTLY) or far outside (clamp pinned to a bound)
    vsign = rng.choice([-1.0, 0.0, 1.0], size=v.shape)
    vold = v - vsign * 0.5
    # returns far from the d1==d2 crossover of the outside-band rows
    # (crossover at ret == (v + bound)/2, bound = vold +- EPS)
    ret = v + rng.normal(size=v.shape)
    bound = np.clip(v, vold - EPS, vold + EPS)
    mid = 0.5 * (v + bound)
    near = (vsign != 0.0) & (np.abs(ret - mid) < MARGIN)
    ret = np.where(near, ret + 0.2, ret)

    return Buffer(
        obs=jnp.asarray(obs),
        actions=jnp.asarray(actions),
        log_probs=jnp.asarray(lp_b.reshape(t, p * A), jnp.float32),
        values=jnp.asarray(vold.reshape(t, p, 1), jnp.float32),
        returns=jnp.asarray(ret.reshape(t, p), jnp.float32),
        done=jnp.asarray(rng.uniform(size=(t, p)) < 0.2),
    )


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": f"{dev.platform}:{dev.device_kind}"}),
          flush=True)
    assert dev.platform == "tpu", "this check must run on the TPU backend"

    actor = actor_init(jax.random.PRNGKey(1), OBS, H, 2)
    critic = critic_init(jax.random.PRNGKey(2), OBS, A, H)
    buf = robust_buffer(0, actor, critic)

    for faithful in (True, False):
        cfg = MAPPOConfig(num_agents=A, num_parallel=P, obs_size=OBS,
                          hidden_size=H, num_total=T * P, buffer_len=T,
                          num_epochs=2, batch_size=BATCH, faithful=faithful,
                          epsilon=EPS)
        tag = "faithful" if faithful else "fixed"
        mb = next(iter(minibatch_slices(buf, cfg)))

        ref_l, ref_g = jax.jit(jax.value_and_grad(actor_loss),
                               static_argnums=2)(actor, mb, cfg)
        for layout in ("packed", "undilated", "affine"):
            kern = make_fused_actor_grad(cfg, layout=layout)
            staged, n = stage_actor_minibatch(mb, cfg, layout=layout)
            kl, kg = jax.jit(kern, static_argnums=2)(actor, staged, n)
            check(f"actor/{layout}/{tag}", kl, kg, ref_l, ref_g)

        ref_l, ref_g = jax.jit(jax.value_and_grad(critic_loss),
                               static_argnums=2)(critic, mb, cfg)
        kern = make_fused_critic_grad(cfg)
        staged, n = stage_critic_minibatch(mb, cfg)
        kl, kg = jax.jit(kern, static_argnums=2)(critic, staged, n)
        check(f"critic/g1/{tag}", kl, kg, ref_l, ref_g)

    # Tiled update path (ops/fused_update_tiled.py): the production layout
    # needs the env axis in 1024-wide tiles (p = block*1024 + sub*128 +
    # lane), so it gets its own buffer.  tp=2048 / tt=16 make BOTH Pallas
    # grid dimensions exceed 1 (faithful: size 15 -> tw 5 -> 3 time grid
    # steps; nb=2 env blocks) so the cross-grid-step accumulation into
    # revisited output blocks and the program_id==0 zero-init — the prime
    # spots for Mosaic-vs-interpreter lowering divergence — execute on
    # hardware (round-2 advisor finding: the old tt=8/tp=1024 shapes
    # collapsed the grid to (1, 1)).  The actor kernel is the affine
    # chain re-gridded over (time window, env block), so the affine
    # tolerance class applies.
    from marlnav_tpu.ops.fused_update_tiled import (
        TiledRollout,
        make_tiled_actor_grad,
        make_tiled_critic_grad,
        stage_adv_tiled,
        stage_vr_tiled,
    )
    from marlnav_tpu.ops.step_math import LANE, SUB

    tp, tt = 2048, 16

    def tile_env_axis(x):
        t, rows, p = x.shape
        nb = p // (SUB * LANE)
        return (x.reshape(t, rows, nb, SUB, LANE).transpose(0, 1, 3, 2, 4)
                .reshape(t, rows, SUB, nb * LANE))

    buf_t = robust_buffer(1, actor, critic, t=tt, p=tp)
    for faithful in (True, False):
        cfg = MAPPOConfig(num_agents=A, num_parallel=tp, obs_size=OBS,
                          hidden_size=H, num_total=tt * tp, buffer_len=tt,
                          num_epochs=2, batch_size=tt, faithful=faithful,
                          epsilon=EPS)
        tag = "faithful" if faithful else "fixed"
        mb = minibatch_slices(buf_t, cfg)[0]  # full batch (last step
        # dropped when faithful — same slice the tiled trainer takes)
        size = mb.obs.shape[0]
        ref_l, ref_g = jax.jit(jax.value_and_grad(actor_loss),
                               static_argnums=2)(actor, mb, cfg)
        tiled = TiledRollout(
            tile_env_axis(np.asarray(mb.obs).transpose(0, 2, 3, 1)
                          .reshape(size, A * OBS, tp)),
            tile_env_axis(np.asarray(mb.actions).transpose(0, 2, 3, 1)
                          .reshape(size, 2 * A, tp)),
            tile_env_axis(np.asarray(mb.log_probs).reshape(size, tp, A)
                          .transpose(0, 2, 1)))
        adv_t = stage_adv_tiled(mb.returns, mb.values, cfg)
        kern = make_tiled_actor_grad(cfg, interpret=False)
        kl, kg = jax.jit(kern)(actor, tiled, adv_t)
        check(f"actor/tiled/{tag}", kl, kg, ref_l, ref_g)

        # Tiled critic (same grid-shape rationale; undilated G=1 operand
        # reached by pure reshapes).  Wider tolerance class — see the
        # GRAD_TOL comment for the measured flip/cancellation analysis.
        ref_l, ref_g = jax.jit(jax.value_and_grad(critic_loss),
                               static_argnums=2)(critic, mb, cfg)
        vold_t = stage_vr_tiled(mb.values[:, :, 0])
        ret_t = stage_vr_tiled(mb.returns)
        kern_c = make_tiled_critic_grad(cfg, interpret=False)
        kl, kg = jax.jit(kern_c)(critic, tiled.obs, vold_t, ret_t)
        check(f"critic-tiled/{tag}", kl, kg, ref_l, ref_g)

        # Grid-decomposition checks (no precision confound): the kernels'
        # cross-grid-step accumulation means result(full grid) must equal
        # the weighted recombination of runs on each time window / each
        # lane block — identical per-block math and rounding on both
        # sides, so agreement is to recombination ulps (tol 1e-5), and a
        # real accumulator/zero-init/index lowering bug (the round-2
        # advisor's concern at the old degenerate (1,1) grids) shows up
        # at order 1.
        from marlnav_tpu.ops.fused_update_tiled import _time_window, _tw_cap

        def recombine(parts, weights):
            loss = sum(w * float(l) for (l, _), w in zip(parts, weights))
            grads = jax.tree.map(
                lambda *gs: sum(w * np.asarray(g_)
                                for g_, w in zip(gs, weights)),
                *[g_ for _, g_ in parts])
            return loss, grads

        size_t = tiled.obs.shape[0]
        tw = _time_window(size_t, _tw_cap())
        t_parts, l_parts = [], []
        for s in range(0, size_t, tw):
            sl_t = slice(s, s + tw)
            t_parts.append(jax.jit(kern_c)(
                critic, tiled.obs[sl_t], vold_t[sl_t], ret_t[sl_t]))
        nbl = tiled.obs.shape[3]
        for s in range(0, nbl, LANE):
            sl_l = (..., slice(s, s + LANE))
            l_parts.append(jax.jit(kern_c)(
                critic, tiled.obs[sl_l], vold_t[sl_l], ret_t[sl_l]))
        for kind, parts in (("time", t_parts), ("lane", l_parts)):
            rl, rg = recombine(parts, [1.0 / len(parts)] * len(parts))
            check(f"decomp/critic-{kind}/{tag}", kl, kg, rl, rg)

        # The actor kernel's outputs pass through the affine-recompose
        # matmuls OUTSIDE the kernel; at default (bf16-pass) precision
        # their rounding is not linear under recombination (~2-3e-3
        # measured), which would mask the in-kernel accumulation this
        # check targets — trace at highest precision so the recompose is
        # linear to f32 ulps (the in-kernel Mosaic dots are unaffected:
        # identical per block on both sides either way).
        with jax.default_matmul_precision("highest"):
            kern_a = jax.jit(make_tiled_actor_grad(cfg, interpret=False))
            al, ag = kern_a(actor, tiled, adv_t)
            t_parts = [kern_a(actor,
                              TiledRollout(*(x[s:s + tw] for x in tiled)),
                              adv_t[s:s + tw])
                       for s in range(0, size_t, tw)]
            l_parts = [
                kern_a(actor,
                       TiledRollout(*(x[..., s:s + LANE] for x in tiled)),
                       adv_t[..., s:s + LANE])
                for s in range(0, nbl, LANE)]
        for kind, parts in (("time", t_parts), ("lane", l_parts)):
            rl, rg = recombine(parts, [1.0 / len(parts)] * len(parts))
            check(f"decomp/actor-{kind}/{tag}", al, ag, rl, rg)

    failed = [r["check"] for r in results if not r["ok"]]
    summary = {"all_ok": not failed, "failed": failed,
               "n_checks": len(results)}
    print(json.dumps(summary), flush=True)
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
