"""Obstacle-corridor curriculum: staged geometry, one continuing policy.

Round-2 sweep finding (docs/sweep_r2.md): at the reference geometry every
episode ends in a collision for every reward setting tried — the obstacle
box (x 500-1000, y 250-500, collision radius 50) straddles the straight
path from the spawn triangle (150, 375) to the target (1350, 375), the
heading-shaped race never learns avoidance, and the group target bonus
never fires even scaled 400x.  Per-magnitude reward shaping cannot fix a
sparse-exploration problem; a curriculum might.

This script tests that hypothesis: train with the obstacle box parked
BELOW the flight corridor first (the task reduces to formation flight,
which the group bonus CAN reinforce), then slide the box up into the
reference position over stages, continuing from the same policy.  An
alternative --mode radius shrinks an enlarged target disk instead.

TPU-cost note: the obstacle-box bounds / target radius are constants
baked into the fused collect kernel, so each stage recompiles ONLY the
Mosaic kernel (seconds); the PPO update-phase programs are
stage-invariant and compile once.  Repeats dispatch per-rollout (3
dispatches each) — at GAE-config sizes the tunnel latency prices a
repeat at ~0.1-0.3 s, fine for a few hundred repeats per stage.

A fixed radius schedule (--mode radius) loses the reach signal when a
step is too steep (300 -> 150 collapses it), so --mode radius-adaptive
anneals instead: shrink the radius 15% only while the group-reach share
of episode endings holds above 2% over the last quarter of a stage,
otherwise retrain at the same radius (up to --max-stages total).

Usage: python scripts/curriculum.py [--repeats-per-stage 300]
       [--mode obstacles|radius|radius-adaptive|none]
       [--out docs/curriculum_r2]
(--mode none = reference geometry throughout: the no-curriculum control.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marlnav_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from marlnav_tpu.algo import make_mappo
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.ops import (
    env_state_to_rows,
    make_fused_collect,
    make_fused_rollout,
)

P, T = 2048, 200


def build_cfg():
    """The sweep's best-learning cell: risk 250, defaults otherwise
    (docs/sweep_r2.md), GAE + corrected semantics + wide clip."""
    return MAPPOConfig(
        num_parallel=P, buffer_len=T, batch_size=T, num_epochs=10,
        num_total=T * P, lr=3e-4, gamma=0.99, epsilon=0.2,
        use_gae=True, faithful=False, fused_updates=True,
    )


def stage_geometry(mode):
    """Per-stage (label, env-param overrides, init-config overrides)."""
    if mode == "obstacles":
        # Slide the obstacle box from below the corridor (y 40-160; the
        # flight path runs at y~375 and ob_risk_dist is 60, so stage 1 is
        # collision-free for a straight formation) up to the reference
        # position (250-500).
        return [
            ("box y 40-160", {}, {"obst_min_y": 40.0, "obst_max_y": 160.0}),
            ("box y 150-330", {}, {"obst_min_y": 150.0, "obst_max_y": 330.0}),
            ("box y 200-420", {}, {"obst_min_y": 200.0, "obst_max_y": 420.0}),
            ("box y 250-500 (reference)", {}, {}),
        ]
    if mode == "radius":
        # Shrink an enlarged target disk to the reference 30.  Stage 1's
        # radius 150 admits the converging straight-line race (agents are
        # ~>5 apart until ~150 from the target center).
        return [
            ("target radius 150", {"target_radius": 150.0}, {}),
            ("target radius 90", {"target_radius": 90.0}, {}),
            ("target radius 50", {"target_radius": 50.0}, {}),
            ("target radius 30 (reference)", {}, {}),
        ]
    return [("reference geometry (control)", {}, {})]


def run_adaptive(ns):
    """Adaptive target-radius annealing (the setup behind
    docs/curriculum_r2_radius_adaptive.json): 4096 envs, 500k group
    bonus, entropy 1e-2; shrink the radius 15% only while the
    group-reach share of the stage's last quarter exceeds 2%."""
    P_, T_ = 4096, 200
    icfg = TriangleInitConfig(num_parallel=P_, num_obstacles=3)
    cfg = MAPPOConfig(num_parallel=P_, buffer_len=T_, batch_size=T_,
                      num_epochs=10, num_total=T_ * P_, lr=3e-4,
                      gamma=0.99, epsilon=0.2, ent_const=1e-2,
                      use_gae=True, faithful=False, fused_updates=True)
    base_seed = (ns.seed * 1_000_003) % (1 << 30)
    ts = rows = None
    gr = 0
    radius, stage, history = 300.0, 0, []
    while radius >= 30.0 and stage < ns.max_stages:
        stage += 1
        ep = EnvParams(num_parallel=P_, risk_factor=ns.risk,
                       target_factor=500_000.0, target_radius=radius,
                       staggered_resets=True)
        mappo = make_mappo(cfg, make_env(ep, icfg, None),
                           NormalizerConfig(), ScalerConfig())
        fc = jax.jit(make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                        ScalerConfig()))
        ta, tc = jax.jit(mappo.train_actor), jax.jit(mappo.train_critic)
        if ts is None:
            ts, es = mappo.init(jax.random.PRNGKey(ns.seed))
            rows = env_state_to_rows(es)
        n = ns.repeats_per_stage
        tar = col = trunc = 0
        t0 = time.perf_counter()
        for r in range(n):
            rows, buf, met = fc(ts, rows, base_seed + gr)
            ts, _ = ta(ts, buf)
            ts, _ = tc(ts, buf)
            gr += 1
            if r >= n - n // 4:
                tar += int(met.stats.num_tar)
                col += int(met.stats.num_col)
                trunc += int(met.stats.num_trunc)
        endings = tar + col + trunc
        share = tar / endings if endings else 0.0
        rec = {"stage": stage, "radius": radius, "tar": tar,
               "tar_share": round(share, 4), "col": col, "trunc": trunc,
               "seconds": round(time.perf_counter() - t0, 1)}
        history.append(rec)
        print(json.dumps(rec), flush=True)
        # Per-stage actor snapshot (renderer format): training CONTINUES
        # past the best-reaching stage and can collapse (stages 6-14 of
        # the recorded run), so the final state is not the artifact.
        np.savez(f"{ns.out}_actor_stage{stage}.npz", **{
            ".".join(str(getattr(k, "name", k)) for k in path):
                np.asarray(v)
            for path, v in
            jax.tree_util.tree_flatten_with_path(ts.actor)[0]})
        if share > 0.02:
            radius = round(radius * 0.85)
    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    path = f"{ns.out}_radius_adaptive.json"
    with open(path, "w") as f:
        json.dump(history, f, indent=2)
    print("wrote", path, flush=True)


def run_noise_adaptive(ns):
    """Round-3 mode: couple NOISE annealing to the radius schedule.

    The round-2 boundary (radius 217, docs/curriculum_r2.md) is set by
    the noise-driven agent-agent collision floor (finding 2): per-step
    steering noise at policy std ~0.5 diffuses 10-15-apart pairs below
    the 5-unit collision distance within ~60 steps, capping episode
    length regardless of target progress — and the smaller the disk, the
    longer a reach trajectory has to survive.  Pair-diffusion time
    scales ~1/std^2, so each radius anneal here also (a) halves the
    entropy bonus (floor --ent-floor; finding 5: entropy exactly 0
    collapses into the suicide basin, so never to zero) and (b) shifts
    the variance head's bias by --var-shift, cutting the sampling std
    immediately instead of waiting for the weakened bonus to drift it
    down.  Metrics fetch in chunks of 25 repeats (async dispatch runs
    ahead; a per-repeat fetch would pay the tunnel round trip 25x).

    Round-4 levers (verdict item 5; the r3 diagnosis is that below
    radius ~130 reaches require the MEAN paths of all three agents to
    converge simultaneously — docs/curriculum_r3.md "Honest status"):
      --group-soft F     continuous group-convergence shaping: the
                         EnvParams.group_soft_factor max-over-agents
                         soft score (the binary disk bonus's missing
                         precursor gradient)
      --episode-len-small N  truncation horizon N (instead of 200) at
                         radius <= --episode-len-radius: nearly-
                         deterministic small-radius trajectories need
                         longer survival windows to finish converging
      --mean-eval        per-stage MEAN-ACTION rollout (fused rollout
                         kernel, deterministic_actions=True); group
                         reaches counted as target-bonus reward spikes.
                         Measures mean-path convergence directly."""
    P_, T_ = 4096, 200
    icfg = TriangleInitConfig(num_parallel=P_, num_obstacles=3)
    base_seed = (ns.seed * 1_000_003) % (1 << 30)
    ent = 1e-2
    ts = rows = None
    gr = 0
    radius, stage, history = 300.0, 0, []
    best = None  # (share, radius, ts, rows, ent) at the last good anneal
    stall = 0
    restores = 0
    consec = 0  # consecutive gate-clearing stages AT the reference radius
    if ns.resume_state:
        # Cross-run continuation: restore the FULL train state + env rows
        # + schedule position saved by a previous run's --save-state (the
        # in-run restore mechanism showed retraining from a drifted
        # policy re-enters the race basin; resuming mid-cascade avoids
        # re-spending 20+ stages re-igniting).
        import pickle
        with open(ns.resume_state, "rb") as f:
            snap = pickle.load(f)
        ts = jax.tree.map(jnp.asarray, snap["ts"])
        rows = jax.tree.map(jnp.asarray, snap["rows"])
        radius, ent, gr = snap["radius"], snap["ent"], snap["gr"]
        # Round-5 pickles also carry the stage counter (so a resumed run
        # with the same --out prefix doesn't overwrite the prior run's
        # per-stage actor snapshots) and the gate-clearing share; seed
        # `best` from the snapshot so restore-on-collapse has a restore
        # point from the first post-resume stage (pre-r5 pickles lack
        # both keys — stage numbering then restarts at 1 and the caller
        # should pick a fresh --out prefix).
        stage = snap.get("stage", 0)
        # One-time variance-head shift at resume (round-5 mechanism
        # tests: the seed-5 wall's signature is mean paths reaching
        # while the SAMPLED share stays ~0 — noise-intolerance — so the
        # falsifiable prediction is that resuming COLDER, not hotter,
        # raises the stochastic share; --restore-reheat tested the
        # hotter direction and measured negative).
        if ns.resume_var_shift:
            ts = ts._replace(actor=ts.actor._replace(
                fc_var=ts.actor.fc_var._replace(
                    b=ts.actor.fc_var.b + ns.resume_var_shift)))
        best = (snap.get("share", 0.0), radius, ts, rows, ent)
        print(json.dumps({"resumed": {"from": ns.resume_state,
                                      "radius": radius, "ent": ent,
                                      "stage": stage,
                                      "var_shift": ns.resume_var_shift}}),
              flush=True)
    while radius >= 30.0 and stage < ns.max_stages:
        stage += 1
        cfg = MAPPOConfig(num_parallel=P_, buffer_len=T_, batch_size=T_,
                          num_epochs=10, num_total=T_ * P_, lr=3e-4,
                          gamma=0.99, epsilon=0.2, ent_const=ent,
                          use_gae=True, faithful=False, fused_updates=True)
        # Density-compensated bonus (scale ~ 1/radius): MEASURED HARMFUL
        # in the r3b run — at radius 184 the share collapsed to 0.7% vs
        # 3.4% with the constant bonus (docs/curriculum_r3b_*.json vs
        # r3); default off.
        tf = (500_000.0 * (300.0 / max(radius, 30.0))
              if ns.bonus_scale else 500_000.0)
        ep_len = (ns.episode_len_small
                  if ns.episode_len_small and radius <= ns.episode_len_radius
                  else 200)
        # Group-convergence shaping gated by radius: run r4c showed a
        # constant factor from stage 1 DELAYS ignition at radius 300
        # (22 stages vs ~1 without) — the race basin ignites fine on its
        # own; the mean-path convergence problem the shaping targets
        # starts below ~150 (docs/curriculum_r3.md).
        gsf = ns.group_soft if radius <= ns.group_soft_radius else 0.0
        ep = EnvParams(num_parallel=P_, risk_factor=ns.risk,
                       target_factor=tf, target_radius=radius,
                       group_soft_factor=gsf,
                       episode_len=ep_len,
                       staggered_resets=True)
        mappo = make_mappo(cfg, make_env(ep, icfg, None),
                           NormalizerConfig(), ScalerConfig())
        fc = jax.jit(make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                        ScalerConfig()))
        ta, tc = jax.jit(mappo.train_actor), jax.jit(mappo.train_critic)
        if ts is None:
            ts, es = mappo.init(jax.random.PRNGKey(ns.seed))
            rows = env_state_to_rows(es)
        n = ns.repeats_per_stage
        tar = col = trunc = 0
        t0 = time.perf_counter()
        pending = []
        q_start = n - n // 4

        def drain():
            nonlocal tar, col, trunc
            for r_i, met_i in jax.device_get(pending):
                if r_i >= q_start:
                    tar += int(met_i.stats.num_tar)
                    col += int(met_i.stats.num_col)
                    trunc += int(met_i.stats.num_trunc)
            pending.clear()

        for r in range(n):
            rows, buf, met = fc(ts, rows, base_seed + gr)
            ts, _ = ta(ts, buf)
            ts, _ = tc(ts, buf)
            gr += 1
            pending.append((r, met))
            if len(pending) >= 25:
                drain()
        drain()
        endings = tar + col + trunc
        share = tar / endings if endings else 0.0
        rec = {"stage": stage, "radius": radius, "ent_const": ent,
               "target_factor": tf, "episode_len": ep_len,
               "var_bias_mean": round(float(jnp.mean(ts.actor.fc_var.b)), 3),
               "tar": tar, "tar_share": round(share, 4), "col": col,
               "trunc": trunc,
               "seconds": round(time.perf_counter() - t0, 1)}
        if ns.mean_eval:
            # Mean-path convergence, measured directly: one deterministic
            # (policy-mean) rollout of the CURRENT stage env from the
            # live env states.  Group reaches are exactly the steps whose
            # mean reward carries the target bonus (tf/2 threshold: every
            # other component is O(1e3) at these factors).
            roll = jax.jit(make_fused_rollout(
                ep, icfg, NormalizerConfig(), ScalerConfig(), T_,
                deterministic_actions=True), static_argnums=2)
            _, rew_e = roll(rows, ts.actor, 0)
            rec["mean_tar"] = int((rew_e > tf / 2.0).sum())
        history.append(rec)
        print(json.dumps(rec), flush=True)
        np.savez(f"{ns.out}_actor_stage{stage}.npz", **{
            ".".join(str(getattr(k, "name", k)) for k in path):
                np.asarray(v)
            for path, v in
            jax.tree_util.tree_flatten_with_path(ts.actor)[0]})
        threshold = (ns.coarse_threshold if radius > 200
                     else ns.fine_threshold)
        if not (radius <= 30.0 and share > threshold):
            consec = 0  # consolidation wants CONSECUTIVE radius-30 clears
        if share > threshold:
            best, stall = (share, radius, ts, rows, ent), 0
            if ns.save_state:
                import pickle
                import numpy as _np
                with open(ns.save_state, "wb") as f:
                    pickle.dump({
                        "ts": jax.tree.map(_np.asarray, ts),
                        "rows": jax.tree.map(_np.asarray, rows),
                        "radius": radius, "ent": ent, "gr": gr,
                        "stage": stage, "share": share,
                    }, f)
            # Gentler steps below 200: the r3 first run cleared 15% steps
            # down to 184 but overshot into the 156 stall.
            if radius <= 30.0:
                # A stage at the REFERENCE radius cleared the gate —
                # the task the reference author reports unsolved
                # (reference README.md:25-29, environment.py:60).
                # --consolidate N demands N CONSECUTIVE clearing stages
                # (no anneal side effects while holding: the schedule is
                # done; repeated ent-halving/var-shifts would just keep
                # squeezing exploration at a fixed task).
                consec += 1
                print(json.dumps({"reference_radius_stage_cleared": {
                    "share": share, "tar": tar, "consecutive": consec,
                    "needed": max(1, ns.consolidate)}}), flush=True)
                if consec >= max(1, ns.consolidate):
                    print(json.dumps({"solved_at_reference_radius": {
                        "share": share, "tar": tar,
                        "consecutive": consec}}), flush=True)
                    break
                continue
            step = 0.85 if radius > 200 else 0.92
            # Clamp at the reference radius 30 (don't anneal past the
            # actual task).
            radius = max(30.0, round(radius * step))
            ent = max(ns.ent_floor, ent * 0.5)
            ts = ts._replace(actor=ts.actor._replace(
                fc_var=ts.actor.fc_var._replace(
                    b=ts.actor.fc_var.b + ns.var_shift)))
        elif share < 0.005:
            # Collapse watch: the reach signal, once below ~0.5%, decays
            # monotonically instead of recovering (r2 stages 6-14 at 217,
            # r3 first-run stages 10-20 at 156) — retraining a drifted
            # policy re-enters the race basin.  Restore the full train
            # state from the last good anneal point and retry from there
            # with a gentler radius step.
            stall += 1
            if stall >= 2 and best is not None:
                _, b_radius, ts, rows, ent = best
                # max(30, ...): a restore from a radius-30 best must not
                # retry BELOW the reference radius (the task's floor).
                radius = max(30.0, round(min(radius / 0.92,
                                             b_radius * 0.96)))
                stall = 0
                restores += 1
                # Restore-loop breaker (round 5, opt-in): run r5s5 ground
                # 13 restore cycles at the same retry radius without ever
                # recovering above 0.1% — by then the variance head had
                # annealed to bias ~ -7.3 (std ~ 1e-3), too cold for the
                # restored policy to re-find the reach trajectories.  With
                # --restore-reheat V, every restore also warms the
                # restored variance head by +V (bounded: the restore
                # snapshot itself is unchanged, so reheats do not
                # compound across restores).
                if ns.restore_reheat:
                    ts = ts._replace(actor=ts.actor._replace(
                        fc_var=ts.actor.fc_var._replace(
                            b=ts.actor.fc_var.b + ns.restore_reheat)))
                rec["restored"] = {"from_radius": b_radius,
                                   "retry_radius": radius,
                                   "reheat": ns.restore_reheat}
                print(json.dumps({"restore": rec["restored"]}), flush=True)
        else:
            stall = 0
    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    path = f"{ns.out}_radius_noise_adaptive.json"
    with open(path, "w") as f:
        json.dump(history, f, indent=2)
    print("wrote", path, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats-per-stage", type=int, default=300)
    ap.add_argument("--mode", type=str, default="obstacles",
                    choices=["obstacles", "radius", "radius-adaptive",
                             "radius-noise-adaptive", "none"])
    ap.add_argument("--risk", type=float, default=250.0)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--max-stages", type=int, default=14,
                    help="radius-adaptive: total stage budget")
    ap.add_argument("--ent-floor", type=float, default=5e-4,
                    help="radius-noise-adaptive: entropy-bonus floor")
    ap.add_argument("--bonus-scale", action="store_true",
                    help="radius-noise-adaptive: scale the group bonus "
                         "~1/radius (measured harmful; kept for the "
                         "record)")
    ap.add_argument("--coarse-threshold", type=float, default=0.02,
                    help="radius-noise-adaptive: anneal threshold above "
                         "radius 200 (seed-23 r4d sustained 0.5-2% with "
                         "shaping but never cleared 2%)")
    ap.add_argument("--fine-threshold", type=float, default=0.006,
                    help="radius-noise-adaptive: anneal threshold below "
                         "radius 200 (restore-on-collapse is the safety "
                         "net for over-eager anneals)")
    ap.add_argument("--var-shift", type=float, default=-0.5,
                    help="radius-noise-adaptive: variance-head bias shift "
                         "applied at each radius anneal")
    ap.add_argument("--group-soft", type=float, default=0.0,
                    help="radius-noise-adaptive: group-convergence "
                         "shaping factor (EnvParams.group_soft_factor)")
    ap.add_argument("--group-soft-radius", type=float, default=1e9,
                    help="apply --group-soft only at radius <= this "
                         "(r4c: constant-from-stage-1 delays ignition)")
    ap.add_argument("--episode-len-small", type=int, default=0,
                    help="radius-noise-adaptive: truncation horizon at "
                         "small radii (0 = keep 200 everywhere)")
    ap.add_argument("--episode-len-radius", type=float, default=150.0,
                    help="radius threshold for --episode-len-small")
    ap.add_argument("--mean-eval", action="store_true",
                    help="radius-noise-adaptive: per-stage mean-action "
                         "rollout, reporting group-reach events "
                         "(mean_tar)")
    ap.add_argument("--save-state", type=str, default="",
                    help="radius-noise-adaptive: pickle the FULL train "
                         "state (+ env rows + schedule position) at "
                         "every good anneal, for --resume-state")
    ap.add_argument("--resume-state", type=str, default="",
                    help="radius-noise-adaptive: resume a cascade from a "
                         "--save-state pickle")
    ap.add_argument("--resume-var-shift", type=float, default=0.0,
                    help="radius-noise-adaptive: one-time variance-head "
                         "bias shift applied at --resume-state (negative "
                         "= colder sampling; the noise-intolerance "
                         "mechanism test)")
    ap.add_argument("--restore-reheat", type=float, default=0.0,
                    help="radius-noise-adaptive: variance-head bias bump "
                         "applied on every restore-on-collapse (breaks "
                         "cold-exploration restore loops; r5s5 ground 13 "
                         "restores at std ~1e-3 without it)")
    ap.add_argument("--consolidate", type=int, default=1,
                    help="radius-noise-adaptive: number of CONSECUTIVE "
                         "gate-clearing stages required AT the reference "
                         "radius 30 before declaring solved (1 = legacy "
                         "first-clear behavior)")
    ap.add_argument("--out", type=str, default="docs/curriculum_r2")
    ns = ap.parse_args()

    if ns.mode == "radius-adaptive":
        run_adaptive(ns)
        return
    if ns.mode == "radius-noise-adaptive":
        run_noise_adaptive(ns)
        return

    cfg = build_cfg()
    base_seed = (ns.seed * 1_000_003) % (1 << 30)
    stages = stage_geometry(ns.mode)

    # Update phases are stage-invariant: build once from any stage's env.
    env0 = make_env(EnvParams(num_parallel=P, risk_factor=ns.risk,
                              staggered_resets=True),
                    TriangleInitConfig(num_parallel=P, num_obstacles=3), None)
    mappo = make_mappo(cfg, env0, NormalizerConfig(), ScalerConfig())
    ta = jax.jit(mappo.train_actor)
    tc = jax.jit(mappo.train_critic)
    ts, es = mappo.init(jax.random.PRNGKey(ns.seed))
    rows = env_state_to_rows(es)

    results = []
    global_repeat = 0
    for label, ep_over, init_over in stages:
        ep = EnvParams(num_parallel=P, risk_factor=ns.risk,
                       staggered_resets=True, **ep_over)
        icfg = TriangleInitConfig(num_parallel=P, num_obstacles=3,
                                  **init_over)
        fc = jax.jit(make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                        ScalerConfig()))
        mean_rews, tars, cols, truncs = [], [], [], []
        t0 = time.perf_counter()
        for r in range(ns.repeats_per_stage):
            rows, buf, met = fc(ts, rows, base_seed + global_repeat)
            ts, _ = ta(ts, buf)
            ts, _ = tc(ts, buf)
            global_repeat += 1
            mean_rews.append(float(met.mean_rew))
            tars.append(int(met.stats.num_tar))
            cols.append(int(met.stats.num_col))
            truncs.append(int(met.stats.num_trunc))
        dt = time.perf_counter() - t0
        q = max(1, ns.repeats_per_stage // 4)
        tar, col, trunc = (float(np.sum(v[-q:])) for v in (tars, cols, truncs))
        endings = tar + col + trunc
        cell = {
            "stage": label,
            "mean_rew_first": mean_rews[0], "mean_rew_last":
                float(np.mean(mean_rews[-q:])),
            "tar": tar, "col": col, "trunc": trunc,
            "tar_share": tar / endings if endings else 0.0,
            "col_share": col / endings if endings else 0.0,
            "seconds": dt,
        }
        results.append(cell)
        print(json.dumps(cell), flush=True)

    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    payload = {"mode": ns.mode, "risk": ns.risk,
               "repeats_per_stage": ns.repeats_per_stage, "stages": results}
    with open(f"{ns.out}_{ns.mode}.json", "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote", f"{ns.out}_{ns.mode}.json", flush=True)


if __name__ == "__main__":
    main()
