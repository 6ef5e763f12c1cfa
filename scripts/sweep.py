"""Reward/hyperparameter sweep exploiting the fused-kernel training rate.

Round-1 finding (BASELINE.md, reference README.md:25-29): at the default
reward factors both frameworks' agents learn to race the target but trade
obstacle/agent collisions for heading+progress reward — collision
terminations RISE as return climbs (risk_factor=0 means collisions are
never penalized beyond the cumulative-reward zeroing at termination).
At >10M trained env-steps/s a factor grid costs minutes, not weeks
(round-1 verdict item 8).

Each cell trains the GAE-config trainer (2048 envs, buffer 200, 10+10
epochs, lr 3e-4, gamma 0.99, epsilon 0.2, staggered resets, corrected
semantics, fused collect + fused updates) for --repeats rollouts, then
scores the last quarter of training by episode endings: target-group
reaches vs collisions vs truncations.

NB epsilon 0.2, NOT the reference's default 0.01: at 0.01 the PPO clip is
so tight that mean return stays flat for hundreds of rollouts on every
path (XLA and fused alike — verified in round 2).

Dispatch note: cells run through --jit-repeats blocks — per-repeat
dispatch costs ~4 tunnel round trips (a 300-repeat cell took ~25 min
that way); the blocked program pays one compile per distinct cell config
(reward factors are baked into the collect kernel, epsilon/ent_const
into the update kernels) and then runs the whole cell in seconds, with
the unchanged XLA glue hitting the persistent compile cache.

Usage: python scripts/sweep.py [--repeats 300] [--out docs/sweep_r2]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from marlnav_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def run_cell(risk, heading, ent, soft, repeats, seed=13, jit_repeats=50,
             target=500.0):
    from marlnav_tpu.__main__ import build_parser
    from marlnav_tpu.config import resolve_run_config
    from marlnav_tpu.train import train

    num_total = repeats * 200 * 2048
    args = build_parser().parse_args([
        "-np", "2048", "-bl", "200", "-bs", "200", "-ne", "10",
        "-nt", str(num_total), "-lr", "0.0003", "-g", "0.99",
        "-ep", "0.2",
        "-se", str(seed),
        "-rf", str(risk), "-hf", str(heading), "-ec", str(ent),
        "-sf", str(soft), "-tf", str(target),
        "--use-gae", "--fixed-semantics", "--staggered-resets",
        "--fused-collect", "--fused-updates",
    ])
    cfg = resolve_run_config(args)
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        try:
            t0 = time.perf_counter()
            # jit_repeats: per-repeat dispatch costs ~4 tunnel round trips
            # per repeat on the remote link (~25 min/cell measured); one
            # blocked program costs one big compile (~6 min) and then runs
            # the whole cell in seconds.
            # fused_collect is a train() parameter (not part of cfg) —
            # forward it explicitly or the --fused-collect flag above is
            # silently ignored and cells run the (slower, jax.random-
            # stream) XLA collect.
            _, _, logger = train(cfg, verbose=False,
                                 jit_repeats=jit_repeats,
                                 fused_collect=True)
            dt = time.perf_counter() - t0
        finally:
            os.chdir(cwd)
    logs = logger.logs
    tail = slice(-max(1, repeats // 4), None)  # last quarter of training
    stats = logs["epi_stats"]
    tar = float(np.sum(stats["tar"][tail]))
    col = float(np.sum(stats["col"][tail]))
    trunc = float(np.sum(stats["trunc"][tail]))
    endings = tar + col + trunc
    return {
        "risk_factor": risk, "heading_factor": heading, "ent_const": ent,
        "soft_factor": soft,
        "mean_rew_first": float(logs["mean_rews"][0]),
        "mean_rew_last": float(np.mean(logs["mean_rews"][tail])),
        "tar": tar, "col": col, "trunc": trunc,
        "tar_share": tar / endings if endings else 0.0,
        "col_share": col / endings if endings else 0.0,
        "seconds": dt,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=300)
    ap.add_argument("--out", type=str, default="docs/sweep_r2")
    ap.add_argument("--grid", type=str, default="main",
                    choices=["main", "quick", "target"])
    ns = ap.parse_args()

    if ns.grid == "quick":
        grid = [(0.0, 500.0, 1e-3, 500.0), (250.0, 500.0, 1e-3, 500.0)]
    else:
        # Risk axis (the collision-penalty lever) crossed with the default
        # shaping, plus targeted variants: weaker heading shaping (less
        # incentive to race) and more exploration at the promising risk.
        grid = [
            (0.0, 500.0, 1e-3, 500.0),    # baseline (reference defaults)
            (100.0, 500.0, 1e-3, 500.0),
            (250.0, 500.0, 1e-3, 500.0),
            (500.0, 500.0, 1e-3, 500.0),
            (1000.0, 500.0, 1e-3, 500.0),
            (250.0, 100.0, 1e-3, 500.0),
            (500.0, 100.0, 1e-3, 500.0),
            (250.0, 500.0, 1e-2, 500.0),
        ]
    if ns.grid == "target":
        # Round-2 finding: every risk level still ends 100% of episodes in
        # collisions — the per-step penalty gets priced into the race, not
        # avoided.  The group-target bonus fires ONCE (500) vs heading
        # shaping's 500/step x 200 steps; these cells make reaching the
        # target the dominant term.  (risk, heading, ent, soft, target)
        grid5 = [
            (250.0, 500.0, 1e-3, 500.0, 50_000.0),
            (0.0, 500.0, 1e-3, 500.0, 50_000.0),
            (250.0, 100.0, 1e-3, 100.0, 50_000.0),
            (500.0, 500.0, 1e-2, 500.0, 200_000.0),
        ]
        rows = []
        for i, (r, h, e, so, tf) in enumerate(grid5):
            print(f"[{i + 1}/{len(grid5)}] risk={r} heading={h} ent={e} "
                  f"soft={so} target={tf} ...", flush=True)
            cell = run_cell(r, h, e, so, ns.repeats, target=tf)
            cell["target_factor"] = tf
            rows.append(cell)
            print(json.dumps(cell), flush=True)
        rows.sort(key=lambda c: -c["tar_share"])
        os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
        with open(ns.out + ".json", "w") as f:
            json.dump({"repeats": ns.repeats, "cells": rows}, f, indent=2)
        print("wrote", ns.out + ".json", flush=True)
        return

    rows = []
    for i, (r, h, e, s) in enumerate(grid):
        print(f"[{i + 1}/{len(grid)}] risk={r} heading={h} ent={e} ...",
              flush=True)
        cell = run_cell(r, h, e, s, ns.repeats)
        rows.append(cell)
        print(json.dumps(cell), flush=True)

    rows.sort(key=lambda c: -c["tar_share"])
    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    with open(ns.out + ".json", "w") as f:
        json.dump({"repeats": ns.repeats, "cells": rows}, f, indent=2)

    lines = [
        "# Reward-factor sweep (round 2)",
        "",
        f"GAE config (2048 envs x buffer 200, 10+10 epochs, lr 3e-4, "
        f"gamma 0.99), {ns.repeats} repeats per cell "
        f"({ns.repeats * 200 * 2048 / 1e6:.0f}M env-steps), fused collect "
        "+ fused updates on one v5e chip.  Scored on the last quarter of "
        "training; `tar/col/trunc share` = fraction of episode endings.",
        "",
        "| risk | heading | ent | mean_rew(last) | tar% | col% | trunc% "
        "| secs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for c in rows:
        endings = c["tar"] + c["col"] + c["trunc"]
        lines.append(
            f"| {c['risk_factor']:.0f} | {c['heading_factor']:.0f} "
            f"| {c['ent_const']:g} | {c['mean_rew_last']:.0f} "
            f"| {100 * c['tar_share']:.1f} | {100 * c['col_share']:.1f} "
            f"| {100 * c['trunc'] / endings if endings else 0:.1f} "
            f"| {c['seconds']:.0f} |")
    with open(ns.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {ns.out}.md / .json", flush=True)


if __name__ == "__main__":
    main()
