"""Isolated fused-collect benchmark with a kernel/tail decomposition.

Round-4 verdict weak #3: at the reference-sized config (1024 envs x
buffer 1000) the isolated fused collect measured 167.7M env-steps/s vs
697.5M at 16384x500, attributed in BASELINE.md to "single env-block: the
serial grid can't pipeline across blocks" — an unverified mechanism.
This bench separates the two candidate costs:

  kernel    the Pallas kernel dispatch alone (collect.run_kernel), small
            slices of every output consumed so nothing is DCE'd;
  full      the complete collect (kernel + untile relayouts + hoisted
            critic + returns pass);
  full-seq  the same with MARLNAV_ASSOC_RETURNS=0 (sequential reverse
            scan returns — the pre-round-5 tail, whose T=1000 form the
            round-2 decomposition measured at ~5.2 ms of pure latency);
  tiled     the PRODUCTION consumer shape: return_tiled=True with only
            the tile outputs + returns/values/done consumed (what the
            tiled update trainers read) — the obs/actions/log_probs
            canonical untiles go dead and XLA drops them, exactly as in
            the composed fused pipeline (bench_composed.py tiled/tiled2).

full - kernel = the post-kernel tail; full-seq - full = what the
associative O(log T) returns pass (algo/mappo.py round-5) buys.

Methodology per CLAUDE.md: repeats scanned into ONE dispatch (the tunnel
charges ~25-30 ms per call), per-repeat seeds so XLA can't hoist the
kernel, timing blocks on one scalar fetch, best of 3.

Usage: python scripts/bench_collect.py [--configs default,16k,2k,4k]
       [--variants kernel,full,full-seq] [--repeats 5] [--gae]
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

from marlnav_tpu.algo import make_mappo
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env
from marlnav_tpu.ops import env_state_to_rows, make_fused_collect

CONFIGS = {
    "default": (1024, 1000),
    "2k": (2048, 1000),
    "4k": (4096, 1000),
    "16k": (16384, 500),
}


def tiny(x):
    """Consume an output without re-reading it wholesale."""
    return jnp.sum(x.reshape(-1)[:: max(1, x.size // 64)])


def build(p, t, gae):
    cfg = MAPPOConfig(num_parallel=p, buffer_len=t, batch_size=t,
                      num_epochs=1, num_total=t * p, use_gae=gae,
                      faithful=not gae)
    ep = EnvParams(num_parallel=p)
    icfg = TriangleInitConfig(num_parallel=p, num_obstacles=3)
    env = make_env(ep, icfg, None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, es = mappo.init(jax.random.PRNGKey(0))
    rows = env_state_to_rows(es)
    return cfg, ep, icfg, ts, rows


def bench(step_fn, ts, rows, repeats):
    """One scanned dispatch of `repeats` calls; returns seconds/repeat."""

    def body(carry, seed):
        rows, acc = carry
        rows, s = step_fn(ts, rows, seed)
        return (rows, acc + s), ()

    def run(rows):
        (rows, acc), _ = jax.lax.scan(
            body, (rows, jnp.float32(0)), jnp.arange(repeats, dtype=jnp.int32))
        return acc

    f = jax.jit(run)
    float(f(rows))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(rows))
        best = min(best, time.perf_counter() - t0)
    return best / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="default,16k")
    ap.add_argument("--variants", default="kernel,full,full-seq")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--gae", action="store_true")
    ap.add_argument("--tw-cap", type=int, default=None,
                    help="collect kernel time-window cap "
                         "(MARLNAV_COLLECT_TW_CAP; hardcoded 16 pre-r5)")
    ns = ap.parse_args()

    out = []
    for name in ns.configs.split(","):
        p, t = CONFIGS[name]
        cfg, ep, icfg, ts, rows = build(p, t, ns.gae)
        for variant in ns.variants.split(","):
            fc = make_fused_collect(
                cfg, ep, icfg, NormalizerConfig(), ScalerConfig(),
                assoc_returns=(variant != "full-seq"), tw_cap=ns.tw_cap,
                return_tiled=(variant == "tiled"))

            if variant == "kernel":
                def step_fn(ts, rows, seed, _fc=fc):
                    rows2, *outs = _fc.run_kernel(rows, ts.actor, seed, None)
                    return rows2, sum(tiny(o) for o in outs)
            elif variant == "tiled":
                def step_fn(ts, rows, seed, _fc=fc):
                    rows2, buf, met, tiled = _fc(ts, rows, seed)
                    s = (met.mean_rew + tiny(buf.returns) + tiny(buf.values)
                         + tiny(buf.done.astype(jnp.float32))
                         + sum(tiny(x) for x in tiled))
                    return rows2, s
            else:
                def step_fn(ts, rows, seed, _fc=fc):
                    rows2, buf, met = _fc(ts, rows, seed)
                    s = (met.mean_rew + tiny(buf.returns) + tiny(buf.values)
                         + tiny(buf.obs) + tiny(buf.log_probs))
                    return rows2, s

            sec = bench(step_fn, ts, rows, ns.repeats)
            rate = p * t / sec
            rec = {"config": name, "P": p, "T": t, "variant": variant,
                   "gae": ns.gae, "tw_cap": ns.tw_cap,
                   "ms": round(sec * 1e3, 2),
                   "steps_per_s_M": round(rate / 1e6, 1)}
            out.append(rec)
            print(json.dumps(rec), flush=True)

    path = "docs/bench_collect_r5.json"
    existing = []
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    with open(path, "w") as f:
        json.dump(existing + out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
