"""Composed training-repeat benchmark: collect + actor + critic per repeat.

Per-phase benches (bench_updates.py) time each phase over a resident
buffer, which charges the fused path its staging relayouts but charges the
tiled path nothing for producing its tile inputs.  The decisive comparison
for the tiled actor path (ops/fused_update_tiled.py) is the COMPOSED
repeat, where the collect kernel either emits the canonical buffer (fused
staging pays the relayout) or additionally emits its native tiles
(return_tiled=True; the actor consumes them with no relayout at all).

Methodology per CLAUDE.md remote-TPU discipline: REPEATS repeats scanned
into one dispatch (excludes the ~25-30 ms/call tunnel latency), per-repeat
seeds vary inside the scan (so XLA cannot hoist the collect), timing
blocks on one scalar loss fetch, best of 3.

Usage:  python scripts/bench_composed.py [--variants fused,tiled,...]
        [--configs default,GAE,GAE-16k] [--repeats 5]

Variants: fused        collect -> canonical buffer -> staged updates
          tiled        collect(return_tiled) -> tiled actor + staged critic
          tiled2       collect(return_tiled) -> tiled actor + tiled critic
                       (the obs/actions/log_probs untiles go dead and XLA
                       drops them from the repeat entirely)
"""

from __future__ import annotations

import argparse
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
    # CPU smoke config (interpret-mode kernels; zero PRNG noise is fine
    # for a shape/API check — timings are only meaningful on the TPU).
    "tiny": (1024, 16, 2, {}),
    "default": (1024, 1000, 50, {}),
    "GAE": (2048, 200, 10, dict(lr=3e-4, gamma=0.99, epsilon=0.2,
                                use_gae=True, faithful=False)),
    "GAE-16k": (16384, 200, 10, dict(lr=3e-4, gamma=0.99, epsilon=0.2,
                                     use_gae=True, faithful=False)),
}


def build(tag, variant, tw_cap=None):
    p, t, epochs, kw = CONFIGS[tag]
    cfg = MAPPOConfig(num_parallel=p, buffer_len=t, batch_size=t,
                      num_epochs=epochs, num_total=t * p,
                      fused_updates=True, **kw)
    ep = EnvParams(num_parallel=p, staggered_resets=("GAE" in tag))
    icfg = TriangleInitConfig(num_parallel=p)
    env = make_env(ep, icfg, None)

    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, es = mappo.init(jax.random.PRNGKey(1))
    rows = env_state_to_rows(es)

    tiled_path = variant.startswith("tiled")
    interpret = jax.devices()[0].platform != "tpu"
    fc = make_fused_collect(cfg, ep, icfg, NormalizerConfig(), ScalerConfig(),
                            interpret=interpret, return_tiled=tiled_path)
    if tiled_path:
        from marlnav_tpu.ops.fused_update_tiled import (
            make_tiled_actor_trainer,
            make_tiled_critic_trainer,
        )

        tat = make_tiled_actor_trainer(cfg, interpret=interpret,
                                       tw_cap=tw_cap)
        if variant.startswith("tiled2"):
            tct = make_tiled_critic_trainer(cfg, interpret=interpret,
                                            tw_cap=tw_cap)

            def repeat(ts, rows, seed):
                rows, buf, met, tiles = fc(ts, rows, seed)
                ts, al = tat(ts, buf, tiles)
                ts, cl = tct(ts, buf, tiles)
                return ts, rows, al[-1] + cl[-1]
        else:
            def repeat(ts, rows, seed):
                rows, buf, met, tiles = fc(ts, rows, seed)
                ts, al = tat(ts, buf, tiles)
                ts, cl = mappo.train_critic(ts, buf)
                return ts, rows, al[-1] + cl[-1]
    else:
        def repeat(ts, rows, seed):
            rows, buf, met = fc(ts, rows, seed)
            ts, al = mappo.train_actor(ts, buf)
            ts, cl = mappo.train_critic(ts, buf)
            return ts, rows, al[-1] + cl[-1]
    return ts, rows, repeat, t * p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="fused,tiled")
    ap.add_argument("--configs", default="default,GAE,GAE-16k")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--tw-cap", type=int, default=None,
                    help="tiled time-window cap (None = TW_CAP_DEFAULT); "
                         "the effective window is the largest divisor of "
                         "T <= cap")
    args = ap.parse_args()

    print("device:", jax.devices()[0].platform, jax.devices()[0].device_kind,
          flush=True)
    n = args.repeats
    for tag in args.configs.split(","):
        for variant in args.variants.split(","):
            ts, rows, repeat, steps = build(tag, variant, tw_cap=args.tw_cap)

            @jax.jit
            def block(ts, rows):
                def body(carry, r):
                    ts, rows = carry
                    ts, rows, loss = repeat(ts, rows, 1000 + r)
                    return (ts, rows), loss
                (ts, rows), ls = jax.lax.scan(body, (ts, rows),
                                              jnp.arange(n))
                return ts, rows, ls[-1]

            ts2, rows2, l = block(ts, rows)
            float(l)  # compile + settle
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                ts2, rows2, l = block(ts2, rows2)
                float(l)
                best = min(best, (time.perf_counter() - t0) / n)
            print(f"{tag:8s} {variant:12s}: {best * 1e3:7.2f} ms/repeat "
                  f"(device) = {steps / best / 1e6:6.1f}M steps/s",
                  flush=True)


if __name__ == "__main__":
    main()
