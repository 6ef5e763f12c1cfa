"""Benchmark the PPO update phase (actor + critic) on the current backend.

The round-1 profile showed the update phase dominating training wall-clock
(actor 77%, critic 14% at the default config — BASELINE.md); this script
times exactly that phase over a synthetic on-device buffer, with and
without ``bf16_updates``, so kernel-level changes can be measured without
paying the rollout-scan compile.

Usage:  python scripts/bench_updates.py [--envs 1024] [--buffer 1000]
        [--epochs 50] [--batch 1000] [--iters 5]

Axon-tunnel discipline (CLAUDE.md): timings block on the small loss output
and a scalar fetch, never on large arrays.
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

from marlnav_tpu.algo import Buffer, make_mappo
from marlnav_tpu.config import (
    EnvParams,
    MAPPOConfig,
    NormalizerConfig,
    ScalerConfig,
    TriangleInitConfig,
)
from marlnav_tpu.env import make_env

A, OBS = 3, 12


def synth_buffer(key, t, p):
    ks = jax.random.split(key, 6)
    return Buffer(
        obs=jax.random.uniform(ks[0], (t, p, A, OBS), jnp.float32, -1, 1),
        actions=jax.random.uniform(ks[1], (t, p, A, 2), jnp.float32, -1, 1),
        log_probs=jax.random.normal(ks[2], (t, p * A), jnp.float32),
        values=jax.random.normal(ks[3], (t, p, 1), jnp.float32),
        returns=jax.random.normal(ks[4], (t, p), jnp.float32),
        done=jax.random.uniform(ks[5], (t, p)) < 0.005,
    )


def bench(label, fn, ts, buf, iters, device_time=False):
    if device_time:
        # Scan `iters` phases into ONE dispatch so the tunnel's
        # ~25-30 ms/dispatch latency is excluded — use this mode for
        # kernel tuning (the per-call numbers below include dispatch).
        @jax.jit
        def block(ts):
            def body(ts, _):
                ts, losses = fn(ts, buf)
                return ts, losses[-1]
            ts, ls = jax.lax.scan(body, ts, None, length=iters)
            return ts, ls[-1]
        ts2, loss = block(ts)
        float(loss)  # compile + settle
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            ts2, loss = block(ts2)
            float(loss)
            dt = min(dt, (time.perf_counter() - t0) / iters)
        print(f"{label}: {dt * 1e3:8.1f} ms/phase (device)")
        return dt
    ts2, losses = fn(ts, buf)
    float(losses[0])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        ts2, losses = fn(ts2, buf)
    float(losses[-1])
    jax.block_until_ready(ts2)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:8.1f} ms/phase")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--buffer", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", type=str, default="all",
                    help="comma list of fp32,bf16,fused,fused+bf16 "
                         "(XLA variants cost minutes of tunnel compile)")
    ap.add_argument("--device-time", action="store_true",
                    help="scan the iters into one dispatch (excludes the "
                         "remote-tunnel per-call latency)")
    args = ap.parse_args()

    print("device:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    t, p = args.buffer, args.envs
    buf = jax.block_until_ready(synth_buffer(jax.random.PRNGKey(0), t, p))

    results = {}
    variants = [("fp32", {}), ("bf16", {"bf16_updates": True}),
                ("fused", {"fused_updates": True}),
                ("fused+bf16", {"fused_updates": True, "bf16_updates": True}),
                ("tiled", {"fused_updates": True})]
    if args.variants != "all":
        want = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in want]
    for tag, kw in variants:
        cfg = MAPPOConfig(
            num_parallel=p, buffer_len=t, batch_size=args.batch,
            num_epochs=args.epochs, num_total=t * p, **kw,
        )
        env = make_env(EnvParams(num_parallel=p),
                       TriangleInitConfig(num_parallel=p), None)
        mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
        ts, _ = mappo.init(jax.random.PRNGKey(1))
        if tag == "tiled":
            # Update phases on the collect kernel's tile layout (the
            # canonical->staged relayouts disappear; fused_update_tiled).
            from marlnav_tpu.ops.fused_update_tiled import (
                TiledRollout,
                make_tiled_actor_trainer,
                make_tiled_critic_trainer,
            )
            from marlnav_tpu.ops.step_math import LANE, SUB

            def tile_env(x, rows):
                nb = p // (SUB * LANE)
                return (x.reshape(t, rows, nb, SUB, LANE)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(t, rows, SUB, nb * LANE))

            tiled = jax.block_until_ready(TiledRollout(
                tile_env(buf.obs.transpose(0, 2, 3, 1)
                         .reshape(t, A * OBS, p), A * OBS),
                tile_env(buf.actions.transpose(0, 2, 3, 1)
                         .reshape(t, 2 * A, p), 2 * A),
                tile_env(buf.log_probs.reshape(t, p, A)
                         .transpose(0, 2, 1), A),
            ))
            tat = make_tiled_actor_trainer(cfg, interpret=False)
            tct = make_tiled_critic_trainer(cfg, interpret=False)
            a = bench(f"actor  {tag:10s}",
                      jax.jit(lambda ts, b: tat(ts, b, tiled)), ts, buf,
                      args.iters, args.device_time)
            c = bench(f"critic {tag:10s}",
                      jax.jit(lambda ts, b: tct(ts, b, tiled)), ts, buf,
                      args.iters, args.device_time)
            results[tag] = (a, c)
            continue
        a = bench(f"actor  {tag:10s}", jax.jit(mappo.train_actor), ts, buf,
                  args.iters, args.device_time)
        c = bench(f"critic {tag:10s}", jax.jit(mappo.train_critic), ts, buf,
                  args.iters, args.device_time)
        results[tag] = (a, c)

    if "fp32" in results:
        a32, c32 = results["fp32"]
        for tag, (a, c) in results.items():
            if tag == "fp32" or c is None:
                continue
            print(f"{tag}: actor {a32 / a:.2f}x, critic {c32 / c:.2f}x, "
                  f"phase total {(a32 + c32) / (a + c):.2f}x")


if __name__ == "__main__":
    main()
