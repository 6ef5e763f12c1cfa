"""Speed-of-light analysis for the fused kernel families (round-5,
round-4 verdict weak #2: "790M steps/s is 79x the north star, yet nobody
can say whether it is 90% or 40% of this chip's ceiling").

Two ingredients, both from THIS chip (zero-egress environment — vendor
VPU throughput tables can't be fetched, and published numbers wouldn't
cover the axon backend anyway):

1. **Measured per-op VPU rates** (``--measure``): for each elementwise op
   class the kernels use (fma, sqrt, divide, log, exp, cos, tanh,
   softplus) run a DEPENDENT chain of length U inside a scanned, jitted
   program at two unroll factors and difference the timings — the memory
   traffic, scan overhead, and tunnel dispatch cancel, leaving pure
   per-element op cost.  A chained op can't be algebraically collapsed
   (float semantics), and a per-iteration `+ k*1e-20` defeats
   loop-invariant hoisting (the bench_updates lesson).  The Pallas
   in-kernel PRNG rate is measured the same way (two draw counts inside
   one kernel, differenced).

2. **Exact op census** of one fused-collect env-step (``census()``),
   counted from ops/step_math.py + ops/fused_collect.py (every term
   cites the method it comes from).  The rollout kernel is the same
   census minus the log-prob logs and the buffer writes.

Bound = 1 / sum_i(count_i * cost_i), compared against the measured
kernel throughput (BASELINE.md round-4: isolated collect 697.5M steps/s
at 16384x500; rollout 750-784M).  An HBM roofline for the collect
buffer writes is printed alongside (it is NOT the binding constraint).

Usage (on the TPU):  python scripts/roofline.py --measure
        (CPU dry):   python scripts/roofline.py --measure --iters 2
Writes docs/roofline_r5.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marlnav_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1. Per-op VPU rate microbenchmarks
# ---------------------------------------------------------------------------

OPS = {
    # name -> (callable, flops charged per element-op when counting "fma")
    "fma": lambda x: x * 1.0000001 + 1e-9,
    "sqrt": lambda x: jnp.sqrt(x) + 0.5,          # fixed point ~1.87, stays finite
    "div": lambda x: 1.3 / x,                     # oscillates 0.7 <-> 1.857
    "log": lambda x: jnp.log(x) + 2.0,            # converges ~2.95
    "exp": lambda x: jnp.exp(-x) + 0.3,           # converges ~0.77
    "cos": lambda x: jnp.cos(x),                  # Dottie fixed point 0.739
    "tanh": lambda x: jnp.tanh(x) + 0.5,          # converges ~1.09
    "softplus": lambda x: jax.nn.softplus(x) - 0.5,  # converges ~0.43
}

SHAPE = (1024, 2048)  # 2M f32 elements = 8 MB; many (8,128) VPU tiles


def _time_chain(op, unroll, iters, reps=3):
    """Seconds for `iters` scan steps of a dependent `unroll`-op chain."""

    def body(x, k):
        for _ in range(unroll):
            x = op(x)
        # per-iteration perturbation: defeats loop-invariant hoisting
        # without measurable cost (one fma on the already-loaded tile)
        return x + k.astype(jnp.float32) * 1e-20, ()

    def run(x):
        y, _ = jax.lax.scan(body, x, jnp.arange(iters))
        return y.sum()  # scalar fetch: no big-array tunnel transfer

    f = jax.jit(run)
    x = jnp.full(SHAPE, 0.7, jnp.float32)
    float(f(x))  # compile + warm
    best = math.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_op_rates(iters):
    """ns per element-op, by differencing two chain lengths.

    First cut used (512,1024) x 100 iters x (8..40) unrolls: the
    chain-length deltas were sub-ms against ~1 ms of tunnel/loop noise,
    and the fast ops (fma/tanh) measured garbage (negative deltas).  The
    64-op spread over 2M elements puts every delta in the tens of ms."""
    u_lo, u_hi = 8, 72
    rates = {}
    n_elem = SHAPE[0] * SHAPE[1]
    for name, op in OPS.items():
        t_lo = _time_chain(op, u_lo, iters)
        t_hi = _time_chain(op, u_hi, iters)
        per_op_s = (t_hi - t_lo) / (n_elem * iters * (u_hi - u_lo))
        rates[name] = {
            "ns_per_elem_op": per_op_s * 1e9,
            "gops_per_s": 1e-9 / per_op_s if per_op_s > 0 else float("inf"),
            "t_lo_s": t_lo, "t_hi_s": t_hi,
        }
        print(f"  {name:9s} {rates[name]['gops_per_s']:9.1f} Gop/s "
              f"({rates[name]['ns_per_elem_op']*1000:.3f} ps/elem)",
              flush=True)
    return rates


def measure_prng_rate(iters):
    """Pallas in-kernel PRNG: (8,128) int32 draws per second (differenced,
    like the op chains — seed + accumulator setup cancels)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(n_draws):
        def kern(seed_ref, out_ref):
            pltpu.prng_seed(seed_ref[0])

            def body(i, acc):
                bits = pltpu.prng_random_bits((8, 128))
                return acc + bits.astype(jnp.float32)

            out_ref[...] = jax.lax.fori_loop(
                0, n_draws, body, jnp.zeros((8, 128), jnp.float32))

        def run(seed):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            )(seed)
            return out.sum()

        return jax.jit(run)

    lo, hi = 2048, 8192
    seed = jnp.array([7], jnp.int32)
    ts = {}
    for n in (lo, hi):
        f = make(n)
        float(f(seed))
        best = math.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(seed)
            float(r)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    per_draw = (ts[hi] - ts[lo]) / ((hi - lo) * iters)
    per_elem = per_draw / (8 * 128)
    print(f"  prng      {1e-9/per_elem:9.1f} Gdraw-elem/s "
          f"({per_draw*1e9:.1f} ns per (8,128) draw)", flush=True)
    return {"ns_per_tile_draw": per_draw * 1e9,
            "gelem_per_s": 1e-9 / per_elem}


# ---------------------------------------------------------------------------
# 2. Op census of one fused-collect env-step (per env)
# ---------------------------------------------------------------------------

def census(a=3, o=3, collect=True, noisy=False):
    """Element-op counts PER ENV PER STEP for the fused collect kernel.

    Counted from ops/step_math.py (geom/obs_feats/actor_affine/dynamics/
    rewards/reset_blend) and ops/fused_collect.py (Box-Muller sampling +
    log-prob).  Each (8,128) tile op touches 1024 envs, so per-env counts
    are per-tile counts; A/O loops are unrolled in the kernel exactly as
    counted here.
    """
    c = {k: 0 for k in list(OPS) + ["prng"]}

    # --- observations: geom() per agent for target(1)+obstacles(o)+others(a-1)
    n_geom = a * (1 + o + (a - 1))
    # per geom (step_math.geom): dist sqrt + acos-poly sqrt; 1 divide;
    # ~31 adds/muls/selects (diffs 2, dist 3, max 1, ux/uy 2, dot+clip 5,
    # orth 1, sign 2, acos poly 7 fma + abs/sub/max/mul/where 7, ang mul 1,
    # cap-where 2) + 2 normalizer ops (obs_feats)
    c["sqrt"] += 2 * n_geom
    c["div"] += 1 * n_geom
    c["fma"] += 33 * n_geom

    # --- actor (affine collapse, step_math.actor_affine): per agent
    # 4 rows x obs_size fma + 4 bias adds; tanh x2, softplus x2
    obs_size = 2 + 2 * o + 2 * (a - 1)
    c["fma"] += a * (4 * obs_size + 4)
    c["tanh"] += 2 * a
    c["softplus"] += 2 * a

    # --- sampling (fused_collect kernel body): per agent one Box-Muller
    # pair from 2 uniforms (log+sqrt+cos+sin+~7), a = mu + sqrt(var)*z
    # (2 sqrt + 2 fma), bits_to_uniform ~3 ops per uniform
    c["log"] += a
    c["sqrt"] += a + 2 * a
    c["cos"] += a
    c["sin"] = c.get("sin", 0) + a
    c["fma"] += a * (7 + 2 + 2 * 3)

    # --- log-prob (collect only, fused_collect.py:195):
    # 2 logs + ~6 adds/muls per agent
    if collect:
        c["log"] += 2 * a
        c["fma"] += 6 * a

    # --- dynamics (step_math.dynamics): per agent cos+sin of steering,
    # 2 clipped affine actions (2 fma + 4 clip), rotation 6, speed 3, pos 4
    c["cos"] += a
    c["sin"] += a
    c["fma"] += a * 17

    # --- rewards (step_math.rewards): per agent target leg (sqrt+div+~12),
    # o obstacle legs (sqrt + ~11), (a-1) neighbor legs (sqrt + 2 div + ~16),
    # tail ~20
    c["sqrt"] += a * (1 + o + (a - 1))
    c["div"] += a * (1 + 2 * (a - 1))
    c["fma"] += a * (12 + 11 * o + 16 * (a - 1) + 20)

    # --- auto-reset draw + blend (step_math.reset_blend): 2o uniforms
    # (bits_to_uniform ~3 each), obstacle blends ~5 each of 2o, agent
    # blends 5 leaves x 2 fma x a, counters ~4
    c["fma"] += 2 * o * 3 + 2 * o * 5 + a * 10 + 4
    if noisy:
        c["log"] += a; c["sqrt"] += a; c["cos"] += 2 * a; c["sin"] += 2 * a
        c["fma"] += 8 * a

    # --- PRNG draws: n_draws (8,128)-tiles per env-block step = per-env
    c["prng"] += 2 * a + 2 * o + (3 * a if noisy else 0)

    # --- termination/trunc/stats/metrics tail (fused_collect kernel body)
    c["fma"] += 25
    return c


# ---------------------------------------------------------------------------
# 3. Bound arithmetic
# ---------------------------------------------------------------------------

def compute_bound(rates, prng_rate, cens):
    t = 0.0
    detail = {}
    for op, n in cens.items():
        if n == 0:
            continue
        if op == "prng":
            per = prng_rate["ns_per_tile_draw"] * 1e-9 / (8 * 128)
        elif op == "sin":
            per = rates["cos"]["ns_per_elem_op"] * 1e-9  # same unit
        else:
            per = rates[op]["ns_per_elem_op"] * 1e-9
        detail[op] = {"count": n, "ns": n * per * 1e9}
        t += n * per
    return t, detail


def critic_matmul_note(device_s=25.4e-3, bf16_peak_tf=197.0):
    """Staged critic update phase: exact matmul inventory vs MXU peak.

    make_fused_critic_grad at G=1 (the measured default) runs, per column
    block of C rows per epoch (ops/fused_update.py:810-824):
      #1 pre = W1(50,36) @ x(36,C)       1800 MACs/row
      #2 v   = W2(1,50) @ h(50,C)          50
      #3 g_h = W2^T(50,1) contraction      50
      #4 dW2 = g_v(1,C) . h(50,C)^T        50
      #5 dW1 = g_pre(50,C) . x(36,C)^T   1800
    = 3750 useful MACs/row/epoch.  Default config: rows = 999*1024,
    50 epochs.  The MXU pads #1/#5's M=50, K=36 to the 128x128 systolic
    edge (9.1x structural waste); #2-#4 are M=1-skinny (VPU-or-worse).
    The padded-equivalent time bound from #1+#5 alone is the number to
    compare against the measured phase: the f32 default matmul precision
    runs bf16 passes on TPU (BASELINE.md round-2 tuning note), so the
    per-pass peak is the bf16 one.
    """
    rows, epochs = 999 * 1024, 50
    useful_flops = 2 * 3750 * rows * epochs
    useful_tf = useful_flops / device_s / 1e12
    padded_big2 = 2 * (2 * 128 * 128) * rows * epochs  # #1 + #5 at MXU pad
    t_bound = padded_big2 / (bf16_peak_tf * 1e12)
    return {
        "useful_tflops": useful_tf,
        "pad_factor": 128 * 128 / (50 * 36),
        "padded_bound_ms": t_bound * 1e3,
        "measured_ms": device_s * 1e3,
        "pct_of_padded_bound": 100.0 * t_bound / device_s,
        "note": ("K=36, M=50 occupy 11% of the 128x128 MXU; the kernel "
                 "runs at this fraction of even the PADDED bound, the "
                 "rest being the three M=1-skinny matmuls + VPU chain"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--measured-collect", type=float, default=697.5e6,
                    help="isolated fused collect steps/s (BASELINE r4)")
    ap.add_argument("--measured-rollout", type=float, default=784e6,
                    help="fused rollout steps/s (BASELINE r4 best)")
    ap.add_argument("--out", type=str, default="docs/roofline_r5.json")
    ns = ap.parse_args()

    result = {"shape": SHAPE, "iters": ns.iters,
              "device": str(jax.devices()[0])}
    if not ns.measure:
        print("(--measure not set: printing census only)")
        print(json.dumps(census(), indent=2))
        return

    print("per-op VPU rates (dependent-chain differencing):", flush=True)
    rates = measure_op_rates(ns.iters)
    try:
        prng = measure_prng_rate(max(1, ns.iters // 10))
    except Exception as e:  # CPU dry runs: no Mosaic prng lowering
        print(f"  prng      unavailable on this backend ({type(e).__name__})")
        prng = {"ns_per_tile_draw": 0.0, "gelem_per_s": float("inf")}
    result["op_rates"] = rates
    result["prng"] = prng

    # Interpretation caveat, established EXPERIMENTALLY in round 5
    # (BASELINE.md round-5 "Measured outcome"): these chain rates are
    # per-op THROUGHPUT under a fully dependent chain.  Inside the real
    # kernels, expensive ops (cos/sin before the sin_pi/cos_pi swap; the
    # PRNG) overlap with independent tile work, so census x chain-rate
    # is a NAIVE bound: swapping the kernels' cos/sin for ~4 ps
    # polynomials — predicted ~2x by this arithmetic — delivered 3-5%.
    # The binding constraint is dependency stalls, measured as the
    # kernels' ~1.5-1.6 ns/env-step marginal cost (bench_collect's
    # fixed+marginal fit) vs ~0.9 ns of census work at measured rates.
    result["caveat"] = (
        "census x chain-rate is a naive bound; kernels are "
        "dependency-stall-bound at ~60% of it (see BASELINE.md round-5)")
    for label, cens, meas in (
        ("collect", census(collect=True), ns.measured_collect),
        ("rollout", census(collect=False), ns.measured_rollout),
    ):
        t, detail = compute_bound(rates, prng, cens)
        bound = 1.0 / t
        result[label] = {
            "census": cens, "detail_ns": detail,
            "naive_chain_rate_ns_per_env_step": t * 1e9,
            "naive_bound_steps_per_s": bound,
            "measured_steps_per_s": meas,
        }
        print(f"\n{label}: naive chain-rate bound {bound/1e6:.0f}M "
              f"env-steps/s ({t*1e9:.2f} ns/env-step); measured "
              f"{meas/1e6:.0f}M (see caveat)")
        top = sorted(detail.items(), key=lambda kv: -kv[1]["ns"])[:5]
        for op, d in top:
            print(f"    {op:9s} {d['count']:5d} ops  {d['ns']:.2f} ns "
                  f"({100*d['ns']/(t*1e9):.0f}%)")

    # HBM write roofline for the collect buffer (not binding; printed for
    # completeness): canonical buffer + tiled copies per env-step.
    obs_b = 12 * 4
    bytes_per_step = (obs_b + 6 * 4 + 3 * 4 + 4 + 4 + 4) + (obs_b + 6 * 4
                                                            + 3 * 4)
    hbm_bound = 819e9 / bytes_per_step
    result["collect_hbm"] = {"bytes_per_env_step": bytes_per_step,
                             "write_bound_steps_per_s": hbm_bound}
    print(f"\ncollect HBM write roofline: {bytes_per_step} B/env-step -> "
          f"{hbm_bound/1e6:.0f}M steps/s at 819 GB/s (not binding)")

    cs = result["critic_staged"] = critic_matmul_note()
    print(f"staged critic: {cs['useful_tflops']:.1f} useful TF/s; padded "
          f"MXU bound {cs['padded_bound_ms']:.1f} ms vs measured "
          f"{cs['measured_ms']:.1f} ms = {cs['pct_of_padded_bound']:.0f}% "
          f"(pad factor {cs['pad_factor']:.1f}x)")

    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    with open(ns.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", ns.out)


if __name__ == "__main__":
    main()
