"""Real-TPU shard_map checks for the fused collect + update paths.

One v5e chip is available, so true multi-chip execution cannot be
tested; what CAN be validated on hardware — and is, here — is the whole
shard_map plumbing at mesh size 1: the collect kernel running INSIDE
``jax.shard_map`` over a real 1-device ("data",) mesh, with a multi-block
env grid (P=2048 -> 2 kernel env blocks) and a multi-chunk time grid
(T=20 -> 2 chunks), must reproduce the no-mesh path BITWISE (shard 0's
PRNG stream is seed + axis_index*2**20 with axis_index 0, so the streams
coincide); likewise one fused-update training phase under the mesh
(psum over a 1-axis mesh is the identity).

The >1-shard behavior is covered off-hardware: the update kernels run
under a 2-shard interpret shard_map (tests/test_fused_update.py) and the
collect kernel's per-shard slicing is validated by the full-batch-vs-
per-block equality tests (tests/test_fused_collect.py); the Mosaic
interpreter deadlocks on >1-shard collect (CLAUDE.md).

Prints one JSON verdict line per check + a summary (all_ok).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

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
from marlnav_tpu.parallel import make_mesh

P, T = 2048, 20  # 2 kernel env blocks x 2 time chunks
results = []


def check(name, pairs):
    """pairs: list of (label, got, want) pytrees — bitwise equality."""
    errs = []
    for label, got, want in pairs:
        for (path, a), b in zip(
                jax.tree_util.tree_flatten_with_path(got)[0],
                jax.tree.leaves(want)):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                diff = float(np.max(np.abs(
                    np.asarray(a, np.float64) - np.asarray(b, np.float64))))
                errs.append(f"{label}{jax.tree_util.keystr(path)} "
                            f"max|diff|={diff:.3e}")
    verdict = {"check": name, "ok": not errs}
    if errs:
        verdict["errors"] = errs[:6]
    results.append(verdict)
    print(json.dumps(verdict), flush=True)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": f"{dev.platform}:{dev.device_kind}"}),
          flush=True)
    assert dev.platform == "tpu"

    mesh = make_mesh(num_data=1)
    cfg = MAPPOConfig(num_parallel=P, buffer_len=T, batch_size=T,
                      num_epochs=2, num_total=T * P, faithful=False,
                      fused_updates=True)
    ep = EnvParams(num_parallel=P)
    icfg = TriangleInitConfig(num_parallel=P)
    env = make_env(ep, icfg, None)

    # --- fused collect: shard_map(1-device mesh) == plain, bitwise ----
    fc_plain = jax.jit(make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                          ScalerConfig()))
    fc_mesh = jax.jit(make_fused_collect(cfg, ep, icfg, NormalizerConfig(),
                                         ScalerConfig(), mesh=mesh))
    mappo_plain = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, es = mappo_plain.init(jax.random.PRNGKey(3))
    rows = env_state_to_rows(es)
    r1, buf1, met1 = fc_plain(ts, rows, 12345)
    r2, buf2, met2 = fc_mesh(ts, rows, 12345)
    check("collect/shardmap-1dev-bitwise", [
        ("rows", r1, r2), ("buffer", buf1, buf2),
        ("metrics", met1, met2)])

    # --- fused update phases under the mesh == plain ------------------
    mappo_mesh = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig(),
                            mesh=mesh)
    tsa1, la1 = jax.jit(mappo_plain.train_actor)(ts, buf1)
    tsa2, la2 = jax.jit(mappo_mesh.train_actor)(ts, buf1)
    check("train_actor/shardmap-1dev-bitwise", [
        ("params", tsa1.actor, tsa2.actor), ("losses", la1, la2)])
    tsc1, lc1 = jax.jit(mappo_plain.train_critic)(ts, buf1)
    tsc2, lc2 = jax.jit(mappo_mesh.train_critic)(ts, buf1)
    check("train_critic/shardmap-1dev-bitwise", [
        ("params", tsc1.critic, tsc2.critic), ("losses", lc1, lc2)])

    failed = [r["check"] for r in results if not r["ok"]]
    print(json.dumps({"all_ok": not failed, "failed": failed,
                      "n_checks": len(results)}), flush=True)
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
