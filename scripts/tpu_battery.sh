#!/bin/bash
# Wait for the axon tunnel, then run the queued TPU measurements.
cd /root/repo
echo "waiting for tunnel..."
for i in $(seq 1 200); do
  if timeout 60 python -c "import jax, jax.numpy as j; float(jax.jit(lambda x: x.sum())(j.ones((8,128))))" >/dev/null 2>&1; then
    echo "tunnel up after $i polls"
    break
  fi
  sleep 120
done

echo "=== 1. update-phase bench (fused vs tiled, device time) ==="
timeout 1800 python scripts/bench_updates.py --variants fused,tiled --device-time 2>&1 | grep -E "actor|critic|device:"

echo "=== 2. composed repeats (tiled) ==="
timeout 2400 python - <<'EOF' 2>&1 | grep -v WARNING
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from marlnav_tpu.algo import make_mappo
from marlnav_tpu.config import (EnvParams, MAPPOConfig, NormalizerConfig,
                                ScalerConfig, TriangleInitConfig)
from marlnav_tpu.env import make_env
from marlnav_tpu.ops import env_state_to_rows, make_fused_collect
from marlnav_tpu.ops.fused_update_tiled import make_tiled_actor_trainer

for (P, T, epochs, kw, tag) in (
    (1024, 1000, 50, {}, "default"),
    (2048, 200, 10, dict(lr=3e-4, gamma=0.99, epsilon=0.2, use_gae=True,
                         faithful=False), "GAE"),
    (16384, 200, 10, dict(lr=3e-4, gamma=0.99, epsilon=0.2, use_gae=True,
                          faithful=False), "GAE-16k"),
):
    cfg = MAPPOConfig(num_parallel=P, buffer_len=T, batch_size=T,
                      num_epochs=epochs, num_total=T*P, fused_updates=True,
                      **kw)
    ep = EnvParams(num_parallel=P, staggered_resets=("GAE" in tag))
    icfg = TriangleInitConfig(num_parallel=P)
    env = make_env(ep, icfg, None)
    mappo = make_mappo(cfg, env, NormalizerConfig(), ScalerConfig())
    ts, es = mappo.init(jax.random.PRNGKey(1))
    rows = env_state_to_rows(es)
    fc = make_fused_collect(cfg, ep, icfg, NormalizerConfig(), ScalerConfig(),
                            return_tiled=True)
    tat = make_tiled_actor_trainer(cfg, interpret=False)
    @jax.jit
    def five(ts, rows):
        def body(carry, r):
            ts, rows = carry
            rows, buf, met, tiled = fc(ts, rows, 1000 + r)
            ts, al = tat(ts, buf, tiled)
            ts, cl = mappo.train_critic(ts, buf)
            return (ts, rows), al[-1] + cl[-1]
        (ts, rows), ls = jax.lax.scan(body, (ts, rows), jnp.arange(5))
        return ts, rows, ls[-1]
    ts2, rows2, l = five(ts, rows); float(l)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); ts2, rows2, l = five(ts2, rows2); float(l)
        best = min(best, (time.perf_counter()-t0)/5)
    print(f"{tag}: {best*1e3:.2f} ms/repeat (device) = {T*P/best/1e6:.1f}M steps/s", flush=True)
EOF

echo "=== 3. train.py end-to-end (default + GAE; set MARLNAV_TILED_UPDATES=1 to bench the tiled path) ==="
timeout 2400 python - <<'PYEOF' 2>&1 | grep -v WARNING | tail -3
import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
from marlnav_tpu.__main__ import build_parser
from marlnav_tpu.config import resolve_run_config
from marlnav_tpu.train import train
R = 30
args = build_parser().parse_args([
    "-np", "1024", "-bl", "1000", "-bs", "1000", "-ne", "50",
    "-nt", str(1000 * 1024 * R), "-se", "11",
    "--fused-collect", "--fused-updates"])
cfg = resolve_run_config(args)
cwd = os.getcwd()
with tempfile.TemporaryDirectory() as tmp:
    os.chdir(tmp)
    try:
        t0 = time.perf_counter()
        train(cfg, verbose=True, jit_repeats=10)
        print(f"total {time.perf_counter()-t0:.1f}s for {R} repeats", flush=True)
    finally:
        os.chdir(cwd)
PYEOF
timeout 2400 python - <<'PYEOF' 2>&1 | grep -v WARNING | tail -3
import os, sys, time, tempfile
sys.path.insert(0, "/root/repo")
from marlnav_tpu.__main__ import build_parser
from marlnav_tpu.config import resolve_run_config
from marlnav_tpu.train import train
R = 75
args = build_parser().parse_args([
    "-np", "2048", "-bl", "200", "-bs", "200", "-ne", "10",
    "-nt", str(200 * 2048 * R), "-lr", "0.0003", "-g", "0.99",
    "-ep", "0.2", "-se", "13",
    "--use-gae", "--fixed-semantics", "--staggered-resets",
    "--fused-collect", "--fused-updates"])
cfg = resolve_run_config(args)
cwd = os.getcwd()
with tempfile.TemporaryDirectory() as tmp:
    os.chdir(tmp)
    try:
        t0 = time.perf_counter()
        train(cfg, verbose=True, jit_repeats=25, fused_collect=True)
        print(f"total {time.perf_counter()-t0:.1f}s for {R} repeats", flush=True)
    finally:
        os.chdir(cwd)
PYEOF

echo "=== 4. TPU checks (updates + mesh) still green ==="
timeout 1200 python scripts/check_tpu_updates.py 2>&1 | tail -1
timeout 1200 python scripts/check_tpu_mesh.py 2>&1 | tail -1
echo "BATTERY DONE"
