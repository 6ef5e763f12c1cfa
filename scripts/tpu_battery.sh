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

echo "=== 3. train.py end-to-end (default + GAE, tiled path) ==="
timeout 2400 python /tmp/bench_train_default.py 2>&1 | grep -v WARNING | tail -3
timeout 2400 python /tmp/bench_train_gae.py 2>&1 | grep -v WARNING | tail -3

echo "=== 4. TPU checks (updates + mesh) still green ==="
timeout 1200 python scripts/check_tpu_updates.py 2>&1 | tail -1
timeout 1200 python scripts/check_tpu_mesh.py 2>&1 | tail -1
echo "BATTERY DONE"
