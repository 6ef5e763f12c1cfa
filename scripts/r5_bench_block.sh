#!/bin/bash
# Round-5 TPU measurement block (run AFTER the curriculum queue so the
# chip is quiet): roofline rates, collect decomposition + tw-cap sweep,
# production-volume PRNG checks, composed repeats with assoc returns.
set -u
cd /root/repo

echo "=== roofline (per-op VPU rates + kernel bounds) ==="
timeout 1800 python scripts/roofline.py --measure 2>&1 | grep -v WARNING

echo "=== collect decomposition: kernel vs full vs full-seq ==="
timeout 2400 python scripts/bench_collect.py \
  --configs default,2k,4k,16k --variants kernel,full,full-seq 2>&1 | grep -v WARNING

echo "=== collect tw-cap sweep (default config) ==="
for cap in 20 25 40 50; do
  timeout 1200 python scripts/bench_collect.py --configs default \
    --variants kernel,full --tw-cap $cap 2>&1 | grep -v WARNING
done
echo "=== collect tw-cap 25 at 16k ==="
timeout 1200 python scripts/bench_collect.py --configs 16k \
  --variants kernel,full --tw-cap 25 2>&1 | grep -v WARNING

echo "=== GAE-config collect (curriculum shape) ==="
timeout 1200 python scripts/bench_collect.py --configs 2k,16k \
  --variants full,full-seq --gae 2>&1 | grep -v WARNING

echo "=== production-volume PRNG checks ==="
timeout 1800 python scripts/check_tpu_prng.py 2>&1 | grep -v WARNING

echo "=== composed repeats (assoc returns now default) ==="
timeout 3600 python scripts/bench_composed.py \
  --variants tiled,tiled2 --configs default,GAE,GAE-16k 2>&1 | grep -v WARNING

echo "=== headline bench ==="
timeout 1800 python bench.py 2>&1 | grep -v WARNING

echo "=== BENCH BLOCK DONE ==="
