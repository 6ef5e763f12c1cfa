#!/bin/bash
# Round-5 curriculum queue (VERDICT r4 task 1): serialized TPU runs.
#   H   — consolidate: resume the r4f3 radius-30 state (seed 23) and hold
#         the REFERENCE radius at >=1% share for 3 consecutive stages.
#   S5  — from-birth hypothesis, fresh seed 5: the exact r4f recipe
#         (always-on potential shaping 5e4, 1% coarse gate, episode_len
#         400 below radius 150) from stage 1.
#   S42 — same, fresh seed 42.
#   G2  — seed 17 (race-shaped self-igniter) with shaping GATED at
#         radius<=150 (docs/curriculum_r4.md finding 2's proposed fix).
set -u
cd /root/repo

echo "=== RUN H: consolidate radius 30 (seed 23, resume r4f3 state) ==="
timeout 7200 python scripts/curriculum.py --mode radius-noise-adaptive --seed 23 \
  --repeats-per-stage 600 --max-stages 25 --group-soft 50000 \
  --coarse-threshold 0.01 --fine-threshold 0.01 --episode-len-small 400 \
  --mean-eval --consolidate 3 \
  --resume-state docs/curriculum_r4f3_state.pkl \
  --save-state docs/curriculum_r5h_state.pkl \
  --out docs/curriculum_r5h 2>&1 | grep -v WARNING

echo "=== RUN S5: from-birth r4f recipe, fresh seed 5 ==="
timeout 10800 python scripts/curriculum.py --mode radius-noise-adaptive --seed 5 \
  --repeats-per-stage 600 --max-stages 60 --group-soft 50000 \
  --coarse-threshold 0.01 --episode-len-small 400 --mean-eval \
  --consolidate 3 \
  --save-state docs/curriculum_r5s5_state.pkl \
  --out docs/curriculum_r5s5 2>&1 | grep -v WARNING

echo "=== RUN S42: from-birth r4f recipe, fresh seed 42 ==="
timeout 10800 python scripts/curriculum.py --mode radius-noise-adaptive --seed 42 \
  --repeats-per-stage 600 --max-stages 60 --group-soft 50000 \
  --coarse-threshold 0.01 --episode-len-small 400 --mean-eval \
  --consolidate 3 \
  --save-state docs/curriculum_r5s42_state.pkl \
  --out docs/curriculum_r5s42 2>&1 | grep -v WARNING

echo "=== RUN G2: seed 17, shaping gated at radius<=150 ==="
timeout 10800 python scripts/curriculum.py --mode radius-noise-adaptive --seed 17 \
  --repeats-per-stage 600 --max-stages 60 --group-soft 50000 \
  --group-soft-radius 150 \
  --coarse-threshold 0.01 --episode-len-small 400 --mean-eval \
  --consolidate 3 \
  --save-state docs/curriculum_r5g2_state.pkl \
  --out docs/curriculum_r5g2 2>&1 | grep -v WARNING

echo "=== QUEUE DONE ==="
