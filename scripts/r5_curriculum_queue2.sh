#!/bin/bash
# Round-5 curriculum continuation queue.
#   S5c — seed 5 resumed from its radius-59 state with --restore-reheat 1.0:
#         tests the cold-exploration restore-loop mechanism (r5s5 ground 13
#         restores at sampling std ~1e-3; the reheat warms the restored
#         variance head by +1 per restore).
#   G3  — seed 17 with the r3 coarse gate (2%) restored ABOVE radius 200 and
#         shaping gated below 150: tests docs/curriculum_r5.md's G2
#         conclusion that the 1% gate (not the shaping) is what breaks the
#         weakly-igniting race seed.  Reheat 0.5 for its restore loops.
set -u
cd /root/repo

echo "=== RUN S5c: seed 5 continuation with restore-reheat 1.0 ==="
# NB the r5s5 pickle carries stage=33, and resumed runs CONTINUE the
# stage numbering (round-5 curriculum.py change) — max-stages 78 = 45
# fresh stages on top.
timeout 10800 python scripts/curriculum.py --mode radius-noise-adaptive --seed 5 \
  --repeats-per-stage 600 --max-stages 78 --group-soft 50000 \
  --coarse-threshold 0.01 --episode-len-small 400 --mean-eval \
  --consolidate 3 --restore-reheat 1.0 \
  --resume-state docs/curriculum_r5s5_state.pkl \
  --save-state docs/curriculum_r5s5c_state.pkl \
  --out docs/curriculum_r5s5c 2>&1 | grep -v WARNING

echo "=== RUN G3: seed 17, 2% coarse gate + gated shaping + reheat ==="
timeout 10800 python scripts/curriculum.py --mode radius-noise-adaptive --seed 17 \
  --repeats-per-stage 600 --max-stages 60 --group-soft 50000 \
  --group-soft-radius 150 \
  --coarse-threshold 0.02 --episode-len-small 400 --mean-eval \
  --consolidate 3 --restore-reheat 0.5 \
  --save-state docs/curriculum_r5g3_state.pkl \
  --out docs/curriculum_r5g3 2>&1 | grep -v WARNING

echo "=== QUEUE2 DONE ==="
