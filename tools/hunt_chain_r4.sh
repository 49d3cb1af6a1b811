#!/bin/bash
# Round-4 evidence hunt: gated bench samples first (judge's #1 ask),
# then the N->4N scaling re-measure. Both tools stage their health gates.
cd /root/repo
BENCH_DEADLINE_SEC=7200 BENCH_STAGE_SEC=1200 BENCH_HEALTH_FLOOR=45 BENCH_PAUSE_SEC=60 \
  python tools/bench_gated.py 3 100 >> /tmp/bench_gated_r4.log 2>&1
SCALING_HEALTH_MIN=60 SCALING_STAGE_SEC=1800 SCALING_HEALTH_FLOOR=40 \
  SCALING_DEADLINE_SEC=9000 SCALING_PAUSE_SEC=90 \
  python tools/scaling_bench.py 60000000 8 2 >> /tmp/scaling_r4.log 2>&1
