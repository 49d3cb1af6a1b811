#!/bin/bash
# Round-5 evidence hunt chain (run alone — any concurrent load pollutes
# the samples; see BENCH/BASELINE.md on this VM's hypervisor steal):
#   1. 2->8-core scaling pairs at 60M keys until 4 gated pairs or deadline
#      (refreshes BENCH/scaling.json from the build-path-v2 pool)
#   2. health-gated full-suite bench samples -> BENCH/bench_healthy_r5.json
#   3. one 10^8-key xor8 bank build -> BENCH/big_build_100m.json
cd /root/repo || exit 1
log=/root/repo/BENCH/hunt_r5.log
{
  echo "=== scaling hunt start $(date -u +%FT%TZ)"
  SCALING_HEALTH_MIN=95 SCALING_STAGE_SEC=4200 SCALING_HEALTH_FLOOR=65 \
  SCALING_DEADLINE_SEC=7800 SCALING_PAUSE_SEC=90 \
    python tools/scaling_bench.py 60000000 2 4
  echo "=== bench_gated start $(date -u +%FT%TZ)"
  BENCH_UNTIL_IMPROVE=1 BENCH_DEADLINE_SEC=6000 BENCH_STAGE_SEC=3000 \
  BENCH_HEALTH_FLOOR=70 BENCH_PAUSE_SEC=90 \
    python tools/bench_gated.py 3 100
  echo "=== big_build start $(date -u +%FT%TZ)"
  BIG_HEALTH_MIN=80 BIG_DEADLINE_SEC=2400 BIG_PAUSE_SEC=90 \
    python tools/big_build.py 100000000
  echo "=== chain done $(date -u +%FT%TZ)"
} >>"$log" 2>&1
