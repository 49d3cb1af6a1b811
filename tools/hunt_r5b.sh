#!/bin/bash
# Round-5 hunt, phase 2: the host has been degraded (health 10-55) for
# 2.5+ hours with no window above 65, so bank coherent evidence at the
# health this box actually offers — every sample carries its health score,
# and best-of-pool / until-improve upgrade automatically if a healthy
# window appears later (hunt_r5c.sh keeps hunting high gates afterwards).
#   A. 3 scaling pairs (2->8 cores, 60M keys) at floor 40  -> pool/scaling.json
#   B. until-improve full-suite bench samples at floor 45  -> bench_healthy_r5.json
#   C. one 10^8-key xor8 bank build at floor 45            -> big_build_100m.json
cd /root/repo || exit 1
log=/root/repo/BENCH/hunt_r5.log
{
  echo "=== r5b A: scaling floor-40 start $(date -u +%FT%TZ)"
  SCALING_HEALTH_MIN=40 SCALING_STAGE_SEC=99999 SCALING_POOL_FLOOR=40 \
  SCALING_DEADLINE_SEC=1800 SCALING_PAUSE_SEC=30 \
    python tools/scaling_bench.py 60000000 2 3
  echo "=== r5b B: bench_gated floor-45 start $(date -u +%FT%TZ)"
  BENCH_UNTIL_IMPROVE=1 BENCH_DEADLINE_SEC=4200 BENCH_STAGE_SEC=1200 \
  BENCH_HEALTH_FLOOR=45 BENCH_PAUSE_SEC=60 \
    python tools/bench_gated.py 2 100
  echo "=== r5b C: big_build floor-45 start $(date -u +%FT%TZ)"
  BIG_HEALTH_MIN=45 BIG_DEADLINE_SEC=1500 BIG_PAUSE_SEC=60 \
    python tools/big_build.py 100000000
  echo "=== r5b chain done $(date -u +%FT%TZ)"
} >>"$log" 2>&1
