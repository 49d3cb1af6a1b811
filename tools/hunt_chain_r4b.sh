#!/bin/bash
# Round-4 second hunt: another gated bench pass (hunting one COHERENT
# clean window — the first pass's windows degraded mid-suite), then a
# 4->16-core scaling pair (8->32 saturates this single box's memory
# bandwidth; see BENCH/scaling_r4_8to32.json).
cd /root/repo
BENCH_DEADLINE_SEC=5400 BENCH_STAGE_SEC=2700 BENCH_HEALTH_FLOOR=60 BENCH_PAUSE_SEC=60 \
  python tools/bench_gated.py 3 110 >> /tmp/bench_gated_r4.log 2>&1
SCALING_HEALTH_MIN=110 SCALING_STAGE_SEC=2700 SCALING_HEALTH_FLOOR=75 \
  SCALING_DEADLINE_SEC=7200 SCALING_PAUSE_SEC=60 \
  SCALING_OUT=/root/repo/BENCH/scaling_r4_4to16.json \
  python tools/scaling_bench.py 60000000 4 2 >> /tmp/scaling_r4.log 2>&1
