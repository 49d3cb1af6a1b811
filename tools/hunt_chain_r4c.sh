#!/bin/bash
# Round-4 third hunt (launched after the r4b pass found 0 windows in
# 90 min).  Phase 1: up to 3 health-gated coherent bench samples — the
# current bench_healthy_r4.json embedded sample predates the q10
# digest-join fix (81388f9: 9.2s -> 3.5s), so one new sample at ANY
# decent health refreshes the headline evidence.  Phase 2: refresh the
# pre-saturation 2->8-core scaling pair at 60M keys (8->32 measures the
# single box's memory-bandwidth ceiling, not the code — see
# BENCH/membw_scaling.json); scaling.json's health guard only accepts
# the new pair if its gate health beats the recorded 73.2.
cd /root/repo
BENCH_DEADLINE_SEC=12600 BENCH_STAGE_SEC=5400 BENCH_HEALTH_FLOOR=55 \
  BENCH_PAUSE_SEC=45 \
  python tools/bench_gated.py 3 105 >> /tmp/gated_r4c.log 2>&1
SCALING_HEALTH_MIN=105 SCALING_STAGE_SEC=2700 SCALING_HEALTH_FLOOR=75 \
  SCALING_DEADLINE_SEC=5400 SCALING_PAUSE_SEC=60 \
  python tools/scaling_bench.py 60000000 2 2 >> /tmp/scaling_r4c.log 2>&1
echo "chain done $(date -u +%FT%TZ)" >> /tmp/gated_r4c.log
