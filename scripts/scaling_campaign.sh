#!/bin/bash
# Protocol-v2 scaling campaign: repeated single-pair scaling_bench
# invocations (fresh interpreter each, PAIR lines streamed to the log)
# so a crash/timeout never loses finished pairs and each pair's window
# is independent. Run with NOTHING else on the host.
#
#   bash scripts/scaling_campaign.sh [n_pairs] [pages] [rels]
#
# Job size default 6M pages / 900k relations: 4x the round-3 job, so
# the ~8-16 s driver-serial component is <3% of the 2-core leg
# (E_max ~0.92+) while a pair still fits in a ~15 min window — the
# 24M default makes a 2-core leg ~40 min, which no calm window on this
# host survives (measured round 3/4).

set -u
N=${1:-5}
PAGES=${2:-6000000}
RELS=${3:-900000}
JOB=${4:-full}
LOG=${SCALING_LOG:-/root/repo/records/scaling_v2_r5.log}

for i in $(seq 1 "$N"); do
  echo "=== campaign pair $i/$N job=$JOB $(date -u +%H:%M:%SZ) ===" >> "$LOG"
  SPARK_GRAFT_SCALE_TRIALS=1 \
  SPARK_GRAFT_SCALE_PAGES="$PAGES" \
  SPARK_GRAFT_SCALE_RELS="$RELS" \
  SPARK_GRAFT_SCALE_JOB="$JOB" \
  python /root/repo/scaling_bench.py >> "$LOG" 2>&1
  echo "=== exit $? ===" >> "$LOG"
done
