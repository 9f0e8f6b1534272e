#!/bin/bash
# End-of-round gate sequence — run this BEFORE the final snapshot so the
# committed state cannot precede the gates (the r12 postmortem: the last
# commit landed before the verify/bench runs and shipped 42 broken keys).
# Order matters: suite → sf0.01 oracle → sf1 sweep → bench. Any failure
# aborts (set -e) and the round must fix before committing.
#
# Usage: tools/finalize.sh        # full sequence (~25 min)
#        SKIP_SWEEP=1 tools/finalize.sh   # without the sf1 sweep
set -e
cd "$(dirname "$0")/.."

echo "[finalize] 1/4 sbt test"
sbt -batch test

echo "[finalize] 2/4 correctness at sf0.01 (driver-shaped oracle check)"
rm -rf /tmp/finalize_v
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/finalize_v
python3 tools/check.py /root/testdata/sf0.01 /tmp/finalize_v

if [ -z "$SKIP_SWEEP" ]; then
  echo "[finalize] 3/4 sf1 (10x) sweep"
  tools/sweep_sf1.sh
else
  echo "[finalize] 3/4 sf1 sweep SKIPPED (SKIP_SWEEP set)"
fi

echo "[finalize] 4/4 bench at sf0.1 (exit 2 on any failed key)"
# r16 drift protocol: re-record the DuckDB oracle IN THE SAME WINDOW as
# the Spark bench, so the line's q_ratio compares the two engines under
# identical host conditions (the r15 postmortem: a drift episode moved
# both walls ~23-30% and the stale duck record made Spark look slow).
# The old total prints beside the new one — a >20% move is the drift
# canary saying the WALLS of this window are not cross-round comparable
# (the ratio still is).
prev_total=$(python3 -c "import json;print(round(sum(json.load(open('tools/bench_oracle.json'))['keys'].values()),2))" 2>/dev/null || echo "n/a")
python3 tools/bench_oracle.py /root/testdata/sf0.1 /tmp/finalize_v/oracle_sql.json
new_total=$(python3 -c "import json;print(round(sum(json.load(open('tools/bench_oracle.json'))['keys'].values()),2))")
echo "[finalize] duck canary: previous total ${prev_total}s -> this window ${new_total}s"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  GRAFT_EXTRA_JAVA_OPTS="${GRAFT_EXTRA_JAVA_OPTS:--Xmx48g}" \
  tools/run.sh graft.Bench

echo "[finalize] all gates green — safe to commit the final snapshot"
