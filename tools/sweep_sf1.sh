#!/bin/bash
# Rerunnable sf1 scale gate (SURVEY §6.2): materialize the
# deterministic 10x scale-up of sf0.1, run EVERY SparkEntry key
# against it, and oracle-check the results with DuckDB. Writes a
# machine-readable result to tools/sweep_sf1_result.json so future
# rounds re-run the gate instead of citing an old one.
#
# Keys run SEQUENTIALLY in one JVM (graft.Verify's loop) — the r11
# sweep's only timeouts came from 32-way *harness* contention on the
# python-side oracle compare of multi-million-row outputs, which this
# serial gate (plus check.py's vectorized compare) avoids.
#
# Usage: tools/sweep_sf1.sh [sf1dir] [outdir]
set -e
cd "$(dirname "$0")/.."
SF1="${1:-/root/repo/target/sf1}"
OUT="${2:-/tmp/sweep_sf1}"

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "[sweep] materializing sf1 at $SF1"
  python3 tools/make_sf1.py "$SF1"
else
  echo "[sweep] reusing sf1 at $SF1 (delete to re-materialize)"
fi

sbt -batch compile
rm -rf "$OUT"
echo "[sweep] running graft.Verify over $SF1"
GRAFT_EXTRA_JAVA_OPTS="${GRAFT_EXTRA_JAVA_OPTS:--Xmx48g}" \
  tools/run.sh graft.Verify "$SF1" "$OUT"

echo "[sweep] oracle check"
python3 tools/check.py --json tools/sweep_sf1_result.json "$SF1" "$OUT"
