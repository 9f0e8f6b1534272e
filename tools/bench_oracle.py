#!/usr/bin/env python3
"""Time the DuckDB oracle per key — the EXTERNAL engine-vs-engine
baseline the bench gate lacked (the reference publishes no numbers, so
through r14 the 2x gate could only self-reference prior rounds).

Runs each key's oracle SQL (the same statements the correctness gate
executes) against DuckDB over the identical parquet tables, twice per
key, and records the warm minimum. graft.Bench then merges the file
into its JSON line as spark-vs-duck pairs, turning wall drift into a
ratio against an independent engine on the same data.

Caveat recorded here so nobody over-reads the ratio: lake lifecycle
keys (lake_*, stream_*, ddl_*) time DuckDB running only their FINAL
verification query over raw parquet, while the Spark side builds the
whole lifecycle (table create, appends, deletes, time travel) — those
ratios measure "query result recheck" vs "full lifecycle", not engine
speed. The q_* analytic keys are the apples-to-apples subset.

Usage: tools/bench_oracle.py <sfDir> <oracle_sql.json>
                             [--out tools/bench_oracle.json]
                             [--runs 2]

--runs 1 suits big scale factors (the sf1 timed lane): keys run
minutes there, so the warm-vs-cold delta the second run controls for
is noise while the rerun doubles a multi-hour wall.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = list(sys.argv[1:])
    out = "tools/bench_oracle.json"
    runs = 2
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    sf_dir, oracle_path = args[0], args[1]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    keys = {}
    failed = []
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        try:
            for _ in range(runs):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            keys[name] = round(best, 4)
            # incremental checkpoint: a multi-hour big-SF run killed
            # mid-flight keeps every completed key
            with open(out + ".partial", "w") as f:
                json.dump({"sf": sf_dir, "keys": keys}, f)
        except Exception as e:
            failed.append(name)
            print(f"[oracle-bench] {name} failed: {e}", file=sys.stderr)
    doc = {"sf": sf_dir, "engine": "duckdb", "runs": runs, "agg": "min",
           "keys": keys, "failed": sorted(failed)}
    with open(out, "w") as f:
        json.dump(doc, f, indent=0, sort_keys=True)
        f.write("\n")
    total = sum(keys.values())
    print(f"[oracle-bench] {len(keys)} keys timed, {len(failed)} failed, "
          f"duck total {total:.2f}s -> {out}")


if __name__ == "__main__":
    main()
