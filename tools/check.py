#!/usr/bin/env python3
"""Dev-only oracle self-check (mirrors the driver's CORRECTNESS gate).

Runs after `tools/run.sh graft.Verify <sfDir> <outDir>`: loads each
<outDir>/<name> parquet (Spark result), runs <outDir>/oracle_sql.json's
SQL in DuckDB against the same testdata parquet, sorts columns by name
(like the driver) and compares row-by-row.

Usage: tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def values_equal(a, b):
    a, b = norm(a), norm(b)
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # driver hashes exact values; require exact
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output parquet"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        got_cols = [c[0] for c in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"[----] {name}: no oracle ({len(got_rows)} rows, rows-only check)")
            n_noora += 1
            continue
        try:
            exp = con.execute(oracle[name])
            exp_cols = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"[FAIL] {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eperm = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        g = [[r[i] for i in gperm] for r in got_rows]
        e = [[r[i] for i in eperm] for r in exp_rows]
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if not all(values_equal(x, y) for x, y in zip(gr, er)):
                bad = (i, gr, er)
                break
        if bad:
            i, gr, er = bad
            print(f"[FAIL] {name}: row {i} differs\n  spark : {gr}\n  duckdb: {er}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
