#!/usr/bin/env python3
"""Dev-only oracle self-check (mirrors the driver's CORRECTNESS gate).

Runs after `tools/run.sh graft.Verify <sfDir> <outDir>`: loads each
<outDir>/<name> parquet (Spark result) via pandas/pyarrow — the way the
driver does — and the oracle SQL via duckdb's .df(), sorts columns by
name, row-sorts with DataFrame.sort_values (driver traceback shows it
does exactly this), then compares cell-by-cell with DTYPE-STRICT
semantics, because the driver hashes the pandas values:

  * a Spark-parquet DECIMAL loads as decimal.Decimal objects while
    DuckDB's .df() materializes DECIMAL as float64 — equal values,
    different hash => queries must not output decimal columns;
  * list/map columns arrive as numpy.ndarray => sort_values raises
    TypeError (unhashable) and the whole query errors at the driver
    => queries must not output raw collection columns.

Usage: tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, math, decimal
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def is_null(v):
    if v is None:
        return True
    try:
        r = pd.isna(v)
        return bool(r) if not isinstance(r, np.ndarray) else False
    except (TypeError, ValueError):
        return False


def canon(v):
    """String rendering of a cell, approximating the driver's hash input
    (to_csv-like). Dates and midnight timestamps both render date-only —
    that's why q_date_funcs passed r01 while every Decimal column failed:
    Decimal keeps its trailing zeros ('1234.5000') but DuckDB's float64
    renders '1234.5'."""
    if is_null(v):
        return ""
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        s = str(pd.Timestamp(v))
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, (list, np.ndarray, dict)):
        raise TypeError(f"collection cell {type(v).__name__}")
    return str(v)


def cells_equal(a, b):
    return canon(a) == canon(b)


def load_sorted(df):
    df = df[sorted(df.columns)]
    # driver does sort_values over all columns; ndarray cells make this
    # raise TypeError exactly like CORRECTNESS_r01's q_array_funcs error
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def ddb_family(t):
    """DuckDB type -> the engine-agnostic family letters FixtureSchemas
    pins (N numeric, S string, T timestampish, A array, B binary)."""
    t = t.upper()
    if t.startswith("DECIMAL") or t in (
            "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
            "FLOAT", "DOUBLE", "REAL", "UTINYINT", "USMALLINT",
            "UINTEGER", "UBIGINT"):
        return "N"
    if t == "VARCHAR":
        return "S"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "T"
    if t.endswith("[]") or t.startswith("LIST"):
        return "A"
    if t == "BLOB":
        return "B"
    return "?"


def preflight_duckdb(con, out_dir):
    """DuckDB-side fixture preflight: FixtureSchemas guards SPARK's view
    of the fixtures; this guards the ORACLE's. A drift that only changes
    DuckDB's read (e.g. a new parquet logical type it maps differently)
    would otherwise surface as confusing hash mismatches — name the
    engine whose view moved instead. Advisory, like the Spark side."""
    import os
    path = f"{out_dir}/fixture_expectations.json"
    if not os.path.exists(path):
        return
    want = json.load(open(path))
    for table in sorted(want):
        try:
            desc = con.execute(f"DESCRIBE {table}").fetchall()
        except Exception as e:
            print(f"[preflight] fixture drift (duckdb view): {table}: "
                  f"unreadable — {e}")
            continue
        got_cols = [r[0] for r in desc]
        if got_cols != list(want[table].keys()):
            print(f"[preflight] fixture drift (duckdb view): {table}: "
                  f"column drift — got {', '.join(got_cols)}; expected "
                  f"{', '.join(want[table].keys())}")
            continue
        for row in desc[:len(want[table])]:
            name, typ = row[0], row[1]
            w = want[table][name]
            # BIGINT is the legacy raw-nanos rendering of a timestamp
            if ddb_family(typ) != w and not (w == "T" and
                                             typ.upper() == "BIGINT"):
                print(f"[preflight] fixture drift (duckdb view): "
                      f"{table}.{name}: got {typ}, wanted family '{w}'")


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    preflight_duckdb(con, out_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    failures, passed = [], []
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{d}/*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark output parquet"); n_fail += 1; failures.append(name); continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            # still exercise the driver's row-sort: collection columns blow up
            try:
                load_sorted(got)
                print(f"[----] {name}: no oracle ({len(got)} rows, rows-only check)")
                n_noora += 1
            except TypeError as e:
                print(f"[FAIL] {name}: no-oracle but driver row-sort would error: {e}")
                n_fail += 1
                failures.append(name)
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}"); n_fail += 1; failures.append(name); continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"[FAIL] {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; failures.append(name); continue
        try:
            g, e = load_sorted(got), load_sorted(exp)
        except TypeError as err:
            print(f"[FAIL] {name}: driver row-sort would error: {err}"); n_fail += 1; failures.append(name); continue
        bad = None
        cols = list(g.columns)
        # column-vectorized canon compare: the old per-row .iloc loop
        # was O(rows*cols) python-object access and made multi-million-
        # row keys (q_scan_project at sf1 = 6M rows) time out in the
        # sweep; .map(canon) + array compare is ~100x faster with the
        # identical cell semantics
        for c in cols:
            gc = g[c].map(canon).to_numpy()
            ec = e[c].map(canon).to_numpy()
            neq = gc != ec
            if neq.any():
                i = int(np.argmax(neq))
                bad = (i, c, g[c].iloc[i], type(g[c].iloc[i]).__name__,
                       e[c].iloc[i], type(e[c].iloc[i]).__name__)
                break
        if bad:
            i, c, gv, gt, ev, et = bad
            print(f"[FAIL] {name}: row {i} col {c}: spark={gv!r} ({gt}) duckdb={ev!r} ({et})")
            n_fail += 1
            failures.append(name)
        else:
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
            passed.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle")
    if json_out:
        json.dump({"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                   "no_oracle": n_noora, "failures": sorted(failures),
                   "passed": sorted(passed)},
                  open(json_out, "w"), indent=1)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
