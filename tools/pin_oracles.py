#!/usr/bin/env python3
"""Dev-only: generate VALUES-based golden oracle SQL for the
fixture-deterministic lifecycle keys (sf-independent outputs: seeded
generators + fixed DDL fixtures). Reads the Spark outputs from a
graft.Verify dump dir and prints DuckDB SQL whose pandas rendering is
cell-identical to the Spark parquet under the driver's compare
(tools/check.py canon rules).

Type rules (must mirror check.py::canon):
  * float32  -> CAST('<repr of float64(value)>' AS REAL)  (bit-exact)
  * int cols with NULLs load as float64 on BOTH sides -> emit INTEGER
    with NULLs and let pandas promote identically
  * bool -> TRUE/FALSE, strings quoted, None/NaN -> NULL with a cast

Usage: tools/pin_oracles.py <verifyOutDir> <query> [...]
"""
import sys, glob, math
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

CASTS = {
    "int32": "INTEGER", "int64": "BIGINT", "bool": "BOOLEAN",
    "float32": "REAL", "float64": "DOUBLE", "object": "VARCHAR",
}


def arrow_type(files, col):
    sch = pq.read_schema(files[0])
    return str(sch.field(col).type)


def lit(v, duck_t):
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if duck_t == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if duck_t == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if duck_t in ("REAL", "DOUBLE"):
        # quoted: a bare decimal literal parses as DECIMAL and a >2^53
        # mantissa double-rounds on the way to float; string -> float
        # parsing rounds once, bit-exact with the JVM value
        return "'" + repr(float(v)) + "'"
    return str(int(v))


def main():
    out_dir = sys.argv[1]
    for q in sys.argv[2:]:
        files = sorted(glob.glob(f"{out_dir}/{q}/*.parquet"))
        df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        cols = list(df.columns)
        duck_types = {}
        for c in cols:
            at = arrow_type(files, c)
            duck_t = {"int32": "INTEGER", "int64": "BIGINT", "float": "REAL",
                      "double": "DOUBLE", "bool": "BOOLEAN",
                      "string": "VARCHAR", "large_string": "VARCHAR"}.get(at)
            if duck_t is None:
                raise SystemExit(f"{q}.{c}: unhandled arrow type {at}")
            duck_types[c] = duck_t
        rows = []
        for _, r in df.iterrows():
            rows.append("(" + ", ".join(
                lit(r[c], duck_types[c]) for c in cols) + ")")
        sel = ", ".join(f"CAST({c} AS {duck_types[c]}) AS {c}" for c in cols)
        sql = (f"SELECT {sel}\nFROM (VALUES\n  " + ",\n  ".join(rows) +
               f")\n  AS t({', '.join(cols)})")
        print(f"----- {q}\n{sql}\n")


if __name__ == "__main__":
    main()
