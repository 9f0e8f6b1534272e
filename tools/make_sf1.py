#!/usr/bin/env python3
"""Dev-only sf1 materializer for the scale sweep (SURVEY §6.2).

/root/testdata tops out at sf0.1 (driver-generated, read-only), so an
"sf1 sweep" against driver fixtures is impossible as such. This builds
a DETERMINISTIC 10x scale-up of sf0.1 under the repo's scratch dir:

  * lineitem/orders: 10 key-shifted copies — l_orderkey/o_orderkey
    shift together by copy*STRIDE so the lineitem-orders join fans out
    10x while staying key-correct; o_custkey/partkey/suppkey stay, so
    dim joins survive (each customer just has 10x orders).
  * documents: 10 copies with shifted doc_id and EXACT duplicate text —
    deliberately: dedup at scale is ABOUT duplicates, and the
    cross-copy duplicate classes stress the LSH/banding/cluster caps.
  * embeddings: 10 copies with shifted vec_id and the first vector
    component perturbed by copy*1e-3 — keeps vectors distinct so
    cosine top-k has no cross-copy ties at the k boundary (a tie would
    make ANY engine's top-k order-ambiguous, which is a fixture
    artifact, not a finding).
  * small tables (region nation customer supplier part events): copied
    verbatim.

Everything is pure pyarrow/numpy — no RNG, rerunnable bit-for-bit.

Usage: tools/make_sf1.py [outdir]     (default /root/repo/target/sf1)
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = 10
STRIDE = 10_000_000

os.makedirs(OUT, exist_ok=True)

def scale(name, shift_cols, perturb_vec=False):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for c in range(COPIES):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in shift_cols:
                col = pa.chunked_array([
                    pa.compute.add(ch, c * STRIDE) for ch in col.chunks])
            elif perturb_vec and field.name == "embedding" and c > 0:
                out_chunks = []
                for ch in col.chunks:
                    flat = ch.values.to_numpy(zero_copy_only=False).copy()
                    offs = ch.offsets.to_numpy(zero_copy_only=False)
                    flat[offs[:-1]] += np.float32(c * 1e-3)
                    out_chunks.append(pa.ListArray.from_arrays(
                        ch.offsets, pa.array(flat, type=pa.float32())))
                col = pa.chunked_array(out_chunks)
            cols.append(col)
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{OUT}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {big.num_rows}")

scale("lineitem", {"l_orderkey"})
scale("orders", {"o_orderkey"})
scale("documents", {"doc_id"})
scale("embeddings", {"vec_id"}, perturb_vec=True)
for name in ["region", "nation", "customer", "supplier", "part",
             "events"]:
    shutil.copyfile(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
    print(f"{name}: copied")
print(f"sf1 fixture at {OUT}")
