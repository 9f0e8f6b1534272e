#!/bin/bash
# Timed sf1 lane (r16, verdict #3): run the HEAVY analytic keys at 10x
# the bench scale factor on BOTH engines and record the per-key pairs,
# so the 100-TB scale story gets a measured trend instead of a single
# sf0.1 point where ~0.2s of fixed job scheduling dominates every
# ratio. Spark's ratio should IMPROVE with scale on the scan/join/
# dedup families; a key whose ratio WORSENS 10x up is a genuine scale
# smell no sf0.1 number can reveal.
#
# Writes: tools/bench_sf1.json      (graft.Bench sidecar: spark secs,
#                                    job counts, duck secs per key)
#         tools/bench_oracle_sf1.json (DuckDB oracle walls at sf1)
#
# Usage: tools/bench_sf1.sh [sf1dir]     (~15 min: duck ~7 min serial,
#                                         spark a few min on 32 cores)
set -e
cd "$(dirname "$0")/.."
SF1="${1:-/root/repo/target/sf1}"
if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "[bench-sf1] materializing sf1 at $SF1"
  python3 tools/make_sf1.py "$SF1"
fi

# heavy analytic subset: every q_* key where either engine spent
# >=0.8s (spark) / >=0.3s (duck) at sf0.1 in the r16 record — the band
# where per-key wall measures work, not scheduling
KEYS=q_agg_approx_distinct,q_agg_approx_quantile,q_curriculum,q_decontaminate,q_dedup_chunk_overlap,q_dedup_clusters,q_dedup_embed,q_dedup_incremental,q_dedup_lsh_pairs,q_dedup_minhash,q_dedup_near,q_dedup_ngram,q_dedup_semantic,q_dedup_simhash,q_dedup_simhash_pairs,q_dedup_source_sketch,q_dedup_spans,q_except,q_join_bloom,q_join_inner,q_join_skew_salted,q_join_sortmerge,q_join_theta_range,q_mine_hard_negatives,q_pack_greedy,q_quality_repetition,q_scan_project,q_sim_ann_lsh,q_sim_range_refpoints,q_star_join,q_stream_dedup,q_stream_join,q_stream_session,q_stream_sliding,q_subquery_corr,q_subquery_scalar,q_text_cdc_chunks,q_text_chunk,q_text_lang_id,q_text_quality,q_text_rarity,q_text_vocab,q_tfidf,q_topk_per_group,q_union_all,q_union_distinct

# oracle SQL is data-independent — dump it via a one-key Verify run.
# ALWAYS regenerate: a cached dump from a prior round silently times
# stale SQL after a round edits an oracle (r17: the adaptive-width LSH
# oracle would have run against the r16 fixed-6-bit form)
ORACLE_DUMP=/tmp/bench_sf1_oracle_dump
rm -rf "$ORACLE_DUMP"
tools/run.sh graft.Verify /root/testdata/sf0.001 "$ORACLE_DUMP" \
  q_scan_project > /dev/null 2>&1

echo "[bench-sf1] timing DuckDB oracle at sf1 (subset, per-key timeout)"
# PER-KEY subprocess with a hard timeout: the first r16 attempt ran
# the whole subset in one process and a single pathological key
# (q_pack_greedy's recursive CTE goes superlinear at sf1) burned
# hours with no checkpoint. A key that cannot finish inside the cap
# records as a timeout — at 10x scale that IS the result: the
# in-process engine stops being runnable on that shape.
DUCK_TIMEOUT="${DUCK_TIMEOUT:-300}"
python3 - "$SF1" "$ORACLE_DUMP/oracle_sql.json" "$KEYS" "$DUCK_TIMEOUT" <<'EOF'
import json, subprocess, sys
sf, oracle_path, keys, cap = (sys.argv[1], sys.argv[2],
                              sys.argv[3].split(","), int(sys.argv[4]))
oracle = json.load(open(oracle_path))
out, timeouts = {}, []
for k in sorted(k for k in keys if k in oracle):
    json.dump({k: oracle[k]}, open("/tmp/oracle_sf1_one.json", "w"))
    try:
        subprocess.run(
            ["python3", "tools/bench_oracle.py", sf,
             "/tmp/oracle_sf1_one.json", "--runs", "1",
             "--out", "/tmp/oracle_sf1_one_out.json"],
            timeout=cap, check=True, capture_output=True)
        out.update(json.load(open("/tmp/oracle_sf1_one_out.json"))["keys"])
        print(f"[duck-sf1] {k}: {out.get(k)}s", flush=True)
    except subprocess.TimeoutExpired:
        timeouts.append(k)
        print(f"[duck-sf1] {k}: TIMEOUT >{cap}s", flush=True)
    except subprocess.CalledProcessError as e:
        timeouts.append(k)
        print(f"[duck-sf1] {k}: FAILED {e.stderr[-200:]}", flush=True)
doc = {"sf": sf, "engine": "duckdb", "runs": 1, "agg": "min",
       "timeout_s": cap, "keys": out, "timeouts": sorted(timeouts),
       "failed": []}
json.dump(doc, open("tools/bench_oracle_sf1.json", "w"), indent=0,
          sort_keys=True)
print(f"[duck-sf1] {len(out)} timed, {len(timeouts)} timed out/failed")
EOF

echo "[bench-sf1] timing graft.Bench at sf1 (subset)"
# retime threshold lifted way up: at sf1 nearly every key crosses the
# 2s drift-evidence threshold and a full retime pass would double the
# lane's wall (the same rerun cost --runs 1 removes on the duck side)
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_CPUS=32 \
  GRAFT_EXTRA_JAVA_OPTS="${GRAFT_EXTRA_JAVA_OPTS:--Xmx48g}" \
  SPARK_GRAFT_RETIME_THRESHOLD=1e12 \
  SPARK_GRAFT_BENCH_KEYS="$KEYS" \
  SPARK_GRAFT_ORACLE_JSON=tools/bench_oracle_sf1.json \
  SPARK_GRAFT_BENCH_SIDECAR=tools/bench_sf1.json \
  tools/run.sh graft.Bench

echo "[bench-sf1] spark/duck pairs in tools/bench_sf1.json"
