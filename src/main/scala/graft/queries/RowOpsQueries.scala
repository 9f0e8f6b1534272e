package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{Engine, LakeTable, LakeTxn}

/** Copy-on-write row-level ops (DELETE / UPDATE / MERGE) exercised
  * end-to-end against the driver testdata, each with a DuckDB oracle
  * expressing the same final table state in plain SQL. The lake side
  * round-trips through a scratch table: create → append the real
  * parquet rows → row-level op (file-pruned rewrite) → read back →
  * aggregate/order deterministically.
  *
  * Scale posture: the op rewrites only files whose partition values /
  * stats / rows match (RowOpsSpec pins that), so at 100 TB a
  * predicate hitting one partition rewrites one partition — the rest
  * of the table is untouched metadata.
  */
object RowOpsQueries extends QueryModule {
  import graft.lake.Engine

  private def scratch(tag: String): String = LakeQueries.freshWarehouse(tag)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_delete" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowdel")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_cow","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_cow")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      // partition-pruned CoW delete: only status=F files are opened
      t.delete(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      t.read(s).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_delete_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read DELETE: position-delete files, no data-file
      // rewrite; read back through the DSv2 connector so the oracle
      // gate covers the reader-side position skipping too
      val wh = scratch("rowdelmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_mor","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_mor")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "orders_mor").load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_update_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read UPDATE: matched rows become position deletes plus
      // appended updated copies — no data-file rewrite; read back via
      // the DSv2 connector so the gate covers reader-side skipping
      val wh = scratch("rowupdmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_umor","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[{"column":"c_mktsegment","name":"seg"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_umor")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      t.updateMoR(s, Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))),
        col("c_mktsegment") === "BUILDING",
        prune = Map("seg" -> Set("BUILDING")))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "customer_umor").load()
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_delete_vectors" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3-style deletion vectors (format-version=3):
      // two overlapping MoR deletes plus an update — each commit's
      // vector REPLACES the file's earlier delete state, so the live
      // structures stay one bitmap per file instead of an accumulating
      // delete-file list. Read back through the DSv2 connector so the
      // oracle gate covers the reader-side bitmap probe, and
      // self-audit that no positional parquet survived the vectoring.
      val wh = scratch("rowdelvec")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_dv","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_dv")
      t.updateProperties(Map("format-version" -> "3"))
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      val t2 = LakeTable.load(wh, "rowops", "orders_dv")
      t2.deleteMoR(s, col("o_totalprice") > 300000.0)
      val t3 = LakeTable.load(wh, "rowops", "orders_dv")
      t3.updateMoR(s, Map("o_orderpriority" -> lit("0-VECTORED")),
        col("o_totalprice") < 10000.0)
      val t4 = LakeTable.load(wh, "rowops", "orders_dv")
      val live = LakeTable.liveDeletes(t4.metadata.snapshots)
      require(live.nonEmpty &&
        live.values.forall(ds => ds.dv.isDefined && ds.paths.isEmpty),
        "lake_delete_vectors: expected every live delete to be a " +
          "vector with no positional parquet residue")
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "orders_dv").load()
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    "lake_analyze" -> QueryModule.micro(4)((s, dir) => {
      // ANALYZE TABLE (Iceberg's statistics-file concept): one scan
      // computes per-column ndv + null counts, committed into table
      // metadata with snapshot provenance; the DSv2 scan serves them
      // to Spark's CBO (columnStats), and the `.stats` metadata
      // relation exposes them to SQL — which is the oracle-gated
      // result here, exact mode vs DuckDB's exact COUNT(DISTINCT).
      val wh = scratch("analyze")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_an","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_nationkey","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_an")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
      s.conf.set("spark.sql.catalog.gan", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gan.warehouse", wh)
      s.sql("CALL gan.system.analyze(db => 'rowops', " +
        "`table` => 'customer_an', mode => 'exact')")
      s.sql("""SELECT column_name, ndv, null_count
              |FROM gan.rowops.customer_an.stats
              |ORDER BY column_name""".stripMargin)
    }),

    "lake_row_lineage" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3 row lineage: stable _row_id assigned at commit and
      // PRESERVED across a copy-on-write update and a full compaction
      // (rewrites materialize the ids). Self-audited distributed-ly:
      // per-key ids before vs after must be identical, all non-null,
      // all distinct — a rewrite that re-identified rows fails here
      // long before the (data-only) oracle could notice.
      val wh = scratch("rowlineage")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_rl","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_rl")
      t.updateProperties(Map("format-version" -> "3"))
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      val before = t.readLineage(s)
        .select(col("c_custkey"), col("_row_id").as("rid_before"))
      t.update(s, Map("c_acctbal" -> (col("c_acctbal") + 100.0)),
        col("c_mktsegment") === "BUILDING")
      val t2 = LakeTable.load(wh, "rowops", "customer_rl")
      t2.compact(s)
      val t3 = LakeTable.load(wh, "rowops", "customer_rl")
      val after = t3.readLineage(s)
      val drift = after
        .select(col("c_custkey"), col("_row_id").as("rid_after"))
        .join(before, Seq("c_custkey"))
        .filter(col("rid_after").isNull ||
          !(col("rid_after") === col("rid_before")))
        .limit(1).collect()
      require(drift.isEmpty,
        s"lake_row_lineage: a rewrite re-identified rows: " +
          drift.mkString(", "))
      val Array(nAll, nIds) = after.agg(
        count(lit(1)), countDistinct(col("_row_id"))).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
      require(nAll == nIds,
        s"lake_row_lineage: $nAll rows but $nIds distinct ids")
      after.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_merge_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read MERGE: matched target rows → position deletes +
      // source-valued copies, unmatched source rows append — only
      // deltas are written, no target file rewrite
      val wh = scratch("rowmrgmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_mmor","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_mmor")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"))
      val src = Tables(s, dir, "supplier").select(
        col("s_suppkey").as("c_custkey"), col("s_name").as("c_name"),
        lit("SUPPLIER").as("c_mktsegment"))
      t.mergeMoR(s, src, Seq("c_custkey"))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "customer_mmor").load()
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_truncate_part" -> QueryModule.micro(4)((s, dir) => {
      // truncate[W] hidden partitioning (Iceberg's order-preserving
      // clustering): ids land in contiguous W-wide dirs, so the range
      // predicate prunes to a dir run; read back through the catalog
      // so SQL + pruning sit under the oracle gate
      val wh = scratch("truncpart")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_tr","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[{"column":"o_orderkey","transform":"truncate[10000]"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_tr")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"))
      s.conf.set("spark.sql.catalog.gtrp", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gtrp.warehouse", wh)
      s.sql("""SELECT o_orderstatus,
              |  count(*) AS n_orders,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              |FROM gtrp.rowops.orders_tr
              |WHERE o_orderkey >= 10000 AND o_orderkey < 30000
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    "lake_update" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowupd")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_cow","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[{"column":"c_mktsegment","name":"seg"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_cow")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      t.update(s, Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))),
        col("c_mktsegment") === "BUILDING",
        prune = Map("seg" -> Set("BUILDING")))
      t.read(s).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_merge" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowmrg")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_m","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_m")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"))
      // upsert suppliers over the customer key space: matched keys take
      // the supplier identity, unmatched suppliers are inserted
      val src = Tables(s, dir, "supplier").select(
        col("s_suppkey").as("c_custkey"), col("s_name").as("c_name"),
        lit("SUPPLIER").as("c_mktsegment"))
      t.merge(s, src, Seq("c_custkey"))
      t.read(s).select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_ff" -> QueryModule.micro(4)((s, dir) => {
      // writable-branch lifecycle WITH divergence: a branch takes an
      // isolated commit (main keeps serving the fork-base state), main
      // then moves past the fork — fast-forward refuses the diverged
      // branch, an explicit rebase re-forks it at the new head (sound:
      // branch commits are append-only), and fast-forward publishes.
      // Zero data movement at publish or rebase. Final state = base +
      // main's divergent append + the branch commit, under the oracle.
      val wh = LakeQueries.freshWarehouse("branchff")
      Engine.processTableDefJson(wh,
        """{"database_name":"bq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bq", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust.filter(col("c_custkey") % 2 === 0))
      t.createBranch("ingest")
      t.appendToBranch(cust.filter(col("c_custkey") % 4 === 1), "ingest")
      // isolation audit, loud before the oracle
      val mainRows = t.read(s).count()
      require(t.readBranch(s, "ingest").count() > mainRows,
        "branch overlay must see its commit")
      // main diverges past the fork base
      LakeTable.load(wh, "bq", "cust")
        .append(cust.filter(col("c_custkey") % 4 === 3))
      val t2 = LakeTable.load(wh, "bq", "cust")
      require(scala.util.Try(t2.fastForward("ingest")).isFailure,
        "fast-forward must refuse a diverged branch")
      t2.rebaseBranch("ingest")
      require(t2.readBranch(s, "ingest").count() == cust.count(),
        "rebased branch view must overlay main's divergent commit")
      t2.fastForward("ingest")
      LakeTable.load(wh, "bq", "cust").read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_mor" -> QueryModule.micro(4)((s, dir) => {
      // row-level ops ON A BRANCH: a curation pass stages a
      // merge-on-read delete (bad keys) and a blind upsert (patched
      // rows) against a branch — main keeps serving the untouched
      // table while the fixes are audited, then fast-forward publishes
      // both commits under their real operations. Write cost is
      // O(keys + patched rows) regardless of table size (equality
      // deletes: no read, no rewrite), and isolation costs zero data
      // movement — the 100 TB "fix the corpus without blocking
      // readers" shape. Final state under the oracle: keys ending in 3
      // gone, keys ending in 7 re-segmented, everything else intact.
      val wh = LakeQueries.freshWarehouse("branchmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"bm","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bm", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust)
      t.createBranch("curate")
      // the whole curation pass runs from SQL: key/source rows travel
      // as registered views (CALL args are scalars), the branch verbs
      // are CALL procedures, the audit reads VERSION AS OF '<branch>',
      // and publish is CALL system.fast_forward
      s.conf.set("spark.sql.catalog.graftbm", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftbm.warehouse", wh)
      cust.filter(col("c_custkey") % 10 === 3).select("c_custkey")
        .createOrReplaceTempView("bm_bad_keys")
      cust.filter(col("c_custkey") % 10 === 7)
        .withColumn("c_mktsegment", lit("PATCHED"))
        .createOrReplaceTempView("bm_patched")
      s.sql("CALL graftbm.system.branch_delete(" +
        "'bm', 'cust', 'curate', 'bm_bad_keys')").collect()
      s.sql("CALL graftbm.system.branch_upsert(" +
        "'bm', 'cust', 'curate', 'bm_patched', 'c_custkey')").collect()
      // isolation audit, loud before the oracle: main serves the full
      // table; the branch view dropped the deleted keys
      val full = cust.count()
      require(s.sql("SELECT count(*) FROM graftbm.bm.cust")
        .head.getLong(0) == full,
        "main must keep serving the untouched table")
      require(s.sql(
        "SELECT count(*) FROM graftbm.bm.cust VERSION AS OF 'curate'")
        .head.getLong(0) ==
        full - cust.filter(col("c_custkey") % 10 === 3).count(),
        "branch view must drop the MoR-deleted keys")
      s.sql("CALL graftbm.system.fast_forward('bm', 'cust', 'curate')")
        .collect()
      LakeTable.load(wh, "bm", "cust").read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_cow" -> QueryModule.micro(4)((s, dir) => {
      // COPY-ON-WRITE row-level ops ON A BRANCH (round-6 What's-missing
      // #1, now built): the same curation pass as lake_branch_mor but
      // as file REWRITES — CoW delete of bad keys, CoW update
      // re-segmenting others — staged in branch isolation while main
      // keeps serving the untouched table. fast_forward publishes the
      // rewrites as "overwrite" snapshots after the rebase check
      // verifies no rewritten file moved under the branch; unlike the
      // MoR variant the published table carries ZERO read-side debt
      // (no delete files, no equality batches to merge at read time) —
      // the audited-rewrite shape for read-heavy 100 TB tables.
      val wh = LakeQueries.freshWarehouse("branchcow")
      Engine.processTableDefJson(wh,
        """{"database_name":"bc","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bc", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust)
      t.createBranch("fix")
      // the whole pass runs from SQL (predicates travel as SQL exprs)
      s.conf.set("spark.sql.catalog.graftbc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftbc.warehouse", wh)
      s.sql("CALL graftbc.system.branch_delete_cow(" +
        "'bc', 'cust', 'fix', 'c_custkey % 10 = 3')").collect()
      s.sql("CALL graftbc.system.branch_update_cow(" +
        "'bc', 'cust', 'fix', 'c_mktsegment', '''PATCHED''', " +
        "'c_custkey % 10 = 7')").collect()
      // isolation audit, loud before the oracle: main serves the full
      // table; the branch view shows the rewrite
      val full = cust.count()
      require(s.sql("SELECT count(*) FROM graftbc.bc.cust")
        .head.getLong(0) == full,
        "main must keep serving the untouched table")
      require(s.sql(
        "SELECT count(*) FROM graftbc.bc.cust VERSION AS OF 'fix'")
        .head.getLong(0) ==
        full - cust.filter(col("c_custkey") % 10 === 3).count(),
        "branch view must drop the CoW-deleted keys")
      val published = LakeTable.load(wh, "bc", "cust")
      val snaps = published.fastForward("fix")
      require(snaps.nonEmpty && snaps.forall(_.operation == "overwrite"),
        s"CoW publish must produce overwrite snapshots, got " +
          snaps.map(_.operation).mkString(", "))
      published.read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_cdc_apply" -> QueryModule.micro(4)((s, dir) => {
      // the full CDC replication loop: a source table evolves by
      // append + blind upsert; a replica pulls each snapshot range
      // incrementally (changesBetween — metadata-only planning, only
      // the added rows are read) and applies it with the same blind
      // upsert — the replica converges to the source with zero full
      // scans on either side, O(delta) per pull. This is the
      // cross-region/cross-tier mirror shape at 100 TB.
      val wh = LakeQueries.freshWarehouse("cdcapply")
      def mk(name: String): LakeTable = {
        Engine.processTableDefJson(wh,
          s"""{"database_name":"cq","table_name":"$name","columns":[
            |{"column_name":"n_nationkey","data_type":"int"},
            |{"column_name":"n_name","data_type":"string"},
            |{"column_name":"n_regionkey","data_type":"int"}],
            |"partitions":[]}""".stripMargin)
        LakeTable.load(wh, "cq", name)
      }
      val src = mk("src")
      val dst = mk("dst")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val s1 = src.append(nat).id
      val s2 = LakeTable.load(wh, "cq", "src").upsertMoR(s,
        nat.filter(col("n_nationkey") < 10)
          .withColumn("n_name", concat(col("n_name"), lit("_v2"))),
        keys = Seq("n_nationkey")).id
      // two incremental pulls, each applied as a blind upsert
      var d = dst
      Seq((0L, s1), (s1, s2)).foreach { case (from, to) =>
        val delta = LakeTable.load(wh, "cq", "src")
          .changesBetween(s, from, to)
        d.upsertMoR(s, delta, keys = Seq("n_nationkey"))
        d = LakeTable.load(wh, "cq", "dst")
      }
      // replica must equal the source exactly — fail loudly before the
      // oracle if the mirror diverged
      val srcRows = LakeTable.load(wh, "cq", "src").read(s)
      require(d.read(s).except(srcRows).isEmpty &&
        srcRows.except(d.read(s)).isEmpty, "replica diverged from source")
      d.read(s).orderBy("n_nationkey")
    }),

    "lake_changelog" -> QueryModule.micro(4)((s, dir) => {
      // changelog replication WITH delete markers: a history mixing
      // appends, a positional MoR delete, a blind upsert and a keyed
      // MoR delete is replayed into a mirror from `changelogBetween`'s
      // (_change_type, _change_ordinal) rows — the history
      // `changesBetween` alone cannot replicate (it never surfaces the
      // deletes). Per ordinal the mirror applies deletes then inserts,
      // mirroring sequence-number semantics; the replay loop is
      // O(snapshots) driver-side with O(delta) work per step.
      // the 6-commit MoR source is SHARED with the other changelog
      // keys (built once per JVM+dir); only the mirror is per-query
      val srcWh = LakeQueries.changelogSource(s, dir)
      val wh = LakeQueries.freshWarehouse("changelog")
      Engine.processTableDefJson(wh,
        """{"database_name":"clq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val srcT = LakeTable.load(srcWh, "cls", "src")
      val log = LakeQueries.changelogSourceLog(s, dir)
      // one metadata-scale collect tells each ordinal's change kinds
      // ONE dst handle across the replay: every commit goes through it,
      // so it can never be stale — reloading per ordinal paid a full
      // metadata parse per step for nothing
      val d = LakeTable.load(wh, "clq", "dst")
      LakeQueries.replayChangelog(d, log, Seq("n_nationkey"),
        Seq("n_nationkey", "n_name", "n_regionkey"))
      // mirror must equal the source exactly — fail loudly before the
      // oracle if the changelog replay diverged
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(srcT.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"), "changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_cow" -> QueryModule.micro(4)((s, dir) => {
      // changelog over COPY-ON-WRITE commits (closes the last
      // acknowledged changelog gap): an overwrite records replaced
      // FILES, not rows, so by default it refuses — includeCowDiffs
      // opts into computing the row delta (removed-files-before vs
      // rewritten-output, multiset except: kept rows cancel, only the
      // CoW-deleted/updated rows surface) at O(rewritten bytes) per
      // such snapshot. The log replays into a mirror that must equal
      // the source — deletes carry FULL rows here (unlike eq-delete
      // key markers), so the replay keys on the row identity. SQL
      // surface: create_changelog_view(..., include_cow => 'true').
      val wh = LakeQueries.freshWarehouse("chlogcow")
      Engine.processTableDefJson(wh,
        """{"database_name":"ccq","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int","required":true},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"n_nationkey"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"ccq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "ccq", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      // CoW UPDATE: region-1 names get a suffix (file rewrite)
      src.update(s, Map("n_name" -> concat(col("n_name"), lit("_cow"))),
        col("n_regionkey") === 1)
      // CoW DELETE: multiples of 7 go away (another rewrite)
      src.delete(s, col("n_nationkey") % 7 === 0)
      val maxId = src.metadata.snapshots.map(_.id).max
      // the raw mode refuses WITHOUT the opt-in — pin the refusal text
      val refused = scala.util.Try(
        src.changelogBetween(s, 0L, maxId).count())
      require(refused.isFailure && refused.failed.get.getMessage
        .contains("includeCowDiffs"),
        "CoW changelog must refuse without the opt-in")
      // SQL surface builds the view; the replay consumes it
      s.conf.set("spark.sql.catalog.gccq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gccq.warehouse", wh)
      s.sql(
        s"""CALL gccq.system.create_changelog_view(db => 'ccq',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'ccq_log', include_cow => 'true')""".stripMargin)
      val d = LakeTable.load(wh, "ccq", "dst")
      LakeQueries.replayChangelog(d, s.table("ccq_log"),
        Seq("n_nationkey"), Seq("n_nationkey", "n_name", "n_regionkey"))
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(src.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"), "CoW changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_replace" -> QueryModule.micro(4)((s, dir) => {
      // changelog over FULL-CONTENT REPLACE snapshots (INSERT
      // OVERWRITE / RTAS — the last changelog refusal): a replace
      // resets the replay rather than naming changed rows, so by
      // default it refuses; include_replace opts into COMPUTING the
      // row diff — the whole before state (every live delete applied)
      // multiset-excepted against the replace's own content, so kept
      // rows cancel and only genuine deletes/inserts surface, at
      // O(replaced bytes). The range here mixes a plain append, a MoR
      // delete, the replace, and a post-replace append; the log
      // replays into a mirror that must equal the source.
      val wh = LakeQueries.freshWarehouse("chlogrep")
      Engine.processTableDefJson(wh,
        """{"database_name":"crq","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int","required":true},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"n_nationkey"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"crq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "crq", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      // a MoR delete BEFORE the replace: the before-image must apply it
      LakeTable.load(wh, "crq", "src")
        .deleteMoR(s, col("n_nationkey") % 5 === 0)
      // the replace: derived from the visible content — drop region 2,
      // suffix region-0 names (an INSERT OVERWRITE SELECT shape)
      val t2 = LakeTable.load(wh, "crq", "src")
      val replaced = t2.read(s).filter(col("n_regionkey") =!= 2)
        .withColumn("n_name", when(col("n_regionkey") === 0,
          concat(col("n_name"), lit("_r"))).otherwise(col("n_name")))
        .localCheckpoint()
      t2.overwrite(replaced)
      // life goes on after the replace
      LakeTable.load(wh, "crq", "src").append(
        nat.filter(col("n_nationkey") < 5)
          .withColumn("n_nationkey", col("n_nationkey") + 200)
          .withColumn("n_name", concat(col("n_name"), lit("_post"))))
      val srcT = LakeTable.load(wh, "crq", "src")
      val maxId = srcT.metadata.snapshots.map(_.id).max
      // the raw mode refuses WITHOUT the opt-in — pin the refusal text
      val refused = scala.util.Try(
        srcT.changelogBetween(s, 0L, maxId).count())
      require(refused.isFailure && refused.failed.get.getMessage
        .contains("includeReplaceDiffs"),
        "replace changelog must refuse without the opt-in")
      s.conf.set("spark.sql.catalog.gcrq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gcrq.warehouse", wh)
      s.sql(
        s"""CALL gcrq.system.create_changelog_view(db => 'crq',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'crq_log', include_replace => 'true')""".stripMargin)
      val d = LakeTable.load(wh, "crq", "dst")
      LakeQueries.replayChangelog(d, s.table("crq_log"),
        Seq("n_nationkey"), Seq("n_nationkey", "n_name", "n_regionkey"))
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(srcT.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"),
        "replace changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_updates" -> QueryModule.micro(4)((s, dir) => {
      // changelog UPDATE pairing + net changes (Iceberg's
      // create_changelog_view(compute_updates / net_changes)) on a
      // table whose row identity is DECLARED (identifier-fields), so
      // the upsert runs key-less and the pairing needs no explicit
      // identifier columns. The same mixed history as lake_changelog;
      // ordinal 2's blind upsert emits one delete + one insert per key,
      // which the updates view re-tags update_before / update_after.
      // Net mode is self-audited: every identity born inside the range
      // nets to a plain insert, and the net key set must equal the
      // source's final state.
      // the 6-commit MoR source is SHARED with the other changelog
      // keys (built once per JVM+dir; identity declared there, so the
      // key-less upsert and the default identifier pairing both hold)
      val wh = LakeQueries.changelogSource(s, dir)
      val src = LakeTable.load(wh, "cls", "src")
      val maxId = src.metadata.snapshots.map(_.id).max
      s.conf.set("spark.sql.catalog.gclu", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gclu.warehouse", wh)
      s.sql(
        s"""CALL gclu.system.create_changelog_view(db => 'cls',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'clu_updates', mode => 'updates')""".stripMargin)
      // net-mode self-audit: the whole range starts from an empty
      // table, so every surviving identity nets to a plain insert and
      // the net key set IS the final state. Net runs over the SHARED
      // materialized log (no second per-ordinal marker read), and both
      // checks fold into ONE action: non-insert rows and any key-set
      // asymmetry vs the final state surface through the same frame.
      val net = src.changelogNet(
        LakeQueries.changelogSourceLog(s, dir), Seq.empty)
      val problems = net
        .filter(col("_change_type") =!= "insert")
        .select(lit("non-insert net row for key").as("why"),
          col("n_nationkey"))
        .unionByName(net.select("n_nationkey").withColumn("_w", lit(1))
          .unionByName(src.read(s).select("n_nationkey")
            .withColumn("_w", lit(-1)))
          .groupBy("n_nationkey").agg(sum("_w").as("_d"))
          .filter(col("_d") =!= 0)
          .select(lit("net/final key mismatch").as("why"),
            col("n_nationkey")))
        .limit(5).collect()
      require(problems.isEmpty,
        "net changelog audit failed: " + problems.mkString("; "))
      s.table("clu_updates")
        .select(col("n_nationkey"), col("_change_type").as("change_type"),
          col("_change_ordinal").as("ord"))
        .orderBy("ord", "change_type", "n_nationkey")
    }),

    "lake_incr_rollup" -> QueryModule.micro(4)((s, dir) => {
      // incremental materialized-view maintenance: a per-customer
      // rollup follows an append-only source through CDC reads. Each
      // refresh pulls ONLY the new snapshots' rows (changesBetween —
      // O(delta) metadata-planned read; the source is never
      // rescanned), aggregates the delta, joins it against the
      // CURRENT rollup values of just the touched groups, and
      // blind-upserts the merged rows (equality-delete supersede —
      // O(changed groups) write, no rollup rewrite). At 100 TB the
      // refresh cost tracks the delta, not the table. Sums accumulate
      // in DECIMAL so incremental addition is exact-associative and
      // matches the oracle's one-pass aggregate bit-for-bit.
      val wh = LakeQueries.freshWarehouse("incrroll")
      Engine.processTableDefJson(wh,
        """{"database_name":"iq","table_name":"src","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"iq","table_name":"roll","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"n_orders","data_type":"long"},
          |{"column_name":"sum_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 4 === 0) // bench-sized fixture
        .select("o_orderkey", "o_custkey", "o_totalprice")
      var lastSeen = 0L
      Seq(0, 1, 2).foreach { m =>
        val src = LakeTable.load(wh, "iq", "src")
        val snap = src.append(orders.filter(col("o_orderkey") % 3 === m))
        // refresh: delta rows only, then merge-add into the rollup
        val delta = src.changesBetween(s, lastSeen, snap.id)
        lastSeen = snap.id
        val deltaAgg = delta.groupBy("o_custkey")
          .agg(count(lit(1)).as("d_n"),
            sum(Tables.dec(col("o_totalprice")))
              .cast("decimal(18,4)").as("d_sum"))
        val roll = LakeTable.load(wh, "iq", "roll")
        if (m == 0) {
          // first refresh of an empty view = full load: no current
          // values to merge and no keys to supersede, so a plain
          // append skips both the rollup read/join and the
          // equality-delete key batch
          roll.append(deltaAgg.select(col("o_custkey"),
            col("d_n").as("n_orders"), col("d_sum").as("sum_price")))
        } else {
          // one materialization: upsertMoR evaluates its source twice
          // (key batch + data write), and the merge join is not free
          val merged = deltaAgg
            .join(roll.read(s), Seq("o_custkey"), "left")
            .select(col("o_custkey"),
              (col("d_n") + coalesce(col("n_orders"), lit(0L)))
                .as("n_orders"),
              (col("d_sum") + coalesce(col("sum_price"),
                lit(BigDecimal(0)).cast("decimal(18,4)")))
                .cast("decimal(18,4)").as("sum_price"))
            .localCheckpoint()
          roll.upsertMoR(s, merged, keys = Seq("o_custkey"))
        }
      }
      // compaction materializes the accumulated equality deletes so
      // the served rollup is plain data files again
      val served = LakeTable.load(wh, "iq", "roll")
      served.compact(s)
      served.read(s)
        .select(col("o_custkey"), col("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy("o_custkey")
    }),

    "lake_compact_zorder" -> QueryModule.micro(4)((s, dir) => {
      // z-order clustered compaction: three unsorted append snapshots
      // (every file's key ranges span the whole table — nothing prunes)
      // are compacted under a zorder(o_orderkey, o_custkey) sort order
      // into Morton-clustered files whose min/max footprints are
      // NARROW on both dimensions — a 2-D range predicate then skips
      // files on metadata alone. The key self-audits the skip (planned
      // < live files) and the oracle pins the surviving rows.
      import graft.lake.RangeFilter
      val wh = LakeQueries.freshWarehouse("zorder")
      Engine.processTableDefJson(wh,
        """{"database_name":"zq","table_name":"ord","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[],
          |"properties":{"write.sort-order":"zorder(o_orderkey,o_custkey)",
          |"write.sort-buckets":"8"}}""".stripMargin)
      val t = LakeTable.load(wh, "zq", "ord")
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 2 === 0) // bench-sized fixture
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // interleave by modulus so every append spans the full key range
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t.compact(s)
      val t2 = LakeTable.load(wh, "zq", "ord")
      // scale-relative 2-D range: the low fifth of each key space, so
      // the prune assertion holds at every scale factor (one tiny
      // metadata-size agg computes the bounds)
      val (maxOk, maxCk) = {
        val r = orders.agg(max("o_orderkey"), max("o_custkey")).head()
        (r.getLong(0) / 5, r.getLong(1) / 5)
      }
      val filters = Seq(
        RangeFilter("o_orderkey", hiNum = Some(BigDecimal(maxOk))),
        RangeFilter("o_custkey", hiNum = Some(BigDecimal(maxCk))))
      val live = t2.plannedFiles().size
      val planned = t2.plannedFiles(statsFilters = filters).size
      require(live > 1 && planned < live,
        s"z-order stats pruning must skip files ($planned of $live planned)")
      t2.read(s, statsFilters = filters)
        .filter(col("o_orderkey") <= maxOk && col("o_custkey") <= maxCk)
        .groupBy(lit(1).as("grp"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("grp")
    }),

    "lake_add_files" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg's add_files / migrate: the shared orders.parquet is
      // registered into the table BY REFERENCE — zero copy, zero
      // rewrite, footer-only IO (the 100-TB onboarding path). The key
      // self-audits that nothing landed under the table's own data dir
      // and that the live set points at the external file, then mixes
      // the referenced data with an ordinary append and a keyed MoR
      // delete (equality batches apply to external files through the
      // same sequence rules) before the oracle compare.
      val wh = LakeQueries.freshWarehouse("addfiles")
      Engine.processTableDefJson(wh,
        """{"database_name":"af","table_name":"orders_ext","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      s.conf.set("spark.sql.catalog.gaf", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gaf.warehouse", wh)
      val proc = s.sql(
        s"""CALL gaf.system.add_files(db => 'af', `table` => 'orders_ext',
           |paths => '$dir/orders.parquet')""".stripMargin).head()
      val t = LakeTable.load(wh, "af", "orders_ext")
      val dataDir = java.nio.file.Paths.get(wh, "af", "orders_ext", "data")
      require(!java.nio.file.Files.exists(dataDir) ||
        scala.util.Using.resource(java.nio.file.Files.list(dataDir))(
          s => !s.findAny().isPresent),
        "add_files must not copy data under the table")
      require(t.plannedFiles().map(_.path).toSet ==
        Set(s"$dir/orders.parquet"),
        "live set must reference the external file")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      require(proc.getAs[Long]("added_rows") == orders.count(),
        "footer row count must match the file")
      t.append(orders.filter(col("o_orderkey") < 10)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
      t.deleteByKeysMoR(s,
        orders.filter(col("o_orderkey") < 100).select("o_orderkey"))
      s.sql(
        """SELECT CAST(o_orderkey % 3 AS BIGINT) AS bucket,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_price
          |FROM gaf.af.orders_ext
          |GROUP BY 1 ORDER BY bucket""".stripMargin)
    }),

    "lake_snapshot_clone" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg's snapshot procedure: a zero-copy dev clone of a table
      // with MoR history — full metadata copy (snapshot log, delete
      // files) referencing the SAME data by path, no bytes moved. The
      // clone then evolves independently (a blind upsert lands only
      // under the clone), time travel works over the cloned history,
      // and the clone refuses orphan sweeps (gc.enabled=false: it
      // shares files it does not own). Self-audited on all four before
      // the oracle compare.
      val wh = LakeQueries.freshWarehouse("snapclone")
      Engine.processTableDefJson(wh,
        """{"database_name":"sn","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "sn", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      src.deleteMoR(s, col("n_regionkey") === 4)
      s.conf.set("spark.sql.catalog.gsnap", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsnap.warehouse", wh)
      s.sql(
        """CALL gsnap.system.snapshot(db => 'sn', `table` => 'src',
          |to_db => 'sn', to_table => 'dev')""".stripMargin)
      val dev = LakeTable.load(wh, "sn", "dev")
      val devData = java.nio.file.Paths.get(wh, "sn", "dev", "data")
      require(!java.nio.file.Files.exists(devData),
        "snapshot clone must copy zero data bytes")
      LakeQueries.requireMirrorEqual(src.read(s), dev.read(s),
        Seq("n_nationkey", "n_name", "n_regionkey"), "snapshot clone")
      // cloned history time-travels: the pre-delete state is intact
      require(dev.read(s, asOfSnapshot = Some(1L)).count() == nat.count(),
        "clone must time-travel over the cloned history")
      // the clone evolves independently — its upsert must not touch src
      dev.upsertMoR(s, nat.filter(col("n_nationkey") < 5)
        .withColumn("n_name", concat(lit("dev_"), col("n_name"))),
        keys = Seq("n_nationkey"))
      require(LakeTable.load(wh, "sn", "src").read(s).count() ==
        dev.read(s).count() - nat.filter(col("n_nationkey") < 5 &&
          col("n_regionkey") === 4).count(),
        "source must not observe the clone's writes")
      // gc refusal: a sweep from the clone's references is never safe
      val refused =
        try { dev.removeOrphanFiles(0); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "removeOrphanFiles must refuse on a clone")
      dev.read(s).orderBy("n_nationkey")
    }),

    "lake_compact_scoped" -> QueryModule.micro(4)((s, dir) => {
      // partition-scoped compaction (Iceberg's rewrite_data_files
      // (where => ...)): three interleaved appends leave every status
      // partition with three small files, a pruned MoR delete attaches
      // position deletes to status=F — then ONLY that partition is
      // compacted, via the SQL CALL surface. Untouched partitions are
      // carried by reference; the key self-audits that their files keep
      // exact (path, seq) through the replay, that every pre-compaction
      // F file is gone, that F's delete files are materialized away, and
      // that a second scoped pass with a tiny small-file threshold is a
      // no-op (the fresh F file is no longer "small"). At 100 TB this is
      // the difference between rewriting one hot day-partition and a
      // full-table rewrite.
      val wh = LakeQueries.freshWarehouse("scoped")
      Engine.processTableDefJson(wh,
        """{"database_name":"sc","table_name":"orders_sc","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "sc", "orders_sc")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0,
        prune = Map("status" -> Set("F")))
      val t1 = LakeTable.load(wh, "sc", "orders_sc")
      val before = t1.plannedFiles()
        .map(f => (f.path, f.seq, f.partitionValues("status")))
      s.conf.set("spark.sql.catalog.gsc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsc.warehouse", wh)
      val proc = s.sql(
        """CALL gsc.system.rewrite_data_files(db => 'sc',
          |`table` => 'orders_sc', where_field => 'status',
          |where_values => 'F', smaller_than_bytes => 0)""".stripMargin).head()
      val t2 = LakeTable.load(wh, "sc", "orders_sc")
      val after = t2.plannedFiles()
        .map(f => (f.path, f.seq, f.partitionValues("status")))
      require(before.filterNot(_._3 == "F").toSet ==
        after.filterNot(_._3 == "F").toSet,
        "untouched partitions must keep exact file paths and seqs")
      require(after.filter(_._3 == "F").map(_._1).toSet
        .intersect(before.filter(_._3 == "F").map(_._1).toSet).isEmpty,
        "every in-scope file must be rewritten")
      require(proc.getAs[Int]("carried_files") ==
        before.count(_._3 != "F"), "carried count must match")
      require(graft.lake.LakeTable.liveDeletes(t2.metadata.snapshots).isEmpty,
        "scoped compaction must materialize the partition's deletes")
      require(t2.compactScoped(s, Map("status" -> Set("F")),
        smallerThanBytes = 1L).isEmpty,
        "re-running with a tiny threshold must be a no-op")
      t2.read(s).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_upsert_eq" -> QueryModule.micro(4)((s, dir) => {
      // blind streaming upserts via equality deletes (Iceberg v2 CDC
      // sink shape): each upsert writes only its key batch + rows —
      // zero reads of the table — and sequence numbers make the later
      // batch win on overlap. Compaction then materializes the deletes
      // (so the SQL catalog read serves the final state) — the full
      // upsert → compact → serve lifecycle under one oracle.
      val wh = scratch("upserteq")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_eq","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_eq")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.append(orders.filter(col("o_orderkey") < 2000))
      t.upsertMoR(s,
        orders.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 3000)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        keys = Seq("o_orderkey"))
      LakeTable.load(wh, "rowops", "orders_eq").upsertMoR(s,
        orders.filter(col("o_orderkey") >= 2500 && col("o_orderkey") < 3500)
          .withColumn("o_totalprice", col("o_totalprice") * 3),
        keys = Seq("o_orderkey"))
      s.conf.set("spark.sql.catalog.greq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.greq.warehouse", wh)
      s.sql("CALL greq.system.compact(db => 'rowops', `table` => 'orders_eq')")
      s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice
              |FROM greq.rowops.orders_eq ORDER BY o_orderkey""".stripMargin)
    }),

    "lake_default_cols" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3 INITIAL DEFAULTS under the oracle: rows written
      // before `ALTER TABLE ... ADD COLUMN tier STRING DEFAULT
      // 'standard'` read the default; rows written after keep their
      // explicit values INCLUDING explicit NULLs. The fill is
      // metadata-driven at read time — zero data rewrites at any
      // table size — and this key serves it through the DSv2 Group
      // reader under the DuckDB oracle.
      val wh = LakeQueries.freshWarehouse("defaults")
      s.conf.set("spark.sql.catalog.gdc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gdc.warehouse", wh)
      Engine.processTableDefJson(wh,
        """{"database_name":"dq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_name")
      LakeTable.load(wh, "dq", "cust")
        .append(cust.filter(col("c_custkey") % 2 === 0))
      s.sql("ALTER TABLE gdc.dq.cust ADD COLUMN tier STRING " +
        "DEFAULT 'standard'")
      LakeTable.load(wh, "dq", "cust").append(
        cust.filter(col("c_custkey") % 2 === 1).withColumn("tier",
          when(col("c_custkey") % 10 === 1, lit("gold"))))
      s.sql("""SELECT c_custkey, c_name, tier
              |FROM gdc.dq.cust ORDER BY c_custkey""".stripMargin)
    }),

    "lake_eq_nested" -> QueryModule.micro(4)((s, dir) => {
      // equality-delete keys resolving through STRUCT nesting by field
      // id (Iceberg v2 keys on any nested scalar): purge one segment
      // via `meta.segment` — one key tuple deletes every matching row,
      // zero reads, zero rewrites — then a blind upsert RE-KEYED on
      // the same nested field replaces a second segment with patch
      // rows. Served through the SQL catalog WITHOUT compaction, so
      // the DSv2 reader applies the nested-key DeleteFilter
      // executor-side (chain resolved by field id per file schema).
      import s.implicits._
      val wh = LakeQueries.freshWarehouse("eqnested")
      Engine.processTableDefJson(wh,
        """{"database_name":"en","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"meta","data_type":"struct","struct_def":[
          |  {"column_name":"segment","data_type":"string"},
          |  {"column_name":"name","data_type":"string"}]}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "en", "cust")
      t.append(Tables(s, dir, "customer").select(col("c_custkey"),
        struct(col("c_mktsegment").as("segment"),
          col("c_name").as("name")).as("meta")))
      t.deleteByKeysMoR(s, Seq("BUILDING").toDF("meta.segment"))
      LakeTable.load(wh, "en", "cust").upsertMoR(s,
        Seq((-1L, "MACHINERY", "patch_1"), (-2L, "MACHINERY", "patch_2"))
          .toDF("c_custkey", "segment", "name")
          .select(col("c_custkey"),
            struct(col("segment"), col("name")).as("meta")),
        keys = Seq("meta.segment"))
      s.conf.set("spark.sql.catalog.gren", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gren.warehouse", wh)
      s.sql("""SELECT c_custkey, meta.segment AS segment,
              |  meta.name AS name
              |FROM gren.en.cust ORDER BY c_custkey""".stripMargin)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "lake_delete" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_delete_mor" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_delete_vectors" ->
      """SELECT o_orderstatus,
        | CASE WHEN o_totalprice < 10000.0 THEN '0-VECTORED'
        |      ELSE o_orderpriority END AS o_orderpriority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |  AND NOT (o_totalprice > 300000.0)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "lake_analyze" ->
      """SELECT column_name, ndv, null_count FROM (
        |  SELECT 'c_custkey' AS column_name,
        |    count(DISTINCT c_custkey) AS ndv,
        |    count(*) - count(c_custkey) AS null_count FROM customer
        |  UNION ALL
        |  SELECT 'c_name', count(DISTINCT c_name),
        |    count(*) - count(c_name) FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(DISTINCT c_mktsegment),
        |    count(*) - count(c_mktsegment) FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', count(DISTINCT c_nationkey),
        |    count(*) - count(c_nationkey) FROM customer
        |) ORDER BY column_name""".stripMargin,

    "lake_row_lineage" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // MoR produces the same visible table state as CoW — identical oracles
    "lake_update_mor" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "lake_merge_mor" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM (
        |  SELECT c.c_custkey,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_name ELSE c.c_name END AS c_name,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN 'SUPPLIER' ELSE c.c_mktsegment END AS c_mktsegment
        |  FROM customer c LEFT JOIN supplier s ON c.c_custkey = s.s_suppkey
        |  UNION ALL
        |  SELECT s_suppkey, s_name, 'SUPPLIER' FROM supplier
        |  WHERE s_suppkey NOT IN (SELECT c_custkey FROM customer)
        |) ORDER BY c_custkey""".stripMargin,

    "lake_truncate_part" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderkey >= 10000 AND o_orderkey < 30000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_update" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "lake_merge" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM (
        |  SELECT c.c_custkey,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_name ELSE c.c_name END AS c_name,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN 'SUPPLIER' ELSE c.c_mktsegment END AS c_mktsegment
        |  FROM customer c LEFT JOIN supplier s ON c.c_custkey = s.s_suppkey
        |  UNION ALL
        |  SELECT s_suppkey, s_name, 'SUPPLIER' FROM supplier
        |  WHERE s_suppkey NOT IN (SELECT c_custkey FROM customer)
        |) ORDER BY c_custkey""".stripMargin,

    "lake_branch_ff" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "lake_branch_mor" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 7 THEN 'PATCHED'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    "lake_changelog_cow" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_cow' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation WHERE n_nationkey % 7 <> 0
        |ORDER BY n_nationkey""".stripMargin,

    "lake_changelog_replace" ->
      """SELECT * FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_regionkey = 0 THEN n_name || '_r' ELSE n_name END
        |      AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE n_nationkey % 5 <> 0 AND n_regionkey <> 2
        |  UNION ALL
        |  SELECT n_nationkey + 200, n_name || '_post', n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |) ORDER BY n_nationkey""".stripMargin,

    "lake_branch_cow" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 7 THEN 'PATCHED'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    "lake_incr_rollup" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_custkey % 4 = 0
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_null_skip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "lake_bloom_skip" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey = 101 OR c_name = 'Customer#000000042'
        |ORDER BY c_custkey""".stripMargin,

    "lake_mat_view_incr" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_merge_nmbs" ->
      """SELECT * FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 10 OR n_regionkey <> 0
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name || '_new', n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |) ORDER BY n_nationkey""".stripMargin,

    "lake_ctas" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,

    "lake_bloom_backfill" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey IN (101, 102, 407)
        |ORDER BY c_custkey""".stripMargin,

    "lake_mat_view_avg" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price,
        |  ROUND(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
        |    6) AS avg6
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_expr" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_mat_view_having" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 2
        |ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_filter" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) > 1000.0
        |  AND o_custkey % 100 <> 7
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_retract" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey % 6 = 0 AND o_custkey % 4 IN (0, 1)
        |  AND o_custkey % 10 <> 2 AND o_custkey % 10 <> 5
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_observe" ->
      """SELECT * FROM (VALUES
        |  ('incremental', 'append', CAST(1 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(5 AS BIGINT), 'ok'),
        |  ('full', 'recompute-all', CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(5 AS BIGINT), 'ok'),
        |  ('incremental', 'no-op', CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'ok'),
        |  ('incremental', '', CAST(-1 AS BIGINT),
        |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'refused'))
        |  AS t(mode, strategy, from_snapshot, to_snapshot, groups,
        |       outcome)
        |ORDER BY mode, strategy""".stripMargin,

    "lake_mat_view_rewrite" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_custkey % 9 IN (0, 1)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_rewrite_rollup" ->
      """SELECT o_orderpriority AS o_prio, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey % 5 = 0 AND o_custkey % 10 = 0
        |GROUP BY o_orderpriority
        |ORDER BY o_prio""".stripMargin,

    "lake_mat_view_join" ->
      """SELECT c_mktsegment AS c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 6 = 0
        |  AND o_custkey % 4 IN (0, 1) AND o_custkey % 10 <> 4
        |GROUP BY c_mktsegment ORDER BY c_seg""".stripMargin,

    "lake_txn_observe" ->
      """SELECT * FROM (VALUES
        |  ('abort', 'to.a,to.b'),
        |  ('commit', 'to.a,to.b'),
        |  ('commit', 'to.a,to.b'))
        |  AS t(state, participants)
        |ORDER BY state, participants""".stripMargin,

    "lake_auto_evolve" ->
      """SELECT CASE WHEN o_orderkey % 3 = 1 THEN o_orderpriority
        |  ELSE '<none>' END AS o_prio,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY 1 ORDER BY o_prio""".stripMargin,

    "lake_constraints" ->
      """SELECT o_orderpriority AS o_prio,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice +
        |    CASE WHEN o_orderkey % 100 = 0 THEN 10.0 ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 4 = 0
        |GROUP BY o_orderpriority ORDER BY o_prio""".stripMargin,

    "lake_txn_sql" ->
      """WITH src AS (
        |  SELECT o_custkey, o_totalprice AS o_price
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |merged AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_custkey % 7 = 0 THEN o_price + 100000.0
        |         ELSE o_price END AS o_price
        |  FROM src
        |  WHERE o_custkey % 7 = 0 OR o_custkey % 10 <> 3)
        |SELECT o_custkey % 10 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_price AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM merged
        |GROUP BY o_custkey % 10 ORDER BY bucket""".stripMargin,

    "lake_mat_view_dimupsert" ->
      """SELECT c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN (
        |  SELECT c_custkey AS c_id,
        |    CASE WHEN c_custkey % 10 = 2 THEN 'MOVED'
        |         ELSE c_mktsegment END AS c_seg
        |  FROM customer) ON o_custkey = c_id
        |WHERE o_orderkey % 12 IN (0, 3) AND o_custkey % 4 = 0
        |GROUP BY c_seg ORDER BY c_seg""".stripMargin,

    "lake_mat_view_dimdelta" ->
      """SELECT c_mktsegment AS c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 12 IN (0, 3)
        |  AND o_custkey % 4 IN (0, 1)
        |GROUP BY c_mktsegment ORDER BY c_seg""".stripMargin,

    "lake_mat_view_minmax" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 6 = 0 AND o_custkey % 8 IN (0, 1)),
        |live AS (
        |  SELECT o_custkey, o_totalprice FROM base
        |  WHERE o_orderkey % 7 <> 3
        |    AND NOT (o_custkey % 8 = 0 AND o_orderkey % 11 = 4)
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice + 1000.0 FROM base
        |  WHERE o_custkey % 8 = 0 AND o_orderkey % 11 = 4)
        |SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM live GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_distinct" ->
      """SELECT o_custkey,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
        |  CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DOUBLE) AS sum_dprice,
        |  ROUND(CAST(AVG(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DOUBLE), 6) AS avg_dprice6,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 = 0 AND o_custkey % 32 IN (0, 1)
        |  AND o_orderkey % 7 <> 3
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_views" ->
      """SELECT n_nationkey, n_name || '/' || n_regionkey AS tagged
        |FROM nation WHERE n_regionkey IN (1, 3)
        |ORDER BY n_nationkey""".stripMargin,

    "lake_txn_multi" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 3 THEN n_name || '_TX' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation WHERE n_regionkey <> 0
        |ORDER BY n_nationkey""".stripMargin,

    "lake_txn_cross" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey <= 30000 AND o_orderkey % 3 < 2
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "lake_cdc_apply" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 10 THEN n_name || '_v2' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // same mixed history as lake_changelog, replayed through the
    // changelog-mode STREAM into the mirror
    "stream_lake_changelog" ->
      """WITH finalstate AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE (n_nationkey < 10 OR n_regionkey <> 4)
        |    AND n_nationkey NOT IN (3, 7, 22)
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), 'new_' || n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |)
        |SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM finalstate ORDER BY n_nationkey""".stripMargin,

    // history: append all; positional-delete region 4; blind upsert
    // keys<10 as _v2 (re-inserting even region-4 ones); keyed-delete
    // 3/7/22; append keys<5 shifted +100 — replayed via the changelog
    "lake_changelog" ->
      """WITH finalstate AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE (n_nationkey < 10 OR n_regionkey <> 4)
        |    AND n_nationkey NOT IN (3, 7, 22)
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), 'new_' || n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |)
        |SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM finalstate ORDER BY n_nationkey""".stripMargin,

    // history: append all (ord 0); positional-delete region 4 (ord 1);
    // key-less blind upsert keys<10 as _v2 (ord 2 — one delete marker +
    // one insert per key, paired into update_before/update_after);
    // keyed-delete 3/7/22 (ord 3); append keys<5 shifted +100 (ord 4)
    "lake_changelog_updates" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, change_type,
        |  CAST(ord AS INTEGER) AS ord FROM (
        |  SELECT n_nationkey, 'insert' AS change_type, 0 AS ord FROM nation
        |  UNION ALL SELECT n_nationkey, 'delete', 1 FROM nation
        |    WHERE n_regionkey = 4
        |  UNION ALL SELECT n_nationkey, 'update_before', 2 FROM nation
        |    WHERE n_nationkey < 10
        |  UNION ALL SELECT n_nationkey, 'update_after', 2 FROM nation
        |    WHERE n_nationkey < 10
        |  UNION ALL SELECT n_nationkey, 'delete', 3 FROM nation
        |    WHERE n_nationkey IN (3, 7, 22)
        |  UNION ALL SELECT n_nationkey + 100, 'insert', 4 FROM nation
        |    WHERE n_nationkey < 5
        |) ORDER BY ord, change_type, n_nationkey""".stripMargin,

    "lake_compact_zorder" ->
      """WITH base AS (SELECT * FROM orders WHERE o_custkey % 2 = 0)
        |SELECT 1 AS grp, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM base
        |WHERE o_orderkey <= (SELECT max(o_orderkey) // 5 FROM base)
        |  AND o_custkey <= (SELECT max(o_custkey) // 5 FROM base)
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    // clone of (append nation; MoR-delete region 4), then a clone-local
    // blind upsert of keys<5 as dev_ (re-adding even region-4 ones)
    "lake_snapshot_clone" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN 'dev_' || n_name
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM nation WHERE n_nationkey < 5 OR n_regionkey <> 4
        |ORDER BY n_nationkey""".stripMargin,

    // referenced orders.parquet + appended keys<10 shifted +10M, then
    // keyed MoR delete of keys<100 (shifted rows unaffected)
    "lake_add_files" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey < 10
        |)
        |SELECT CAST(o_orderkey % 3 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM src WHERE o_orderkey >= 100
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "lake_compact_scoped" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_upsert_eq" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= 2500 THEN o_totalprice * 3
        |       WHEN o_orderkey >= 1000 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey < 3500
        |ORDER BY o_orderkey""".stripMargin,

    "lake_default_cols" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'standard'
        |       WHEN c_custkey % 10 = 1 THEN 'gold'
        |       ELSE NULL END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "lake_eq_nested" ->
      """SELECT c_custkey, segment, name FROM (
        |  SELECT c_custkey, c_mktsegment AS segment, c_name AS name
        |  FROM customer WHERE c_mktsegment NOT IN ('BUILDING','MACHINERY')
        |  UNION ALL
        |  SELECT * FROM (VALUES (CAST(-1 AS BIGINT), 'MACHINERY', 'patch_1'),
        |                        (CAST(-2 AS BIGINT), 'MACHINERY', 'patch_2'))
        |    v(c_custkey, segment, name)
        |) ORDER BY c_custkey""".stripMargin,
  )
}
