package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Parquet row-group / record-level predicate pushdown inside the
  * graft-lake reader ([[graft.sources.LakeSource.parquetPredicate]]):
  * filtered scans over MULTI-row-group files must return exactly what
  * the unfiltered scan filters to — with the predicate applied (clean
  * files) AND with it gated off (positional reads: MoR deletes,
  * `_metadata.row_index` consumers), where a desynchronized row
  * counter would corrupt delete application.
  */
class ScanPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-pushdown-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"s","data_type":"string"},
        |{"column_name":"v","data_type":"long"}],
        |"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    // tiny parquet blocks => many row groups per file, so predicate
    // skipping actually has groups to skip
    t.updateProperties(Map(
      "write.option.parquet.block.size" -> "4096",
      "write.option.parquet.page.size" -> "1024"))
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private def seed(t: LakeTable, n: Int = 20000): Unit = {
    import SparkTestSession.spark.implicits._
    // sorted by k => row groups carry tight disjoint k-ranges
    t.append((0 until n).map(i =>
      (i.toLong, f"s$i%06d", (i * 7).toLong)).toDF("k", "s", "v")
      .repartition(1).sortWithinPartitions("k"))
  }

  test("range, point, and string filters return EXACT results over " +
      "multi-row-group files") {
    val (wh, t0) = mk("basic")
    seed(t0)
    val t = LakeTable.load(wh, "d", "t")
    assert(t.plannedFiles().size == 1, "one multi-group file")
    spark.conf.set("spark.sql.catalog.gpd", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpd.warehouse", wh)
    def q(where: String): Seq[(Long, String, Long)] =
      spark.sql(s"SELECT k, s, v FROM gpd.d.t WHERE $where ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq
    assert(q("k BETWEEN 5000 AND 5004") ==
      (5000L to 5004L).map(i => (i, f"s$i%06d", i * 7)))
    assert(q("k = 19999") == Seq((19999L, "s019999", 19999L * 7)))
    assert(q("k > 19999") == Seq.empty)
    assert(q("s = 's000123'") == Seq((123L, "s000123", 123L * 7)))
    assert(q("s >= 's019990' AND s < 's019995'") ==
      (19990L to 19994L).map(i => (i, f"s$i%06d", i * 7)))
    // negative bounds / cross-type: filter on v with a range
    assert(q("v >= 139972 AND v <= 139993").map(_._1) ==
      Seq(19996L, 19997L, 19998L, 19999L))
    // IN-sets translate to parquet in() (dictionary-capable skipping)
    assert(q("k IN (17, 9001, 19998)").map(_._1) ==
      Seq(17L, 9001L, 19998L))
    assert(q("s IN ('s000042', 's010000', 'zzz')").map(_._1) ==
      Seq(42L, 10000L))
  }

  test("the predicate actually ENGAGES: a selective filter reads far " +
      "fewer source records than the table holds") {
    val (wh, t0) = mk("engage")
    seed(t0)
    spark.conf.set("spark.sql.catalog.gpde", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpde.warehouse", wh)
    val records = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val got = spark.sql(
        "SELECT k FROM gpde.d.t WHERE k BETWEEN 10000 AND 10009")
        .collect()
      var prev = -1L
      var cur = records.get
      while (prev != cur) { Thread.sleep(100); prev = cur; cur = records.get }
      assert(got.length == 10)
      // 20k rows in the file; without in-reader skipping every row is
      // read and recordsRead ~ 20k. With row-group + record filtering
      // a 10-row slice reads at most a couple of row groups.
      assert(cur > 0 && cur < 5000,
        s"the pushed predicate must skip records at the source, " +
          s"read $cur of 20000")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("a 1,000-key IN probe skips row groups via column bloom " +
      "filters — the min/max envelope alone is vacuous for scattered keys") {
    val (wh, t0) = mk("inset")
    import SparkTestSession.spark.implicits._
    // EVEN keys only, sorted: a scattered probe's [min,max] envelope
    // covers essentially the whole file, so only per-row-group value
    // checks (parquet's in() against chunk bloom filters /
    // dictionaries) can skip. Through r13 the reader dropped IN-sets
    // past 100 values to the envelope — a 1,000-key broadcast-join
    // probe list read every record. High-cardinality keys write PLAIN
    // (no dictionary), so the table opts its join key into parquet
    // bloom filters — the 100-TB recipe for probe-joined fact tables.
    t0.updateProperties(Map(
      "write.option.parquet.bloom.filter.enabled#k" -> "true"))
    LakeTable.load(wh, "d", "t").append((0 until 20000).map(i =>
      ((2 * i).toLong, f"s$i%06d", (i * 7).toLong)).toDF("k", "s", "v")
      .repartition(1).sortWithinPartitions("k"))
    spark.conf.set("spark.sql.catalog.gpd4", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpd4.warehouse", wh)
    val present = Seq(40L, 8000L, 16000L, 24000L, 39998L)
    // 995 ODD (absent) keys spread over the whole key range
    val absent = (0 until 995).map(i => (i * 40 + 1).toLong)
    val inList = (present ++ absent).mkString(", ")
    val records = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val got = spark.sql(
        s"SELECT k FROM gpd4.d.t WHERE k IN ($inList) ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      var prev = -1L
      var cur = records.get
      while (prev != cur) { Thread.sleep(100); prev = cur; cur = records.get }
      assert(got == present, s"exactness first: $got")
      assert(cur > 0 && cur < 10000,
        s"a scattered 1,000-key IN probe must skip row groups whose " +
          s"dictionaries lack every key: read $cur of 20000")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("positional reads gate the predicate OFF: MoR deletes and " +
      "row_index consumers stay exact under filters") {
    import SparkTestSession.spark.implicits._
    val (wh, t0) = mk("gated")
    seed(t0, 10000)
    // MoR position deletes in the middle of the k-range the filter hits
    LakeTable.load(wh, "d", "t").deleteMoR(spark,
      col("k") >= 5000L && col("k") < 5003L)
    spark.conf.set("spark.sql.catalog.gpd2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpd2.warehouse", wh)
    val got = spark.sql(
      "SELECT k FROM gpd2.d.t WHERE k BETWEEN 4998 AND 5005 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4998L, 4999L, 5003L, 5004L, 5005L),
      s"deletes must apply exactly under a pushed filter: $got")
    // row_index consumers (row-level op scans) also stay exact
    val withPos = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
      .filter(col("k") === 7777L)
      .select(col("k"), col("_graft_pos"))
      .collect()
    assert(withPos.length == 1 && withPos.head.getLong(0) == 7777L &&
      withPos.head.getLong(1) == 7777L,
      "row positions must be physical-file positions, never " +
        "filter-shifted")
  }

  test("row-level operations never record-filter: a selective CoW " +
      "UPDATE over a multi-row-group file carries every non-matching " +
      "row through the rewrite") {
    val (wh, t0) = mk("rowlevel")
    seed(t0, 8000)
    spark.conf.set("spark.sql.catalog.gpd3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gpd3.warehouse", wh)
    // the UPDATE's WHERE selects a sliver of the one file — with
    // record filtering wrongly active on its scan, the rewrite would
    // silently DROP the other 7990 rows (the lake_sql_dml regression)
    spark.sql("UPDATE gpd3.d.t SET s = 'HIT' WHERE k >= 4000 AND k < 4010")
    val t = LakeTable.load(wh, "d", "t")
    assert(t.read(spark).count() == 8000L,
      "the rewrite must carry every non-matching row")
    val hit = spark.sql(
      "SELECT k FROM gpd3.d.t WHERE s = 'HIT' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(hit == (4000L until 4010L).toSeq, s"got $hit")
    // same for a selective three-clause MERGE
    import SparkTestSession.spark.implicits._
    Seq((4500L, "M"), (90000L, "NEW")).toDF("mk", "mv")
      .createOrReplaceTempView("pushdown_merge_src")
    spark.sql(
      """MERGE INTO gpd3.d.t t USING pushdown_merge_src s
        |ON t.k = s.mk
        |WHEN MATCHED THEN UPDATE SET s = s.mv
        |WHEN NOT MATCHED THEN INSERT (k, s, v) VALUES (s.mk, s.mv, 0L)
        |""".stripMargin)
    assert(LakeTable.load(wh, "d", "t").read(spark).count() == 8001L,
      "the merge rewrite must carry every non-matching row")
    assert(spark.sql("SELECT s FROM gpd3.d.t WHERE k = 4500")
      .collect().head.getString(0) == "M")
  }
}
