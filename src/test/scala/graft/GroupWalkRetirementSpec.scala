package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}
import graft.sources.BatchRowLakeReader

/** r15 retires the last two COMMON GroupRowReader triggers: STRUCT-
  * NESTED equality-delete keys (probe chains read through struct
  * children of the decoded row) and absent-with-DEFAULT columns
  * (served as per-reader constants — ConstantColumnVector on the
  * columnar path, plan consts on the row path). Each scenario pins
  * BOTH exactness (identical rows on the forced Group walk) and
  * engagement (the `groupWalks` counter does not move), so a future
  * gate regression that silently demotes these scans fails the spec
  * rather than just running slower. Remaining legitimate fallbacks:
  * exotic external encodings and unmappable schema pairs.
  */
class GroupWalkRetirementSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def noGroupWalks[A](body: => A): A = {
    val before = BatchRowLakeReader.groupWalks.get
    val out = body
    assert(BatchRowLakeReader.groupWalks.get == before,
      "scan must not fall back to the Group walk")
    out
  }

  test("nested equality-delete keys decode vectorized (columnar MoR), " +
      "exact vs the forced Group walk") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-nested").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"seg","data_type":"string"},
        |  {"column_name":"name","data_type":"string"}]}],
        |"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    t.append((0 until 300).map(i =>
      (i.toLong, s"seg${i % 7}", s"n$i")).toDF("k", "seg", "name")
      .select(col("k"),
        struct(col("seg"), col("name")).as("meta")))
    LakeTable.load(wh, "d", "t").deleteByKeysMoR(spark,
      Seq("seg3", "seg5").toDF("meta.seg"))
    def read() = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    // full projection (nested key read through the projected struct)
    val full = noGroupWalks(rows(read()))
    // pruned projection (the carrier struct drops out of the target:
    // the reader re-requests a minimal single-chain struct)
    val pruned = noGroupWalks(rows(read().select("k")))
    System.setProperty("graft.read.novector", "1")
    try {
      assert(full == rows(read()), "full projection vs Group walk")
      assert(pruned == rows(read().select("k")),
        "pruned projection vs Group walk")
    } finally System.clearProperty("graft.read.novector")
    assert(full.size == 300 - (0 until 300).count(i =>
      i % 7 == 3 || i % 7 == 5))
  }

  test("absent-with-DEFAULT columns decode vectorized as constants " +
      "(clean AND delete-bearing files), exact vs the Group walk") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-def").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"}],"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append((0 until 100).map(_.toLong).toDF("k"))
    spark.conf.set("spark.sql.catalog.ggwr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.ggwr.warehouse", wh)
    spark.sql("ALTER TABLE ggwr.d.t ADD COLUMN note STRING DEFAULT 'n/a'")
    spark.sql("ALTER TABLE ggwr.d.t ADD COLUMN score DOUBLE DEFAULT 2.5")
    // a second file WITH the columns, so both fill paths mix in one scan
    LakeTable.load(wh, "d", "t").append(
      Seq((1000L, "real", 9.9)).toDF("k", "note", "score"))
    // and MoR deletes so the DEFAULT + delete combination exercises
    // the columnar MoR reader's constant vectors
    LakeTable.load(wh, "d", "t").deleteMoR(spark, col("k") % 10L === 7L)
    def read() = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    val got = noGroupWalks(rows(read()))
    System.setProperty("graft.read.novector", "1")
    try assert(got == rows(read()), "constants vs Group walk")
    finally System.clearProperty("graft.read.novector")
    val notes = noGroupWalks(read().select("note").distinct()
      .collect().map(_.getString(0)).toSet)
    assert(notes == Set("n/a", "real"), s"default must fill: $notes")
  }

  test("TWO eq-delete batches keyed on the same PRUNED column share " +
      "one re-requested column (review-found r15 regression: the " +
      "second batch re-appended it, tripping the names-distinct " +
      "check and demoting the scan)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-twobatch").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"v","data_type":"long"}],"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append(
      (0 until 200).map(i => (i.toLong, i * 10L)).toDF("k", "v"))
    // two separate eq-delete commits => two batches, both keyed on k
    LakeTable.load(wh, "d", "t").deleteByKeysMoR(spark,
      Seq(5L, 50L).toDF("k"))
    LakeTable.load(wh, "d", "t").deleteByKeysMoR(spark,
      Seq(6L, 60L).toDF("k"))
    def read() = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    // projection PRUNES k: both batches must resolve through the ONE
    // appended request column
    val got = noGroupWalks(read().select("v")
      .collect().map(_.getLong(0)).sorted.toSeq)
    val expect = (0 until 200).filterNot(i =>
      Set(5, 50, 6, 60)(i)).map(_ * 10L)
    assert(got == expect)
  }

  test("a ZERO-column projection over a clean file stays columnar and " +
      "never leaks the row-count-driving row-index column") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-zero").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"}],"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append((0 until 123).map(_.toLong).toDF("k"))
    val lit1 = noGroupWalks(spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
      .select(org.apache.spark.sql.functions.lit(1).as("one"))
      .collect())
    assert(lit1.length == 123 && lit1.forall(r =>
      r.length == 1 && r.getInt(0) == 1),
      "zero-column scan must emit exactly the literal — a leaked " +
        "row-index column would widen the batch past the scan schema")
  }

  test("equality-delete key on a column ABSENT from an old file " +
      "probes the constant (default), exact vs the Group walk") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-absent").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"}],"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append(Seq(1L, 2L, 3L).toDF("k"))
    spark.conf.set("spark.sql.catalog.ggwa", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.ggwa.warehouse", wh)
    spark.sql("ALTER TABLE ggwa.d.t ADD COLUMN tag STRING DEFAULT 'old'")
    LakeTable.load(wh, "d", "t").append(
      Seq((10L, "new"), (11L, "old")).toDF("k", "tag"))
    // delete by tag='old': the pre-evolution file's rows carry the
    // DEFAULT 'old' (Group-walk semantics) — all three must vanish,
    // plus the new file's k=11
    LakeTable.load(wh, "d", "t").deleteByKeysMoR(spark,
      Seq("old").toDF("tag"))
    def read() = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    val got = noGroupWalks(rows(read()))
    System.setProperty("graft.read.novector", "1")
    try assert(got == rows(read()),
      "absent-key constant probe vs Group walk")
    finally System.clearProperty("graft.read.novector")
    assert(got.size == 1 && got.head.contains("10"),
      s"only the non-matching new row survives: $got")
  }

  test("NESTED absent-with-DEFAULT fields decode vectorized via " +
      "constant injection (clean, MoR, and row-emitting paths), " +
      "exact vs the Group walk (r16)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-nestdef").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"seg","data_type":"string"}]}],
        |"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append((0 until 200).map(i =>
      (i.toLong, s"seg${i % 5}")).toDF("k", "seg")
      .select(col("k"), struct(col("seg")).as("meta")))
    // TWO injected children on one struct spine, added via table-def
    // evolution with initial_default (r16 contract extension — the
    // SQL surface deliberately routes nested adds here): the old
    // file's rows must read them as per-row constants wherever meta
    // is non-null
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"seg","data_type":"string"},
        |  {"column_name":"note","data_type":"string",
        |   "initial_default":"n/a"},
        |  {"column_name":"score","data_type":"double",
        |   "initial_default":"2.5"}]}],
        |"partitions":[]}""".stripMargin)
    // a post-evolution file carrying REAL values, so one scan mixes
    // injected and decoded children
    LakeTable.load(wh, "d", "t").append(
      Seq((1000L, "segX", "real", 9.9)).toDF("k", "seg", "note", "score")
        .select(col("k"), struct(col("seg"), col("note"),
          col("score")).as("meta")))
    // MoR deletes drive the columnar-MoR path (selection map OVER the
    // injected children)
    LakeTable.load(wh, "d", "t").deleteMoR(spark, col("k") % 10L === 7L)
    def read() = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    val got = noGroupWalks(rows(read()))
    // row-EMITTING path: a position-meta projection demotes the scan
    // to row mode, exercising the injectStruct rebuild
    val gotRows = noGroupWalks(rows(read()
      .select(col("k"), col("meta"), col("_graft_pos"))))
    System.setProperty("graft.read.novector", "1")
    try {
      assert(got == rows(read()), "injected constants vs Group walk")
      assert(gotRows == rows(read()
        .select(col("k"), col("meta"), col("_graft_pos"))),
        "row-emitting injection vs Group walk")
    } finally System.clearProperty("graft.read.novector")
    val notes = noGroupWalks(read().select("meta.note").distinct()
      .collect().map(_.getString(0)).toSet)
    assert(notes == Set("n/a", "real"), s"nested default must fill: $notes")
    val scores = noGroupWalks(read()
      .agg(sum("meta.score")).collect()(0).getDouble(0))
    val expect = (0 until 200).filterNot(_ % 10 == 7).size * 2.5 + 9.9
    assert(math.abs(scores - expect) < 1e-9, s"$scores != $expect")
  }

  test("an equality-delete KEYED on an injected nested default keeps " +
      "the Group walk (the decoded cell is null-filled, not the " +
      "default) — guarded demotion, exact results") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-gwr-nestdefeq").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"seg","data_type":"string"}]}],
        |"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append((0 until 50).map(i =>
      (i.toLong, s"seg${i % 5}")).toDF("k", "seg")
      .select(col("k"), struct(col("seg")).as("meta")))
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"k","data_type":"long"},
        |{"column_name":"meta","data_type":"struct","struct_def":[
        |  {"column_name":"seg","data_type":"string"},
        |  {"column_name":"tag","data_type":"string",
        |   "initial_default":"old"}]}],
        |"partitions":[]}""".stripMargin)
    LakeTable.load(wh, "d", "t").append(
      Seq((100L, "segX", "new")).toDF("k", "seg", "tag")
        .select(col("k"), struct(col("seg"), col("tag")).as("meta")))
    // eq-delete keyed on the INJECTED child: pre-evolution rows carry
    // the default 'old' semantically — every one must vanish
    LakeTable.load(wh, "d", "t").deleteByKeysMoR(spark,
      Seq("old").toDF("meta.tag"))
    val before = BatchRowLakeReader.groupWalks.get
    val got = rows(spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load())
    assert(BatchRowLakeReader.groupWalks.get > before,
      "the injected-key scan must take the guarded Group-walk demotion")
    assert(got.size == 1 && got.head.contains("100"),
      s"only the 'new' row survives: $got")
  }
}
