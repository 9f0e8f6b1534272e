package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** SQL access to lake tables through the catalog plugin: identifier
  * resolution, nested projections, joins against regular DataFrames,
  * listTables, and the read-only DDL contract.
  */
class LakeCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("SELECT over a nested lake table via graft.<db>.<table>") {
    val wh = Files.createTempDirectory("graft-catalog").toString
    Engine.processTableDefJson(wh, graft.gen.OrdersFixtures.ordersV1Json)
    val t = LakeTable.load(wh, "customer_order", "orders")
    t.append(graft.gen.DataGen.toDf(spark,
      graft.gen.DataGen.ordersV1(12, seed = 3L), t.currentSchema))

    spark.conf.set("spark.sql.catalog.graft", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

    val rows = spark.sql(
      """SELECT customer_name, address.city AS city, size(order_items) AS n
        |FROM graft.customer_order.orders
        |ORDER BY customer_name, n""".stripMargin).collect()
    assert(rows.length == 12)
    assert(rows.forall(r => r.getString(0).startsWith("Customer_")))

    // joinable with ordinary DataFrames/SQL
    val n = spark.sql(
      """SELECT count(*) FROM graft.customer_order.orders o
        |JOIN (SELECT explode(sequence(1, 100)) AS x) s
        |  ON size(o.order_items) = s.x""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == 12) // every order's item count is in [1, 100]

    // listTables sees it
    assert(spark.sql("SHOW TABLES IN graft.customer_order").collect()
      .map(_.getString(1)).toSet == Set("orders"))

    // RENAME stays unsupported
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.customer_order.orders RENAME TO orders2")
    }
    assert(e.getMessage.contains("RENAME not supported"))
  }

  test("SQL lifecycle: CREATE, INSERT, ALTER add/drop/retype, DROP") {
    val wh = Files.createTempDirectory("graft-catalog-ddl").toString
    spark.conf.set("spark.sql.catalog.graftd", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftd.warehouse", wh)

    spark.sql(
      """CREATE TABLE graftd.d.evt (
        |  id BIGINT, kind STRING, at TIMESTAMP_NTZ, score INT)
        |PARTITIONED BY (kind, days(at))""".stripMargin)
    val t = LakeTable.load(wh, "d", "evt")
    assert(t.currentSchema.fieldNames.toSeq ==
      Seq("id", "kind", "at", "score"))
    assert(t.metadata.currentSpec.fields.map(_.transform) ==
      Seq("identity", "day"))

    spark.sql(
      """INSERT INTO graftd.d.evt VALUES
        |  (1, 'a', TIMESTAMP_NTZ'2024-01-01 10:00:00', 5),
        |  (2, 'b', TIMESTAMP_NTZ'2024-01-02 11:00:00', 6)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graftd.d.evt")
      .collect()(0).getLong(0) == 2)

    // evolve through SQL: add, retype int->long, drop
    spark.sql("ALTER TABLE graftd.d.evt ADD COLUMN note STRING")
    spark.sql("ALTER TABLE graftd.d.evt ALTER COLUMN score TYPE BIGINT")
    spark.sql("ALTER TABLE graftd.d.evt DROP COLUMN note")
    val t2 = LakeTable.load(wh, "d", "evt")
    assert(t2.currentSchema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(!t2.currentSchema.fieldNames.contains("note"))
    // old rows read under the evolved schema
    assert(spark.sql("SELECT sum(score) FROM graftd.d.evt")
      .collect()(0).getLong(0) == 11)

    // CTAS
    spark.sql(
      """CREATE TABLE graftd.d.evt2 AS
        |SELECT id, kind FROM graftd.d.evt""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graftd.d.evt2")
      .collect()(0).getLong(0) == 2)

    spark.sql("DROP TABLE graftd.d.evt2")
    assert(!LakeTable.exists(wh, "d", "evt2"))
    assert(spark.sql("SHOW TABLES IN graftd.d").collect()
      .map(_.getString(1)).toSet == Set("evt"))
  }

  test("RENAME COLUMN keeps the field ID: old files read under the new name") {
    val wh = Files.createTempDirectory("graft-catalog-rn").toString
    spark.conf.set("spark.sql.catalog.graftr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftr.warehouse", wh)
    spark.sql("CREATE TABLE graftr.d.rn (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graftr.d.rn VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE graftr.d.rn RENAME COLUMN v TO label")

    val t = LakeTable.load(wh, "d", "rn")
    // same field ID under the new name, new schema version committed
    val oldSchema = t.metadata.schemas.minBy(_.id).schema
    assert(graft.schema.FieldIds.idOf(t.currentSchema("label")) ==
      graft.schema.FieldIds.idOf(oldSchema("v")))
    assert(t.metadata.schemas.size == 2)

    // files written under the OLD name reconcile by ID...
    assert(spark.sql("SELECT label FROM graftr.d.rn ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // ...and union cleanly with a post-rename append
    spark.sql("INSERT INTO graftr.d.rn VALUES (3, 'c')")
    assert(spark.sql(
      "SELECT concat_ws('', collect_list(label)) FROM " +
        "(SELECT label FROM graftr.d.rn ORDER BY id)")
      .collect()(0).getString(0) == "abc")

    // renaming to an existing column is refused
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftr.d.rn RENAME COLUMN label TO id")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("VERSION AS OF reads a pinned snapshot; writes to it are refused") {
    val wh = Files.createTempDirectory("graft-catalog-tt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"tt","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[]}""".stripMargin)
    spark.conf.set("spark.sql.catalog.graftt", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftt.warehouse", wh)
    spark.sql("INSERT INTO graftt.d.tt VALUES (1), (2)")
    spark.sql("INSERT INTO graftt.d.tt VALUES (3)")
    spark.sql("DELETE FROM graftt.d.tt WHERE id = 1")

    assert(spark.sql("SELECT id FROM graftt.d.tt ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(spark.sql(
      "SELECT id FROM graftt.d.tt VERSION AS OF 1 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql(
      "SELECT id FROM graftt.d.tt VERSION AS OF 2 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graftt.d.tt VERSION AS OF 1 VALUES (9)")
    }
    assert(e != null) // Spark rejects writes to time-travel relations

    // friendly errors: missing snapshot id, non-numeric version
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM graftt.d.tt VERSION AS OF 99").collect()
    }
    assert(e2.getMessage.contains("no snapshot 99"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graftt.d.tt VERSION AS OF 'main'").collect()
    }
    assert(e3.getMessage.contains("snapshot id or a ref name"))
  }

  test("SQL DELETE FROM routes through copy-on-write delete") {
    val wh = Files.createTempDirectory("graft-catalog-del").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"dl","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    spark.conf.set("spark.sql.catalog.graftx", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftx.warehouse", wh)
    spark.sql(
      "INSERT INTO graftx.d.dl VALUES (1,'a'), (2,'b'), (3,'a'), (4,'c')")
    spark.sql("DELETE FROM graftx.d.dl WHERE grp = 'a' AND id > 1")
    assert(spark.sql("SELECT id FROM graftx.d.dl ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    // the delete is a CoW overwrite snapshot in the log
    val t = LakeTable.load(wh, "d", "dl")
    assert(t.metadata.snapshots.last.operation == "overwrite")
    // unconditional delete empties the table
    spark.sql("DELETE FROM graftx.d.dl")
    assert(spark.sql("SELECT count(*) FROM graftx.d.dl")
      .collect()(0).getLong(0) == 0)
  }

  test("SQL UPDATE and MERGE INTO rewrite groups copy-on-write") {
    val wh = Files.createTempDirectory("graft-catalog-rlo").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"u","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"},
        |{"column_name":"v","data_type":"double"}],
        |"partitions":[{"column":"grp"}]}""".stripMargin)
    spark.conf.set("spark.sql.catalog.graftu", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftu.warehouse", wh)
    spark.sql(
      """INSERT INTO graftu.d.u VALUES
        |  (1, 'a', 1.0), (2, 'b', 2.0), (3, 'a', 3.0)""".stripMargin)

    spark.sql("UPDATE graftu.d.u SET v = v * 10, grp = 'z' WHERE id >= 2")
    assert(spark.sql("SELECT id, grp, v FROM graftu.d.u ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 1.0), (2L, "z", 20.0), (3L, "z", 30.0)))
    // updated rows carry their new partition value in metadata
    val t = LakeTable.load(wh, "d", "u")
    assert(t.metadata.snapshots.last.operation == "overwrite")
    assert(LakeTable.liveFiles(t.metadata.snapshots)
      .exists(_.partitionValues.get("grp_identity").contains("z")))

    spark.sql(
      """MERGE INTO graftu.d.u t USING (
        |  SELECT * FROM VALUES (2L, 'm', 222.0), (9L, 'n', 9.0) AS s(id, grp, v)
        |) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.grp = s.grp, t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql("SELECT id, grp, v FROM graftu.d.u ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 1.0), (2L, "m", 222.0), (3L, "z", 30.0),
        (9L, "n", 9.0)))

    // replace-style sync: WHEN NOT MATCHED BY SOURCE deletes (or
    // updates) target rows the source no longer carries
    spark.sql(
      """MERGE INTO graftu.d.u t USING (
        |  SELECT * FROM VALUES (2L, 'p', 2.2), (3L, 'q', 3.3)
        |    AS s(id, grp, v)
        |) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.grp = s.grp, t.v = s.v
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql("SELECT id, grp, v FROM graftu.d.u ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((2L, "p", 2.2), (3L, "q", 3.3)))
    spark.sql(
      """MERGE INTO graftu.d.u t USING (
        |  SELECT * FROM VALUES (3L) AS s(id)
        |) s ON t.id = s.id
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.grp = 'stale'""".stripMargin)
    assert(spark.sql("SELECT id, grp, v FROM graftu.d.u ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((2L, "stale", 2.2), (3L, "q", 3.3)))
  }

  test("INSERT INTO and writeTo append commit snapshots through the engine") {
    val wh = Files.createTempDirectory("graft-catalog-w").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"w","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],
        |"partitions":[]}""".stripMargin)
    // catalog plugin instances are cached per name at first use, so a
    // second warehouse needs its own catalog name
    spark.conf.set("spark.sql.catalog.graftw", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftw.warehouse", wh)

    spark.sql("INSERT INTO graftw.d.w VALUES (1, 'a'), (2, 'b')")
    import spark.implicits._
    Seq((3L, "c")).toDF("id", "v").writeTo("graftw.d.w").append()

    assert(spark.sql("SELECT id FROM graftw.d.w ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // each write is one snapshot commit through the engine path
    val t = LakeTable.load(wh, "d", "w")
    assert(t.metadata.snapshots.map(_.operation) == Seq("append", "append"))
    // INSERT OVERWRITE replaces the content as one rewrite snapshot
    spark.sql("INSERT OVERWRITE graftw.d.w VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM graftw.d.w").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(LakeTable.load(wh, "d", "w").metadata.snapshots.last.operation
      == "replace")
  }

  test("metadata inspection tables: .snapshots and .files") {
    val wh = Files.createTempDirectory("graft-meta").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"m","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "m")
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    t.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
    spark.conf.set("spark.sql.catalog.graftm2", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftm2.warehouse", wh)

    val snaps = spark.sql(
      """SELECT snapshot_id, operation, n_files, n_rows
        |FROM graftm2.d.m.snapshots ORDER BY snapshot_id""".stripMargin).collect()
    assert(snaps.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ==
      Seq((1L, "append", 2L), (2L, "append", 1L)))

    val files = spark.sql(
      """SELECT snapshot_id, rows, bytes FROM graftm2.d.m.files
        |ORDER BY snapshot_id, path""".stripMargin).collect()
    assert(files.map(_.getLong(1)).sum == 3L)
    assert(files.forall(_.getLong(2) > 0L), "bytes recorded per file")

    // filters/projections still work through the normal scan path
    assert(spark.sql(
      "SELECT count(*) FROM graftm2.d.m.files WHERE rows > 1").collect()
      .head.getLong(0) == 1L)
  }

  test("metadata inspection table: .delete_files shows live delete state") {
    val wh = Files.createTempDirectory("graft-meta-df").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"df","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "df")
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    spark.conf.set("spark.sql.catalog.graftdf", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftdf.warehouse", wh)
    // no deletes yet: empty relation
    assert(spark.sql("SELECT * FROM graftdf.d.df.delete_files")
      .collect().isEmpty)
    // v2 positional delete shows as a parquet entry
    t.deleteMoR(spark, org.apache.spark.sql.functions.col("id") === 1L)
    val v2rows = spark.sql(
      """SELECT data_path, kind, deleted_rows, storage
        |FROM graftdf.d.df.delete_files""".stripMargin).collect()
    assert(v2rows.length == 1)
    assert(v2rows(0).getString(1) == "parquet" && v2rows(0).getLong(2) == 1L)
    assert(v2rows(0).getString(3).endsWith(".parquet"))
    // v3 upgrade + another delete: the state converts to ONE vector
    LakeTable.load(wh, "d", "df")
      .updateProperties(Map("format-version" -> "3"))
    LakeTable.load(wh, "d", "df").deleteMoR(spark,
      org.apache.spark.sql.functions.col("id") === 2L)
    val v3rows = spark.sql(
      """SELECT data_path, kind, deleted_rows, storage
        |FROM graftdf.d.df.delete_files""".stripMargin).collect()
    assert(v3rows.length == 1)
    assert(v3rows(0).getString(1) == "vector" && v3rows(0).getLong(2) == 2L,
      s"expected one 2-row vector entry, got ${v3rows.toSeq}")
    assert(v3rows(0).getString(3).contains(".gdv@"))
  }

  test("metadata inspection tables: .history and .partitions") {
    val wh = Files.createTempDirectory("graft-meta-hp").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"hp","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"grp","data_type":"string"}],
        |"partitions":[{"column":"grp","name":"grp"}]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "hp")
    import spark.implicits._
    t.append(Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp"))
    t.appendStaged(Seq((4L, "y")).toDF("id", "grp"), "w1")
    t.publishStaged("w1")
    t.deleteMoR(spark,
      org.apache.spark.sql.functions.col("id") === 1L)
    spark.conf.set("spark.sql.catalog.graftm3", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftm3.warehouse", wh)

    val hist = spark.sql(
      """SELECT snapshot_id, operation, wap_id, is_current
        |FROM graftm3.d.hp.history ORDER BY snapshot_id""".stripMargin)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(hist.map(_._2).toSeq == Seq("append", "append", "delete"))
    assert(hist(1)._3 == "w1", "published cherry-pick keeps wap lineage")
    assert(hist.count(_._4) == 1 && hist.last._4)

    val parts = spark.sql(
      """SELECT partition, n_files, n_rows, deleted_rows
        |FROM graftm3.d.hp.partitions ORDER BY partition""".stripMargin)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(parts.map(_._1).toSeq == Seq("grp=x", "grp=y"))
    assert(parts.map(_._3).toSeq == Seq(2L, 2L), "per-partition live rows")
    assert(parts.map(_._4).toSeq == Seq(1L, 0L),
      "merge-on-read deleted rows attributed to their partition")

    // .manifests surfaces the out-of-line tier from summaries alone:
    // two data-bearing snapshots (the MoR delete carries no data files)
    val mans = spark.sql(
      """SELECT snapshot_id, n_files, n_rows, partition_summary
        |FROM graftm3.d.hp.manifests ORDER BY snapshot_id""".stripMargin)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    // ids 1 (append) and 3 (the published cherry-pick gets a fresh id
    // past the staged one); the MoR delete carries no manifest
    assert(mans.map(_._1).toSeq == Seq(1L, 3L))
    assert(mans.map(_._3).toSeq == Seq(3L, 1L))
    assert(mans.head._4 == "grp=[x|y]" && mans(1)._4 == "grp=[y]",
      "partition summaries render per manifest")

    // the distributed rollup replays copy-on-write removals and a
    // rewrite reset exactly: CoW-delete grp=x's survivor (removes that
    // partition's files), then compact (rewrite — applies the MoR
    // delete, resets replay to the compacted manifest)
    val t2 = LakeTable.load(wh, "d", "hp")
    t2.delete(spark, org.apache.spark.sql.functions.col("id") === 2L)
    LakeTable.load(wh, "d", "hp").compact(spark)
    val parts2 = spark.sql(
      """SELECT partition, n_rows, deleted_rows
        |FROM graftm3.d.hp.partitions ORDER BY partition""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts2.toSeq == Seq(("grp=y", 2L, 0L)),
      "post-CoW + compaction rollup: only grp=y survives, deletes reset")
  }

  test("ALTER ADD COLUMN ... DEFAULT: initial default fills the " +
      "pre-column history only") {
    val wh = Files.createTempDirectory("graft-defaults").toString
    spark.conf.set("spark.sql.catalog.gdef", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gdef.warehouse", wh)
    spark.sql("CREATE TABLE gdef.d.dc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gdef.d.dc VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE gdef.d.dc ADD COLUMN note STRING DEFAULT 'n/a'")
    spark.sql("ALTER TABLE gdef.d.dc ADD COLUMN score BIGINT DEFAULT 7")
    def rows(): Seq[(Long, String, Any)] =
      spark.sql("SELECT id, note, score FROM gdef.d.dc ORDER BY id")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    // pre-column rows read the defaults (DSv2 Group-reader path)
    assert(rows() == Seq((1L, "n/a", 7L), (2L, "n/a", 7L)))
    // the native reconciling read agrees
    val t = LakeTable.load(wh, "d", "dc")
    assert(t.read(spark).select("id", "note", "score")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1L, "n/a", 7L), (2L, "n/a", 7L)))
    // rows written AFTER the add keep explicit values — incl. NULL
    spark.sql("INSERT INTO gdef.d.dc VALUES (3, 'c', NULL, 9)")
    assert(rows() == Seq((1L, "n/a", 7L), (2L, "n/a", 7L), (3L, null, 9L)))
    // the default survives a later evolution (metadata carry-over)
    spark.sql("ALTER TABLE gdef.d.dc ADD COLUMN extra INT")
    assert(rows() == Seq((1L, "n/a", 7L), (2L, "n/a", 7L), (3L, null, 9L)))
    // time travel BEFORE the add serves the old schema — no column
    assert(!spark.sql("SELECT * FROM gdef.d.dc VERSION AS OF 1")
      .columns.contains("note"))
    // the write-default half: INSERT ... DEFAULT fills the literal
    spark.sql("INSERT INTO gdef.d.dc VALUES (4, 'd', DEFAULT, DEFAULT, 1)")
    assert(rows().exists(r => r == ((4L, "n/a", 7L))),
      "INSERT DEFAULT must resolve to the declared literal, not NULL")
    // API appends that OMIT the column take the default too (Align)
    locally {
      import spark.implicits._
      LakeTable.load(wh, "d", "dc").append(
        Seq((5L, "e")).toDF("id", "v"))
    }
    assert(rows().exists(r => r == ((5L, "n/a", 7L))),
      "an aligned append omitting the column takes the write-default")
    // SET DEFAULT changes the WRITE default only — pre-column history
    // keeps reading the immutable initial default
    spark.sql("ALTER TABLE gdef.d.dc ALTER COLUMN note SET DEFAULT 'retro'")
    assert(graft.schema.Defaults.writeOf(LakeTable.load(wh, "d", "dc")
      .currentSchema.fields.find(_.name == "note").get).contains("retro"),
      "SET DEFAULT must store the write default")
    spark.sql("INSERT INTO gdef.d.dc VALUES (6, 'f', DEFAULT, DEFAULT, 2)")
    assert(rows().exists(r => r == ((6L, "retro", 7L))),
      "INSERT DEFAULT must take the new write default")
    assert(rows().exists(r => r == ((1L, "n/a", 7L))),
      "SET DEFAULT must never rewrite history's initial fill")
    locally {
      import spark.implicits._
      LakeTable.load(wh, "d", "dc").append(Seq((7L, "g")).toDF("id", "v"))
    }
    assert(rows().exists(r => r == ((7L, "retro", 7L))),
      "aligned appends follow the new write default")
    // DROP DEFAULT: omitted writes go back to NULL; history unchanged
    spark.sql("ALTER TABLE gdef.d.dc ALTER COLUMN note DROP DEFAULT")
    spark.sql("INSERT INTO gdef.d.dc VALUES (8, 'h', DEFAULT, DEFAULT, 3)")
    assert(rows().exists(r => r == ((8L, null, 7L))),
      "after DROP DEFAULT an omitted write is NULL again")
    assert(rows().exists(r => r == ((1L, "n/a", 7L))))
    // escaped-quote literal round-trips Spark's lexer rules, and the
    // SET + a DROP tombstone both survive a later evolution
    spark.sql("""ALTER TABLE gdef.d.dc ALTER COLUMN note SET DEFAULT 'O\'Brien'""")
    spark.sql("ALTER TABLE gdef.d.dc ALTER COLUMN score DROP DEFAULT")
    spark.sql("ALTER TABLE gdef.d.dc ADD COLUMN extra2 INT")
    spark.sql(
      "INSERT INTO gdef.d.dc VALUES (9, 'i', DEFAULT, DEFAULT, 4, NULL)")
    assert(rows().exists(r => r == ((9L, "O'Brien", null))),
      "annotations must survive evolution; escapes must round-trip")
    // a NOT NULL column WITH a write default aligns from omission —
    // the primary SQL use-case for SET DEFAULT
    locally {
      import spark.implicits._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val req = graft.schema.Defaults.withWriteDefault(
        graft.schema.FieldIds.withId(
          StructField("score", LongType, nullable = false), 50), Some("0"))
      val target = StructType(Seq(
        graft.schema.FieldIds.withId(StructField("id", LongType), 51), req))
      val aligned = graft.lake.Align(Seq(Tuple1(1L)).toDF("id"), target)
      assert(aligned.collect().head.getLong(1) == 0L,
        "a required column takes its write default when omitted")
    }
    // DEFAULT NULL is "no default": pre-column history reads NULL,
    // not the string 'null' (and numeric parses must not crash)
    spark.sql("ALTER TABLE gdef.d.dc ADD COLUMN opt BIGINT DEFAULT NULL")
    assert(spark.sql("SELECT opt FROM gdef.d.dc WHERE id = 1")
      .collect().head.isNullAt(0))
    // CREATE with DEFAULT is refused loudly, not silently dropped
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gdef.d.dc2 (x INT DEFAULT 5)"))
    assert(e1.getMessage.contains("ADD COLUMN"))
    // non-round-tripping default types are refused at DDL time
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE gdef.d.dc ADD COLUMN d DATE DEFAULT DATE'2024-01-01'"))
    assert(e2.getMessage.toLowerCase.contains("default"))
    // a literal that cannot produce the field's value fails at
    // annotation (DDL) time, never at read time — SQL can't reach
    // this (Spark coerces DEFAULT literals to the column type), but
    // the engine API must not trust its caller
    import org.apache.spark.sql.types.{DecimalType, StructField}
    val e3 = intercept[IllegalArgumentException](
      graft.schema.Defaults.withDefault(
        graft.schema.FieldIds.withId(
          StructField("pct", DecimalType(10, 2)), 99), "1.234"))
    assert(e3.getMessage.contains("does not parse"))
  }

  test("INSERT OVERWRITE replaces the visible content in one snapshot") {
    val wh = Files.createTempDirectory("graft-ow").toString
    spark.conf.set("spark.sql.catalog.gow", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gow.warehouse", wh)
    spark.sql("CREATE TABLE gow.d.ow (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gow.d.ow VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("INSERT OVERWRITE gow.d.ow VALUES (9, 'z'), (10, 'y')")
    assert(spark.sql("SELECT id FROM gow.d.ow").collect()
      .map(_.getLong(0)).toSet == Set(9L, 10L))
    // history stays readable; the op is a replay-resetting "replace"
    // (no path enumeration into later metadata versions)
    assert(spark.sql("SELECT id FROM gow.d.ow VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(LakeTable.load(wh, "d", "ow").metadata.snapshots.last.operation
      == "replace")
    // appends continue past it
    spark.sql("INSERT INTO gow.d.ow VALUES (11, 'x')")
    assert(spark.sql("SELECT count(*) FROM gow.d.ow").collect()
      .head.getLong(0) == 3L)
    // live equality deletes don't block a full replace — the reset
    // retires them (no compact() detour)
    val t = LakeTable.load(wh, "d", "ow")
    import spark.implicits._
    t.upsertMoR(spark, Seq((11L, "x2")).toDF("id", "v"), Seq("id"))
    LakeTable.load(wh, "d", "ow")
      .overwrite(Seq((50L, "w")).toDF("id", "v"))
    assert(spark.sql("SELECT id, v FROM gow.d.ow").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((50L, "w")))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES steers engine knobs") {
    val wh = Files.createTempDirectory("graft-props").toString
    spark.conf.set("spark.sql.catalog.gprops", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gprops.warehouse", wh)
    spark.sql("CREATE TABLE gprops.d.pt (id BIGINT, v STRING)")
    spark.sql("""ALTER TABLE gprops.d.pt SET TBLPROPERTIES (
      |'commit.retry.num-retries' = '9',
      |'write.sort-order' = 'id')""".stripMargin)
    val t = LakeTable.load(wh, "d", "pt")
    assert(t.metadata.properties.get("commit.retry.num-retries")
      .contains("9"))
    assert(t.metadata.properties.get("write.sort-order").contains("id"))
    // visible through SHOW TBLPROPERTIES (Table.properties)
    val shown = spark.sql("SHOW TBLPROPERTIES gprops.d.pt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("write.sort-order").contains("id"))
    // the property actually steers the writer: sorted file recorded
    import spark.implicits._
    LakeTable.load(wh, "d", "pt").append(
      Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(LakeTable.load(wh, "d", "pt").metadata.snapshots.last.files
      .forall(_.sortedByIds.nonEmpty),
      "write.sort-order set via SQL must reach the writer")
    spark.sql(
      "ALTER TABLE gprops.d.pt UNSET TBLPROPERTIES ('write.sort-order')")
    assert(!LakeTable.load(wh, "d", "pt").metadata.properties
      .contains("write.sort-order"))
  }

  test("CALL add_files accepts a path containing a comma (escaped)") {
    val wh = Files.createTempDirectory("graft-commapath").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"cp","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    import spark.implicits._
    // materialize an external file whose NAME contains a comma — legal
    // on every posix filesystem, and previously unregistrable from SQL
    // (the bare comma split produced two nonexistent paths)
    val tmp = Files.createTempDirectory("graft-ext-comma")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(tmp.resolve("plain").toString)
    val written = Files.list(tmp.resolve("plain"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val commaPath = tmp.resolve("part-0,0.parquet")
    Files.move(written, commaPath)
    spark.conf.set("spark.sql.catalog.gcomma", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gcomma.warehouse", wh)
    // two levels of escaping: Spark SQL's single-quoted literal eats one
    // backslash, splitList consumes the surviving `\,`
    val escaped = commaPath.toString.replace(",", "\\\\,")
    val res = spark.sql(
      s"CALL gcomma.system.add_files('d', 'cp', '$escaped')").collect()
    assert(res.head.getInt(1) == 1 && res.head.getLong(2) == 2L)
    assert(spark.sql("SELECT id FROM gcomma.d.cp ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("CALL procedures: expire_snapshots, compact, remove_orphan_files") {
    val wh = Files.createTempDirectory("graft-proc").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"p","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "p")
    import spark.implicits._
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.delete(spark, $"id" === 2L)
    spark.conf.set("spark.sql.catalog.graftp", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graftp.warehouse", wh)

    val compacted = spark.sql(
      "CALL graftp.system.compact(db => 'd', table => 'p')").collect()
    assert(compacted.head.getLong(1) == 2L, "2 live rows rewritten")

    val expired = spark.sql(
      s"CALL graftp.system.expire_snapshots('d', 'p', ${compacted.head.getLong(0)})")
      .collect()
    assert(expired.head.getInt(0) > 0, "history squashed")

    val removed = spark.sql(
      "CALL graftp.system.remove_orphan_files(db => 'd', table => 'p', older_than_ms => 0L)")
      .collect()
    assert(removed.head.getInt(0) > 0, "pre-compaction files swept")

    val live = spark.sql("SELECT id FROM graftp.d.p ORDER BY id").collect()
    assert(live.map(_.getLong(0)).toSeq == Seq(1L, 3L))

    // the delete-file merge dispatches through CALL (nothing to merge
    // here — the table has only CoW history)
    val pd = spark.sql("CALL graftp.system.rewrite_position_delete_files(" +
      "db => 'd', table => 'p')").collect()
    assert(pd.head.getInt(0) == 0)

    // a SQL NULL string argument is named, not NPE'd
    val e = intercept[Exception] {
      spark.sql("CALL graftp.system.compact(db => 'd', table => NULL)")
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(m =>
      m.contains("must not be NULL") && m.contains("table")),
      s"got: ${chain(e).mkString(" | ")}")
  }

  test("TIMESTAMP AS OF resolves to the latest snapshot at the instant") {
    val wh = Files.createTempDirectory("graft-tt").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"tt","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "tt")
    import spark.implicits._
    val s1 = t.append(Seq(1L).toDF("id"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(Seq(2L).toDF("id"))
    assert(t.snapshotAsOfTime(between).contains(s1.id))
    assert(t.snapshotAsOfTime(System.currentTimeMillis()).contains(s1.id + 1))
    assert(t.snapshotAsOfTime(0L).isEmpty)

    spark.conf.set("spark.sql.catalog.grafttt", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grafttt.warehouse", wh)
    val inst = java.time.Instant.ofEpochMilli(between)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString.replace("T", " ")
    val rows = spark.sql(
      s"SELECT id FROM grafttt.d.tt TIMESTAMP AS OF '$inst+00:00' ORDER BY id")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("SQL ADD/DROP PARTITION FIELD evolves the spec; multi-spec " +
      "pruning holds") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-specsql").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"ts","data_type":"timestamp"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    val t = LakeTable.load(wh, "d", "t")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    t.append(Seq((1L, ts(1), "a"), (2L, ts(2), "b")).toDF("id", "ts", "v"))

    spark.conf.set("spark.sql.catalog.gspecsql", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gspecsql.warehouse", wh)
    // the shared test session was built without GraftExtensions — run
    // the statement through the extension parser directly (same plan
    // the injected parser produces; e2e injection covered below)
    def exec(sql: String) = {
      val p = new org.apache.spark.sql.GraftSqlParser(
        org.apache.spark.sql.GraftPlanBridge.sessionParser(spark))
      org.apache.spark.sql.GraftPlanBridge.ofRows(spark, p.parsePlan(sql))
        .collect()
    }
    exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD days(ts)")
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.currentSpec.fields.map(f => (f.transform, f.name))
      == Seq(("day", "ts_day")), "auto-named day field")
    assert(t2.metadata.specs.size == 2, "new spec version committed")

    // new writes partition by the extended spec; old files keep spec 0
    t2.append(Seq((3L, ts(1), "c"), (4L, ts(2), "d")).toDF("id", "ts", "v"))
    val live = t2.plannedFiles()
    val pruned = t2.plannedFiles(prune = Map("ts_day" -> Set("2024-01-01")))
    assert(pruned.size < live.size,
      "day prune must drop new-spec files of other days")
    assert(pruned.map(_.rows).sum >= 1)
    // reads stay correct across specs (old files conservatively kept)
    assert(spark.sql("SELECT count(*) FROM gspecsql.d.t").head.getLong(0) == 4L)

    // DROP by name via the CALL procedure surface
    spark.sql("CALL gspecsql.system.drop_partition_field('d', 't', 'ts_day')")
      .collect()
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields.isEmpty)
    // re-add via CALL ('' name = auto), drop via the transform form
    spark.sql("CALL gspecsql.system.add_partition_field(" +
      "'d', 't', 'ts', 'day', '')").collect()
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
      .map(_.name) == Seq("ts_day"))
    exec("ALTER TABLE gspecsql.d.t DROP PARTITION FIELD day(ts)")
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields.isEmpty)

    // bucket + truncate SQL forms map to the engine transform names
    exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD bucket(8, id)")
    exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD truncate(2, v) AS vp")
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
      .map(f => (f.transform, f.name))
      == Seq(("bucket[8]", "id_bucket"), ("truncate[2]", "vp")))

    // unknown source column is refused; other statements still parse
    intercept[Exception](
      exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD nope"))
    assert(exec("SELECT 1 AS x").head.getInt(0) == 1)

    // an unknown TRANSFORM is refused loudly, not committed as an
    // identity field on the literal text
    val e = intercept[Exception](
      exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD zorder(ts)"))
    assert(e.getMessage.contains("unsupported partition transform"),
      s"got: ${e.getMessage}")
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
      .map(_.name) == Seq("id_bucket", "vp"), "no spec commit on refusal")

    // a backtick-quoted AS-name (with a space) round-trips
    exec("ALTER TABLE gspecsql.d.t ADD PARTITION FIELD days(ts) AS `day part`")
    assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
      .map(_.name).contains("day part"))
    exec("ALTER TABLE gspecsql.d.t DROP PARTITION FIELD `day part`")
    assert(!LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
      .map(_.name).contains("day part"))
  }

  test("injected parser serves ALTER PARTITION FIELD in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val wh = Files.createTempDirectory("graft-specsql-e2e").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[]}""".stripMargin)
    // force a NEW session (same context): getOrCreate would return the
    // shared one, whose parser predates the extension
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      s2.conf.set("spark.sql.catalog.gspece2e", "graft.sources.LakeCatalog")
      s2.conf.set("spark.sql.catalog.gspece2e.warehouse", wh)
      s2.sql("ALTER TABLE gspece2e.d.t ADD PARTITION FIELD bucket(4, id)")
      assert(LakeTable.load(wh, "d", "t").metadata.currentSpec.fields
        .map(f => (f.transform, f.name)) == Seq(("bucket[4]", "id_bucket")))
      // the delegate path is intact in the extended session
      assert(s2.sql("SELECT 2 AS x").head.getInt(0) == 2)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
