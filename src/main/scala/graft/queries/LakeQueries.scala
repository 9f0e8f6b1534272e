package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{DataGen, OrdersFixtures}
import graft.lake.{Engine, LakeTable}

/** Lake DDL / evolution / ingest queries (SURVEY.md §2.B ddl_* +
  * ingest_append_read). No SQL oracle — the lake format is
  * engine-specific; results are deterministic summaries (seeded
  * generator) checked by the driver's rows-only gate and pinned in
  * depth by graft.LakeSpec.
  *
  * Each query rebuilds a scratch warehouse under java.io.tmpdir so
  * repeated runs are self-contained and identical.
  */
object LakeQueries extends QueryModule {

  private def freshWarehouse(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-lake-$tag")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    p.toString
  }

  private def messagesDf(s: SparkSession, rows: Seq[(String, Int, String)]): DataFrame = {
    import s.implicits._
    rows.toDF("phase", "seq", "message").orderBy("phase", "seq")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ddl_create" -> ((s, _) => {
      val wh = freshWarehouse("create")
      val resp = Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val t = LakeTable.load(wh, "customer_order", "orders")
      val schemaRows = graft.schema.FieldIds.flatten(t.currentSchema).map {
        case (path, f) =>
          (path, graft.schema.FieldIds.idOf(f), f.dataType.simpleString)
      }
      import s.implicits._
      schemaRows.toDF("path", "field_id", "type")
        .withColumn("change_type", lit(resp.changeType))
        .orderBy("field_id")
    }),

    "ddl_evolve_v1_v2" -> ((s, _) => {
      val wh = freshWarehouse("evolve")
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val resp = Engine.processTableDefJson(wh, OrdersFixtures.ordersV2Json)
      messagesDf(s, resp.messageList.zipWithIndex.map {
        case (m, i) => ("v1->v2", i, redactPaths(m))
      })
    }),

    "ddl_drop_reorder_update" -> ((s, _) => {
      val wh = freshWarehouse("dru")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"a","data_type":"int"},
          |{"column_name":"b","data_type":"string"},
          |{"column_name":"c","data_type":"float"}],
          |"partitions":[]}""".stripMargin)
      // drop b, promote a int->long and c float->double, reorder c first
      val resp = Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"c","data_type":"double"},
          |{"column_name":"a","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "d", "t")
      val schemaRows = graft.schema.FieldIds.flatten(t.currentSchema).zipWithIndex.map {
        case ((path, f), pos) =>
          (pos, path, graft.schema.FieldIds.idOf(f), f.dataType.simpleString)
      }
      import s.implicits._
      schemaRows.toDF("pos", "path", "field_id", "type")
        .withColumn("had_error", lit(resp.hasError))
        .orderBy("pos")
    }),

    "ingest_append_read" -> ((s, _) => {
      val wh = freshWarehouse("ingest")
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val t1 = LakeTable.load(wh, "customer_order", "orders")
      t1.append(DataGen.toDf(s, DataGen.ordersV1(20, seed = 1L), t1.currentSchema))
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV2Json)
      val t2 = LakeTable.load(wh, "customer_order", "orders")
      t2.append(DataGen.toDf(s, DataGen.ordersV2(15, seed = 2L), t2.currentSchema))
      // unified read: v1 rows surface NULL order_id / address.zip /
      // order_items[*].item_count under the v2 schema
      t2.read(s)
        .select(
          col("order_id"), col("customer_name"),
          col("address.city").as("city"), col("address.zip").as("zip"),
          size(col("order_items")).as("n_items"),
          col("order_items").getItem(0).getField("item_count").as("first_item_count"),
          col("order_items").getItem(0).getField("price").as("first_price"),
          year(col("order_time")).as("yr"))
        .orderBy(col("order_id").asc_nulls_first, col("customer_name"),
          col("yr"), col("n_items"), col("first_price"))
    }),
  )

  /** Meta-file paths embed the tmpdir — strip to keep output stable. */
  private def redactPaths(m: String): String =
    m.replaceAll("Latest Meta file: .*", "Latest Meta file: <meta>")

  def oracleSql: Map[String, String] = Map.empty
}
