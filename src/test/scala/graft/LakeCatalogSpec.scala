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

    // read-only: SQL DDL is refused
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graft.customer_order.orders")
    }
    assert(e.getMessage.contains("read-only"))
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
    // INSERT OVERWRITE is refused (no SupportsTruncate — Spark's
    // analyzer rejects it before reaching the V1 bridge)
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE graftw.d.w VALUES (9, 'z')")
    }
    assert(e.getMessage.contains("does not support truncate"))
  }
}
