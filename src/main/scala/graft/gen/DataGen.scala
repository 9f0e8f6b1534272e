package graft.gen

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic (seeded) parity generator for the reference's
  * synthetic orders (`lambda/data_generator.py:10-65`, distributions
  * recorded in FIXTURES.md §1): order_time ∈ 2020-2025 (day 1-28,
  * 01:01:01), customer_name = Customer_{1..100}, address city/state_
  * {1..100} (+address_line/zip in v2), order_items 1-50 structs with
  * item_id = item_{i}, price = uniform(10,20) rounded to 2dp,
  * item_count = 1-5 in v2. The reference appends 1-20 random orders
  * per invoke.
  *
  * Rows are Row objects matching the lake schema built from
  * OrdersFixtures; this generator exists for tests/demos (the
  * reference's data plane is toy-sized by design — BASELINE.md).
  */
object DataGen {

  private def price(rnd: scala.util.Random): Float =
    math.round((10.0 + rnd.nextDouble() * 10.0) * 100.0).toFloat / 100.0f

  private def orderTime(rnd: scala.util.Random): LocalDateTime =
    LocalDateTime.of(2020 + rnd.nextInt(6), 1 + rnd.nextInt(12),
      1 + rnd.nextInt(28), 1, 1, 1)

  def ordersV1(n: Int, seed: Long): Seq[Row] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val items = (1 to (1 + rnd.nextInt(50))).map { i =>
        Row(s"item_$i", price(rnd))
      }
      Row(
        orderTime(rnd),
        s"Customer_${1 + rnd.nextInt(100)}",
        Row(s"city_${1 + rnd.nextInt(100)}", s"state_${1 + rnd.nextInt(100)}"),
        items)
    }
  }

  def ordersV2(n: Int, seed: Long): Seq[Row] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { k =>
      val items = (1 to (1 + rnd.nextInt(50))).map { i =>
        Row(s"item_$i", 1 + rnd.nextInt(5), price(rnd))
      }
      Row(
        s"order_${seed}_$k",
        orderTime(rnd),
        s"Customer_${1 + rnd.nextInt(100)}",
        Row(s"address_line_${1 + rnd.nextInt(100)}",
          s"city_${1 + rnd.nextInt(100)}", s"state_${1 + rnd.nextInt(100)}",
          s"zip_${1 + rnd.nextInt(100)}"),
        items)
    }
  }

  def toDf(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      graft.lake.Reconcile.clean(schema).asInstanceOf[StructType])
}
