package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Loaders + shared determinism helpers for the driver test tables
  * (TESTDATA.md / FIXTURES.md §2). All money/double columns are cast to
  * DECIMAL(18,4) *before* aggregation so Spark and the DuckDB oracle
  * hash-match (SURVEY.md §7.8): float summation order differs across
  * engines, decimal summation is exact and order-independent.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores ts as Parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright. Read nanos as LongType (legacy conf, safe to
    * flip at runtime) and truncate to microsecond TimestampType — the same
    * truncation DuckDB applies on CAST(ts_ns AS TIMESTAMP), so oracle SQL
    * must always cast ts before use.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** DECIMAL(18,4) pre-aggregation cast (SURVEY.md §7.8). Input doubles in
    * the testdata carry <=2 decimal digits, so the cast is exact (no
    * engine-specific rounding can occur).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
}
