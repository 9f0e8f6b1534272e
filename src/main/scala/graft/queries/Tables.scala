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
  /** Inferred parquet schema per absolute path (r17 optimization):
    * without a user-supplied schema every `spark.read.parquet` call
    * runs a footer-inference job (~40-50 ms) — and the bench makes
    * hundreds of Tables() calls per run over the SAME immutable
    * fixture files. Pure file metadata, never row data: every query
    * still scans the parquet for its rows; this only stops Spark
    * re-deriving a constant StructType per call. Keyed by full path,
    * so distinct sf dirs never collide.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  /** events.parquet probe result per path: (loaded schema, whether the
    * read needs the nanosAsLong cloned session). Same metadata-only
    * memo as [[schemaCache]]; the encoding branch itself is unchanged. */
  private val eventsCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (org.apache.spark.sql.types.StructType, Boolean)]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else {
      val path = s"$dir/$name.parquet"
      val schema = schemaCache.computeIfAbsent(path,
        p => spark.read.parquet(p).schema)
      spark.read.schema(schema).parquet(path)
    }

  /** events.parquet's `ts` physical encoding has drifted across driver
    * regenerations: TIMESTAMP(NANOS) (rounds 1-4) vs plain timestamp[us]
    * (round 5+). Branch on the schema Spark actually loads instead of
    * assuming either encoding:
    *   - LongType      → TIMESTAMP(NANOS) read under nanosAsLong; truncate
    *                     to micros (the same truncation DuckDB applies on
    *                     CAST(ts AS TIMESTAMP)).
    *   - TimestampNTZ  → timestamp[us], isAdjustedToUTC=false; reinterpret
    *                     the wall clock in the session zone (UTC in Verify)
    *                     so downstream window/stream ops see TimestampType.
    *   - TimestampType → already session-typed; pass through.
    * Any other type fails loudly with the table name — a one-line
    * diagnosis the next time the fixtures drift.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$dir/events.parquet"
    // Probe without any legacy flag first: micros fixtures load directly and
    // the shared session config is never touched. Only a TIMESTAMP(NANOS)
    // fixture (which Spark rejects at schema inference) falls back to the
    // nanosAsLong read — and that legacy mode is scoped to a cloned session
    // (same SparkContext, isolated SQL conf) so it cannot leak a legacy
    // parquet read mode into every subsequent query on the caller's session.
    // The (schema, needs-nano-session) probe result memoizes per path like
    // the generic loader above; the nano read keeps the legacy flag on its
    // per-call cloned session — the flag gates the READ, not just inference.
    val (schema, nano) = eventsCache.computeIfAbsent(path, p =>
      try (spark.read.parquet(p).schema, false)
      catch {
        case e: Throwable if {
          val m = Option(e.getMessage).getOrElse("")
          m.contains("TIMESTAMP(NANOS") || m.contains("TIMESTAMP_NANOS")
        } =>
          val ns = spark.newSession()
          ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          (ns.read.parquet(p).schema, true)
      })
    val raw =
      if (!nano) spark.read.schema(schema).parquet(path)
      else {
        val nanoSession = spark.newSession()
        nanoSession.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nanoSession.read.schema(schema).parquet(path)
      }
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.parquet: unsupported ts encoding $other at $dir — update Tables.events")
    }
  }

  /** DECIMAL(18,4) pre-aggregation cast (SURVEY.md §7.8). Input doubles in
    * the testdata carry <=2 decimal digits, so the cast is exact (no
    * engine-specific rounding can occur).
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
}
