package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hidden-partitioning transforms (reference `iceberg_helper.py:398-425`:
  * identity / hour / day / month / year). Partition values are *derived*
  * from source columns at write time and stored only in the directory
  * layout + file metadata — user queries never see `_p_*` columns
  * (SURVEY.md §4.1).
  *
  * Values are rendered as strings (Hive dir-value style, human-readable
  * and totally ordered within a transform) so metadata pruning is a
  * plain string compare.
  */
object Transforms {
  val Supported = Seq("identity", "year", "month", "day", "hour")

  /** Engine extension over the reference's transform set: `bucket[N]`
    * hash-partitions a (typically high-cardinality) source column into
    * N stable buckets — Spark's murmur3 `hash()` mod N — so equi-joins
    * on the column can run storage-partitioned with no shuffle.
    */
  private val bucketRe = """(?i)bucket\[(\d+)\]""".r

  def bucketCount(transform: String): Option[Int] = transform match {
    case bucketRe(n) => Some(n.toInt)
    case _ => None
  }

  def isSupported(transform: String): Boolean =
    Supported.contains(transform) || bucketCount(transform).exists(_ > 0)

  /** The derived partition Column for a transform over a source column. */
  def expr(transform: String, source: Column): Column = transform match {
    case "identity" => source.cast("string")
    case "year" => date_format(source, "yyyy")
    case "month" => date_format(source, "yyyy-MM")
    case "day" => date_format(source, "yyyy-MM-dd")
    case "hour" => date_format(source, "yyyy-MM-dd-HH")
    case bucketRe(n) => pmod(hash(source), lit(n.toInt)).cast("string")
    case other =>
      throw new IllegalArgumentException(s"unknown transform '$other'")
  }

  /** Apply a transform to a literal predicate value (for pruning:
    * `year(order_time) = 2024` arrives as transform="year",
    * value="2024").
    */
  def defaultName(column: String, transform: String): String =
    s"${column}_$transform"

  // ---- executor-side rendering ----------------------------------------
  // The same strings `expr` produces through date_format, computed from
  // raw internal values — shared by the distributed writers and the V2
  // partition-transform functions so the two paths can never drift.
  // Wall-clock types only (NTZ micros / epoch days): tz-aware rendering
  // would depend on the session timezone.

  def renderLocal(transform: String, ldt: java.time.LocalDateTime): String =
    transform match {
      case "year" => f"${ldt.getYear}%04d"
      case "month" => f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d"
      case "day" => f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d"
      case "hour" => f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d-${ldt.getHour}%02d"
      case other =>
        throw new IllegalArgumentException(s"unknown time transform '$other'")
    }

  def renderNtzMicros(transform: String, micros: Long): String =
    renderLocal(transform, java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))

  def renderEpochDay(transform: String, days: Int): String =
    renderLocal(transform,
      java.time.LocalDate.ofEpochDay(days.toLong).atStartOfDay)
}
