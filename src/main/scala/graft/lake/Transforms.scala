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

  /** The derived partition Column for a transform over a source column. */
  def expr(transform: String, source: Column): Column = transform match {
    case "identity" => source.cast("string")
    case "year" => date_format(source, "yyyy")
    case "month" => date_format(source, "yyyy-MM")
    case "day" => date_format(source, "yyyy-MM-dd")
    case "hour" => date_format(source, "yyyy-MM-dd-HH")
    case other =>
      throw new IllegalArgumentException(s"unknown transform '$other'")
  }

  /** Apply a transform to a literal predicate value (for pruning:
    * `year(order_time) = 2024` arrives as transform="year",
    * value="2024").
    */
  def defaultName(column: String, transform: String): String =
    s"${column}_$transform"
}
