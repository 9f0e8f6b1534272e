package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream joins (Structured Streaming): the click-attribution
  * shape — impressions joined to clicks that land within an attribution
  * window after the impression.
  *
  * Scale/state contract: both sides carry watermarks and the join
  * condition bounds click time to [imp time, imp time + window], so
  * Spark evicts buffered rows as the watermark passes — state is
  * O(rows inside the window), not O(stream). The left-outer variant
  * emits unmatched impressions (null click) once the watermark proves
  * no click can still arrive.
  */
object StreamJoin {

  case class Impression(imp_id: Long, ts: java.sql.Timestamp)
  case class Click(click_id: Long, imp_id: Long, cts: java.sql.Timestamp)

  /** `joinType`: "inner" or "left_outer". `delayThreshold` is the
    * watermark delay for both sides (e.g. "10 minutes").
    */
  def attribute(impressions: Dataset[Impression], clicks: Dataset[Click],
      windowMinutes: Int, delayThreshold: String,
      joinType: String = "inner"): DataFrame = {
    val i = impressions.withWatermark("ts", delayThreshold)
    val c = clicks.withColumnRenamed("imp_id", "click_imp_id")
      .withWatermark("cts", delayThreshold)
    i.join(c,
      expr(s"""imp_id = click_imp_id AND
              |cts >= ts AND
              |cts <= ts + INTERVAL $windowMinutes MINUTES""".stripMargin),
      joinType)
      .select(col("imp_id"), col("ts"), col("click_id"), col("cts"))
  }
}
