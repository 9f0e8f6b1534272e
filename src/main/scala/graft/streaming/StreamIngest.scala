package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.LakeTable

/** Structured-Streaming ingestion into a lake table: each micro-batch
  * is schema-aligned and committed as one snapshot. foreachBatch is
  * only at-least-once (a driver crash between the snapshot commit and
  * the checkpoint write replays the batch), so each snapshot records
  * its micro-batch id and replays of already-committed batches are
  * skipped — exactly-once at the snapshot level, Iceberg's
  * streaming-sink idempotence model. The table is reloaded per batch so
  * concurrent schema evolution applies from the next micro-batch on — a
  * stream keeps running across an ALTER TABLE.
  *
  * Scale: the batch append is a normal distributed write (align +
  * hidden-partition derive + partitionBy); only the snapshot commit is
  * driver-side, O(files).
  */
object StreamIngest {

  def intoLake(stream: DataFrame, warehouse: String, db: String, table: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val t = LakeTable.load(warehouse, db, table)
        // batch ids are checkpoint-scoped, so the checkpoint is the
        // stream identity: a replay (same checkpoint, id <= committed)
        // is skipped; a fresh checkpoint starts its own id sequence
        val alreadyCommitted = t.lastStreamBatchId(checkpoint).exists(batchId <= _)
        if (!alreadyCommitted && !batch.isEmpty) {
          t.append(batch, streamBatchId = Some(batchId),
            streamId = Some(checkpoint))
        }
        ()
      }
      .trigger(trigger)
      .start()

  /** Streaming CDC upsert sink (the Flink→Iceberg upsert-mode shape):
    * each micro-batch keeps its newest row per key (ordered by
    * `orderBy` descending, so e.g. Seq("ts", "event_id") means latest
    * timestamp wins, id as tiebreak) and lands as ONE blind
    * equality-delete upsert — zero reads of the target at write time,
    * O(batch) per commit at any table size. Batch replays are skipped
    * via the same (checkpoint, batchId) idempotence as `intoLake`;
    * later batches supersede earlier ones per key (data sequence
    * numbers).
    */
  def upsertIntoLake(stream: DataFrame, warehouse: String, db: String,
      table: String, keys: Seq[String] = Seq.empty, orderBy: Seq[String],
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val t = LakeTable.load(warehouse, db, table)
        // empty keys → the table's declared identifier fields, resolved
        // per batch (rename-proof); upsertMoR re-validates, so explicit
        // keys that drift from the declared identity fail loudly
        val ks = if (keys.nonEmpty) keys else t.identifierFieldNames
        val alreadyCommitted =
          t.lastStreamBatchId(checkpoint).exists(batchId <= _)
        if (!alreadyCommitted && !batch.isEmpty) {
          // the blind upsert needs unique keys per batch: older
          // versions inside ONE batch would survive alongside the
          // newest (the eq batch only kills rows from EARLIER
          // sequences), so collapse to newest-per-key first
          val w = Window.partitionBy(ks.map(col): _*)
            .orderBy(orderBy.map(c => col(c).desc): _*)
          val latest = batch.withColumn("_si_rn", row_number().over(w))
            .filter(col("_si_rn") === 1).drop("_si_rn")
          t.upsertMoR(batch.sparkSession, latest, ks,
            streamBatchId = Some(batchId), streamId = Some(checkpoint))
        }
        ()
      }
      .trigger(trigger)
      .start()
}
