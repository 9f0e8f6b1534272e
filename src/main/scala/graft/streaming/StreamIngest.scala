package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.LakeTable

/** Structured-Streaming ingestion into a lake table: each micro-batch
  * is schema-aligned and committed as one snapshot (exactly-once at the
  * snapshot level via the streaming checkpoint). The table is reloaded
  * per batch so concurrent schema evolution applies from the next
  * micro-batch on — a stream keeps running across an ALTER TABLE.
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
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          LakeTable.load(warehouse, db, table).append(batch)
        }
        ()
      }
      .trigger(trigger)
      .start()
}
