package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads are opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as partition-
  * local batch operators (`mapPartitions` — the Scala analogue of
  * `mapInPandas` batch UDFs).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from
  * the payload bytes. Everything around it — schema, encoders, batch
  * iteration shape, partition preservation — is the real plumbing a
  * codec would drop into.
  *
  * Scale posture: payloads never shuffle for feature extraction (all
  * ops are narrow, partition-local); only extracted features (small,
  * fixed-width) flow into downstream joins/aggregations.
  */
object Multimodal {

  /** Metadata carried next to every opaque payload. */
  val metaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Wrap a text column as an opaque media payload + metadata struct
    * (the shape image/audio ingestion would produce). The fake
    * width/height are carved out of a polynomial rolling fingerprint
    * of the content (the same mod-1e9+7 fold as q_text_fingerprint) —
    * content-derived like a real decoder's metadata, and recomputable
    * in plain SQL so the decode pipeline sits under the DuckDB oracle.
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("media_id"),
        col(textCol).as("__txt"),
        aggregate(
          transform(split(col(textCol), ""), c => ascii(c)),
          lit(0L),
          (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("__fp"))
      .select(
        col("media_id"),
        encode(col("__txt"), "UTF-8").as("payload"),
        struct(
          lit("fake/rgb8").as("format"),
          (col("__fp") % 1024 + 32).cast("int").as("width"),
          (expr("__fp div 1024") % 1024 + 32).cast("int").as("height"),
          length(encode(col("__txt"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: a real implementation would decode image bytes;
    * this derives `dim` deterministic float features by bucketing
    * payload bytes. Runs batch-at-a-time per partition — the exact
    * seam where a native codec (JNI / Arrow batch) would plug in.
    */
  def decodeFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // Batch seam: a native codec would decode each payload here.
        iter.map { case (id, bytes) =>
          val acc = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            acc(i % dim) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
          (id, acc)
        }
      }
      .toDF("media_id", "features")
  }

  /** STUB resize: updates metadata only (a codec would re-encode the
    * payload); payload passes through untouched.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      lit(w).as("width"),
      lit(h).as("height"),
      col("meta.n_bytes").as("n_bytes")))

  /** STUB frame sampling: treats the payload as a "video" and emits
    * every k-th fixed-size slice as a frame row (media_id, frame_no,
    * frame binary). posexplode keeps it a narrow op.
    */
  def frameSample(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val nFrames = floor(col("meta.n_bytes") / frameBytes).cast("int")
    media.select(col("media_id"), col("payload"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), posexplode(
        transform(sequence(lit(0), col("n_frames") - 1, lit(everyK)),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_no", "frame")))
  }
}
