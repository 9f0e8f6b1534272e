package graft.lake

import java.nio.file.Path
import java.nio.ByteBuffer

/** One per-(data file, column) bloom filter blob inside a sidecar
  * container — point-lookup file skipping for columns whose values
  * min/max ranges cannot prune (high-cardinality ids and uuids spread
  * across every file). Parquet's own bloom filters sit in the data
  * footer, which would cost one footer+blob read per file per PLANNING
  * pass; keeping the blobs in an engine container referenced from the
  * manifest entry (Iceberg's Puffin shape) lets the planner probe only
  * candidate files, through the same JVM-wide cache the deletion
  * vectors use. Manifest cost is ~40 bytes per (file, column); the
  * bits live out-of-line.
  *
  * `fieldId` keys the column (rename-proof, like [[ColStats]]).
  * Filters are built over `xxhash64(cast(col AS STRING))` — the cast
  * canonicalizes across int→long promotion, so a filter built before
  * an evolution still answers after it. Probing uses Spark's own
  * XxHash64 on the driver, so build and probe can never disagree.
  */
case class BloomRef(fieldId: Int, path: String, offset: Long,
    length: Long, k: Int)

object BloomFilters {
  val Magic: Array[Byte] = "GBF1".getBytes("UTF-8")

  /** ~9.6 bits/value ≈ 1% false-positive rate at `K` hashes. */
  val BitsPerValue = 10
  val K = 7
  /** Bits bounds: a floor so tiny files stay probe-worthy, a ceiling
    * (1 MiB of bits) so one huge file cannot bloat the container —
    * past it the fpp degrades gracefully instead of the blob growing.
    */
  val MinBits = 1 << 10
  val MaxBits = 1 << 23

  def sizeBits(n: Long): Int = {
    var bits = MinBits
    while (bits < MaxBits && bits.toLong < n * BitsPerValue) bits <<= 1
    bits
  }

  /** Double hashing (Kirsch–Mitzenmacher): k indexes derived from one
    * 64-bit hash; bits is a power of two so the mask replaces a mod.
    */
  private def setOrTest(words: Array[Long], hash: Long, k: Int,
      set: Boolean): Boolean = {
    val mask = (words.length.toLong << 6) - 1
    val h2 = (hash >>> 17) | 1L
    var i = 0
    while (i < k) {
      val idx = ((hash + i * h2) & mask).toInt
      val w = idx >>> 6
      val bit = 1L << (idx & 63)
      if (set) words(w) |= bit
      else if ((words(w) & bit) == 0L) return false
      i += 1
    }
    true
  }

  def add(words: Array[Long], hash: Long, k: Int = K): Unit = {
    setOrTest(words, hash, k, set = true); ()
  }

  def mightContain(words: Array[Long], hash: Long, k: Int): Boolean =
    setOrTest(words, hash, k, set = false)

  def build(hashes: Array[Long], k: Int = K): Array[Long] = {
    val words = new Array[Long](sizeBits(hashes.length.toLong) >>> 6)
    var i = 0
    while (i < hashes.length) { add(words, hashes(i), k); i += 1 }
    words
  }

  def serialize(words: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(words.length * 8)
    words.foreach(buf.putLong)
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = buf.getLong; i += 1 }
    words
  }

  /** Write one container of `[len][words][crc]` blobs (framing shared
    * with every sidecar format — [[ContainerIO]]); returns (offset,
    * length) per blob, in input order. Blob boundaries live in the
    * manifest entry ([[BloomRef]]) — readers seek, never scan.
    */
  def writeContainer(path: Path,
      blobs: Seq[Array[Byte]]): Seq[(Long, Long)] =
    ContainerIO.writeBlobs(path, Magic, blobs)

  def readBlob(path: String, offset: Long, length: Long): Array[Long] =
    deserialize(ContainerIO.readBlob(path, offset, length, "bloom"))

  /** JVM-wide filter cache, byte-budgeted ([[BlobCache]]) — bloom
    * blobs run up to 1 MiB ([[MaxBits]]), so an entry-count cap would
    * let planning pin gigabytes; the byte budget bounds heap no
    * matter the table's file count. A point-lookup plan probes each
    * candidate file once; repeated lookups hit the cache instead of
    * the container.
    */
  private val cache = new BlobCache[Array[Long]](256L << 20,
    words => words.length * 8L)

  def cached(path: String, offset: Long, length: Long): Array[Long] =
    cache.getOrLoad(path, offset)(readBlob(path, offset, length))

  /** Spark's `xxhash64(cast(x AS STRING))` of a driver-side value —
    * the probe MUST hash exactly like the build job's column
    * expression or skipping silently loses rows.
    */
  def hashOf(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)),
      42L) // the SQL function's fixed seed — build and probe must agree
      .eval(null).asInstanceOf[Long]

  /** Only integral and string columns build blooms: their
    * cast-to-string is canonical under every legal type promotion
    * (int→long keeps the rendering; float/double/decimal renderings
    * drift across engines and promotions, so they stay min/max-only).
    */
  def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType => true
    case _ => false
  }
}
