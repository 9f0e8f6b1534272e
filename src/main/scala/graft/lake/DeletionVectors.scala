package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.nio.ByteBuffer
import java.util.zip.CRC32

import org.roaringbitmap.longlong.Roaring64Bitmap

/** One live deletion vector: the deleted row positions of a single data
  * file as a 64-bit Roaring bitmap blob inside a container file
  * (Iceberg v3's DV model — one vector per data file, a new vector
  * REPLACES the old one rather than accumulating delete files, see the
  * v3 spec's "deletion vectors" section; the reference repo itself has
  * no delete surface at all, `iceberg_helper.py` writes append-only).
  *
  * `dataPath` is the data file whose positions are deleted (stored
  * normalized). `dvPath`+`offset`+`length` locate the FULL bitmap blob
  * (every deleted position, merged at write time). `cardinality` is
  * its exact bit count — metadata-only COUNT(*) stays exact without
  * opening the blob. `deltaOffset`+`deltaLength` locate a second blob
  * holding only the positions NEWLY deleted by the committing
  * snapshot; the changelog reads that delta directly instead of
  * reconstructing new-minus-previous from two full vectors (a Graft
  * extension over the Iceberg layout — the full blob serves reads, the
  * delta serves CDC, both written once while the writer holds them).
  */
case class DvMeta(dataPath: String, dvPath: String,
    offset: Long, length: Long, cardinality: Long,
    deltaOffset: Long, deltaLength: Long)

/** Container-file IO for deletion vectors.
  *
  * Layout: 4-byte magic "GDV1", then back-to-back blobs; each blob is
  * `[len: int4][bitmap: len bytes][crc32(bitmap): int4]` with the
  * bitmap in Roaring64Bitmap's native serialization. Blob boundaries
  * live in table metadata ([[DvMeta]]), not the container — same
  * contract as Iceberg's Puffin: readers seek straight to
  * (offset, length) and never scan the file.
  */
object DeletionVectors {
  val Magic: Array[Byte] = "GDV1".getBytes("UTF-8")

  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  private def crc(bytes: Array[Byte]): Int = {
    val c = new CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Write one container holding, per affected data file, the full
    * merged vector and the newly-deleted delta vector. Returns the
    * [[DvMeta]] entries to commit. `blobs` maps the NORMALIZED data
    * path to (full, delta).
    */
  def writeContainer(path: Path,
      blobs: Seq[(String, (Roaring64Bitmap, Roaring64Bitmap))]): Seq[DvMeta] = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(path, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE)))
    try {
      out.write(Magic)
      var pos: Long = Magic.length.toLong
      blobs.map { case (dataPath, (full, delta)) =>
        def putBlob(bm: Roaring64Bitmap): (Long, Long) = {
          val bytes = serialize(bm)
          out.writeInt(bytes.length)
          out.write(bytes)
          out.writeInt(crc(bytes))
          val at = pos
          pos += 4L + bytes.length + 4L
          (at, 4L + bytes.length + 4L)
        }
        val (fOff, fLen) = putBlob(full)
        val (dOff, dLen) = putBlob(delta)
        DvMeta(dataPath, path.toString, fOff, fLen, full.getLongCardinality,
          dOff, dLen)
      }
    } finally out.close()
  }

  /** Read one blob at (offset, length); verifies the CRC so a torn or
    * mis-addressed read fails loudly instead of silently resurrecting
    * rows.
    */
  def readBlob(dvPath: String, offset: Long, length: Long): Roaring64Bitmap = {
    val ch = FileChannel.open(java.nio.file.Paths.get(dvPath),
      StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(length.toInt)
      ch.position(offset)
      while (buf.hasRemaining) {
        if (ch.read(buf) < 0)
          throw new java.io.EOFException(
            s"deletion vector truncated: $dvPath @$offset+$length")
      }
      buf.flip()
      val len = buf.getInt
      require(len == length - 8,
        s"deletion vector blob length mismatch: $dvPath @$offset " +
          s"declares $len, metadata says ${length - 8}")
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      val expected = buf.getInt
      require(crc(bytes) == expected,
        s"deletion vector CRC mismatch: $dvPath @$offset — corrupt blob")
      deserialize(bytes)
    } finally ch.close()
  }

  /** Process-wide cache of deserialized vectors, keyed by
    * (container path, offset). Containers are immutable once written
    * (CREATE_NEW) so entries never invalidate; bounded as an
    * access-ordered LRU — past the cap only the coldest entry falls
    * out, so a scan cycling through more files than the cap degrades
    * to re-reads of its own working set instead of wiping every
    * other scan's entries wholesale. Executors on a real cluster read
    * the container from shared storage exactly like a parquet footer.
    * The map-level lock is off the row path: [[graft.functions.DvLookup]]
    * holds a per-thread last-file slot, so this is hit once per file
    * change per task, not per row.
    */
  private val cacheCap = 4096
  private val cache: java.util.Map[(String, Long), Roaring64Bitmap] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long), Roaring64Bitmap](
          64, 0.75f, /* accessOrder = */ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long), Roaring64Bitmap]): Boolean =
          size() > cacheCap
      })

  def cached(dvPath: String, offset: Long, length: Long): Roaring64Bitmap = {
    val key = (dvPath, offset)
    val hit = cache.get(key)
    if (hit != null) return hit
    // two racing threads may both read the blob; both get the same
    // immutable content, last put wins — cheaper than holding the map
    // lock across file IO
    val bm = readBlob(dvPath, offset, length)
    cache.put(key, bm)
    bm
  }
}
