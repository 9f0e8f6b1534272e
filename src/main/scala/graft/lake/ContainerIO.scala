package graft.lake

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, StandardOpenOption}
import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Shared sidecar-container plumbing for the engine's out-of-line blob
  * formats (deletion vectors `.gdv`, bloom filters `.gbf`): one magic
  * header, then back-to-back `[len: int4][payload][crc32: int4]`
  * frames. Blob boundaries live in table metadata — readers seek to
  * (offset, length) and never scan. Factored here so the framing and
  * the CRC/torn-read handling cannot drift between formats.
  */
private[lake] object ContainerIO {

  private def crc(bytes: Array[Byte]): Int = {
    val c = new CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Write one container (CREATE_NEW — containers are immutable);
    * returns each blob's (offset, length) in input order.
    */
  def writeBlobs(path: Path, magic: Array[Byte],
      blobs: Seq[Array[Byte]]): Seq[(Long, Long)] = {
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(path, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE)))
    try {
      out.write(magic)
      var pos: Long = magic.length.toLong
      blobs.map { bytes =>
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeInt(crc(bytes))
        val at = pos
        pos += 4L + bytes.length + 4L
        (at, 4L + bytes.length + 4L)
      }
    } finally out.close()
  }

  /** Read one CRC-checked blob at (offset, length); a torn or
    * mis-addressed read fails loudly (`what` names the format in the
    * error) instead of silently corrupting downstream state.
    */
  def readBlob(path: String, offset: Long, length: Long,
      what: String): Array[Byte] = {
    val ch = FileChannel.open(java.nio.file.Paths.get(path),
      StandardOpenOption.READ)
    try {
      val buf = ByteBuffer.allocate(length.toInt)
      ch.position(offset)
      while (buf.hasRemaining) {
        if (ch.read(buf) < 0)
          throw new java.io.EOFException(
            s"$what blob truncated: $path @$offset+$length")
      }
      buf.flip()
      val len = buf.getInt
      require(len == length - 8,
        s"$what blob length mismatch: $path @$offset declares $len, " +
          s"metadata says ${length - 8}")
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      val expected = buf.getInt
      require(crc(bytes) == expected,
        s"$what blob CRC mismatch: $path @$offset — corrupt blob")
      bytes
    } finally ch.close()
  }
}

/** JVM-wide blob cache, access-ordered LRU bounded by a BYTE budget
  * (not entry count — one format's blobs can be 1 MiB while another's
  * are 100 B, and an entry cap would let the big ones pin gigabytes).
  * Keys are (container path, offset); containers are immutable once
  * written, so entries never invalidate. Loads run OUTSIDE the map
  * lock (two racers may both read the immutable blob — cheaper than
  * serializing file IO); a single blob larger than the whole budget
  * is kept (evicting it would thrash every probe).
  */
private[lake] final class BlobCache[V <: AnyRef](maxBytes: Long,
    sizeOf: V => Long) {
  private val map =
    new java.util.LinkedHashMap[(String, Long), V](64, 0.75f, true)
  private var used = 0L

  def getOrLoad(path: String, offset: Long)(load: => V): V = {
    val key = (path, offset)
    map.synchronized {
      val hit = map.get(key)
      if (hit != null) return hit
    }
    val v = load
    map.synchronized {
      val prev = map.put(key, v)
      used += sizeOf(v) - (if (prev == null) 0L else sizeOf(prev))
      val it = map.entrySet().iterator()
      while (used > maxBytes && it.hasNext) {
        val e = it.next()
        if (e.getKey != key) {
          used -= sizeOf(e.getValue)
          it.remove()
        }
      }
    }
    v
  }
}
