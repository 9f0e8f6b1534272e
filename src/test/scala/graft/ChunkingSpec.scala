package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainingOps

/** Pins the content-defined chunker: chunks tile the input exactly,
  * respect [min, max] bounds, and — the property that makes CDC dedup
  * robust where fixed-stride chunking fails — resynchronize after a
  * prefix insertion, so shifted text still shares most chunk hashes.
  */
class ChunkingSpec extends AnyFunSuite {

  private def bytesOf(n: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((rnd.nextInt(26) + 'a').toByte)
  }

  test("chunks tile the input and respect bounds") {
    for (seed <- 1 to 5; n <- Seq(0, 1, 23, 24, 100, 5000)) {
      val data = bytesOf(n, seed)
      val chunks = TrainingOps.cdcChunks(data)
      assert(chunks.map(_._2).sum == n, s"n=$n seed=$seed: tiling")
      chunks.zipWithIndex.foreach { case ((start, len, _), i) =>
        val expectedStart = chunks.take(i).map(_._2).sum
        assert(start == expectedStart, "contiguous")
        if (i < chunks.length - 1)
          assert(len >= 24 && len <= 256, s"bounds violated: $len")
        else assert(len <= 256)
      }
    }
  }

  test("deterministic across calls") {
    val data = bytesOf(4000, 9L)
    assert(TrainingOps.cdcChunks(data) == TrainingOps.cdcChunks(data))
  }

  test("chunking resynchronizes after a prefix insertion") {
    for (seed <- 1 to 3) {
      val data = bytesOf(8000, seed)
      val shifted = ("INSERTED-PREFIX-" + new String(data, "UTF-8"))
        .getBytes("UTF-8")
      val origHashes = TrainingOps.cdcChunks(data).map(_._3).toSet
      val shiftHashes = TrainingOps.cdcChunks(shifted).map(_._3).toSet
      val shared = (origHashes & shiftHashes).size.toDouble / origHashes.size
      // fixed-stride chunking would share ~0% after a 16-byte shift;
      // CDC must recover the vast majority of chunks
      assert(shared > 0.8, s"seed=$seed: only ${(shared * 100).round}% shared")
    }
  }
}
