package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Pins the DecVector JVM kernel (dec_dot / dec_normsq) to the
  * higher-order-function decimal formulation it replaced
  * (graft.queries.Pipeline.dotDecHof): bit-identical doubles on
  * randomized float vectors, including negatives, large magnitudes,
  * and subnormal-ish values. The HOF chain is the cross-engine
  * oracle-parity spec; the kernel is the fast path — any divergence is
  * a correctness bug, not a tolerance question.
  */
class DecVectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      def v() = Array.fill(dim)((rnd.nextFloat() - 0.5f) *
        (if (rnd.nextInt(10) == 0) 1000.0f else 2.0f))
      (i.toLong, v(), v())
    }.toDF("id", "a", "b")
  }

  test("dec_dot / dec_normsq == decimal-HOF formulation, bit-exact") {
    VectorFunctions.register(spark)
    val df = randomVecs(500, 48, seed = 42L)
    val both = df.select(
      $"id",
      VectorFunctions.dec_dot($"a", $"b").as("k_dot"),
      graft.queries.Pipeline.dotDecHof($"a", $"b").cast("double").as("h_dot"),
      VectorFunctions.dec_normsq($"a").as("k_nsq"),
      graft.queries.Pipeline.normSqDecHof($"a").cast("double").as("h_nsq"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"dot mismatch at id=${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"normsq mismatch at id=${r.getLong(0)}")
    }
  }

  test("dec_dot null semantics match zip_with padding") {
    VectorFunctions.register(spark)
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f), Array(3.0f, 4.0f))) // length mismatch
      .toDF("id", "a", "b")
    val out = df.select($"id", VectorFunctions.dec_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(11.0))
    assert(out(2L).isEmpty, "length mismatch must yield null like zip_with null-padding")
  }
}
