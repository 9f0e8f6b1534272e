package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, VectorFunctions}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(3.0f, 4.0f, 0.5f)),
    (2L, Array(1.0f, 1.0f, 1.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)))
    .toDF("id", "a", "b")

  test("float_dot: exact values, null propagation, codegen path") {
    VectorFunctions.register(spark)
    val out = vecs.select($"id", VectorFunctions.float_dot($"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0 * 3.0 + 0.0 * 4.0 + 2.0 * 0.5)
    assert(out(2L) == 3.0)
    assert(out(3L) == 0.0)
    val withNull = vecs.select(VectorFunctions.float_dot(
      when($"id" === 1L, $"a"), $"b").as("d")).collect()
    assert(withNull.count(_.isNullAt(0)) == 3)
  }

  test("float_cosine: identity=1, orthogonal=0, zero-vector=0") {
    VectorFunctions.register(spark)
    val out = vecs.select($"id", VectorFunctions.float_cosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.0)
  }

  test("float_cosine matches the decimal-accumulated oracle formulation") {
    VectorFunctions.register(spark)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    val fast = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(probe))
      .select($"vec_id",
        VectorFunctions.float_cosine($"embedding", $"p").as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oracle = graft.SparkEntry.queries("q_sim_topk")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    // the decimal formulation is exact; IEEE-order accumulation must agree
    // to ~1e-9 relative
    oracle.foreach { case (id, c) =>
      assert(math.abs(fast(id) - c) < 1e-9, s"vec $id: ${fast(id)} vs $c")
    }
  }

  test("GraftExtensions registers functions for SQL in a fresh session") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0)
      assert(r == 11.0)
    } finally {
      // keep the shared test session; this one was an extra handle
    }
  }
}
