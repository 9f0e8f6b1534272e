package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r17 token_stats kernel must be value-identical to the
  * higher-order-function chain it replaced in q_quality_repetition /
  * q_curriculum (kept in CurationOps as the semantic spec, the
  * dotDecHof precedent): sizes, array_distinct over tokens AND over
  * concat-built bigrams, and the sorted-run top-token count — across
  * random corpora including nulls, empty arrays, empty-string tokens,
  * and duplicate-heavy rows.
  */
class TokenStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomRows(seed: Long, n: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "ab", "a b", "", "zz", "q1", "Q1")
    (0 until n).map { _ =>
      val len = rnd.nextInt(12)
      (0 until len).map { _ =>
        if (rnd.nextInt(20) == 0) null
        else vocab(rnd.nextInt(vocab.size))
      }
    }
  }

  test("kernel matches the HOF chain on random token arrays") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val rows = randomRows(42L, 400) ++ Seq(
      Seq.empty[String],                    // empty array
      Seq("x"),                             // single token, no bigrams
      Seq(null, null, null),                // all-null (top = 1)
      Seq("t", "t", "t", "t"),              // one run
      Seq("", "", "a"))                     // empty-string tokens
    val df = rows.toDF("l")
    val l = col("l")
    val hof = df.select(
      size(l).as("n_tokens"),
      size(array_distinct(l)).as("n_distinct_tokens"),
      size(graft.queries.CurationOps.bgExpr(l)).as("n_bigrams"),
      size(array_distinct(graft.queries.CurationOps.bgExpr(l)))
        .as("n_distinct_bigrams"),
      graft.queries.CurationOps.topTokenCount(l).as("top_cnt"))
      .collect().toSeq.map(_.toString)
    val kernel = df.select(
      graft.functions.VectorFunctions.token_stats(l).as("st"))
      .select(col("st.n_tokens"), col("st.n_distinct_tokens"),
        col("st.n_bigrams"), col("st.n_distinct_bigrams"),
        col("st.top_cnt"))
      .collect().toSeq.map(_.toString)
    assert(kernel === hof)
  }

  test("null array yields a null struct (size-of-null parity)") {
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Tuple1(null: Seq[String])).toDF("l")
    val r = df.select(
      graft.functions.VectorFunctions.token_stats(col("l")).as("st"))
      .select(col("st.n_tokens")).collect()(0)
    assert(r.isNullAt(0))
  }
}
