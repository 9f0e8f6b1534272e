package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Sketches

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docANear = "the quick brown fox jumps over the lazy dog again and again tomorrow"
  private val docB = "completely different words about database engines and query planners here now"

  test("minhash: identical texts get identical signatures") {
    val df = Seq((1L, docA), (2L, docA), (3L, docB)).toDF("doc_id", "text")
    val sigs = Sketches.minhashSignatures(df, "doc_id", "text")
      .select($"id", $"sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).size == Sketches.NumPerms)
  }

  test("lsh: exact duplicates are candidate pairs with est_jaccard 1.0") {
    val df = Seq((1L, docA), (2L, docA), (3L, docB)).toDF("doc_id", "text")
    val pairs = Sketches.lshCandidatePairs(
      Sketches.minhashSignatures(df, "doc_id", "text")).collect()
    val dup = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(dup.isDefined, "exact duplicate pair must be a candidate")
    assert(dup.get.getAs[Double]("est_jaccard") == 1.0)
    assert(!pairs.exists(r => r.getLong(1) == 3L && r.getAs[Double]("est_jaccard") > 0.9))
  }

  test("lsh: near-duplicates collide, estimate tracks true jaccard") {
    val df = Seq((1L, docA), (2L, docANear), (3L, docB)).toDF("doc_id", "text")
    val pairs = Sketches.lshCandidatePairs(
      Sketches.minhashSignatures(df, "doc_id", "text")).collect()
    val near = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(near.isDefined, "one-word-changed doc must be a candidate")
    assert(near.get.getAs[Double]("est_jaccard") > 0.5)
  }

  test("minhash is deterministic across runs") {
    val df = Seq((1L, docA)).toDF("doc_id", "text")
    val s1 = Sketches.minhashSignatures(df, "doc_id", "text")
      .select($"sig").head().getSeq[Long](0)
    val s2 = Sketches.minhashSignatures(df, "doc_id", "text")
      .select($"sig").head().getSeq[Long](0)
    assert(s1 == s2)
  }

  test("simhash: identical texts equal, near texts close, far texts far") {
    val df = Seq((1L, docA), (2L, docA), (3L, docANear), (4L, docB))
      .toDF("doc_id", "text")
    val sh = Sketches.simhash64(df, "doc_id", "text")
      .select($"id", $"simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)),
      s"near doc should be closer: ${hamming(sh(1L), sh(3L))} vs ${hamming(sh(1L), sh(4L))}")
  }

  test("simhash pairs: identical docs at hamming 0, banding finds them") {
    val df = Seq((1L, docA), (2L, docA), (3L, docB)).toDF("doc_id", "text")
    val pairs = Sketches.simhashPairs(
      Sketches.simhash64(df, "doc_id", "text"), maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getAs[Int]("hamming") == 0))
  }

  test("hyperplane bucket: deterministic and within range") {
    val df = Seq(
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val b = df.withColumn("bucket",
        Sketches.hyperplaneBucket(col("embedding"), numPlanes = 4, dim = 8, seed = 7L))
      .select($"vec_id", $"bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L), "identical vectors share a bucket")
    assert(b(1L) == (~b(3L) & 0xFL), "negated vector flips every sign bit")
    assert(b.values.forall(v => v >= 0 && v < 16))
  }

  test("MinHashSetAggregator: group sketch equals sketch of the union") {
    import org.apache.spark.sql.functions.udaf
    val minhashUnion = udaf(graft.functions.MinHashSetAggregator)
    // two docs in one group; union sketch must equal component-wise min
    val df = Seq((1L, docA, "g1"), (2L, docB, "g1"), (3L, docA, "g2"))
      .toDF("doc_id", "text", "grp")
    val sigs = Sketches.minhashSignatures(df, "doc_id", "text")
      .join(df.select(col("doc_id").as("id"), col("grp")), "id")
    val grouped = sigs.groupBy("grp").agg(minhashUnion(col("sig")).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val perDoc = Sketches.minhashSignatures(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
    val expectedG1 = perDoc(1L).zip(perDoc(2L)).map { case (x, y) => math.min(x, y) }
    assert(grouped("g1") == expectedG1)
    assert(grouped("g2") == perDoc(3L))
  }
}
