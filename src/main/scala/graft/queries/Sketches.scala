package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate / ANN primitives for the LLM-pipeline
  * inventory: MinHash+LSH banding, SimHash, and random-hyperplane LSH.
  * All hash-deterministic (fixed seeds, xxhash64 with Spark's default
  * seed) so repeated runs produce identical output; not expressible in
  * portable SQL, so these are verified by ScalaTest specs instead of
  * the DuckDB oracle (SURVEY.md §7.8 ✖ class).
  *
  * Scale posture: signatures are computed with partial aggregation
  * after an explode (shuffle carries (id, shingle-hash) pairs, then
  * 64 min-aggregates combine map-side); candidate generation joins on
  * (band, key) buckets with a hard bucket-size cap so a hot bucket
  * can never produce a quadratic pair blowup at 100 TB.
  */
object Sketches {
  val NumPerms = 64
  val BandRows = 2
  val NumBands: Int = NumPerms / BandRows
  // 31-bit hash domain: a*h + b stays under 2^62, so the modular
  // permutation never overflows a signed long (ANSI mode would throw).
  val MersennePrime = 2147483647L // 2^31 - 1
  /** Buckets larger than this are dropped from pair generation: they
    * are near-useless for dedup (everything matches everything) and
    * are exactly what blows up at scale.
    */
  val MaxBucket = 50

  /** Deterministic permutation parameters (seeded — never wall-clock). */
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumPerms)(math.abs(rnd.nextLong()) % MersennePrime + 1)
    val b = Array.fill(NumPerms)(math.abs(rnd.nextLong()) % MersennePrime)
    (a, b)
  }

  /** Word n-gram shingle set. */
  def shingleCol(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signatures: input (idCol, textCol) -> (id, n_shingles,
    * sig: array<long> of NumPerms minima). Explode + partial min
    * aggregation — one shuffle keyed by id.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingleCol(split(col(textCol), " "), 4).as("sh"))
    val exploded = sh.select(col("id"), explode(col("sh")).as("shingle"))
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MersennePrime)))
    val minExprs = (0 until NumPerms).map { i =>
      min(pmod(col("h") * lit(permA(i)) + lit(permB(i)),
        lit(MersennePrime))).as(s"m$i")
    }
    exploded.groupBy("id")
      .agg(count(lit(1)).as("n_shingle_rows"), minExprs: _*)
      .select(col("id"), col("n_shingle_rows"),
        array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding over signatures: (id, sig) -> candidate pairs
    * (a_id, b_id, n_bands, est_jaccard). est_jaccard = fraction of
    * equal signature components.
    */
  def lshCandidatePairs(sigs: DataFrame): DataFrame = {
    val bands = sigs.select(col("id"), posexplode(
        array((0 until NumBands).map { b =>
          xxhash64(lit(b), col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1))
        }: _*)).as(Seq("band", "bkey")))
    // Cap hot buckets before pairing (bounded pair count at any scale).
    val withSize = bands
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("bsz") <= MaxBucket)
    val l = withSize.select(col("band"), col("bkey"), col("id").as("a_id"))
    val r = withSize.select(col("band"), col("bkey"), col("id").as("b_id"))
    val pairs = l.join(r, Seq("band", "bkey")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_bands"))
    val sa = sigs.select(col("id").as("a_id"), col("sig").as("a_sig"))
    val sb = sigs.select(col("id").as("b_id"), col("sig").as("b_sig"))
    pairs.join(sa, "a_id").join(sb, "b_id")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") / NumPerms)
      .select("a_id", "b_id", "n_bands", "est_jaccard")
  }

  /** 64-bit SimHash over whitespace tokens (all occurrences, weight 1).
    * One explode + 64 sign-sums per id; simhash bit j is the sign of
    * the sum of (bit j of xxhash64(token) ? +1 : -1).
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val sumExprs = (0 until 64).map { j =>
      sum(shiftrightunsigned(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"s$j")
    }
    val agg = toks.groupBy("id").agg(count(lit(1)).as("n_tokens"), sumExprs: _*)
    val hashExpr = (0 until 64).map { j =>
      shiftleft(when(col(s"s$j") > 0, 1L).otherwise(0L), j)
    }.reduce(_ + _)
    agg.select(col("id"), col("n_tokens"), hashExpr.as("simhash"))
      .withColumn("band0", shiftrightunsigned(col("simhash"), 0).bitwiseAND(0xFFFFL))
      .withColumn("band1", shiftrightunsigned(col("simhash"), 16).bitwiseAND(0xFFFFL))
      .withColumn("band2", shiftrightunsigned(col("simhash"), 32).bitwiseAND(0xFFFFL))
      .withColumn("band3", shiftrightunsigned(col("simhash"), 48).bitwiseAND(0xFFFFL))
  }

  /** SimHash near-dup pairs: band on the four 16-bit chunks (any pair
    * with hamming distance <= 3 shares at least one chunk by
    * pigeonhole), then filter by exact hamming distance.
    */
  def simhashPairs(sh: DataFrame, maxHamming: Int): DataFrame = {
    val bands = sh.select(col("id"), col("simhash"), posexplode(
      array(col("band0"), col("band1"), col("band2"), col("band3"))).as(Seq("band", "bkey")))
    val withSize = bands
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .filter(col("bsz") <= MaxBucket)
    val l = withSize.select(col("band"), col("bkey"),
      col("id").as("a_id"), col("simhash").as("a_sh"))
    val r = withSize.select(col("band"), col("bkey"),
      col("id").as("b_id"), col("simhash").as("b_sh"))
    l.join(r, Seq("band", "bkey")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Random-hyperplane LSH bucket id (numPlanes sign bits) for an
    * array<float> embedding column. Planes are seeded-deterministic.
    */
  def hyperplaneBucket(emb: Column, numPlanes: Int, dim: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(numPlanes, dim)(rnd.nextGaussian())
    (0 until numPlanes).map { p =>
      val planeLit = array(planes(p).map(lit).toSeq: _*)
      val dot = aggregate(
        zip_with(emb, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      shiftleft(when(dot > 0, 1).otherwise(0).cast("long"), p)
    }.reduce(_ + _)
  }
}
