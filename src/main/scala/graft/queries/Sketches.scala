package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based near-duplicate / ANN primitives for the LLM-pipeline
  * inventory: MinHash+LSH banding, SimHash, and random-hyperplane LSH.
  * All hash-deterministic (fixed seeds) so repeated runs produce
  * identical output. Every hash in this module is deliberately built
  * from 31-bit polynomial folds (modulus 2^31-1, all intermediates
  * under 2^62): the identical arithmetic runs in DuckDB's plain BIGINT
  * SQL, so the sketch queries get full value-level oracles instead of
  * the rows-only gate a mod-2^64 hash (FNV/xxhash) would force
  * (SURVEY.md §7.8).
  *
  * Scale posture: per-document sketches are tight JVM kernels inside
  * typed mapPartitions — pure narrow maps that scale linearly with
  * input splits; candidate generation groups (band, key) buckets in
  * one shuffle, drops oversized buckets (hard cap), and expands pairs
  * locally per bucket, so a hot bucket can never produce a quadratic
  * pair blowup at 100 TB.
  */
object Sketches {
  val NumPerms = 32
  val BandRows = 2
  val NumBands: Int = NumPerms / BandRows
  // 31-bit hash domain: a*h + b stays under 2^62, so no arithmetic
  // ever overflows a signed long (ANSI mode would throw on wrap).
  val Mask31 = 0x7FFFFFFFL
  /** Buckets larger than this are dropped from pair generation: they
    * are near-useless for dedup (everything matches everything) and
    * are exactly what blows up at scale.
    */
  val MaxBucket = 50

  /** Deterministic permutation parameters (seeded — never wall-clock).
    * Exposed to the query layer so oracle SQL can embed them as
    * literals and recompute the identical signatures in DuckDB. */
  private[queries] val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumPerms)(math.abs(rnd.nextLong()) % Mask31 + 1)
    val b = Array.fill(NumPerms)(math.abs(rnd.nextLong()) % Mask31)
    (a, b)
  }

  /** Word n-gram shingle set (string form — used by the oracle-checked
    * Jaccard query, not the hot minhash path).
    */
  def shingleCol(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  // ---- JVM kernels -----------------------------------------------------
  // The per-document sketch math runs as a tight JVM loop inside a typed
  // mapPartitions (a pure narrow map — the same scale posture as a
  // column expression). Spark's higher-order array functions are
  // interpreted (no whole-stage codegen, no subexpression elimination):
  // a 32-permutation nested-HOF formulation measured 24s for 5000 docs
  // at sf0.1 vs ~0.2s for this kernel.

  /** 31-bit polynomial string hash: fold (h*mult + codeUnit) mod
    * 2^31-1. SQL-portable: DuckDB recomputes it as
    * list_reduce(list_prepend(0, chars), (a,b) -> (a*mult+b) % 2147483647)
    * with no 64-bit wraparound anywhere (h < 2^31, h*mult+c < 2^39).
    */
  def sqlHash31(s: String, mult: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * mult + s.charAt(i)) % Mask31; i += 1 }
    h
  }

  /** 62-bit SQL-portable token hash for SimHash: two independent 31-bit
    * folds (multipliers 131 and 31) packed as (h131 << 32) | h31. Bits
    * 31 and 63 are always zero — SimHash just carries two dead bits.
    */
  def tokenHash62(s: String): Long =
    (sqlHash31(s, 131) << 32) | sqlHash31(s, 31)

  /** Distinct 31-bit hashes of word 4-gram shingles: one hash per
    * token, consecutive token hashes combined with a masked polynomial
    * roll — shingle strings are never materialized.
    */
  def shingleHashLongs(tokens: Array[String]): Array[Long] = {
    if (tokens.length < 4) return Array.empty
    val th = tokens.map(t => sqlHash31(t, 31))
    val out = new Array[Long](tokens.length - 3)
    var i = 0
    while (i < out.length) {
      out(i) = (((((th(i) * 31 + th(i + 1)) & Mask31) * 31 + th(i + 2)) & Mask31) *
        31 + th(i + 3)) & Mask31
      i += 1
    }
    out.distinct
  }

  /** mod 2^31-1 via Mersenne fold (no division). The wraparound is what
    * makes (a*h+b) mod p a usable min-hash permutation — an
    * order-preserving hash would make every permutation pick the same
    * minimum shingle and collapse the signature.
    */
  private def mersenneMod(x: Long): Long = {
    val m1 = (x & Mask31) + (x >>> 31)
    val m2 = (m1 & Mask31) + (m1 >>> 31)
    if (m2 >= Mask31) m2 - Mask31 else m2
  }

  def signatureOf(hs: Array[Long]): Array[Long] = {
    val sig = new Array[Long](NumPerms)
    var i = 0
    while (i < NumPerms) {
      val a = permA(i); val b = permB(i)
      var min = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = mersenneMod(hs(j) * a + b)
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }

  /** MinHash signatures: (idCol, textCol) -> (id, n_shingle_rows,
    * sig: array<long> of NumPerms minima). A narrow typed map — no
    * explode, no shuffle; at 100 TB this is a pure map stage scaling
    * linearly with input splits.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val hs = shingleHashLongs(text.split(" "))
        if (hs.isEmpty) None
        else Some((id, hs.length.toLong, signatureOf(hs)))
      })
      .toDF("id", "n_shingle_rows", "sig")
  }

  /** LSH banding over signatures: (id, sig) -> candidate pairs
    * (a_id, b_id, n_bands, est_jaccard). est_jaccard = fraction of
    * equal signature components.
    */
  def lshCandidatePairs(sigsIn: DataFrame): DataFrame = {
    // Signatures feed three plan branches (bands + both pair sides);
    // materialize once — at scale this is the "signature table" a real
    // pipeline would persist anyway (tiny next to the corpus).
    // localCheckpoint, not persist: its blocks are reclaimed once the
    // result DataFrame is dropped, so repeated calls don't accumulate
    // cached plans in executor storage for the life of the session.
    val sigs = sigsIn.localCheckpoint()
    val bands = sigs.select(col("id"), posexplode(
        array((0 until NumBands).map { b =>
          xxhash64(lit(b), col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1))
        }: _*)).as(Seq("band", "bkey")))
    // Classic LSH pair generation: one shuffle groups ids per bucket,
    // oversized buckets are dropped (bounded pair count at any scale),
    // and pairs expand locally per bucket — no self-join, no window.
    val buckets = bands.groupBy("band", "bkey")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
    val pairsExpr = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
        struct(least(x, y).as("a"), greatest(x, y).as("b")))))
    val pairs = buckets.select(explode(pairsExpr).as("p"))
      .groupBy(col("p.a").as("a_id"), col("p.b").as("b_id"))
      .agg(count(lit(1)).as("n_bands"))
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
    * the sum of (bit j of tokenHash62(token) ? +1 : -1). Bits 31/63
    * are structurally zero (see tokenHash62).
    */
  def simhash64Of(tokens: Array[String]): Long = {
    val counters = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = tokenHash62(tokens(i))
      var j = 0
      while (j < 64) {
        counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 64) { if (counters(j) > 0) sh |= (1L << j); j += 1 }
    sh
  }

  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Same JVM-kernel shape as minhashSignatures: narrow typed map.
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tokens = text.split(" ")
        (id, tokens.length.toLong, simhash64Of(tokens))
      })
      .toDF("id", "n_tokens", "simhash")
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
    val bands = sh.select(
      struct(col("id"), col("simhash")).as("doc"), posexplode(
        array(col("band0"), col("band1"), col("band2"), col("band3"))).as(Seq("band", "bkey")))
    // same bucket-grouped local pair expansion as lshCandidatePairs
    val buckets = bands.groupBy("band", "bkey")
      .agg(sort_array(collect_list(col("doc"))).as("docs"))
      .filter(size(col("docs")).between(2, MaxBucket))
    val pairsExpr = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + 2, size(col("docs"))), y => struct(
        x.getField("id").as("a_id"), y.getField("id").as("b_id"),
        x.getField("simhash").as("a_sh"), y.getField("simhash").as("b_sh")))))
    buckets.select(explode(pairsExpr).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        bit_count(col("p.a_sh").bitwiseXOR(col("p.b_sh"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Seeded-deterministic hyperplane coordinates — exposed so the ANN
    * oracle SQL can embed the identical doubles as literals. */
  private[queries] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH bucket id (numPlanes sign bits) for an
    * array<float> embedding column. Planes are seeded-deterministic.
    */
  def hyperplaneBucket(emb: Column, numPlanes: Int, dim: Int, seed: Long): Column = {
    val planes = hyperplanes(numPlanes, dim, seed)
    (0 until numPlanes).map { p =>
      val planeLit = array(planes(p).map(lit).toSeq: _*)
      val dot = aggregate(
        zip_with(emb, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      shiftleft(when(dot > 0, 1).otherwise(0).cast("long"), p)
    }.reduce(_ + _)
  }
}
