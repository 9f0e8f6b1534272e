package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based LLM-pipeline queries (MinHash+LSH, SimHash,
  * hyperplane-LSH ANN). Every hash in graft.queries.Sketches is a
  * 31-bit polynomial fold chosen so the identical arithmetic runs in
  * DuckDB BIGINT SQL — the oracle SQL below is GENERATED from the same
  * constants (permutation parameters, hyperplane coordinates, band
  * counts) the Scala kernels use, so these queries sit under the full
  * value-level DuckDB gate as well as graft.SketchesSpec.
  */
object PipelineSketches extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash" -> ((s, dir) => {
      // Per-document MinHash signature summary (full signatures feed
      // q_dedup_lsh_pairs); first four components exposed as columns.
      val sigs = Sketches.minhashSignatures(
        Tables(s, dir, "documents"), "doc_id", "text")
      sigs.select(col("id").as("doc_id"), col("n_shingle_rows"),
          col("sig").getItem(0).as("sig0"), col("sig").getItem(1).as("sig1"),
          col("sig").getItem(2).as("sig2"), col("sig").getItem(3).as("sig3"))
        .orderBy("doc_id")
    }),

    "q_dedup_lsh_pairs" -> ((s, dir) => {
      val sigs = Sketches.minhashSignatures(
        Tables(s, dir, "documents"), "doc_id", "text")
      Sketches.lshCandidatePairs(sigs)
        .orderBy("a_id", "b_id")
    }),

    "q_dedup_simhash" -> ((s, dir) => {
      Sketches.simhash64(Tables(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("simhash"),
          col("band0"), col("band1"), col("band2"), col("band3"))
        .orderBy("doc_id")
    }),

    "q_dedup_simhash_pairs" -> ((s, dir) => {
      val sh = Sketches.simhash64(Tables(s, dir, "documents"), "doc_id", "text")
      Sketches.simhashPairs(sh, maxHamming = 16)
        .orderBy("a_id", "b_id")
    }),

    "q_dedup_source_sketch" -> ((s, dir) => {
      // Group-level MinHash via the custom Aggregator (udaf): one
      // signature per source = sketch of the union of its shingle sets
      // (combines map-side, NumPerms longs per group on the wire), then
      // pairwise est-Jaccard between sources — whole-corpus overlap
      // without ever comparing documents.
      import org.apache.spark.sql.functions.udaf
      val minhashUnion = udaf(graft.functions.MinHashSetAggregator)
      val sigs = Sketches.minhashSignatures(
        Tables(s, dir, "documents"), "doc_id", "text")
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val perSource = sigs.join(docs, col("id") === col("doc_id"))
        .groupBy("source")
        .agg(minhashUnion(col("sig")).as("src_sig"),
          count(lit(1)).as("n_docs"))
      val a = perSource.select(col("source").as("a_src"),
        col("src_sig").as("a_sig"), col("n_docs").as("a_docs"))
      val b = perSource.select(col("source").as("b_src"),
        col("src_sig").as("b_sig"))
      // pairwise over AGGREGATED sources (sources ≪ docs): broadcast
      // the probe side so the non-equi pair join never plans a
      // two-sided CartesianProduct
      a.join(broadcast(b), col("a_src") < col("b_src"))
        .select(col("a_src"), col("b_src"), col("a_docs"),
          (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) =>
            when(x === y, 1).otherwise(0)), v => v === 1)).cast("double") /
            Sketches.NumPerms).as("est_jaccard"))
        .orderBy("a_src", "b_src")
    }),

    "q_multimodal_decode" -> ((s, dir) => {
      // Opaque-binary decode pipeline (stubbed codec): text payloads ->
      // media table (payload + typed metadata) -> partition-local batch
      // feature extraction -> features joined back to metadata.
      import graft.multimodal.Multimodal
      val media = Multimodal.asMediaTable(
        Tables(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.decodeFeatures(media, dim = 8)
      media.join(feats, "media_id")
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"),
          element_at(col("features"), 1).as("f0"),
          size(col("features")).as("f_dim"))
        .orderBy("media_id")
    }),

    "q_sim_topk_fast" -> ((s, dir) => {
      // Brute-force cosine top-k through the native codegen'd
      // FloatCosine kernel — the actual hot path at scale. The float
      // kernel ranks the whole corpus in one scan; a 5x candidate
      // margin absorbs float-vs-decimal rounding at the cutoff (a true
      // 10th/11th near-tie inside float epsilon could otherwise admit
      // the wrong member), then only the candidates get the
      // decimal-exact re-score and the final top-10 cut — so the output
      // is value-identical to q_sim_topk (they share one DuckDB oracle)
      // while the scan cost stays pure float codegen.
      import graft.functions.VectorFunctions
      VectorFunctions.register(s)
      val e = Tables(s, dir, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"))
      val top = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .withColumn("fcos",
          VectorFunctions.float_cosine(col("embedding"), col("p_emb")))
        .orderBy(col("fcos").desc, col("vec_id"))
        .limit(50)
      val rescored = top.withColumn("cos",
        VectorFunctions.dec_dot(col("embedding"), col("p_emb")).cast("double") /
          (sqrt(VectorFunctions.dec_normsq(col("embedding")).cast("double")) *
           sqrt(VectorFunctions.dec_normsq(col("p_emb")).cast("double"))))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))
      rescored.select(col("vec_id"), col("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10).orderBy("rank")
    }),

    "q_sim_ann_lsh" -> ((s, dir) => {
      // Hyperplane-LSH ANN with a CORPUS-ADAPTIVE signature width (r17
      // — the r16 sf1 lane caught the fixed 6-bit signature going
      // superlinear: bucket occupancy grows linearly with n, so the
      // hamming≤1 multi-probe candidate set did too). B = smallest bits
      // in [6,24] with TargetOccupancy·2^B ≥ n holds expected occupancy
      // ~constant, so a probe examines ~occupancy·(B+1) candidates at
      // ANY corpus size; the formula is integer-only comparisons so the
      // DuckDB oracle derives the identical B from its own count(*),
      // and the seeded plane stream is PREFIX-STABLE in B (plane p's
      // coordinates never depend on how many planes follow), so the
      // oracle embeds the max-width plane matrix and evaluates the
      // first B rows. At 100 TB the corpus is stored bucket-partitioned
      // so a probe touches ~(B+1)/2^B of the data. A candidates-
      // examined budget rides the same pass (observe — no second scan)
      // and refuses loudly past the cap: a degenerate corpus that all
      // collides into one bucket cannot be fixed by signature width,
      // and silently returning a brute-force-priced "ANN" answer would
      // hide it.
      val e0 = Tables(s, dir, "embeddings")
      val n = e0.count()
      val numPlanes = annLshPlanes(n)
      val e = e0.withColumn("bucket",
        Sketches.hyperplaneBucket(col("embedding"), numPlanes, 64, seed = 7L))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"), col("bucket").as("p_bucket"))
      val obs = org.apache.spark.sql.Observation()
      val cands = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .filter(bit_count(col("bucket").bitwiseXOR(col("p_bucket"))) <= 1)
        .observe(obs, count(lit(1)).as("n_cands"))
      val D2812 = org.apache.spark.sql.types.DecimalType(28, 12)
      val DAcc = org.apache.spark.sql.types.DecimalType(37, 12)
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) =>
            (x.cast("double") * y.cast("double")).cast(D2812)),
          lit(0).cast(DAcc), (acc, v) => (acc + v).cast(DAcc))
      val top = cands
        .withColumn("cos", dot(col("embedding"), col("p_emb")).cast("double") /
          (sqrt(dot(col("embedding"), col("embedding")).cast("double")) *
           sqrt(dot(col("p_emb"), col("p_emb")).cast("double"))))
        .select(col("vec_id"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))
      val out = top.withColumn("rank", row_number().over(w))
        .orderBy("rank").collect()
      val nCands = obs.get("n_cands").asInstanceOf[Long]
      if (nCands > AnnLshCandidateBudget)
        throw new IllegalStateException(
          s"q_sim_ann_lsh: candidate budget exceeded — the hamming<=1 " +
            s"probe examined $nCands of $n vectors (budget " +
            s"$AnnLshCandidateBudget at B=$numPlanes bits); the corpus " +
            "collides into too few buckets for hyperplane LSH — " +
            "re-index with a different seed or use the IVF path " +
            "instead of running a brute-force-priced probe")
      import s.implicits._
      // null-safe cosine: a zero-norm embedding divides to NULL in
      // non-ANSI mode and must pass through like the pre-localize
      // DataFrame form did, not NPE on getDouble (review-found r17)
      out.toSeq.map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getInt(2)))
        .toDF("vec_id", "cos", "rank").orderBy("rank")
    }),
  )

  /** Corpus-adaptive hyperplane count for the ANN signature: the
    * smallest B in [6, [[AnnLshMaxPlanes]]] with
    * [[AnnLshTargetOccupancy]]·2^B ≥ n — expected bucket occupancy
    * stays ≤ the target as the corpus grows (bits ~ log n), so the
    * multi-probe candidate set stays ~constant. Integer comparisons
    * only: the DuckDB oracle mirrors this exact search over
    * range(6, 25), and float log2 rounding at power-of-two corpus
    * sizes can never diverge the two engines.
    */
  private[queries] def annLshPlanes(n: Long): Int =
    (6 to AnnLshMaxPlanes).find(b => (AnnLshTargetOccupancy << b) >= n)
      .getOrElse(AnnLshMaxPlanes)

  private[queries] val AnnLshTargetOccupancy = 64L
  private[queries] val AnnLshMaxPlanes = 24

  /** Loud-refusal cap on candidates a single ANN probe may examine —
    * ~40× the expected occupancy·(B+1) ceiling, so only a genuinely
    * degenerate bucket distribution trips it. */
  private[queries] val AnnLshCandidateBudget = 65536L

  // ---- generated oracle SQL -------------------------------------------
  // Built from the SAME constants the Scala kernels use (Sketches.permA/
  // permB, the hyperplane coordinates, band/bucket sizes), so a drift in
  // either side fails the driver's hash compare.

  private val M31 = "2147483647" // 2^31 - 1, the shared hash modulus

  /** 31-bit polynomial fold of a token's characters (mirror of
    * Sketches.sqlHash31): list_prepend supplies the explicit 0 seed so
    * empty tokens fold to 0 instead of erroring.
    */
  private def hash31Sql(tokVar: String, mult: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($tokVar,''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a,b) -> (a*$mult+b) % $M31)"

  /** Per-doc token-hash list CTE body (mirror of tokens.map(sqlHash31)). */
  private def tokenHashListSql(mult: Int): String =
    s"list_transform(string_split(text,' '), t -> ${hash31Sql("t", mult)})"

  /** Distinct word-4-gram shingle hashes from the token-hash list `th`
    * (mirror of Sketches.shingleHashLongs' masked polynomial roll).
    */
  private def shingleExprSql: String = {
    val s1 = s"((th[i]*31 + th[i+1]) & $M31)"
    val s2 = s"(($s1*31 + th[i+2]) & $M31)"
    val s3 = s"(($s2*31 + th[i+3]) & $M31)"
    "CASE WHEN len(th) >= 4 THEN " +
      s"list_distinct(list_transform(range(1, len(th)-2), i -> $s3)) " +
      "ELSE [] END"
  }

  /** MinHash component k over the shingle list `sh` (mirror of
    * Sketches.signatureOf: min of (h*a_k + b_k) mod 2^31-1).
    */
  private def sigComponentSql(k: Int): String =
    s"list_min(list_transform(sh, h -> (h*${Sketches.permA(k)} + ${Sketches.permB(k)}) % $M31))"

  private def minhashCtes: String =
    s"""WITH th AS (
       |  SELECT doc_id, ${tokenHashListSql(31)} AS th FROM documents),
       |shs AS (
       |  SELECT doc_id, sh FROM (
       |    SELECT doc_id, $shingleExprSql AS sh FROM th)
       |  WHERE len(sh) > 0)""".stripMargin

  private def sigListSql: String =
    (0 until Sketches.NumPerms).map(sigComponentSql).mkString("[", ", ", "]")

  /** SimHash bit-sum (mirror of Sketches.simhash64Of over tokenHash62:
    * bit j set iff strictly more than half the tokens have bit j set;
    * bits 0..30 come from the mult-31 fold, bits 32..62 from the
    * mult-131 fold, bits 31/63 structurally zero).
    */
  private def simhashSumSql: String = {
    def terms(listCol: String, shift: Int) = (0 to 30).map { j =>
      s"(CASE WHEN 2*len(list_filter($listCol, h -> ((h >> $j) & 1) = 1)) > n_tokens " +
        s"THEN (CAST(1 AS BIGINT) << ${j + shift}) ELSE CAST(0 AS BIGINT) END)"
    }
    (terms("h1", 0) ++ terms("h2", 32)).mkString(" + ")
  }

  private def simhashCtes: String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
       |    ${tokenHashListSql(31)} AS h1,
       |    ${tokenHashListSql(131)} AS h2
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, n_tokens, ($simhashSumSql) AS simhash FROM tok)""".stripMargin

  /** Adaptive-width bucketing CTEs (mirror of `annLshPlanes` +
    * `hyperplaneBucket`): the full [[AnnLshMaxPlanes]]-row plane matrix
    * rides as a VALUES relation (the seeded stream is prefix-stable, so
    * row p is identical at any width), each (vector, plane ≤ nb) pair
    * computes one sign bit with the same left-fold double accumulation
    * as `Sketches.hyperplaneBucket`, and a group-by sums the disjoint
    * powers of two back into the bucket id. Set-based on purpose: the
    * first r17 form indexed a 24×64 nested list LITERAL inside a
    * per-element lambda, which DuckDB re-evaluates per (row, plane,
    * dim) — >240 s at sf1 where this form takes seconds.
    */
  private def bucketCtesSql(dim: Int, seed: Long): String = {
    val planes = Sketches.hyperplanes(AnnLshMaxPlanes, dim, seed)
    val rows = planes.zipWithIndex.map { case (w, i) =>
      s"(${i + 1}, ${w.map(_.toString).mkString("[", ", ", "]")})"
    }.mkString(",\n    ")
    s"""nbp AS (
       |  SELECT coalesce((SELECT min(b) FROM range(6, ${AnnLshMaxPlanes + 1}) t(b)
       |    WHERE (CAST($AnnLshTargetOccupancy AS BIGINT) << b)
       |      >= (SELECT count(*) FROM embeddings)), $AnnLshMaxPlanes) AS nb),
       |planes AS (SELECT * FROM (VALUES
       |    $rows) pl(p, w)),
       |bits AS (
       |  SELECT em.vec_id,
       |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, ${dim + 1}),
       |        i -> CAST(em.embedding[i] AS DOUBLE) * pl.w[i])),
       |      (a,b) -> a + b) > 0
       |    THEN (CAST(1 AS BIGINT) << (pl.p - 1))
       |    ELSE CAST(0 AS BIGINT) END AS bit
       |  FROM embeddings em, planes pl, nbp WHERE pl.p <= nbp.nb),
       |eb AS (
       |  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket
       |  FROM bits GROUP BY vec_id),
       |e AS (
       |  SELECT em.vec_id, em.embedding, eb.bucket
       |  FROM embeddings em JOIN eb USING (vec_id))""".stripMargin
  }

  /** Decimal-exact cosine between two embedding-list columns (the same
    * DECIMAL(28,12) per-product rounding the dec_dot kernel pins).
    */
  private def decCosSql(a: String, b: String): String = {
    def nsq(v: String) =
      s"CAST(list_sum(list_transform($v, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)"
    s"CAST(list_sum(list_transform(list_zip($a, $b), " +
      s"s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)" +
      s" / (sqrt(${nsq(a)}) * sqrt(${nsq(b)}))"
  }

  def oracleSql: Map[String, String] = Map(
    "q_dedup_minhash" ->
      s"""$minhashCtes
         |SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingle_rows,
         |  ${sigComponentSql(0)} AS sig0,
         |  ${sigComponentSql(1)} AS sig1,
         |  ${sigComponentSql(2)} AS sig2,
         |  ${sigComponentSql(3)} AS sig3
         |FROM shs ORDER BY doc_id""".stripMargin,

    "q_dedup_lsh_pairs" ->
      s"""$minhashCtes,
         |sigs AS (SELECT doc_id, $sigListSql AS sig FROM shs),
         |bands AS (
         |  SELECT doc_id, sig, bb.band AS band,
         |    sig[2*bb.band+1] AS k1, sig[2*bb.band+2] AS k2
         |  FROM sigs, (SELECT unnest(range(0, ${Sketches.NumBands})) AS band) bb),
         |bsz AS (SELECT band, k1, k2, count(*) AS n FROM bands GROUP BY band, k1, k2),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_bands
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
         |    AND a.doc_id < b.doc_id
         |  JOIN bsz s ON s.band = a.band AND s.k1 = a.k1 AND s.k2 = a.k2
         |  WHERE s.n BETWEEN 2 AND ${Sketches.MaxBucket}
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT p.a_id, p.b_id, p.n_bands,
         |  CAST(len(list_filter(range(1, ${Sketches.NumPerms + 1}), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / ${Sketches.NumPerms} AS est_jaccard
         |FROM pairs p
         |JOIN sigs sa ON sa.doc_id = p.a_id
         |JOIN sigs sb ON sb.doc_id = p.b_id
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_simhash" ->
      s"""$simhashCtes
         |SELECT doc_id, n_tokens, simhash,
         |  (simhash & 65535) AS band0,
         |  ((simhash >> 16) & 65535) AS band1,
         |  ((simhash >> 32) & 65535) AS band2,
         |  ((simhash >> 48) & 65535) AS band3
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q_dedup_simhash_pairs" ->
      s"""$simhashCtes,
         |b AS (
         |  SELECT doc_id, simhash, bb.band AS band,
         |    ((simhash >> (16*bb.band)) & 65535) AS bkey
         |  FROM sh, (SELECT unnest(range(0, 4)) AS band) bb),
         |bsz AS (SELECT band, bkey, count(*) AS n FROM b GROUP BY band, bkey)
         |SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
         |FROM b x
         |JOIN b y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
         |JOIN bsz s ON s.band = x.band AND s.bkey = x.bkey
         |WHERE s.n BETWEEN 2 AND ${Sketches.MaxBucket}
         |  AND bit_count(xor(x.simhash, y.simhash)) <= 16
         |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_source_sketch" -> {
      val mins = (0 until Sketches.NumPerms)
        .map(k => s"min(sg.sig[${k + 1}]) AS m$k").mkString(",\n|    ")
      val eq = (0 until Sketches.NumPerms)
        .map(k => s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$minhashCtes,
         |sigs AS (SELECT doc_id, $sigListSql AS sig FROM shs),
         |src AS (
         |  SELECT d.source AS source, count(*) AS n_docs,
         |    $mins
         |  FROM sigs sg JOIN documents d ON sg.doc_id = d.doc_id
         |  GROUP BY d.source)
         |SELECT a.source AS a_src, b.source AS b_src, a.n_docs AS a_docs,
         |  CAST(($eq) AS DOUBLE) / ${Sketches.NumPerms} AS est_jaccard
         |FROM src a JOIN src b ON a.source < b.source
         |ORDER BY a_src, b_src""".stripMargin
    },

    // exact brute force re-scored with the decimal kernel — shares
    // q_sim_topk's oracle verbatim
    "q_sim_topk_fast" -> Pipeline.oracleSql("q_sim_topk"),

    "q_multimodal_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT))),
        |      (a,b) -> (a*31+b) % 1000000007) AS fp,
        |    CAST(length(text) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT media_id, 'fake/rgb8' AS format,
        |  CAST(fp % 1024 + 32 AS INTEGER) AS width,
        |  CAST((fp // 1024) % 1024 + 32 AS INTEGER) AS height,
        |  n_bytes,
        |  CAST(list_reduce(list_prepend(CAST(0 AS REAL),
        |    list_transform(list_filter(range(1, CAST(length(text) AS BIGINT) + 1), p -> (p-1) % 8 = 0),
        |      p -> CAST(CAST(ascii(substring(text, CAST(p AS INTEGER), 1)) AS REAL) / CAST(255 AS REAL) AS REAL))),
        |    (a,b) -> CAST(a + b AS REAL)) AS REAL) AS f0,
        |  CAST(8 AS INTEGER) AS f_dim
        |FROM m ORDER BY media_id""".stripMargin,

    "q_sim_ann_lsh" ->
      s"""WITH ${bucketCtesSql(64, 7L)},
         |p AS (SELECT embedding AS p_emb, bucket AS p_bucket FROM e WHERE vec_id = 0),
         |cand AS (
         |  SELECT e.vec_id, e.embedding, p.p_emb FROM e, p
         |  WHERE e.vec_id <> 0 AND bit_count(xor(e.bucket, p.p_bucket)) <= 1),
         |scored AS (
         |  SELECT vec_id, ${decCosSql("embedding", "p_emb")} AS cos FROM cand)
         |SELECT vec_id, cos,
         |  CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
         |FROM scored ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
  )
}
