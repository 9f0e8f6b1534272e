package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between ingestion and tokenization: repetition-based quality
  * filtering (the Gopher/MassiveText rules), benchmark decontamination,
  * sequence packing (fixed-boundary and true greedy), curriculum
  * construction over quality tiers, and deterministic mixture
  * sampling. Engine extensions — the reference
  * (aws-samples/sample-iceberg-schema-evolution-pyiceberg) has no query
  * surface at all; designs follow the published pipeline papers
  * (Gopher appendix A1, GPT-3 appendix A decontamination).
  *
  * Scale posture: every per-document signal is computed with
  * higher-order array functions inside the row — zero shuffle until the
  * final ORDER BY; the decontamination join broadcasts the (small)
  * benchmark gram set; packing windows partition by language so no
  * global single-reducer ordering exists. All outputs are integers so
  * the DuckDB oracle hash-matches exactly (no float summation-order
  * drift).
  */
object CurationOps extends QueryModule {

  /** Whitespace tokens — the shared tokenizer for every operator here
    * (matches DuckDB's string_split(text, ' ') exactly).
    */
  private def toks = split(col("text"), " ")

  /** Adjacent-bigram strings of a token array. sequence(1, n-1) would
    * DESCEND for n=1 (Spark generates decreasing sequences when start >
    * stop) — guard to empty.
    */
  private[graft] def bgExpr(l: org.apache.spark.sql.Column) =
    when(size(l) >= 2,
      transform(sequence(lit(1), size(l) - 1),
        i => concat(element_at(l, i), lit(" "), element_at(l, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Count of the most frequent token, computed inside the row as the
    * longest run of equal elements in the SORTED token array — O(n log n)
    * per row instead of the previous O(n·u) shape (filter the full list
    * once per distinct token), which the r17 optimization pass measured
    * dominating q_curriculum's scan stage (~6M interpreted comparisons
    * over sf0.1's 5000×54-token docs; guide §1.2 "per-task work").
    * Equal tokens are adjacent after array_sort, so the max run length
    * IS the top token's occurrence count — identical output, including
    * the empty-array → 0 case (aggregate's finish sees the zero acc).
    */
  private[graft] def topTokenCount(l: org.apache.spark.sql.Column) =
    aggregate(array_sort(l),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style repetition signals, one row per document, computed
    // entirely inside the row (no explode, no shuffle): token count,
    // distinct tokens, bigram counts, and the most-frequent-token
    // count via an aggregate over the row's distinct tokens. The keep
    // flag applies two integer-arithmetic rules: top token <= 1/5 of
    // tokens, distinct bigrams >= 1/2 of bigrams.
    "q_quality_repetition" -> ((s, dir) => {
      // r17: all five per-document integers come from the one-pass
      // token_stats kernel (TokenStats pins exact equality to the
      // previous HOF chain — sizes, array_distinct, sorted-run top
      // count, nulls included)
      graft.functions.VectorFunctions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.VectorFunctions.token_stats(toks).as("st"))
        .select(col("doc_id"),
          col("st.n_tokens").as("n_tokens"),
          col("st.n_distinct_tokens").as("n_distinct_tokens"),
          col("st.n_bigrams").as("n_bigrams"),
          col("st.n_distinct_bigrams").as("n_distinct_bigrams"),
          col("st.top_cnt").as("top_token_count"))
        .withColumn("keep",
          when(col("top_token_count") * 5 <= col("n_tokens") &&
            col("n_distinct_bigrams") * 2 >= col("n_bigrams"), lit(1))
            .otherwise(lit(0)))
        .orderBy("doc_id")
    }),

    // Benchmark decontamination (GPT-3 appendix A style): any document
    // sharing a 4-gram with the held-out "benchmark" slice (doc_id %
    // 50 == 0) is dropped. The benchmark gram set is tiny (1/50 of the
    // corpus) → broadcast semi join; corpus grams are exploded but
    // never shuffled (the semi join's build side ships instead).
    "q_decontaminate" -> ((s, dir) => {
      // r17: gram generation moves from interpreted HOFs
      // (transform(sequence)+concat_ws(slice)) into a JVM kernel — the
      // shingleDf precedent from the dedup family — emitting each
      // document's DISTINCT 4-grams. Distinct-per-doc is semantics-
      // preserving here: the bench side is globally distinct'd anyway,
      // and the corpus side only feeds a semi-join + doc_id distinct —
      // membership, not multiplicity. Tokenization is split(" ", -1),
      // byte-identical to Spark's split (trailing empties kept).
      import s.implicits._
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      def grams(df: DataFrame): DataFrame = df.as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val t = if (text == null) Array.empty[String]
            else text.split(" ", -1)
          val out =
            if (t.length < 4) Array.empty[String]
            else {
              val a = new Array[String](t.length - 3)
              var i = 0
              while (i < a.length) {
                a(i) = s"${t(i)} ${t(i + 1)} ${t(i + 2)} ${t(i + 3)}"
                i += 1
              }
              a.distinct
            }
          (id, out)
        }).toDF("doc_id", "gs")
        .select(col("doc_id"), explode(col("gs")).as("g"))
      val bench = grams(base.filter(col("doc_id") % 50 === 0))
        .select("g").distinct()
      val contaminated = grams(base.filter(col("doc_id") % 50 =!= 0))
        .join(broadcast(bench), Seq("g"), "left_semi")
        .select("doc_id").distinct()
      base.filter(col("doc_id") % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id").orderBy("doc_id")
    }),

    // Fixed-token-budget sequence packing: documents are laid out in
    // doc_id order within each language and cut into 512-token bins by
    // starting offset (a document starting before a bin boundary
    // belongs to the earlier bin — the deterministic streaming-packer
    // layout). The window partitions by language, so the sort is
    // per-group, not global; output is one row per (lang, bin).
    "q_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 512
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), size(toks).as("n_tok"))
        .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
        .withColumn("bin",
          ((col("cum") - col("n_tok")) / budget).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("sum_tokens"))
        .orderBy("lang", "bin")
    }),

    // TRUE greedy packing (accumulator reset on overflow — the
    // streaming-packer algorithm, vs q_pack_sequences' fixed boundary
    // cut): inherently sequential per group, so it runs as the
    // secondary-sort pattern — repartition by group, sort within
    // partitions by (group, doc_id), one imperative scan per partition
    // (the rare case where mapPartitions IS the right Spark tool; a
    // window cannot express a running sum that resets on its own
    // value). Parallelism = number of groups; real pipelines pack per
    // (lang, shard) when groups are too coarse. The DuckDB oracle
    // replays the same recurrence with a recursive CTE.
    "q_pack_greedy" -> ((s, dir) => {
      import s.implicits._
      val budget = 512
      val packed = Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"),
          size(toks).as("n_tok"))
        .repartition(col("lang"))
        .sortWithinPartitions("lang", "doc_id")
        .as[(String, Long, Int)]
        .mapPartitions { it =>
          // langs are contiguous within the sorted partition; reset
          // the accumulator at every lang boundary
          var lang: String = null
          var bin = 0L
          var acc = 0L
          it.map { case (l, id, t) =>
            if (l != lang) { lang = l; bin = 0L; acc = t.toLong }
            else if (acc + t > budget) { bin += 1; acc = t.toLong }
            else acc += t
            (l, bin, t)
          }
        }.toDF("lang", "bin", "n_tok")
      packed.groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("sum_tokens"))
        .orderBy("lang", "bin")
    }),

    // Curriculum construction: documents are tiered by integer quality
    // rules (tier 0 = clean, 2 = heavily repetitive) and ordered WITHIN
    // each tier — a curriculum loader then drains tiers in order. A
    // window partitioned by the 3-value tier key would concentrate the
    // whole corpus into <=3 reducer tasks, so tier_pos is assigned with
    // the two-pass zipWithIndex pattern instead: range-partition by
    // (tier, doc_id) so every partition holds a contiguous slice of one
    // or more tiers, count each partition's per-tier rows (a
    // metadata-scale collect: #partitions x #tiers longs), broadcast
    // the cumulative offsets, then emit offset + local rank in a single
    // narrow pass. Parallelism = #partitions at every step; both jobs
    // run over the SAME shuffled RDD instance so the second pass reuses
    // the first's shuffle files and sees identical partition contents.
    "q_curriculum" -> ((s, dir) => {
      import s.implicits._
      // r17: one-pass token_stats kernel (same integers as the HOF
      // chain — see q_quality_repetition)
      graft.functions.VectorFunctions.register(s)
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.VectorFunctions.token_stats(toks).as("st"))
        .withColumn("tier",
          when(col("st.top_cnt") * 10 <= col("st.n_tokens") &&
            col("st.n_distinct_bigrams") * 20 >= col("st.n_bigrams") * 19,
            lit(0))
            .when(col("st.top_cnt") * 7 <= col("st.n_tokens"), lit(1))
            .otherwise(lit(2)))
      val parted = base
        .select(col("doc_id"), col("lang"), col("tier"))
        .repartitionByRange(col("tier"), col("doc_id"))
        .sortWithinPartitions("tier", "doc_id")
        .as[(Long, String, Int)]
        .rdd // materialize ONE RDD: both passes share its shuffle output
      // pass 1: per-(partition, tier) row counts -> per-tier offsets
      val perPart = parted.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.Map.empty[Int, Long]
        it.foreach { case (_, _, t) => m(t) = m.getOrElse(t, 0L) + 1L }
        Iterator((pid, m.toMap))
      }.collect().sortBy(_._1).map(_._2)
      val offsets: Array[Map[Int, Long]] =
        perPart.scanLeft(Map.empty[Int, Long]) { (acc, m) =>
          (acc.keySet ++ m.keySet).iterator
            .map(k => k -> (acc.getOrElse(k, 0L) + m.getOrElse(k, 0L)))
            .toMap
        }.dropRight(1)
      val bcOff = s.sparkContext.broadcast(offsets)
      // pass 2: local per-tier counters seeded from the broadcast offsets
      parted.mapPartitionsWithIndex { (pid, it) =>
        val ctr = scala.collection.mutable.Map.empty[Int, Long]
        bcOff.value(pid).foreach { case (t, off) => ctr(t) = off }
        it.map { case (id, lang, t) =>
          val p = ctr.getOrElse(t, 0L) + 1L
          ctr(t) = p
          (id, lang, t, p.toInt)
        }
      }.toDF("doc_id", "lang", "tier", "tier_pos")
        .orderBy("tier", "tier_pos")
    }),

    // Deterministic mixture sampling: each language gets a target keep
    // rate (downsample the dominant language, keep the rare ones); the
    // keep decision is a pure arithmetic hash of doc_id — identical on
    // any engine, any partitioning, re-runnable without a seed store.
    // The rates relation is 5 rows → broadcast; no shuffle at all
    // before the final ORDER BY.
    "q_sample_mixture" -> ((s, dir) => {
      import s.implicits._
      val rates = Seq(("en", 400000L), ("de", 800000L), ("fr", 800000L),
        ("es", 900000L), ("zh", 1000000L)).toDF("lang", "rate_ppm")
      Tables(s, dir, "documents")
        .join(broadcast(rates), Seq("lang"))
        .filter((col("doc_id") * 2654435761L) % 1000000L < col("rate_ppm"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_quality_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |), base AS (
        |  SELECT doc_id, len(l) AS n_tokens,
        |    len(list_distinct(l)) AS n_distinct_tokens,
        |    list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1]) AS bg
        |  FROM toks
        |), topt AS (
        |  SELECT doc_id, max(c) AS top_token_count FROM (
        |    SELECT doc_id, count(*) AS c
        |    FROM (SELECT doc_id, unnest(l) AS tok FROM toks)
        |    GROUP BY doc_id, tok) GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(n_distinct_tokens AS INTEGER) AS n_distinct_tokens,
        |  CAST(len(bg) AS INTEGER) AS n_bigrams,
        |  CAST(len(list_distinct(bg)) AS INTEGER) AS n_distinct_bigrams,
        |  CAST(top_token_count AS INTEGER) AS top_token_count,
        |  CAST(CASE WHEN top_token_count * 5 <= n_tokens
        |        AND len(list_distinct(bg)) * 2 >= len(bg)
        |       THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM base b JOIN topt USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |), grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(l) - 2),
        |    i -> array_to_string(l[i:i+3], ' '))) AS g
        |  FROM toks WHERE len(l) >= 4
        |), bench AS (
        |  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
        |), contaminated AS (
        |  SELECT DISTINCT doc_id FROM grams
        |  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)
        |)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 50 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d
        |)
        |SELECT lang, CAST((cum - n_tok) // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q_pack_greedy" ->
      """WITH RECURSIVE d AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents
        |), r AS (
        |  SELECT lang, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin,
        |    n_tok AS acc
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.lang, d.rn, d.doc_id, d.n_tok,
        |    CASE WHEN r.acc + d.n_tok > 512 THEN r.bin + 1 ELSE r.bin END,
        |    CASE WHEN r.acc + d.n_tok > 512 THEN d.n_tok
        |         ELSE r.acc + d.n_tok END
        |  FROM r JOIN d ON d.lang = r.lang AND d.rn = r.rn + 1
        |)
        |SELECT lang, bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM r GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "q_curriculum" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
        |), sig AS (
        |  SELECT t.doc_id, t.lang, len(t.l) AS n_tokens,
        |    list_transform(range(1, len(t.l)),
        |      i -> t.l[i] || ' ' || t.l[i+1]) AS bg,
        |    (SELECT max(c) FROM (
        |       SELECT count(*) AS c FROM unnest(t.l) AS u(tok)
        |       GROUP BY tok)) AS top_cnt
        |  FROM toks t
        |), tiered AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN top_cnt * 10 <= n_tokens
        |          AND len(list_distinct(bg)) * 20 >= len(bg) * 19 THEN 0
        |         WHEN top_cnt * 7 <= n_tokens THEN 1
        |         ELSE 2 END AS tier
        |  FROM sig
        |)
        |SELECT doc_id, lang, CAST(tier AS INTEGER) AS tier,
        |  CAST(row_number() OVER (PARTITION BY tier ORDER BY doc_id)
        |    AS INTEGER) AS tier_pos
        |FROM tiered ORDER BY tier, tier_pos""".stripMargin,

    "q_sample_mixture" ->
      """WITH rates(lang, rate_ppm) AS (VALUES
        |  ('en', 400000), ('de', 800000), ('fr', 800000),
        |  ('es', 900000), ('zh', 1000000))
        |SELECT d.doc_id, d.lang FROM documents d JOIN rates r USING (lang)
        |WHERE (d.doc_id * 2654435761) % 1000000 < r.rate_ppm
        |ORDER BY d.doc_id""".stripMargin,
  )
}
