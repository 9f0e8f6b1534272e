package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** LLM-training-data pipeline operators with DuckDB oracles
  * (SURVEY.md §2.B + builder contract): exact dedup, n-gram Jaccard
  * near-dup, embedding-cosine near-dup, brute-force and IVF-style
  * similarity top-k, text statistics / quality / token counting /
  * language-ID / rolling-hash fingerprinting, and multimodal joins.
  * Engine-specific (minhash/simhash/LSH) variants live in
  * PipelineSketches (no SQL oracle).
  *
  * Float determinism: every dot product / norm is accumulated in
  * DECIMAL(38,12) over per-element float products (bit-identical in
  * both engines), then cast to double — so cosine values hash-match
  * exactly (SURVEY.md §7.8).
  *
  * Scale posture: dedup keys are hashes (32-byte digest shuffles, not
  * document bodies); near-dup pair generation is blocked (batch × label
  * cell), never all-pairs; similarity search broadcasts the probe and
  * computes in one scan + TakeOrderedAndProject.
  */
object Pipeline extends QueryModule {
  private val D2812 = DecimalType(28, 12)
  // Accumulator at precision 37: (37,12)+(28,12) lands exactly on
  // (38,12) with no scale loss; the cast back to (37,12) only narrows
  // precision (|sum| <= 64, so it never changes a value). A (38,12)
  // accumulator would make Spark's addition drop to scale 11 and
  // diverge from DuckDB's exact list_sum.
  private val DAcc = DecimalType(37, 12)

  /** Outward margin for double-math cosine PREFILTERS ahead of the
    * decimal-exact threshold tests (r17; the q_sim_range_refpoints
    * precedent from TrainingOps): |float_dot-cosine − dec_dot-cosine|
    * over dim-64 float vectors is bounded by the per-product
    * DECIMAL(28,12) rounding (≤ 64·5e-13) plus double-accumulation
    * error (~1e-14 relative) — ≪ 1e-9 for unit-scale norms. 1e-4 is
    * 10^5× conservative; a too-wide margin only over-admits pairs to
    * the exact recheck, never changes the result.
    */
  private val CosBoundMargin = 1e-4

  /** Exact decimal-accumulated dot product of two float vectors.
    * Elements are widened to double *before* multiplying so both
    * engines produce the identical IEEE product regardless of their
    * float-arithmetic promotion rules, then accumulated in decimal
    * (order-independent, exact).
    */
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dec_dot(a, b)

  /** Exact decimal-accumulated squared norm (same widening rule). */
  private def normSqDec(a: Column): Column =
    graft.functions.VectorFunctions.dec_normsq(a)

  /** The original HOF formulation of dotDec, kept as the semantic spec
    * the DecVector kernel must match (DecVectorSpec pins equality):
    * widen to double before multiplying, round each product to
    * DECIMAL(28,12), accumulate at (37,12) — exact and
    * order-independent, hash-identical to DuckDB's list math.
    */
  private[graft] def dotDecHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast(D2812)),
      lit(0).cast(DAcc),
      (acc, v) => (acc + v).cast(DAcc))

  private[graft] def normSqDecHof(a: Column): Column =
    aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(D2812)),
      lit(0).cast(DAcc),
      (acc, v) => (acc + v).cast(DAcc))

  /** (doc_id, sh: array<string>) with distinct word 4-gram shingles,
    * built in a JVM kernel (Spark's higher-order array expressions are
    * interpreted and would be re-evaluated per join branch — this was
    * the slowest pipeline query at sf0.1 before the kernel).
    */
  private def shingleDf(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val toks = text.split(" ")
        val sh =
          if (toks.length < 4) Array.empty[String]
          else {
            val out = new Array[String](toks.length - 3)
            var i = 0
            while (i < out.length) {
              out(i) = s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)} ${toks(i + 3)}"
              i += 1
            }
            out.distinct
          }
        (id, sh)
      })
      .toDF("doc_id", "sh")
  }

  /** SemDeDup's quadratic budget: within-cluster pair count any single
    * cluster may contribute before the query REFUSES. The algorithm's
    * scale contract is that k grows with the corpus so cluster sizes
    * stay fixed — a degenerate quantizer (everything in one cell) must
    * fail loudly here instead of silently going O(n²) on the join.
    */
  private[graft] val SemDedupMaxPairsPerCluster = 2000000L

  /** Enforce the budget: one count-per-label aggregate (shuffle is
    * O(k) counts, never vectors), then a driver-side check of the
    * worst cluster — the same loud-refusal shape as the LSH bucket
    * cap, except SemDeDup's oracle semantics forbid silently dropping
    * the hot cluster, so refusal is the only sound degradation.
    */
  private[graft] def requireBoundedClusters(v: DataFrame, labelCol: String,
      maxPairs: Long = SemDedupMaxPairsPerCluster): Unit = {
    val worst = v.groupBy(col(s"`$labelCol`"))
      .agg(count(lit(1)).as("n"))
      .agg(max((col("n") * (col("n") - 1) / 2).cast("long")).as("pairs"),
        max(col("n")).as("n"))
      .collect()(0)
    if (!worst.isNullAt(0) && worst.getLong(0) > maxPairs)
      throw new IllegalStateException(
        "q_dedup_semantic: degenerate coarse quantizer — a cluster of " +
          s"${worst.getLong(1)} vectors implies ${worst.getLong(0)} " +
          s"within-cluster pairs (budget $maxPairs); re-cluster with " +
          "more centroids (k must scale with the corpus) instead of " +
          "running the quadratic join")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) => {
      // Hash-groupBy dedup: shuffle the 32-byte sha2 digest, not the
      // document body — at 100 TB the shuffle stays O(docs × 32B).
      Tables(s, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
        .select("rep_id", "n_copies")
        .orderBy("rep_id")
    }),

    "q_dedup_ngram" -> ((s, dir) => {
      // Word-4-gram Jaccard over a bounded candidate pairing
      // (consecutive doc ids) — the LSH modules generate candidates at
      // scale; this query pins the exact Jaccard computation itself.
      // localCheckpoint (not persist): reclaimed when the result drops.
      val d = shingleDf(s, dir).localCheckpoint()
      val a = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      val b = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
      a.join(b, col("b_id") === col("a_id") + 1)
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).as("n_common"),
          size(array_union(col("a_sh"), col("b_sh"))).as("n_union"))
        .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
        .orderBy("a_id")
    }),

    "q_dedup_spans" -> ((s, dir) => {
      // EXACT substring-span dedup (cross-doc repeated-span removal,
      // the deduplicate-text-datasets shape): find maximal word spans
      // (>= K words) that repeat ACROSS documents and attribute every
      // repeat to the first-occurrence doc — later docs report the
      // repeated footage as removable. Shuffle-bounded suffix-array
      // surrogate: positional K-gram anchors (one shuffle keyed by the
      // gram's xxhash64 digest — 8 bytes on the wire instead of ~50
      // of text; a 64-bit collision can only ADD a false anchor,
      // never drop a real one, and the per-doc span merge absorbs
      // it) + LOCAL extension (overlapping or
      // contiguous anchor windows merge into maximal spans inside one
      // per-doc window over dup anchors only — no cross-doc join of
      // span candidates, no all-pairs anything). Within-doc repeats
      // don't count (min_doc == doc_id): this operator is the
      // cross-doc decontamination shape; q_quality_repetition covers
      // within-doc repetition.
      import s.implicits._
      val K = 8
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      // r17 optimization, two parts. (1) The anchor digest is computed
      // IN the kernel over a reused byte scratch — the old closure
      // built every gram as a String, shipped it through the encoder,
      // and hashed it in a separate catalyst projection; the digest is
      // bit-identical (Spark's own XXH64 over the same UTF-8 bytes,
      // seed 42 = xxhash64's), so anchor semantics are untouched.
      // (2) localCheckpoint materializes the narrow (id, pos, gh)
      // anchor table ONCE: the plan previously evaluated the gram
      // MapPartitions TWICE — once under the min-doc aggregate and
      // once as the join probe (plans/r17/q_dedup_spans_before.txt,
      // nodes 5 and 10) — because the two consumers' exchanges don't
      // canonicalize equal. ~24 bytes/row checkpointed, reclaimed when
      // the result drops (the shingleDf-consumer precedent).
      val sh = docs.as[(Long, String)].mapPartitions { it =>
        var buf = new Array[Byte](4096)
        it.flatMap { case (id, text) =>
          val toks = text.split(" ")
          if (toks.length < K) Iterator.empty
          else {
            val tb = toks.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            (0 to toks.length - K).iterator.map { i =>
              var len = 0
              var j = i
              while (j < i + K) {
                val t = tb(j)
                if (len + t.length + 1 > buf.length)
                  buf = java.util.Arrays.copyOf(buf,
                    math.max(buf.length * 2, len + t.length + 1))
                if (j > i) { buf(len) = ' '; len += 1 }
                System.arraycopy(t, 0, buf, len, t.length)
                len += t.length
                j += 1
              }
              (id, i, org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(buf,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                  len, 42L))
            }
          }
        }
      }.toDF("doc_id", "pos", "gh").localCheckpoint()
      val firstDoc = sh.groupBy("gh").agg(min("doc_id").as("min_doc"))
      val dup = sh.join(firstDoc, "gh")
        .filter(col("min_doc") < col("doc_id"))
        .select("doc_id", "pos")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      // windows [pos, pos+K-1] merge iff the gap to the previous dup
      // anchor is <= K (overlapping or exactly contiguous)
      val spans = dup
        .withColumn("brk",
          when(col("pos") - lag("pos", 1).over(w) <= K, 0).otherwise(1))
        .withColumn("span_id", sum("brk")
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "span_id")
        .agg((max("pos") - min("pos") + K).as("span_len"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), sum("span_len").as("dup_tokens"))
      val out = docs
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).cast("long").as("dup_tokens"),
          coalesce(col("n_spans"), lit(0L)).cast("long").as("n_spans"))
        .orderBy("doc_id")
      // anti-vacuity audit: the fixture generator plants cross-doc
      // near-dups, so a zero-span result means the anchor pipeline
      // broke, not that the corpus is clean
      require(out.filter(col("n_spans") > 0).limit(1).count() == 1,
        "q_dedup_spans: no cross-doc spans found — anchor pipeline broken " +
          "or fixture drifted")
      out
    }),

    "q_dedup_near" -> ((s, dir) => {
      // SURVEY §2.B's deterministic near-dup variant: the same 4-gram
      // Jaccard computation as q_dedup_ngram, but thresholded to the
      // candidate-pair shape a dedup pipeline consumes (pairs with any
      // shingle overlap, strongest first).
      val d = shingleDf(s, dir).localCheckpoint()
      val a = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      val b = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
      a.join(b, col("b_id") === col("a_id") + 1)
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).as("n_common"),
          size(array_union(col("a_sh"), col("b_sh"))).as("n_union"))
        .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
        .filter(col("n_common") > 0)
        .orderBy(col("jaccard").desc, col("a_id"))
    }),

    "q_dedup_embed" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      import graft.functions.VectorFunctions.float_dot
      // Embedding-cosine near-dup, batch-vs-corpus framing: the first
      // 100 vectors (an incoming batch) are checked against all vectors
      // sharing their coarse cell (label) — bounded pairs at any scale.
      // r17 optimization: the threshold test runs FIRST in pure double
      // math through the codegen'd float_dot kernel with an
      // outward-rounded margin (conservative: may only over-admit,
      // never drop — the float/decimal cosine divergence over dim-64
      // float vectors is ~1e-9, the margin 1e-4; NaN/Inf from a
      // zero-norm row compare ≥-true in Spark semantics, so such rows
      // still reach the exact filter that always decided them). The
      // decimal-exact kernels (JVM BigDecimal loops, previously run on
      // EVERY corpus row + every joined pair — the same smell the r16
      // verdict flagged on q_sim_range_refpoints) now run only on the
      // admitted near-threshold pairs, and the output `cos` stays the
      // identical decimal-derived expression.
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          float_dot(col("embedding"), col("embedding")).as("nsq_f"))
      val batch = v.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("embedding").as("a_emb"), col("nsq_f").as("a_nsq_f"))
      val corpus = v.select(col("vec_id").as("b_id"), col("label").as("b_label"),
        col("embedding").as("b_emb"), col("nsq_f").as("b_nsq_f"))
      batch.join(corpus,
          col("a_label") === col("b_label") && col("a_id") < col("b_id"))
        .filter(float_dot(col("a_emb"), col("b_emb")) /
          (sqrt(col("a_nsq_f")) * sqrt(col("b_nsq_f"))) >=
          lit(0.35) - CosBoundMargin)
        .withColumn("cos",
          dotDec(col("a_emb"), col("b_emb")).cast("double") /
            (sqrt(normSqDec(col("a_emb")).cast("double")) *
              sqrt(normSqDec(col("b_emb")).cast("double"))))
        .filter(col("cos") >= 0.35)
        .select(col("a_id"), col("b_id"), col("cos"))
        .orderBy("a_id", "b_id")
    }),

    "q_dedup_semantic" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      // SemDeDup (semantic dedup over an embedding space): a coarse
      // quantizer assigns each vector to a cluster (the precomputed
      // label column stands in for the nearest-centroid id, as in
      // q_sim_topk_ivf), then WITHIN each cluster a vector is a
      // semantic duplicate iff some lower-id member lies within the
      // cosine threshold — min-id is the deterministic stand-in for
      // the paper's keep-one-representative rule. The clustering is
      // the SCALE LEVER — k must grow with the corpus so cluster
      // sizes stay fixed — so when the precomputed clusters outgrow
      // the pair budget (the 10x sweep tripped this), the quantizer
      // deepens ADAPTIVELY: hyperplane sign bits of the leading
      // embedding dimensions split each cluster 2^bits ways, with
      // `bits` derived from the worst cluster size by exact integer
      // thresholds the DuckDB oracle reproduces verbatim. The
      // post-split guard still refuses a pathologically imbalanced
      // split rather than running a quadratic join. The decimal dot
      // product keeps the cosine bit-exact for the oracle. Output:
      // per-coarse-cluster totals, duplicates, and kept.
      import graft.functions.VectorFunctions.float_dot
      val v0 = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          float_dot(col("embedding"), col("embedding")).as("nsq_f"))
      val maxN = v0.groupBy("label").agg(count(lit(1)).as("n"))
        .agg(max("n")).collect()(0).getLong(0)
      val bits =
        if (maxN <= 1500L) 0
        else if (maxN <= 3000L) 1
        else if (maxN <= 6000L) 2
        else if (maxN <= 12000L) 3
        else 4
      val sub = (0 until bits)
        .map(i => when(col("embedding")(i) >= 0f, 1 << i).otherwise(0))
        .foldLeft(lit(0))(_ + _)
      val v = v0.withColumn("sub", sub)
        .withColumn("ckey", concat_ws(":", col("label"), col("sub")))
      requireBoundedClusters(v, "ckey")
      val a = v.select(col("label"), col("sub"),
        col("vec_id").as("a_id"),
        col("embedding").as("a_emb"), col("nsq_f").as("a_nsq_f"))
      val b = v.select(col("label"), col("sub"),
        col("vec_id").as("b_id"),
        col("embedding").as("b_emb"), col("nsq_f").as("b_nsq_f"))
      // r17 optimization: same double-math prefilter as q_dedup_embed —
      // the cosine only feeds the >= 0.5 THRESHOLD here (it is not an
      // output column), so the decimal-exact recheck runs on the few
      // admitted near-threshold pairs instead of every within-cluster
      // pair, and the margin guarantees no admitted-set loss.
      val dups = a.join(b, Seq("label", "sub"))
        .filter(col("b_id") < col("a_id"))
        .filter(float_dot(col("a_emb"), col("b_emb")) /
          (sqrt(col("a_nsq_f")) * sqrt(col("b_nsq_f"))) >=
          lit(0.5) - CosBoundMargin)
        .withColumn("cos",
          dotDec(col("a_emb"), col("b_emb")).cast("double") /
            (sqrt(normSqDec(col("a_emb")).cast("double")) *
              sqrt(normSqDec(col("b_emb")).cast("double"))))
        .filter(col("cos") >= 0.5)
        .select(col("label"), col("a_id")).distinct()
      v.groupBy("label").agg(count(lit(1)).as("n_vectors"))
        .join(dups.groupBy("label").agg(count(lit(1)).as("n_dups")),
          Seq("label"), "left")
        .na.fill(0L, Seq("n_dups"))
        .withColumn("n_kept", col("n_vectors") - col("n_dups"))
        .orderBy("label")
    }),

    "q_mine_hard_negatives" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      // Contrastive-pair mining (the training-data shape behind
      // embedding fine-tuning): for each probe, its nearest SAME-label
      // neighbor (positive) and nearest OTHER-label neighbor (hard
      // negative). The probe set broadcasts and the corpus is scanned
      // ONCE; per-(probe, side) best is a map-side struct-max partial
      // aggregate, so the shuffle carries two rows per probe per task
      // — never the probe x corpus pair stream. Decimal-exact cosine,
      // min-id tiebreak, so the oracle hash-matches.
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          normSqDec(col("embedding")).cast("double").as("nsq"))
      val probes = broadcast(v.filter(col("vec_id") < 50)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("embedding").as("a_emb"), col("nsq").as("a_nsq")))
      val pairs = probes.join(v, col("vec_id") =!= col("a_id"))
        .withColumn("cos",
          dotDec(col("a_emb"), col("embedding")).cast("double") /
            (sqrt(col("a_nsq")) * sqrt(col("nsq"))))
        .withColumn("side",
          when(col("a_label") === col("label"), "pos").otherwise("neg"))
      // struct max = (max cos, then min id): deterministic arg-max
      // with partial aggregation below the exchange
      val best = pairs.groupBy("a_id", "side")
        .agg(max(struct(col("cos"), (-col("vec_id")).as("nb"))).as("m"))
        .select(col("a_id"), col("side"),
          (-col("m.nb")).cast("long").as("b_id"), col("m.cos").as("cos"))
      best.filter(col("side") === "pos")
        .select(col("a_id"), col("b_id").as("pos_id"),
          col("cos").as("pos_cos"))
        .join(best.filter(col("side") === "neg")
          .select(col("a_id"), col("b_id").as("neg_id"),
            col("cos").as("neg_cos")), "a_id")
        .orderBy("a_id")
    }),

    "q_sim_topk" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      // Brute-force cosine top-k: probe broadcast to every partition,
      // one scan over the corpus, TakeOrderedAndProject for the top-k —
      // no shuffle of the corpus at any scale.
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          normSqDec(col("embedding")).cast("double").as("nsq"))
      val probe = v.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"), col("nsq").as("p_nsq"))
      val top = v.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .withColumn("cos",
          dotDec(col("embedding"), col("p_emb")).cast("double") /
            (sqrt(col("nsq")) * sqrt(col("p_nsq"))))
        .select(col("vec_id"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))
      top.withColumn("rank", row_number().over(w))
        .orderBy("rank")
    }),

    "q_sim_topk_ivf" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      // IVF-style ANN: the coarse quantizer assigns each vector to a
      // cell (here the precomputed label column stands in for the
      // nearest-centroid id); the probe searches only its own cell —
      // partition pruning cuts the scan by the cell count at 100 TB.
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          normSqDec(col("embedding")).cast("double").as("nsq"))
      val probe = v.filter(col("vec_id") === 0)
        .select(col("label").as("p_label"), col("embedding").as("p_emb"),
          col("nsq").as("p_nsq"))
      val top = v.filter(col("vec_id") =!= 0)
        .join(broadcast(probe), col("label") === col("p_label"))
        .withColumn("cos",
          dotDec(col("embedding"), col("p_emb")).cast("double") /
            (sqrt(col("nsq")) * sqrt(col("p_nsq"))))
        .select(col("vec_id"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))
      top.withColumn("rank", row_number().over(w))
        .orderBy("rank")
    }),

    "q_text_stats" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).as("n_words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_words").cast("long")).as("sum_words"),
          max(col("n_words")).as("max_words"))
        .withColumn("avg_words",
          col("sum_words").cast("double") / col("n_docs"))
        .orderBy("lang")
    }),

    "q_text_quality" -> ((s, dir) => {
      // Heuristic quality scoring: lexical diversity × (1 − stopword
      // share) — all integer/ratio arithmetic, per-row, codegen'd.
      val stop = array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"),
          length(regexp_replace(col("text"), " ", "")).as("n_nospace"))
      d.select(col("doc_id"), col("lang"),
          size(col("toks")).as("n_words"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          size(filter(col("toks"), t => array_contains(stop, t))).as("n_stop"),
          col("n_nospace"))
        .withColumn("avg_word_len",
          col("n_nospace").cast("double") / col("n_words"))
        .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_words"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
        .withColumn("quality",
          col("uniq_ratio") * (lit(1.0) - col("stop_ratio")))
        .orderBy("doc_id")
    }),

    "q_text_tokens" -> ((s, dir) => {
      // Whitespace tokens vs a BPE-ish regex tokenizer (runs of letters,
      // runs of digits, single other non-space chars).
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("re_tokens"),
          length(col("text")).as("n_chars_txt"))
        .orderBy("doc_id")
    }),

    "q_text_fingerprint" -> ((s, dir) => {
      // Polynomial rolling hash over the character stream, mod 1e9+7 —
      // pure integer math, identical in any engine.
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          aggregate(
            transform(split(col("text"), ""), c => ascii(c)),
            lit(0L),
            (acc, x) => pmod(acc * 31 + x, lit(1000000007L))).as("fingerprint"))
        .orderBy("doc_id")
    }),

    "q_text_lang_id" -> ((s, dir) => {
      // Marker-token language scoring + argmax (deterministic tie-break
      // by fixed precedence). On this synthetic corpus all langs share
      // a vocabulary, so the scores — not accuracy — are the contract.
      val toks = split(col("text"), " ")
      def score(markers: Seq[String]): Column =
        size(filter(toks, t =>
          array_contains(array(markers.map(lit): _*), t)))
      val d = Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        score(Seq("the", "table", "query")).as("s_en"),
        score(Seq("join", "row", "group")).as("s_de"),
        score(Seq("order", "batch", "scan")).as("s_es"),
        score(Seq("key", "sort", "hash")).as("s_fr"),
        score(Seq("data", "stream", "window")).as("s_zh"))
      d.withColumn("pred_lang",
          when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr"), col("s_zh")), "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "de")
          .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
        .orderBy("doc_id")
    }),

    "q_multimodal_join" -> ((s, dir) => {
      // Text modality ⋈ vector modality on the shared id; output is the
      // flattened metadata of both sides.
      val d = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
      d.join(e, d("doc_id") === e("vec_id"), "inner")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("label"), size(col("embedding")).as("dim"))
        .orderBy("doc_id")
    }),

    "q_multimodal_features" -> ((s, dir) => {
      // Opaque-binary plumbing: the text payload re-encoded as a binary
      // column with typed metadata (byte length, first byte, format tag)
      // — the same schema shape used for image/audio payloads in
      // graft.multimodal (where decode is stubbed).
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          col("n_chars"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          col("n_chars"),
          lit("utf8-text").as("format"))
        .orderBy("doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS n_copies
        |FROM documents GROUP BY sha256(text) ORDER BY rep_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split(text,' ')) >= 4 THEN
        |      list_distinct(list_transform(range(1, len(string_split(text,' ')) - 2),
        |        i -> array_to_string(string_split(text,' ')[i:i+3], ' ')))
        |    ELSE [] END AS s
        |  FROM documents)
        |SELECT a_id, b_id, n_common, n_union,
        |  CAST(n_common AS DOUBLE)/n_union AS jaccard
        |FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(list_intersect(a.s, b.s)) AS INTEGER) AS n_common,
        |    CAST(len(list_distinct(a.s || b.s)) AS INTEGER) AS n_union
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1) t
        |ORDER BY a_id""".stripMargin,

    "q_dedup_spans" ->
      """WITH sh0 AS (
        |  SELECT doc_id, len(string_split(text,' ')) AS n,
        |    CASE WHEN len(string_split(text,' ')) >= 8 THEN
        |      list_transform(range(1, len(string_split(text,' ')) - 6),
        |        i -> struct_pack(pos := i,
        |               g := array_to_string(string_split(text,' ')[i:i+7], ' ')))
        |    ELSE [] END AS shl
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(shl, recursive := true) FROM sh0),
        |mins AS (SELECT g, min(doc_id) AS min_doc FROM sh GROUP BY g),
        |dup AS (
        |  SELECT s.doc_id, s.pos FROM sh s JOIN mins m ON s.g = m.g
        |  WHERE m.min_doc < s.doc_id),
        |runs AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
        |              <= 8 THEN 0 ELSE 1 END AS brk
        |  FROM dup),
        |spans AS (
        |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
        |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM runs),
        |agg AS (
        |  SELECT doc_id, span_id, max(pos) - min(pos) + 8 AS span_len
        |  FROM spans GROUP BY doc_id, span_id),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(span_len) AS BIGINT) AS dup_tokens
        |  FROM agg GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans
        |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_near" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split(text,' ')) >= 4 THEN
        |      list_distinct(list_transform(range(1, len(string_split(text,' ')) - 2),
        |        i -> array_to_string(string_split(text,' ')[i:i+3], ' ')))
        |    ELSE [] END AS s
        |  FROM documents)
        |SELECT a_id, b_id, n_common, n_union,
        |  CAST(n_common AS DOUBLE)/n_union AS jaccard
        |FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    CAST(len(list_intersect(a.s, b.s)) AS INTEGER) AS n_common,
        |    CAST(len(list_distinct(a.s || b.s)) AS INTEGER) AS n_union
        |  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1) t
        |WHERE n_common > 0
        |ORDER BY jaccard DESC, a_id""".stripMargin,

    "q_dedup_embed" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding,
        |    CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |    / (sqrt(a.nsq) * sqrt(b.nsq)) AS cos
        |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE a.vec_id < 100
        |  AND CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |    / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin,

    "q_dedup_semantic" ->
      """WITH mx AS (
        |  SELECT max(cnt) AS m FROM (
        |    SELECT count(*) AS cnt FROM embeddings GROUP BY label)),
        |bt AS (
        |  SELECT CASE WHEN m <= 1500 THEN 0 WHEN m <= 3000 THEN 1
        |              WHEN m <= 6000 THEN 2 WHEN m <= 12000 THEN 3
        |              ELSE 4 END AS b FROM mx),
        |v AS (
        |  SELECT vec_id, label, embedding,
        |    (CASE WHEN (SELECT b FROM bt) >= 1 AND embedding[1] >= 0 THEN 1 ELSE 0 END
        |     + CASE WHEN (SELECT b FROM bt) >= 2 AND embedding[2] >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN (SELECT b FROM bt) >= 3 AND embedding[3] >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN (SELECT b FROM bt) >= 4 AND embedding[4] >= 0 THEN 8 ELSE 0 END) AS sub,
        |    CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings),
        |dup AS (
        |  SELECT DISTINCT a.label AS label, a.vec_id AS did
        |  FROM v a JOIN v b ON a.label = b.label AND a.sub = b.sub
        |    AND b.vec_id < a.vec_id
        |  WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |    / (sqrt(a.nsq) * sqrt(b.nsq)) >= 0.5)
        |SELECT t.label, t.n_vectors,
        |  COALESCE(d.n_dups, 0) AS n_dups,
        |  t.n_vectors - COALESCE(d.n_dups, 0) AS n_kept
        |FROM (SELECT label, count(*) AS n_vectors FROM v GROUP BY label) t
        |LEFT JOIN (SELECT label, count(*) AS n_dups FROM dup GROUP BY label) d
        |  USING (label)
        |ORDER BY label""".stripMargin,

    "q_mine_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding,
        |    CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings),
        |p AS (SELECT vec_id AS a_id, label AS a_label, embedding AS a_emb,
        |        nsq AS a_nsq FROM v WHERE vec_id < 50),
        |pairs AS (
        |  SELECT p.a_id, b.vec_id AS b_id,
        |    CASE WHEN p.a_label = b.label THEN 'pos' ELSE 'neg' END AS side,
        |    CAST(list_sum(list_transform(list_zip(p.a_emb, b.embedding),
        |      s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |      / (sqrt(p.a_nsq) * sqrt(b.nsq)) AS cos
        |  FROM p JOIN v b ON b.vec_id <> p.a_id),
        |best AS (
        |  SELECT a_id, side, b_id, cos,
        |    row_number() OVER (PARTITION BY a_id, side
        |      ORDER BY cos DESC, b_id) AS rn
        |  FROM pairs)
        |SELECT a.a_id, a.b_id AS pos_id, a.cos AS pos_cos,
        |  n.b_id AS neg_id, n.cos AS neg_cos
        |FROM best a JOIN best n ON a.a_id = n.a_id
        |WHERE a.side = 'pos' AND n.side = 'neg' AND a.rn = 1 AND n.rn = 1
        |ORDER BY a.a_id""".stripMargin,

    "q_sim_topk" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings),
        |p AS (SELECT embedding AS p_emb, nsq AS p_nsq FROM v WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(list_zip(v.embedding, p.p_emb),
        |      s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |      / (sqrt(v.nsq) * sqrt(p.p_nsq)) AS cos
        |  FROM v, p WHERE vec_id <> 0)
        |SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
        |FROM scored ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q_sim_topk_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding,
        |    CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings),
        |p AS (SELECT label AS p_label, embedding AS p_emb, nsq AS p_nsq FROM v WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(list_zip(v.embedding, p.p_emb),
        |      s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)
        |      / (sqrt(v.nsq) * sqrt(p.p_nsq)) AS cos
        |  FROM v JOIN p ON v.label = p.p_label WHERE vec_id <> 0)
        |SELECT vec_id, cos, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
        |FROM scored ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(len(string_split(text,' '))) AS BIGINT) AS sum_words,
        | CAST(max(len(string_split(text,' '))) AS INTEGER) AS max_words,
        | CAST(sum(len(string_split(text,' '))) AS DOUBLE)/count(*) AS avg_words
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, lang,
        | CAST(len(string_split(text,' ')) AS INTEGER) AS n_words,
        | CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_uniq,
        | CAST(len(list_filter(string_split(text,' '),
        |   t -> list_contains(['the','a','of','and','to','in'], t))) AS INTEGER) AS n_stop,
        | CAST(length(replace(text,' ','')) AS INTEGER) AS n_nospace,
        | CAST(length(replace(text,' ','')) AS DOUBLE)/len(string_split(text,' ')) AS avg_word_len,
        | CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)/len(string_split(text,' ')) AS uniq_ratio,
        | CAST(len(list_filter(string_split(text,' '),
        |   t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)/len(string_split(text,' ')) AS stop_ratio,
        | (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)/len(string_split(text,' ')))
        |   * (1.0 - CAST(len(list_filter(string_split(text,' '),
        |     t -> list_contains(['the','a','of','and','to','in'], t))) AS DOUBLE)/len(string_split(text,' '))) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text,' ')) AS INTEGER) AS ws_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS re_tokens,
        | CAST(length(text) AS INTEGER) AS n_chars_txt
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT)),
        |   (a, b) -> (a*31 + b) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_lang_id" ->
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |   CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','table','query'], t))) AS INTEGER) AS s_en,
        |   CAST(len(list_filter(string_split(text,' '), t -> list_contains(['join','row','group'], t))) AS INTEGER) AS s_de,
        |   CAST(len(list_filter(string_split(text,' '), t -> list_contains(['order','batch','scan'], t))) AS INTEGER) AS s_es,
        |   CAST(len(list_filter(string_split(text,' '), t -> list_contains(['key','sort','hash'], t))) AS INTEGER) AS s_fr,
        |   CAST(len(list_filter(string_split(text,' '), t -> list_contains(['data','stream','window'], t))) AS INTEGER) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q_multimodal_join" ->
      """SELECT doc_id, lang, source, n_chars, label,
        | CAST(len(embedding) AS INTEGER) AS dim
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,

    "q_multimodal_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | n_chars, 'utf8-text' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
