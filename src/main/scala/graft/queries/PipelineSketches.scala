package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based LLM-pipeline queries (MinHash+LSH, SimHash,
  * hyperplane-LSH ANN). No DuckDB oracle (engine-specific hashes —
  * SURVEY.md §7.8 ✖ class); verified by graft.SketchesSpec and the
  * driver's rows-only check. All deterministic across runs.
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
      // Same brute-force cosine top-k as the oracle-checked q_sim_topk,
      // but through the native codegen'd FloatCosine expression — the
      // actual hot path at scale (plain IEEE accumulation, so no
      // cross-engine oracle; FunctionsSpec pins it against the decimal
      // formulation).
      graft.functions.VectorFunctions.register(s)
      val e = Tables(s, dir, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"))
      val top = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .withColumn("cos", graft.functions.VectorFunctions
          .float_cosine(col("embedding"), col("p_emb")))
        .select(col("vec_id"), col("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cos").desc, col("vec_id"))
      top.withColumn("rank", row_number().over(w)).orderBy("rank")
    }),

    "q_sim_ann_lsh" -> ((s, dir) => {
      // Hyperplane-LSH ANN: bucket every vector by 6 sign bits, search
      // only buckets within hamming distance 1 of the probe's bucket
      // (multi-probe), rank candidates by exact cosine. At 100 TB the
      // corpus is stored bucket-partitioned so a probe touches ~7/64
      // of the data.
      val numPlanes = 6
      val e = Tables(s, dir, "embeddings")
        .withColumn("bucket",
          Sketches.hyperplaneBucket(col("embedding"), numPlanes, 64, seed = 7L))
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"), col("bucket").as("p_bucket"))
      val cands = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .filter(bit_count(col("bucket").bitwiseXOR(col("p_bucket"))) <= 1)
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
      top.withColumn("rank", row_number().over(w)).orderBy("rank")
    }),
  )

  def oracleSql: Map[String, String] = Map.empty
}
