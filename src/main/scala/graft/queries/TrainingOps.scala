package graft.queries

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Second-wave training-data pipeline operators, each with a DuckDB
  * oracle: dedup-cluster assignment (connected components over
  * near-dup candidate pairs), a distributed-bloom pre-filtered join,
  * PII masking, CDC latest-per-key compaction, and per-cell embedding
  * centroids (the k-means E-step shape).
  *
  * Scale posture notes sit on each query; the common theme is that
  * every shuffle carries keys/hashes, never document bodies, and the
  * iterative component loop converges in O(log max-component) rounds
  * via pointer jumping (the alternating-contraction trick from the
  * MapReduce connected-components literature, same family GraphX
  * uses).
  */
object TrainingOps extends QueryModule {

  /** (doc_id, ws) distinct word sets — the near-dup blocking input. */
  private def wordSets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))

  /** Candidate edges: windows of 4 consecutive doc ids with word-set
    * Jaccard >= 0.75. The window join is an equi-join on generated
    * candidate ids (no theta join): explode(sequence(id+1, id+4)).
    * Integer set sizes divide exactly the same in IEEE double on both
    * engines, so the threshold is cross-engine deterministic.
    */
  private def nearDupEdges(s: SparkSession, dir: String): DataFrame = {
    val w = wordSets(s, dir)
    val a = w.select(col("doc_id").as("u"), col("ws").as("a_ws"),
      explode(sequence(col("doc_id") + 1, col("doc_id") + 4)).as("v"))
    val b = w.select(col("doc_id").as("v"), col("ws").as("b_ws"))
    a.join(b, "v")
      .withColumn("jac",
        size(array_intersect(col("a_ws"), col("b_ws"))).cast("double") /
          size(array_union(col("a_ws"), col("b_ws"))))
      .filter(col("jac") >= 0.75)
      .select("u", "v")
  }

  /** Connected components: `vertices(n)` + undirected `edges(u, v)` →
    * labels `(n, l)` with l = min vertex id reachable from n. One join
    * + min-groupBy per round, propagating labels along graph edges AND
    * bidirectional label-pointer edges (n ⇄ l(n)) — the pointer edges
    * implement pointer jumping, so rounds = O(log max-component); each
    * round shuffles O(|E| + |V|) ids. Labels decrease monotonically,
    * so an unchanged sum(l) proves the fixpoint — the convergence
    * probe is a tiny agg, not a join. Labels are localCheckpointed per
    * round to cut lineage (at cluster scale: checkpoint to DFS).
    * RandomGraphSpec pins the result against a union-find reference on
    * random graphs.
    */
  private[graft] def connectedComponents(vertices: DataFrame,
      edges: DataFrame, driverMaxEdges: Long = 1L << 20): DataFrame = {
    // One materialization serves the adaptivity count AND whichever
    // path runs — without it the (expensive) edge plan would be fully
    // evaluated once for count() and again for collect()/the loop.
    val edgePairs = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v")).localCheckpoint()
    val edgeCount = edgePairs.count()
    // Adaptive small-graph path (the broadcast-join-threshold idea
    // applied to graphs): when the blocked candidate-pair set is small
    // enough to hold on the driver, a union-find beats ~log(component)
    // distributed rounds of job overhead. The distributed loop below
    // remains the path for edge sets that don't fit — the threshold is
    // on EDGES (bounded by the blocking strategy), not documents.
    // Both paths share one contract: labels are the min id reachable
    // over vertices ∪ edge endpoints, reported for the input vertices
    // (an endpoint absent from `vertices` still conducts connectivity).
    if (edgeCount <= driverMaxEdges) {
      val spark = vertices.sparkSession
      import spark.implicits._
      val es = edgePairs.as[(Long, Long)].collect()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) {
          parent(r) = parent.getOrElse(parent(r), parent(r)); r = parent(r)
        }
        r
      }
      es.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val roots = parent.keys.map(k => k -> find(k)).toSeq
      val rootsDf = broadcast(roots.toDF("rn", "rl"))
      return vertices.join(rootsDf, vertices("n") === col("rn"), "left")
        .select(col("n"), coalesce(col("rl"), col("n")).as("l"))
    }
    val es = edgePairs
      .union(edgePairs.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // label domain = vertices ∪ endpoints, so an endpoint-only id both
    // conducts and contributes its own id as a candidate label (the
    // union-find path behaves identically); reported rows are joined
    // back to the input vertices at the end
    var lbl = vertices.select(col("n"))
      .union(es.select(col("u").as("n"))).distinct()
      .select(col("n"), col("n").as("l")).localCheckpoint()
    // Option, not a sentinel value: vertex ids may be negative, so any
    // Long could be a genuine label sum
    var prevSum: Option[Long] = None
    var rounds = 0
    var converged = false
    while (!converged && rounds < 64) {
      val pointer = lbl.filter(col("n") =!= col("l"))
      val aug = es
        .union(pointer.select(col("l").as("u"), col("n").as("v")))
        .union(pointer.select(col("n").as("u"), col("l").as("v")))
      // localCheckpoint drops size stats, so Spark would sort-merge
      // this join every round; the label table is |V| ids — small at
      // this scale, so broadcast it (at 100-TB |V|, leave it to the
      // shuffle join / AQE instead)
      val offered = aug.join(broadcast(lbl), aug("u") === lbl("n"))
        .select(col("v").as("n"), col("l"))
      lbl = offered.union(lbl).groupBy("n").agg(min(col("l")).as("l"))
        .localCheckpoint()
      val sumRow = lbl.agg(org.apache.spark.sql.functions.sum(col("l"))).head()
      // empty vertex set → sum(l) is NULL → nothing to propagate
      val sum = if (sumRow.isNullAt(0)) None else Some(sumRow.getLong(0))
      converged = sum.isEmpty || sum == prevSum
      prevSum = sum
      rounds += 1
    }
    lbl.join(vertices.select(col("n")), Seq("n"))
  }

  /** Gear-table content-defined chunking (the FastCDC/rsync family):
    * roll `h = (h << 1) + gear(byte)` — the shift implicitly ages
    * bytes out after 64 steps, so a boundary decision depends only on
    * a sliding window of recent content and chunking RESYNCHRONIZES
    * after an edit (ChunkingSpec pins this). Boundary when the low
    * `maskBits` bits are zero (expected chunk ~2^maskBits bytes),
    * bounded to [minLen, maxLen]. Returns (start, len, md5hex).
    */
  private val gear: Array[Long] = {
    val rnd = new java.util.Random(42) // spec-fixed PRNG: stable across JVMs
    Array.fill(256)(rnd.nextLong())
  }

  /** The boundary decision only reads the low 6 bits of the rolling
    * hash, and h mod 64 is closed under the roll:
    * (h<<1 + g) mod 64 = (2*(h mod 32) + g mod 64) mod 64. So the
    * chunker's boundary behavior is a 6-bit automaton whose transition
    * table is gear mod 64 — exposed here so the DuckDB oracle can
    * replay the identical automaton with a recursive CTE and plain
    * integer arithmetic (no 64-bit wraparound anywhere).
    */
  private[queries] def gearMod64: Array[Long] = gear.map(_ & 63L)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(hexDigits((b(i) >> 4) & 0xF)).append(hexDigits(b(i) & 0xF))
      i += 1
    }
    sb.toString
  }

  private[graft] def cdcChunks(bytes: Array[Byte], minLen: Int = 24,
      maxLen: Int = 256, maskBits: Int = 6,
      digest: java.security.MessageDigest = null): Seq[(Int, Int, String)] = {
    val mask = (1L << maskBits) - 1
    // caller may pass a per-partition digest to amortize getInstance
    // across the corpus; reset() makes reuse safe per chunk
    val md = if (digest != null) digest
      else java.security.MessageDigest.getInstance("MD5")
    val out = Seq.newBuilder[(Int, Int, String)]
    def emit(start: Int, len: Int): Unit = {
      md.reset()
      md.update(bytes, start, len)
      out += ((start, len, toHex(md.digest())))
    }
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0) || len >= maxLen) {
        emit(start, len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) emit(start, bytes.length - start)
    out.result()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_clusters" -> QueryModule.micro(4)((s, dir) => {
      // Connected components over the near-dup edges: every document
      // gets cluster_id = min doc_id reachable through pairs — the
      // canonical-representative assignment a dedup pipeline feeds to
      // the keep-one filter. One join + min-groupBy per round,
      // propagating labels along graph edges AND bidirectional
      // label-pointer edges (n ⇄ l(n)) — the pointer edges implement
      // pointer jumping, so rounds = O(log max-component); each round
      // shuffles O(|E| + |V|) ids, never text. Labels decrease
      // monotonically, so an unchanged sum(l) proves the fixpoint —
      // the convergence probe is a tiny agg, not a join. Labels are
      // localCheckpointed per round to cut lineage (at cluster scale:
      // checkpoint to DFS instead).
      val vertices = wordSets(s, dir).select(col("doc_id").as("n"))
      val lbl = connectedComponents(vertices, nearDupEdges(s, dir))
      val sizes = lbl.groupBy(col("l").as("cl")).agg(count(lit(1)).as("n_in_cluster"))
      lbl.join(sizes, lbl("l") === sizes("cl"))
        .select(col("n").as("doc_id"), col("l").as("cluster_id"),
          col("n_in_cluster"))
        .orderBy("doc_id")
    }),

    "q_join_bloom" -> ((s, dir) => {
      // Distributed bloom-filter semi-join: the dim-side key set is
      // folded into a bloom sketch with Spark's own BloomFilterAggregate
      // (one partial sketch per partition, merged — no driver collect of
      // keys), and the fact side is pre-filtered by a codegen'd
      // might_contain probe BEFORE the shuffle/semi-join. At 100 TB this
      // is the shuffle-killer for selective joins: non-matching fact
      // rows die at the scan. False positives are then removed by the
      // exact semi join, so the result equals the plain semi join the
      // oracle runs.
      import org.apache.spark.sql.catalyst.expressions.{
        BloomFilterMightContain, Literal, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val dim = Tables(s, dir, "supplier")
        .filter(col("s_nationkey") === 5).select("s_suppkey")
      val bloomBytes = dim.select(GraftPlanBridge.column(
          new BloomFilterAggregate(
            new XxHash64(Seq(GraftPlanBridge.expression(col("s_suppkey")))),
            Literal(100000L), Literal(800000L)).toAggregateExpression()))
        .head().getAs[Array[Byte]](0)
      val probe = GraftPlanBridge.column(BloomFilterMightContain(
        Literal(bloomBytes),
        new XxHash64(Seq(GraftPlanBridge.expression(col("l_suppkey"))))))
      Tables(s, dir, "lineitem")
        .filter(probe) // bloom pre-filter (codegen, superset of matches)
        .join(dim.hint("broadcast"), col("l_suppkey") === col("s_suppkey"),
          "left_semi") // exactness
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(Tables.dec(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy("l_suppkey")
    }),

    "q_text_pii_mask" -> ((s, dir) => {
      // PII scrub over synthesized raw log lines (the testdata carries
      // no natural PII, so the line is built deterministically from
      // customer fields, then masked): emails → <EMAIL>, digit runs of
      // 4+ → <NUM>. Pure regexp_replace chain — codegen'd, narrow, no
      // shuffle except the final sort.
      Tables(s, dir, "customer")
        .withColumn("raw",
          concat(col("c_name"), lit(" <"),
            lower(regexp_replace(col("c_name"), " ", ".")),
            lit("@example.com> acct:"),
            (col("c_custkey") * 7919).cast("string"),
            lit(" seg="), col("c_mktsegment")))
        .withColumn("masked",
          regexp_replace(
            regexp_replace(col("raw"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
            "[0-9]{4,}", "<NUM>"))
        .select(col("c_custkey"), col("raw"), col("masked"))
        .orderBy("c_custkey")
    }),

    "q_window_dedup" -> ((s, dir) => {
      // CDC compaction / latest-per-key dedup: keep each user's newest
      // event (ties broken by event_id). One hash-partition by user_id
      // + in-partition sort — the canonical "current state of the
      // world" query over an append-only log.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .orderBy("user_id")
    }),

    "lake_incremental" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-style CDC consumption under the oracle gate: three
      // appends split on a deterministic predicate, then
      // changesBetween(snap1, snap3] returns exactly the second and
      // third batches — incremental consumers resume from a snapshot
      // id and never rescan history (metadata-only planning: the
      // snapshot range selects data files directly).
      import graft.lake.{Engine, LakeTable}
      val wh = LakeQueries.freshWarehouse("incr")
      Engine.processTableDefJson(wh,
        """{"database_name":"rq","table_name":"ord_inc","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rq", "ord_inc")
      val src = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val snap1 = t.append(src.filter(col("o_orderkey") % 3 === 0)).id
      t.append(src.filter(col("o_orderkey") % 3 === 1))
      val snap3 = t.append(src.filter(col("o_orderkey") % 3 === 2)).id
      t.changesBetween(s, snap1, snap3)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "q_join_skew_salted" -> ((s, dir) => {
      // Salted shuffle join for hot keys: the fact side's key space is
      // deliberately skewed (half of lineitem lands on key 0); salting
      // fans each key across 16 reducers (salt = hash(rowid) % 16) and
      // replicates the matching dim row per salt, so no single reducer
      // owns a hot key. Result == the plain join the oracle runs. (AQE
      // skew-join splitting is the automatic variant; salting is the
      // pattern when the skew is known and the dim side replicates
      // cheaply.)
      val fact = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"),
          when(col("l_partkey") % 10 < 5, lit(0L))
            .otherwise(col("l_partkey")).as("k"),
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)).as("salt"))
      val dim = Tables(s, dir, "part")
        .select(when(col("p_partkey") % 10 < 5, lit(0L))
            .otherwise(col("p_partkey")).as("k"),
          col("p_retailprice"))
        .groupBy("k")
        .agg(min(col("p_retailprice")).cast("double").as("dim_price"))
      val dimSalted = dim.crossJoin(
        s.range(16).select(col("id").cast("int").as("salt")))
      fact.hint("merge")
        .join(dimSalted, Seq("k", "salt"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Tables.dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          min(col("dim_price")).as("dim_price"))
        .filter(col("k") < 200)
        .orderBy("k")
    }),

    "q_stream_dedup" -> QueryModule.micro(1)((s, dir) => {
      // Cross-batch streaming dedup (flatMapGroupsWithState) fed
      // through the graft-lake DSv2 streaming source — zero driver-side
      // collect of data rows: the events slice lands in a bronze lake
      // table as two append snapshots, and ONE Trigger.AvailableNow
      // query with maxSnapshotsPerTrigger=1 (the source's admission
      // control) delivers them as two micro-batches — dedup state
      // carries across batches, so batch 1's keys stay deduped in
      // batch 2 (batch 1 wins over batch 2, and within a batch the
      // smallest id wins). Output flows through the DSv2 streaming
      // sink into a silver lake table.
      import graft.lake.{Engine, LakeTable}
      import graft.streaming.Stateful
      val wh = LakeQueries.freshWarehouse("streamdedup")
      Engine.processTableDefJson(wh,
        """{"database_name":"sd","table_name":"bronze","columns":[
          |{"column_name":"key","data_type":"string"},
          |{"column_name":"docId","data_type":"long"},
          |{"column_name":"ts","data_type":"timestamp"}],"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"sd","table_name":"silver","columns":[
          |{"column_name":"key","data_type":"string"},
          |{"column_name":"docId","data_type":"long"}],"partitions":[]}""".stripMargin)
      val bronze = LakeTable.load(wh, "sd", "bronze")
      val slice = Tables(s, dir, "events")
        .filter(col("event_id") < 3000)
        .select(concat(col("user_id").cast("string"), lit(":"),
            col("event_type")).as("key"),
          col("event_id").as("docId"), col("ts"))
      bronze.append(slice.filter(col("docId") < 1500))
      bronze.append(slice.filter(col("docId") >= 1500))
      locally {
        import s.implicits._
        val in = s.readStream.format("graft-lake")
          .option("warehouse", wh).option("database", "sd")
          .option("table", "bronze")
          // one snapshot per micro-batch: AvailableNow drains both
          // appends as two batches through one query — state recovery
          // between them exercises the same cross-batch path as two
          // separate runs, at half the query-startup cost
          .option("maxSnapshotsPerTrigger", "1").load()
          // lake timestamps surface as NTZ; the watermark needs an
          // instant — identical UTC wall clock under the UTC session
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "10 minutes")
          .as[Stateful.Doc]
        Stateful.dedupFirstSeen(in, ttlMs = 365L * 24 * 3600 * 1000)
          .writeStream.format("graft-lake")
          .option("warehouse", wh).option("database", "sd")
          .option("table", "silver")
          .option("checkpointLocation", s"$wh/_cp_dedup")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      LakeTable.load(wh, "sd", "silver").read(s)
        .select(col("key"), col("docId").as("first_event_id"))
        .orderBy("key")
    }),

    "stream_lake_upsert" -> QueryModule.micro(1)((s, dir) => {
      // streaming CDC upsert pipeline: bronze append snapshots stream
      // through the rate-limited DSv2 source into the equality-delete
      // upsert sink — silver holds the newest event per user with zero
      // reads of silver at write time (blind upserts, O(batch) per
      // commit). Two micro-batches through one query; the later batch
      // supersedes the earlier per key via data sequence numbers.
      import graft.lake.{Engine, LakeTable}
      import graft.streaming.StreamIngest
      val wh = LakeQueries.freshWarehouse("streamupsert")
      Engine.processTableDefJson(wh,
        """{"database_name":"su","table_name":"bronze","columns":[
          |{"column_name":"user_id","data_type":"long"},
          |{"column_name":"event_id","data_type":"long"},
          |{"column_name":"event_type","data_type":"string"},
          |{"column_name":"ts","data_type":"timestamp"}],"partitions":[]}""".stripMargin)
      // silver declares its row identity ONCE (identifier-fields):
      // the upsert sink below passes no keys — every CDC writer
      // inherits the same identity from the table, none can drift
      Engine.processTableDefJson(wh,
        """{"database_name":"su","table_name":"silver","columns":[
          |{"column_name":"user_id","data_type":"long","required":true},
          |{"column_name":"latest_event_id","data_type":"long"},
          |{"column_name":"event_type","data_type":"string"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"user_id"}}""".stripMargin)
      val bronze = LakeTable.load(wh, "su", "bronze")
      val slice = Tables(s, dir, "events")
        .filter(col("event_id") < 3000)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"))
      bronze.append(slice.filter(col("event_id") < 1500))
      bronze.append(slice.filter(col("event_id") >= 1500))
      val in = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "su")
        .option("table", "bronze")
        .option("maxSnapshotsPerTrigger", "1").load()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("latest_event_id", col("event_id"))
      StreamIngest.upsertIntoLake(in, wh, "su", "silver",
        orderBy = Seq("ts", "event_id"),
        checkpoint = s"$wh/_cp_upsert").awaitTermination()
      LakeTable.load(wh, "su", "silver").read(s)
        .select("user_id", "latest_event_id", "event_type")
        .orderBy("user_id")
    }),

    "lake_meta_tables" -> QueryModule.micro(1)((s, _) => {
      // Iceberg-style metadata inspection through SQL: the snapshot
      // log and the file inventory are relations
      // (graft.<db>.<t>.snapshots / .files). Output keeps only the
      // parallelism-independent facts (ids, operations, row counts).
      import graft.lake.{Engine, LakeTable}
      val wh = LakeQueries.freshWarehouse("meta")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"mt","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "d", "mt")
      import s.implicits._
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
      t.append(Seq((3L, "c")).toDF("id", "v").coalesce(1))
      t.delete(s, col("id") === 2L)
      s.conf.set("spark.sql.catalog.graftmeta", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftmeta.warehouse", wh)
      s.sql("""SELECT 'snapshot' AS kind, snapshot_id, operation, n_rows
              |FROM graftmeta.d.mt.snapshots
              |UNION ALL
              |SELECT 'files_all', 0, 'sum', sum(rows)
              |FROM graftmeta.d.mt.files
              |UNION ALL
              |SELECT 'manifest', snapshot_id, 'summary', n_rows
              |FROM graftmeta.d.mt.manifests
              |ORDER BY kind, snapshot_id""".stripMargin)
    }),

    "q_multimodal_frames" -> ((s, dir) => {
      // Video-shaped multimodal plumbing under the oracle gate: payload
      // → resize (metadata rewrite) → every-4th fixed-16-byte frame
      // sample (posexplode, narrow). The oracle recomputes the emitted
      // frame counts and byte totals from the text byte lengths alone,
      // so the binary slicing itself is what's being checked.
      import graft.multimodal.Multimodal
      val media = Multimodal.resizeStub(
        Multimodal.asMediaTable(Tables(s, dir, "documents"), "doc_id", "text"),
        w = 64, h = 48)
      val frames = Multimodal.frameSample(media, frameBytes = 16, everyK = 4)
      frames.groupBy("media_id")
        .agg(count(lit(1)).as("n_frames_emitted"),
          sum(length(col("frame"))).as("total_frame_bytes"))
        .join(media.select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height")), "media_id")
        .select("media_id", "width", "height", "n_frames_emitted",
          "total_frame_bytes")
        .orderBy("media_id")
    }),

    "stream_lake_pipe" -> QueryModule.micro(1)((s, dir) => {
      // End-to-end medallion hop under the oracle gate: bronze lake
      // table (real customer rows) → DSv2 streaming read → filter +
      // projection → DSv2 streaming sink into silver → batch read
      // back. Exercises snapshot offsets, executor-side parquet
      // writers, and epoch-tagged commits in one pipeline; the oracle
      // recomputes the same transform over the source parquet.
      import graft.lake.{Engine, LakeTable}
      val wh = LakeQueries.freshWarehouse("pipe")
      Engine.processTableDefJson(wh,
        """{"database_name":"p","table_name":"bronze","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"}],"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"p","table_name":"silver","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"name_up","data_type":"string"}],"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "p", "bronze")
        .append(Tables(s, dir, "customer").select("c_custkey", "c_name"))
      val q = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "p").option("table", "bronze")
        .load()
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), upper(col("c_name")).as("name_up"))
        .writeStream.format("graft-lake")
        .option("warehouse", wh).option("database", "p").option("table", "silver")
        .option("checkpointLocation", s"$wh/_cp_pipe")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      LakeTable.load(wh, "p", "silver").read(s)
        .select("c_custkey", "name_up").orderBy("c_custkey")
    }),

    "q_text_cdc_chunks" -> ((s, dir) => {
      // Content-defined chunking (rolling-hash boundaries, the
      // FastCDC/rsync idea): chunk boundaries depend on local content,
      // not absolute offsets, so an insertion only reshapes chunks
      // near the edit — the property that makes chunk-hash dedup
      // robust to shifted text. JVM kernel per document (narrow, no
      // shuffle before the final agg); ChunkingSpec pins tiling and
      // shift-stability. Output keeps per-doc aggregates (chunk count,
      // bytes, distinct hashes); the DuckDB oracle replays the chunker
      // as a 6-bit automaton (gearMod64) in a recursive CTE.
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions { iter =>
          // one digest per partition, reset per chunk (the
          // getInstance-per-chunk cost is what mapPartitions amortizes)
          val md = java.security.MessageDigest.getInstance("MD5")
          iter.map { case (id, text) =>
            val chunks = TrainingOps.cdcChunks(text.getBytes("UTF-8"),
              digest = md)
            (id, chunks.length.toLong,
              chunks.map(_._2.toLong).sum,
              chunks.map(_._3).distinct.length.toLong)
          }
        }
        .toDF("doc_id", "n_chunks", "total_bytes", "n_distinct_hashes")
        .orderBy("doc_id")
    }),

    "q_dedup_chunk_overlap" -> ((s, dir) => {
      // Chunk-granularity near-dup: fixed-stride 64-char chunks are
      // hashed and self-joined — doc pairs sharing many identical
      // chunks are near-dup candidates even when whole-doc hashes
      // differ. The shuffle carries 32-char hex digests, never text;
      // blocking is by chunk hash, so pair generation is proportional
      // to actual overlap, not the corpus square.
      // localCheckpoint (r17): both join sides consume the SAME chunk
      // digest relation, but the two subtrees don't canonicalize equal
      // (different aliases under different join requirements), so the
      // runtime ran the chunk+md5 expansion twice (two documents scans
      // in the executed plan). The checkpointed relation is narrow —
      // (doc_id, 32-char digest) per chunk, never text — and both
      // sides read it back.
      val chunks = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), greatest(length(col("text")), lit(1)),
            lit(64))).as("start"))
        .select(col("doc_id"),
          md5(expr("substring(text, CAST(start AS INT), 64)")).as("h"))
        .localCheckpoint()
      val a = chunks.select(col("doc_id").as("a_id"), col("h"))
      val b = chunks.select(col("doc_id").as("b_id"), col("h"))
      a.join(b, Seq("h")).filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_shared_chunks"))
        .filter(col("n_shared_chunks") >= 2)
        .orderBy("a_id", "b_id")
    }),

    "q_pipeline_end2end" -> ((s, dir) => {
      // The whole preprocessing recipe as ONE declarative plan — what a
      // training-data job actually runs nightly: exact-dedup (keep the
      // smallest doc_id per content hash) → length gate → per-language
      // corpus stats (docs, tokens, chars). Catalyst fuses the dedup
      // aggregation and the join; everything before the final agg
      // shuffles hashes and ids, not text bodies.
      val docs = Tables(s, dir, "documents")
      val keep = docs
        .groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      docs.join(keep, "doc_id")
        .filter(col("n_chars").between(40, 100000))
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    "q_text_vocab" -> ((s, dir) => {
      // Vocabulary extraction / exact heavy hitters (the BPE-training
      // precursor): corpus-wide token counts, keep tokens above a
      // support threshold, rank by (count desc, token). Partial
      // aggregation collapses each task to its distinct tokens before
      // the exchange — the shuffle is vocabulary-sized, not
      // corpus-sized. The rank is NOT a global Window.orderBy (a
      // single-task sort at 100-TB vocab): range-partition in rank
      // order, then zipWithIndex — a per-partition count job + a
      // broadcast of cumulative offsets over the same shuffle files —
      // keeps every step partition-parallel with identical output.
      import s.implicits._
      val sorted = Tables(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token")
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= 50)
        .repartitionByRange(col("n_occurrences").desc, col("token"))
        .sortWithinPartitions(col("n_occurrences").desc, col("token"))
        .as[(String, Long)]
        .rdd
      sorted.zipWithIndex()
        .map { case ((tok, n), i) => (tok, n, (i + 1).toInt) }
        .toDF("token", "n_occurrences", "rank")
        .orderBy("rank")
    }),

    "q_text_rarity" -> ((s, dir) => {
      // Rare-token curation stats (the rare-token-filtering shape:
      // documents dominated by near-unique tokens are OCR noise /
      // mojibake candidates; documents with none are boilerplate).
      // One corpus scan (r17; was two — the explode subtree is narrow,
      // so the old freq branch re-scanned and re-exploded documents):
      // (doc, token) occurrence counts first — partial aggregation
      // collapses repeats before the exchange, so every downstream
      // step carries distinct (doc, token) pairs (~2.3× fewer rows at
      // this fixture's repetition rate), never the raw occurrence
      // stream. Occurrence weights ride as `c`, so the per-doc sums
      // are unchanged integers. localCheckpoint because the two
      // consumers never share the subtree otherwise: the join pushes
      // an isnotnull(token) filter below its side's aggregate, so the
      // two (doc,token) exchanges don't canonicalize equal and the
      // runtime re-ran the scan+tokenize (same disease and fix as
      // q_tfidf). All-integer outputs, so the oracle is exact at any
      // scale.
      val tc = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val freq = tc.groupBy("token")
        .agg(sum(col("c")).as("freq"))
      tc.join(freq, "token")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(when(col("freq") <= 2, col("c")).otherwise(0L)).as("n_rare"),
          sum(when(col("freq") === 1, col("c")).otherwise(0L)).as("n_hapax"),
          min(col("freq")).as("min_freq"))
        .orderBy("doc_id")
    }),

    "q_dedup_incremental" -> ((s, dir) => {
      // Incremental exact dedup (batch-vs-index): new documents check
      // against the EXISTING corpus's digest set and against earlier
      // docs of their own batch — the production shape, where
      // re-deduplicating the whole corpus per ingest would be O(corpus)
      // instead of O(batch). Both probes are digest-keyed joins (32-byte
      // keys, the index side is a distinct-digest set — at 100 TB the
      // index digests are a fraction of corpus bytes and the batch side
      // broadcasts when small).
      // localCheckpoint (r17): the digest relation feeds FOUR consumers
      // (the split-point aggregate, the index side, the batch side, and
      // the batch's first-per-digest rollup) and none of their subtrees
      // canonicalize equal — the runtime re-ran the scan + sha2 pass
      // per consumer. (doc_id, 64-char digest) rows only, never text.
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .localCheckpoint()
      // floor on BOTH engines: Spark's long cast truncates while
      // DuckDB's CAST(double AS BIGINT) rounds — an explicit floor
      // keeps the split identical whatever max(doc_id) mod 5 is
      val split = docs.agg(floor(max(col("doc_id")) * 3 / 5).cast("long"))
        .first().getLong(0)
      val index = docs.filter(col("doc_id") < split)
        .select(col("h")).distinct()
        .withColumn("in_index", lit(1L))
      val batch = docs.filter(col("doc_id") >= split)
      val firstInBatch = batch.groupBy("h")
        .agg(min(col("doc_id")).as("first_id"))
      batch.join(index, Seq("h"), "left")
        .join(firstInBatch, "h")
        .select(col("doc_id"),
          coalesce(col("in_index"), lit(0L)).as("dup_of_index"),
          when(col("doc_id") > col("first_id"), 1L).otherwise(0L)
            .as("dup_in_batch"))
        .withColumn("keep",
          when(col("dup_of_index") === 0L && col("dup_in_batch") === 0L, 1L)
            .otherwise(0L))
        .orderBy("doc_id")
    }),

    "q_embed_quantize" -> ((s, dir) => {
      // Scalar int8 quantization (vector-storage compression):
      // round(x * 127) clamped to [-127, 127] per dimension — 4x
      // smaller vectors for ANN shortlists. Integer outputs, so the
      // oracle is exact; leading 4 dims reported per vector.
      Tables(s, dir, "embeddings")
        // slice BEFORE exploding: 4 generated rows per vector instead
        // of dim-many generated-then-discarded (pos restarts at 0 on
        // the slice, so `dim` is unchanged)
        .select(col("vec_id"),
          posexplode(slice(col("embedding"), 1, 4)).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          greatest(lit(-127), least(lit(127),
            round(col("x").cast("double") * 127).cast("int"))).as("q"))
        .orderBy("vec_id", "dim")
    }),

    "q_sim_range_refpoints" -> ((s, dir) => {
      // Reference-point pruned range search (REPOSE, ICDE'21 — see
      // PAPERS.md): precompute each vector's distance to a few fixed
      // reference vectors; the triangle inequality gives
      // |d(v,r) − d(q,r)| ≤ d(v,q), so a candidate whose bound exceeds
      // the radius dies on a cheap scalar comparison — no vector math,
      // no shuffle — before the exact distance runs. The BOUND side is
      // pure double math through the codegen'd float_dot kernel with an
      // outward-rounded 1e-4 margin (r17 — the r16 sf1 lane caught the
      // decimal-exact kernels running on every corpus row turning the
      // index build superlinear in wall: a conservative bound only needs
      // to never UNDERestimate, and double accumulation over dim-64
      // float vectors is exact to ~1e-12, so the margin overwhelms it
      // the same way the parquet float-predicate pushdown widens its
      // bounds). Exactness lives ONLY in the survivor verification: the
      // final filter recomputes true distances with the decimal kernels,
      // so the result equals the oracle's brute force (the prune drops
      // provable misses; the margin only widens the survivor set).
      graft.functions.VectorFunctions.register(s)
      import graft.functions.{DecVector, VectorFunctions}
      val radius = 1.25
      val v = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      // probe (vec 0) + reference vectors (vecs 1-3): tiny, driver-held
      val pivots = v.filter(col("vec_id") <= 3)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val probe = pivots(0L)
      def arr(a: Array[Float]) = typedlit(a)
      def nsqOf(a: Array[Float]): Double = {
        val g = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          a.map(x => x: Any))
        DecVector.normSq(g).doubleValue
      }
      def dblNsq(a: Array[Float]): Double = {
        var s2 = 0.0; var i = 0
        while (i < a.length) { s2 += a(i).toDouble * a(i).toDouble; i += 1 }
        s2
      }
      def refDist(a: Array[Float], b: Array[Float]): Double = {
        var s2 = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s2 += d * d; i += 1 }
        math.sqrt(s2)
      }
      val refs = Seq(1L, 2L, 3L).map(pivots)
      // "index build": per-vector reference distances in double math —
      // at scale these are computed once at ingest and stored beside the
      // vector, so a probe pays only scalar comparisons until the prune
      // passes. greatest(sq, 0): last-ulp cancellation near zero must
      // not feed sqrt a tiny negative.
      def dblDistTo(other: Array[Float]) = sqrt(greatest(
        col("fnsq") + lit(dblNsq(other)) -
          lit(2.0) * VectorFunctions.float_dot(col("embedding"), arr(other)),
        lit(0.0)))
      val base = v.filter(col("vec_id") =!= 0).withColumn("fnsq",
        VectorFunctions.float_dot(col("embedding"), col("embedding")))
      val indexed = refs.zipWithIndex.foldLeft(base) {
        case (d, (r, i)) => d.withColumn(s"dref_$i", dblDistTo(r))
      }
      val bounds = refs.zipWithIndex.map { case (r, i) =>
        abs(col(s"dref_$i") - lit(refDist(probe, r))) - lit(1e-4)
      }
      // exact math (decimal kernels), SURVIVORS only — the filter below
      // runs before this projection in the same codegen stage
      val exactDist = sqrt(
        VectorFunctions.dec_normsq(col("embedding")) + lit(nsqOf(probe)) -
          lit(2.0) * VectorFunctions.dec_dot(col("embedding"), arr(probe)))
      indexed
        .filter(bounds.reduce(greatest(_, _)) <= radius) // prune (scalars)
        .withColumn("dist", exactDist)
        .filter(col("dist") <= radius)
        .select(col("vec_id"),
          col("dist").cast("decimal(12,9)").cast("double").as("dist"))
        .orderBy("vec_id")
    }),

    "q_embed_centroid" -> ((s, dir) => {
      // Per-label centroid, the k-means E-step shape: posexplode the
      // vector, aggregate per (label, dim) — the shuffle carries
      // (label, dim, value), and partial aggregation collapses it to
      // cells × dim rows before the exchange. Decimal power sums +
      // closed-form double division + narrow-decimal rounding, the
      // same cross-engine determinism recipe as q_stats_corr.
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("x").cast("double").cast("decimal(28,12)")).as("sx"))
        .select(col("label"), col("dim"), col("n_vecs"),
          (col("sx").cast("double") / col("n_vecs").cast("double"))
            .cast("decimal(15,9)").cast("double").as("centroid"))
        .filter(col("dim") < 8) // report the leading block; full width is the same plan
        .orderBy("label", "dim")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // Golden VALUES pin: the metadata-table fixture is frozen (three
    // deterministic commits), so snapshot ids / operations / row
    // accounting are constants — see LakeQueries.oracleSql for the
    // pinning rationale and the regeneration recipe.
    "lake_meta_tables" ->
      """SELECT CAST(kind AS VARCHAR) AS kind,
        |  CAST(snapshot_id AS BIGINT) AS snapshot_id,
        |  CAST(operation AS VARCHAR) AS operation,
        |  CAST(n_rows AS BIGINT) AS n_rows
        |FROM (VALUES
        |  ('files_all', 0, 'sum', 2),
        |  ('manifest', 1, 'summary', 2),
        |  ('manifest', 2, 'summary', 1),
        |  ('manifest', 3, 'summary', 1),
        |  ('snapshot', 1, 'append', 2),
        |  ('snapshot', 2, 'append', 1),
        |  ('snapshot', 3, 'overwrite', 1))
        |  AS t(kind, snapshot_id, operation, n_rows)
        |ORDER BY kind, snapshot_id""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
        |  FROM documents),
        |e AS (
        |  SELECT a.doc_id AS u, b.doc_id AS v
        |  FROM w a JOIN w b
        |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 4
        |  WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |        / len(list_distinct(a.ws || b.ws)) >= 0.75),
        |es AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |r AS (
        |  SELECT doc_id AS n, doc_id AS l FROM w
        |  UNION
        |  SELECT es.v, r.l FROM r JOIN es ON es.u = r.n WHERE r.l < es.v),
        |lbl AS (SELECT n, min(l) AS cluster_id FROM r GROUP BY n)
        |SELECT n AS doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_in_cluster
        |FROM lbl ORDER BY doc_id""".stripMargin,

    "q_join_bloom" ->
      """SELECT l_suppkey, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_suppkey IN (
        |  SELECT s_suppkey FROM supplier WHERE s_nationkey = 5)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q_text_pii_mask" ->
      """SELECT c_custkey,
        |  c_name || ' <' || lower(replace(c_name, ' ', '.'))
        |    || '@example.com> acct:' || CAST(c_custkey * 7919 AS VARCHAR)
        |    || ' seg=' || c_mktsegment AS raw,
        |  regexp_replace(
        |    regexp_replace(
        |      c_name || ' <' || lower(replace(c_name, ' ', '.'))
        |        || '@example.com> acct:' || CAST(c_custkey * 7919 AS VARCHAR)
        |        || ' seg=' || c_mktsegment,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g') AS masked
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_window_dedup" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,

    "lake_incremental" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 3 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_skew_salted" ->
      """WITH dim AS (
        |  SELECT CASE WHEN p_partkey % 10 < 5 THEN 0 ELSE p_partkey END AS k,
        |    CAST(min(p_retailprice) AS DOUBLE) AS dim_price
        |  FROM part GROUP BY 1),
        |fact AS (
        |  SELECT CASE WHEN l_partkey % 10 < 5 THEN 0 ELSE l_partkey END AS k,
        |    l_extendedprice
        |  FROM lineitem)
        |SELECT k, count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(dim_price) AS dim_price
        |FROM fact JOIN dim USING (k)
        |WHERE k < 200
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_stream_dedup" ->
      """SELECT key, first_event_id FROM (
        |  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key,
        |    coalesce(min(CASE WHEN event_id < 1500 THEN event_id END),
        |             min(event_id)) AS first_event_id
        |  FROM events WHERE event_id < 3000 GROUP BY 1)
        |ORDER BY key""".stripMargin,

    "stream_lake_pipe" ->
      """SELECT c_custkey, upper(c_name) AS name_up
        |FROM customer WHERE c_custkey % 2 = 0
        |ORDER BY c_custkey""".stripMargin,

    // the later micro-batch (event_id >= 1500) wins per key regardless
    // of timestamp (blind upsert = last WRITE wins); within a batch the
    // newest (ts, event_id) wins
    "stream_lake_upsert" ->
      """SELECT user_id, event_id AS latest_event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY (event_id >= 1500) DESC, CAST(ts AS TIMESTAMP) DESC,
        |      event_id DESC) AS rn
        |  FROM events WHERE event_id < 3000)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_sim_range_refpoints" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(embedding,
        |      x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |        AS DECIMAL(28,12)))) AS DOUBLE) AS nsq
        |  FROM embeddings),
        |p AS (SELECT embedding AS pe, nsq AS pnsq FROM v WHERE vec_id = 0)
        |SELECT vec_id,
        |  CAST(CAST(sqrt((v.nsq + p.pnsq) -
        |    (2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, p.pe),
        |      s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |        AS DECIMAL(28,12)))) AS DOUBLE))) AS DECIMAL(12,9)) AS DOUBLE)
        |    AS dist
        |FROM v, p
        |WHERE vec_id <> 0
        |  AND sqrt((v.nsq + p.pnsq) -
        |    (2.0 * CAST(list_sum(list_transform(list_zip(v.embedding, p.pe),
        |      s -> CAST(CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)
        |        AS DECIMAL(28,12)))) AS DOUBLE))) <= 1.25
        |ORDER BY vec_id""".stripMargin,

    "q_text_vocab" ->
      """SELECT token, n_occurrences, rank FROM (
        |  SELECT token, count(*) AS n_occurrences,
        |    row_number() OVER (ORDER BY count(*) DESC, token) AS rank
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0
        |  GROUP BY token)
        |WHERE n_occurrences >= 50
        |ORDER BY rank""".stripMargin,

    "q_text_rarity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tok AS (SELECT * FROM toks WHERE length(token) > 0),
        |freq AS (SELECT token, count(*) AS freq FROM tok GROUP BY token)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN freq <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(min(freq) AS BIGINT) AS min_freq
        |FROM tok JOIN freq USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH docs AS (
        |  SELECT doc_id, sha256(text) AS h FROM documents),
        |split AS (SELECT CAST(floor(max(doc_id) * 3 / 5) AS BIGINT) AS s
        |          FROM docs),
        |idx AS (SELECT DISTINCT h FROM docs, split WHERE doc_id < s),
        |batch AS (SELECT doc_id, h FROM docs, split WHERE doc_id >= s),
        |fib AS (SELECT h, min(doc_id) AS first_id FROM batch GROUP BY h)
        |SELECT b.doc_id,
        |  CAST(CASE WHEN i.h IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS dup_of_index,
        |  CAST(CASE WHEN b.doc_id > f.first_id THEN 1 ELSE 0 END AS BIGINT)
        |    AS dup_in_batch,
        |  CAST(CASE WHEN i.h IS NULL AND b.doc_id = f.first_id
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM batch b LEFT JOIN idx i ON b.h = i.h
        |JOIN fib f ON b.h = f.h
        |ORDER BY b.doc_id""".stripMargin,

    "q_embed_quantize" ->
      """SELECT vec_id, t.i AS dim,
        |  CAST(greatest(-127, least(127,
        |    round(CAST(embedding[t.i + 1] AS DOUBLE) * 127))) AS INTEGER) AS q
        |FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
        |WHERE t.i < 4
        |ORDER BY vec_id, dim""".stripMargin,

    "q_pipeline_end2end" ->
      """WITH keep AS (
        |  SELECT min(doc_id) AS doc_id
        |  FROM documents GROUP BY md5(text) -- any content hash works: keep-one per identical text
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents JOIN keep USING (doc_id)
        |WHERE n_chars BETWEEN 40 AND 100000
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dedup_chunk_overlap" ->
      """WITH chunks AS (
        |  SELECT doc_id,
        |    md5(substring(text, CAST(t.g AS INT), 64)) AS h
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      CAST(greatest(length(text), 1) AS BIGINT), 64)) AS t(g))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  count(*) AS n_shared_chunks
        |FROM chunks a JOIN chunks b USING (h)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY a_id, b_id""".stripMargin,

    "q_multimodal_frames" ->
      """SELECT doc_id AS media_id, 64 AS width, 48 AS height,
        |  CAST(FLOOR((FLOOR(strlen(text) / 16) - 1) / 4) + 1 AS BIGINT)
        |    AS n_frames_emitted,
        |  CAST((FLOOR((FLOOR(strlen(text) / 16) - 1) / 4) + 1) * 16 AS BIGINT)
        |    AS total_frame_bytes
        |FROM documents WHERE FLOOR(strlen(text) / 16) > 0
        |ORDER BY media_id""".stripMargin,

    // Generated from the same gear table the JVM chunker uses: the
    // recursive CTE advances every document one byte per iteration,
    // tracking only (h mod 64, chunk start) — see gearMod64 for why
    // that 6-bit state is exactly the boundary-relevant part of the
    // 64-bit rolling hash. Chunk hashes are md5 over the identical
    // (ASCII) chunk substrings.
    "q_text_cdc_chunks" -> {
      val gl = gearMod64.mkString("[", ", ", "]")
      s"""WITH RECURSIVE gl AS (SELECT $gl AS g),
         |doc AS (SELECT doc_id, text, CAST(length(text) AS INTEGER) AS n FROM documents),
         |st AS (
         |  SELECT doc_id, 0 AS i, 0 AS s, 0 AS cstart, CAST(NULL AS INTEGER) AS bend
         |  FROM doc WHERE n > 0
         |  UNION ALL
         |  SELECT doc_id, i,
         |    CASE WHEN bnd THEN 0 ELSE ns END AS s,
         |    CASE WHEN bnd THEN i ELSE cstart END AS cstart,
         |    CASE WHEN bnd THEN i ELSE NULL END AS bend
         |  FROM (
         |    SELECT st.doc_id, st.i + 1 AS i, st.cstart,
         |      CAST((2*(st.s % 32) + g[ascii(substring(d.text, st.i + 1, 1)) + 1]) % 64 AS INTEGER) AS ns,
         |      ((st.i + 1 - st.cstart >= 24
         |          AND (2*(st.s % 32) + g[ascii(substring(d.text, st.i + 1, 1)) + 1]) % 64 = 0)
         |        OR st.i + 1 - st.cstart >= 256) AS bnd
         |    FROM st, doc d, gl
         |    WHERE d.doc_id = st.doc_id AND st.i < d.n) t),
         |ends AS (SELECT doc_id, bend FROM st WHERE bend IS NOT NULL),
         |chunks AS (
         |  SELECT doc_id,
         |    COALESCE(lag(bend) OVER (PARTITION BY doc_id ORDER BY bend), 0) AS cs,
         |    bend AS ce
         |  FROM ends
         |  UNION ALL
         |  SELECT d.doc_id,
         |    COALESCE((SELECT max(e.bend) FROM ends e WHERE e.doc_id = d.doc_id), 0) AS cs,
         |    d.n AS ce
         |  FROM doc d
         |  WHERE d.n > COALESCE((SELECT max(e.bend) FROM ends e WHERE e.doc_id = d.doc_id), 0))
         |SELECT c.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(c.ce - c.cs) AS BIGINT) AS total_bytes,
         |  CAST(count(DISTINCT md5(substring(d.text, c.cs + 1, c.ce - c.cs))) AS BIGINT) AS n_distinct_hashes
         |FROM chunks c JOIN doc d ON d.doc_id = c.doc_id
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
    },

    "q_embed_centroid" ->
      """SELECT label, dim, n_vecs,
        |  CAST(CAST(CAST(sx AS DOUBLE) / n_vecs AS DECIMAL(15,9)) AS DOUBLE)
        |    AS centroid
        |FROM (
        |  SELECT label, t.i AS dim, count(*) AS n_vecs,
        |    sum(CAST(CAST(embedding[t.i + 1] AS DOUBLE) AS DECIMAL(28,12))) AS sx
        |  FROM embeddings,
        |    UNNEST(range(len(embedding))) AS t(i)
        |  GROUP BY label, dim)
        |WHERE dim < 8 ORDER BY label, dim""".stripMargin,
  )
}
