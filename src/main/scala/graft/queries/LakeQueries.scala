package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{DataGen, OrdersFixtures}
import graft.lake.{Engine, LakeTable, LakeTxn}

/** Lake DDL / evolution / ingest queries (SURVEY.md §2.B ddl_* +
  * ingest_append_read). The lake format is engine-specific, but each
  * query's output is a deterministic summary of FROZEN fixtures
  * (seeded generator + fixed DDL JSON), so golden VALUES oracles pin
  * the exact values (see oracleSql); graft.LakeSpec covers the same
  * paths in depth.
  *
  * Each query rebuilds a scratch warehouse under java.io.tmpdir so
  * repeated runs are self-contained and identical.
  */
object LakeQueries extends QueryModule {

  private[queries] def freshWarehouse(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-lake-$tag")
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    Files.createDirectories(p)
    p.toString
  }

  /** One shared 6-commit MoR history over nation (append → positional
    * MoR delete → blind upsert → keyed MoR delete → append), built ONCE
    * per (JVM, sf-dir) and then consumed READ-ONLY: `lake_changelog`,
    * `lake_changelog_updates` and `stream_lake_changelog` all read the
    * same source table, so the bench clock measures the changelog
    * operators instead of three separate fixture builds (round-6
    * What's-wrong #2 — the fixture cost dominated the family's bench
    * lines). Row identity is DECLARED (`identifier-fields`) so the
    * key-less consumers work; explicit keys that match the identity
    * stay legal for the others. Mirror/dst tables are NOT shared —
    * each query replays into its own scratch warehouse.
    */
  private val chlogSrc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def changelogSource(s: SparkSession, dir: String): String =
    chlogSrc.computeIfAbsent(dir, _ => {
      val wh = freshWarehouse(
        "chlogshared-" + Integer.toHexString(dir.hashCode))
      Engine.processTableDefJson(wh,
        """{"database_name":"cls","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int","required":true},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"n_nationkey"}}""".stripMargin)
      val src = LakeTable.load(wh, "cls", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      // positional MoR delete (full-row markers in the changelog)
      src.deleteMoR(s, col("n_regionkey") === 4)
      // blind upsert: re-inserts keys < 10 as _v2 (incl. region-4 ones)
      src.upsertMoR(s, nat.filter(col("n_nationkey") < 10)
        .withColumn("n_name", concat(col("n_name"), lit("_v2"))))
      // keyed MoR delete (key-only markers in the changelog)
      locally {
        import s.implicits._
        src.deleteByKeysMoR(s, Seq(3, 7, 22).toDF("n_nationkey"))
      }
      src.append(nat.filter(col("n_nationkey") < 5)
        .select((col("n_nationkey") + 100).cast("int").as("n_nationkey"),
          concat(lit("new_"), col("n_name")).as("n_name"),
          col("n_regionkey")))
      wh
    })

  /** The RAW changelog of the shared source's full range, computed and
    * materialized (localCheckpoint) once per JVM+dir: lake_changelog's
    * replay and lake_changelog_updates' net self-audit both consume
    * exactly this frame, so the per-ordinal marker reads happen once
    * for the family instead of once per view.
    */
  private val chlogLogs =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private[graft] def changelogSourceLog(s: SparkSession,
      dir: String): DataFrame =
    chlogLogs.computeIfAbsent(dir, _ => {
      val src = LakeTable.load(changelogSource(s, dir), "cls", "src")
      src.changelogBetween(s, 0L, src.metadata.snapshots.map(_.id).max)
        .localCheckpoint()
    })

  private def messagesDf(s: SparkSession, rows: Seq[(String, Int, String)]): DataFrame = {
    import s.implicits._
    rows.toDF("phase", "seq", "message").orderBy("phase", "seq")
  }

  /** Replay one changelog frame (a full `changelogBetween` log or one
    * streamed micro-batch) into `d`: per ordinal, deletes (by
    * `keyCols`) then inserts (of `dataCols`) — mirroring sequence-
    * number semantics. One metadata-scale collect tells each ordinal's
    * change kinds; the per-step work is O(delta). An ordinal carrying
    * BOTH kinds lands as ONE `applyDeltaMoR` commit (the batch kills
    * only strictly-older rows, so delete-then-insert holds within the
    * commit); delta frames coalesce to one partition — they are
    * O(delta) small by construction, and a replayed commit spread over
    * `shuffle.partitions` files would pay per-file footer/plan costs
    * forever after.
    */
  private[queries] def replayChangelog(d: LakeTable, log: DataFrame,
      keyCols: Seq[String], dataCols: Seq[String]): Unit = {
    val kinds = log.groupBy("_change_ordinal", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    kinds.map(_._1).toSeq.sorted.foreach { o =>
      val slice = log.filter(col("_change_ordinal") === o)
      def keysOf = slice.filter(col("_change_type") === "delete")
        .select(keyCols.map(col): _*).coalesce(1)
      def rowsOf = slice.filter(col("_change_type") === "insert")
        .select(dataCols.map(col): _*).coalesce(1)
      (kinds((o, "delete")), kinds((o, "insert"))) match {
        case (true, true) =>
          d.applyDeltaMoR(log.sparkSession, keysOf, rowsOf)
        case (true, false) => d.deleteByKeysMoR(log.sparkSession, keysOf)
        case (false, true) => d.append(rowsOf)
        case (false, false) => ()
      }
    }
  }

  /** Fail loudly when two frames differ as MULTISETS over `cols`: one
    * signed ±1-weight pass (one shuffle, one action) — strictly
    * stronger than a pair of `except` set-audits.
    */
  private[queries] def requireMirrorEqual(src: DataFrame, dst: DataFrame,
      cols: Seq[String], what: String): Unit = {
    val diff = src.withColumn("_w", lit(1))
      .unionByName(dst.withColumn("_w", lit(-1)))
      .groupBy(cols.map(col): _*)
      .agg(sum(col("_w")).as("_d")).filter(col("_d") =!= 0)
    require(diff.isEmpty, s"$what diverged from source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ddl_create" -> QueryModule.micro(4)((s, _) => {
      val wh = freshWarehouse("create")
      val resp = Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val t = LakeTable.load(wh, "customer_order", "orders")
      val schemaRows = graft.schema.FieldIds.flatten(t.currentSchema).map {
        case (path, f) =>
          (path, graft.schema.FieldIds.idOf(f), f.dataType.simpleString)
      }
      import s.implicits._
      schemaRows.toDF("path", "field_id", "type")
        .withColumn("change_type", lit(resp.changeType))
        .orderBy("field_id")
    }),

    "ddl_evolve_v1_v2" -> QueryModule.micro(4)((s, _) => {
      val wh = freshWarehouse("evolve")
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val resp = Engine.processTableDefJson(wh, OrdersFixtures.ordersV2Json)
      messagesDf(s, resp.messageList.zipWithIndex.map {
        case (m, i) => ("v1->v2", i, redactPaths(m))
      })
    }),

    "ddl_drop_reorder_update" -> QueryModule.micro(4)((s, _) => {
      val wh = freshWarehouse("dru")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"a","data_type":"int"},
          |{"column_name":"b","data_type":"string"},
          |{"column_name":"c","data_type":"float"}],
          |"partitions":[]}""".stripMargin)
      // drop b, promote a int->long and c float->double, reorder c first
      val resp = Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"t","columns":[
          |{"column_name":"c","data_type":"double"},
          |{"column_name":"a","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "d", "t")
      val schemaRows = graft.schema.FieldIds.flatten(t.currentSchema).zipWithIndex.map {
        case ((path, f), pos) =>
          (pos, path, graft.schema.FieldIds.idOf(f), f.dataType.simpleString)
      }
      import s.implicits._
      schemaRows.toDF("pos", "path", "field_id", "type")
        .withColumn("had_error", lit(resp.hasError))
        .orderBy("pos")
    }),

    "stream_lake_read" -> QueryModule.micro(1)((s, _) => {
      // DSv2 streaming read: snapshot-id offsets, append-only CDC.
      // Two appends land in the sink; the delete's overwrite snapshot
      // must not replay rows into the stream — and since a row-removing
      // commit is unrepresentable as inserts, skipping it is an
      // EXPLICIT opt-in (without the option the stream fails loudly
      // instead of silently losing the delete).
      val wh = freshWarehouse("streamread")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"sr","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
      val t = graft.lake.LakeTable.load(wh, "d", "sr")
      import s.implicits._
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t.delete(s, col("id") === 1L)
      t.append(Seq((3L, "c")).toDF("id", "v"))
      val q = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "sr")
        .option("skipDeleteSnapshots", "true")
        .load()
        .writeStream.format("memory").queryName("stream_lake_read_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.sql("SELECT id, v FROM stream_lake_read_sink ORDER BY id, v")
    }),

    "stream_lake_enrich" -> QueryModule.micro(1)((s, dir) => {
      // stream-STATIC enrichment: the lake source micro-batches the
      // fact stream, a literal dimension broadcasts into every batch
      // (no shuffle of the stream side — the canonical enrichment
      // plan at any scale), and a complete-mode aggregation rolls up
      // per category. The batch oracle runs the same join+rollup over
      // the raw events.
      import s.implicits._
      val wh = freshWarehouse("streamenrich")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"ev","columns":[
          |{"column_name":"event_id","data_type":"long"},
          |{"column_name":"event_type","data_type":"string"},
          |{"column_name":"value","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      graft.lake.LakeTable.load(wh, "d", "ev").append(
        Tables(s, dir, "events").select("event_id", "event_type", "value"))
      val dim = Seq(
        ("click", "engage"), ("view", "engage"), ("purchase", "convert"),
        ("signup", "acquire"), ("error", "ops"))
        .toDF("event_type", "category")
      val q = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "ev")
        .load()
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("category")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).as("sv"))
        .writeStream.format("memory").queryName("stream_lake_enrich_sink")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.sql("""SELECT category, n_events, CAST(sv AS DOUBLE) AS sum_value
              |FROM stream_lake_enrich_sink ORDER BY category""".stripMargin)
    }),

    "stream_mat_view" -> QueryModule.micro(1)((s, dir) => {
      // STREAMING materialized-view maintenance — the production
      // refresh loop: a lake-source stream paces the source table's
      // commit history (maxSnapshotsPerTrigger), and each micro-batch
      // triggers an INCREMENTAL refresh, so the MV tracks the table
      // with O(delta) work per commit instead of periodic recomputes.
      // The self-audit requires at least one real incremental advance
      // and a monotone watermark; the oracle recomputes from scratch.
      import s.implicits._
      val wh = freshWarehouse("streammv")
      Engine.processTableDefJson(wh,
        """{"database_name":"smv","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "smv", "ord")
        .append(orders.filter(col("o_custkey") % 3 === 0))
      s.conf.set("spark.sql.catalog.gsmv", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsmv.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gsmv.smv.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gsmv.smv.ord GROUP BY o_custkey").collect()
      // two more source commits land AFTER the seed
      LakeTable.load(wh, "smv", "ord")
        .append(orders.filter(col("o_custkey") % 3 === 1))
      LakeTable.load(wh, "smv", "ord")
        .append(orders.filter(col("o_custkey") % 3 === 2))
      val advances =
        new java.util.concurrent.atomic.AtomicReference(Seq.empty[Long])
      val q = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "smv")
        .option("table", "ord")
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch {
          (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
            // the batch is the SCHEDULE, the refresh reads its own
            // O(delta) range from the table — refresh-on-commit
            graft.sources.MatViewDdl.refresh(s, wh, "smv", "roll",
              "incremental") match {
              case graft.sources.MatViewDdl
                  .IncrementalRefresh(from, to) if to > from =>
                advances.updateAndGet(_ :+ to); ()
              case _ => ()
            }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val adv = advances.get()
      require(adv.nonEmpty && adv == adv.sorted,
        s"streamed maintenance must advance the watermark " +
          s"monotonically, got $adv")
      vsql("SELECT o_custkey, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gsmv.smv.roll ORDER BY o_custkey")
    }),

    "stream_txn_sink" -> QueryModule.micro(1)((s, dir) => {
      // EXACTLY-ONCE cross-table streaming publication: each
      // micro-batch lands in the raw table AND its per-region rollup
      // through ONE LakeTxn cross-table commit, with the processed
      // batch id recorded on the raw table in the SAME flip.
      // Structured Streaming redelivers batches at-least-once after a
      // crash, so the sink's idempotence ledger (the batch id) and
      // its data must move atomically — a ledger that advances
      // without the data drops a batch, data without the ledger
      // double-counts on replay, and a rollup published without its
      // raw rows shows observers an inconsistent pair. Self-audits:
      // a manual REPLAY of the final batch is skipped with both
      // tables' histories untouched, and the rollup reconciles with
      // the raw rows after the drain. The oracle recomputes the
      // rollup from nation.
      import graft.lake.LakeTxn
      val wh = freshWarehouse("stxnsink")
      Engine.processTableDefJson(wh,
        """{"database_name":"st","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"st","table_name":"raw","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"st","table_name":"agg","columns":[
          |{"column_name":"n_regionkey","data_type":"int"},
          |{"column_name":"n","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      val nation = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      for (m <- 0 to 2)
        LakeTable.load(wh, "st", "src")
          .append(nation.filter(col("n_nationkey") % 3 === m))
      // the sink body — shared by the stream and the replay audit
      def publish(batch: DataFrame, id: Long): Boolean = {
        val done = LakeTable.load(wh, "st", "raw").metadata.properties
          .get("graft.stream.last-batch").exists(_.toLong >= id)
        if (done) false
        else {
          // the caller pins the batch (localCheckpoint) — a narrow
          // select over it re-evaluates for free, so no second pin
          val rows = batch.select(col("n_nationkey"), col("n_name"),
            col("n_regionkey"))
          val delta = rows.groupBy("n_regionkey")
            .agg(count(lit(1)).as("n"))
          val cur = LakeTable.load(wh, "st", "agg").read(s)
            .withColumnRenamed("n", "cn")
          val merged = delta.join(cur, Seq("n_regionkey"), "left")
            .select(col("n_regionkey"),
              (col("n") + coalesce(col("cn"), lit(0L))).as("n"))
            .localCheckpoint()
          LakeTxn.transaction(wh) { ctx =>
            val raw = ctx.table("st", "raw")
            raw.append(rows)
            raw.updateProperties(
              Map("graft.stream.last-batch" -> id.toString))
            ctx.table("st", "agg").upsertMoR(s, merged,
              keys = Seq("n_regionkey"))
          }
          true
        }
      }
      val lastRef = new java.util.concurrent.atomic.AtomicReference[
        (DataFrame, Long)](null)
      val q = s.readStream.format("graft-lake")
        .option("warehouse", wh).option("database", "st")
        .option("table", "src")
        .option("maxSnapshotsPerTrigger", "1")
        .load()
        .writeStream
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            val pinned = b.localCheckpoint()
            publish(pinned, id)
            lastRef.set((pinned, id)); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val lastB = lastRef.get()
      require(lastB != null, "no batches delivered")
      def hist(t: String): (Int, Long) = {
        val md = LakeTable.load(wh, "st", t).metadata
        (md.snapshots.size, md.snapshots.map(_.id).foldLeft(0L)(math.max))
      }
      val before = (hist("raw"), hist("agg"))
      require(!publish(lastB._1, lastB._2),
        "a redelivered batch must be skipped by the ledger")
      require((hist("raw"), hist("agg")) == before,
        "a skipped replay must leave both histories untouched")
      // rollup reconciles with the raw rows — the atomicity invariant
      val recon = LakeTable.load(wh, "st", "raw").read(s)
        .groupBy("n_regionkey").agg(count(lit(1)).as("rn"))
        .join(LakeTable.load(wh, "st", "agg").read(s),
          Seq("n_regionkey"), "full_outer")
        .filter(col("rn") =!= col("n") ||
          col("rn").isNull || col("n").isNull)
      require(recon.isEmpty, "rollup does not reconcile with raw rows")
      LakeTable.load(wh, "st", "agg").read(s)
        .select(col("n_regionkey"), col("n"))
        .orderBy("n_regionkey")
    }),

    "stream_lake_changelog" -> QueryModule.micro(1)((s, dir) => {
      // changelog-mode streaming read (option("changelog","true")): a
      // delete-bearing MoR history STREAMS as _change_type-tagged rows
      // instead of failing or skipping — full-row markers for position
      // deletes, key-only markers for equality batches, inserts for
      // added rows. The stream replays into a mirror table (deletes
      // then inserts per ordinal, batch by batch under a snapshot-rate
      // cap) and the mirror must equal the source exactly — the
      // streamed form of the lake_changelog replication.
      // the 6-commit MoR source is SHARED with the other changelog
      // keys (built once per JVM+dir); only the mirror is per-query
      val srcWh = LakeQueries.changelogSource(s, dir)
      val wh = LakeQueries.freshWarehouse("streamchlog")
      Engine.processTableDefJson(wh,
        """{"database_name":"scl","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val q = s.readStream.format("graft-lake")
        .option("warehouse", srcWh).option("database", "cls")
        .option("table", "src")
        .option("changelog", "true")
        .option("maxSnapshotsPerTrigger", "2")
        .load()
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              _: Long) =>
          LakeQueries.replayChangelog(LakeTable.load(wh, "scl", "dst"),
            batch.toDF(), Seq("n_nationkey"),
            Seq("n_nationkey", "n_name", "n_regionkey"))
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dstRows = LakeTable.load(wh, "scl", "dst").read(s)
      LakeQueries.requireMirrorEqual(
        LakeTable.load(srcWh, "cls", "src").read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"),
        "streamed changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "q_stream_join" -> QueryModule.micro(1)((s, _) => {
      // stream-stream interval join under Structured Streaming: clicks
      // attribute to impressions within a 30-minute window; watermarks
      // bound the join state. Deterministic fixed feed, memory sink.
      import graft.streaming.StreamJoin.{Click, Impression}
      implicit val sqlCtx = s.sqlContext
      import s.implicits._
      def ts(min: Int) = java.sql.Timestamp.valueOf(
        f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
      val imps = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Impression]
      val clicks = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Click]
      imps.addData(Impression(1L, ts(0)), Impression(2L, ts(5)),
        Impression(3L, ts(10)))
      clicks.addData(Click(100L, 1L, ts(10)), Click(101L, 2L, ts(50)),
        Click(102L, 3L, ts(15)), Click(103L, 3L, ts(200)))
      val q = graft.streaming.StreamJoin
        .attribute(imps.toDS(), clicks.toDS(), windowMinutes = 30,
          delayThreshold = "10 minutes")
        .writeStream.format("memory").queryName("q_stream_join_sink")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.sql("""SELECT imp_id, click_id FROM q_stream_join_sink
              |ORDER BY imp_id, click_id""".stripMargin)
    }),

    "lake_maintenance" -> QueryModule.micro(4)((s, _) => {
      // lifecycle: appends + CoW delete → expire history → drop orphans.
      // Outputs are env-independent booleans/counts (file counts depend
      // on parallelism, so only their invariants are asserted).
      val wh = freshWarehouse("maint")
      Engine.processTableDefJson(wh,
        """{"database_name":"d","table_name":"m","columns":[
          |{"column_name":"id","data_type":"long"},
          |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
      val t = graft.lake.LakeTable.load(wh, "d", "m")
      import s.implicits._
      t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.delete(s, col("id") === 2L)
      // manifest compaction first: forward planning replays ONE merged
      // manifest; history (ids 1-3) stays readable until expiry below
      val rwm = t.rewriteManifests()
      val merged = LakeTable.replaySuffix(t.metadata.snapshots)._1
      val rwmOk = merged.size == 1 && merged.head.id == rwm.id &&
        t.read(s, asOfSnapshot = Some(1L)).count() == 2
      val expired = t.expireSnapshots(keepAfter = rwm.id)
      val orphans = t.removeOrphanFiles(olderThanMillis = 0)
      // retention check stays distributed (symmetric except + counts):
      // no data-row collect even if the fixture grows
      val live = t.read(s).select("id")
      val expect = Seq(1L, 3L).toDF("id")
      val liveOk = live.except(expect).isEmpty && expect.except(live).isEmpty
      Seq(
        ("expired_snapshots", expired.toLong),
        ("orphans_removed_some", if (orphans.nonEmpty) 1L else 0L),
        ("live_rows", live.count()),
        ("live_ids_ok", if (liveOk) 1L else 0L),
        ("rewrite_manifests_ok", if (rwmOk) 1L else 0L),
        ("snapshots_left", t.metadata.snapshots.size.toLong))
        .toDF("metric", "value").orderBy("metric")
    }),

    "ingest_append_read" -> QueryModule.micro(4)((s, _) => {
      val wh = freshWarehouse("ingest")
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV1Json)
      val t1 = LakeTable.load(wh, "customer_order", "orders")
      t1.append(DataGen.toDf(s, DataGen.ordersV1(20, seed = 1L), t1.currentSchema))
      Engine.processTableDefJson(wh, OrdersFixtures.ordersV2Json)
      val t2 = LakeTable.load(wh, "customer_order", "orders")
      t2.append(DataGen.toDf(s, DataGen.ordersV2(15, seed = 2L), t2.currentSchema))
      // unified read: v1 rows surface NULL order_id / address.zip /
      // order_items[*].item_count under the v2 schema
      t2.read(s)
        .select(
          col("order_id"), col("customer_name"),
          col("address.city").as("city"), col("address.zip").as("zip"),
          size(col("order_items")).as("n_items"),
          col("order_items").getItem(0).getField("item_count").as("first_item_count"),
          col("order_items").getItem(0).getField("price").as("first_price"),
          year(col("order_time")).as("yr"))
        .orderBy(col("order_id").asc_nulls_first, col("customer_name"),
          col("yr"), col("n_items"), col("first_price"))
    }),

    "lake_spec_evolve_sql" -> QueryModule.micro(2)((s, dir) => {
      // SQL partition-spec evolution: `ALTER TABLE ... ADD PARTITION
      // FIELD` (Iceberg's spec-evolution DDL, served by the
      // GraftSqlParser session extension) commits a new spec version
      // through the same engine path as a table-def evolution
      // (reference `iceberg_helper.py:364-378`). Files written before
      // keep spec 0 and reads stay correct across specs; files written
      // after land in year directories the metadata pruner skips with
      // zero IO (self-audited below).
      val wh = freshWarehouse("specsql")
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"ev","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderdate","data_type":"timestamp"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "sq", "ev")
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      t.append(orders.filter(col("o_orderkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gsqlspec", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsqlspec.warehouse", wh)
      // the exact statement an extensions-enabled session serves via
      // spark.sql(...) — parsed by the same GraftSqlParser here so the
      // key does not depend on this session's construction
      val parser = new org.apache.spark.sql.GraftSqlParser(
        org.apache.spark.sql.GraftPlanBridge.sessionParser(s))
      org.apache.spark.sql.GraftPlanBridge.ofRows(s, parser.parsePlan(
        "ALTER TABLE gsqlspec.sq.ev ADD PARTITION FIELD " +
          "years(o_orderdate) AS od_year")).collect()
      val t2 = LakeTable.load(wh, "sq", "ev")
      require(t2.metadata.currentSpec.fields.map(f =>
        (f.transform, f.name)) == Seq(("year", "od_year")),
        "SQL spec evolution must commit the year field")
      require(t2.metadata.specs.size == 2, "expected a new spec version")
      t2.append(orders.filter(col("o_orderkey") % 2 === 1))
      // multi-spec pruning: spec-0 files are kept conservatively, the
      // new spec's other-year files are skipped on metadata alone
      val live = t2.plannedFiles()
      val pruned = t2.plannedFiles(prune = Map("od_year" -> Set("1995")))
      require(pruned.size < live.size,
        s"year prune must skip files (live=${live.size}, " +
          s"pruned=${pruned.size})")
      t2.read(s)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy").as("od_year"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }),
  )

  /** Meta-file paths embed the tmpdir — strip to keep output stable. */
  private def redactPaths(m: String): String =
    m.replaceAll("Latest Meta file: .*", "Latest Meta file: <meta>")

  /** Golden VALUES oracles: these lifecycle queries run on FIXED
    * fixtures (frozen DDL JSON + seeded generators + a deterministic
    * micro-feed), so their outputs are constants independent of scale
    * factor and parallelism. Pinning them as VALUES turns the driver's
    * rows-only check into an exact value/hash gate — any behavioral
    * drift in the engine (field-ID assignment, evolution messages,
    * watermark semantics, snapshot accounting) goes red.
    * Regenerate after an intentional fixture change with:
    *   tools/run.sh graft.Verify <sf> /tmp/v && tools/pin_oracles.py /tmp/v <keys>
    */
  def oracleSql: Map[String, String] = Map(
    "lake_spec_evolve_sql" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y') AS od_year,
        |  o_totalprice
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "ddl_create" ->
      """SELECT CAST(path AS VARCHAR) AS path, CAST(field_id AS INTEGER) AS field_id,
        |  CAST(type AS VARCHAR) AS type, CAST(change_type AS VARCHAR) AS change_type
        |FROM (VALUES
        |  ('order_time', 1, 'timestamp_ntz', 'CREATE TABLE'),
        |  ('customer_name', 2, 'string', 'CREATE TABLE'),
        |  ('address', 3, 'struct<city:string,state:string>', 'CREATE TABLE'),
        |  ('address.city', 4, 'string', 'CREATE TABLE'),
        |  ('address.state', 5, 'string', 'CREATE TABLE'),
        |  ('order_items', 6, 'array<struct<item_id:string,price:float>>', 'CREATE TABLE'),
        |  ('order_items.element.item_id', 7, 'string', 'CREATE TABLE'),
        |  ('order_items.element.price', 8, 'float', 'CREATE TABLE'))
        |  AS t(path, field_id, type, change_type)
        |ORDER BY field_id""".stripMargin,

    "ddl_evolve_v1_v2" ->
      """SELECT CAST(phase AS VARCHAR) AS phase, CAST(seq AS INTEGER) AS seq,
        |  CAST(message AS VARCHAR) AS message
        |FROM (VALUES
        |  ('v1->v2', 0, 'Added column order_id'),
        |  ('v1->v2', 1, 'Added column address.address_line'),
        |  ('v1->v2', 2, 'Added column address.zip'),
        |  ('v1->v2', 3, 'Added column order_items.element.item_count'),
        |  ('v1->v2', 4, 'Updated partition spec to [month(src=1) as order_time_month]'),
        |  ('v1->v2', 5, 'Latest Meta file: <meta>'))
        |  AS t(phase, seq, message)
        |ORDER BY seq""".stripMargin,

    "ddl_drop_reorder_update" ->
      """SELECT CAST(pos AS INTEGER) AS pos, CAST(path AS VARCHAR) AS path,
        |  CAST(field_id AS INTEGER) AS field_id, CAST(type AS VARCHAR) AS type,
        |  CAST(had_error AS BOOLEAN) AS had_error
        |FROM (VALUES
        |  (0, 'c', 3, 'double', FALSE),
        |  (1, 'a', 1, 'bigint', FALSE))
        |  AS t(pos, path, field_id, type, had_error)
        |ORDER BY pos""".stripMargin,

    "lake_maintenance" ->
      """SELECT CAST(metric AS VARCHAR) AS metric, CAST(value AS BIGINT) AS value
        |FROM (VALUES
        |  ('expired_snapshots', 4),
        |  ('live_ids_ok', 1),
        |  ('live_rows', 2),
        |  ('orphans_removed_some', 1),
        |  ('rewrite_manifests_ok', 1),
        |  ('snapshots_left', 1))
        |  AS t(metric, value)
        |ORDER BY metric""".stripMargin,

    "stream_lake_read" ->
      """SELECT CAST(id AS BIGINT) AS id, CAST(v AS VARCHAR) AS v
        |FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, v)
        |ORDER BY id""".stripMargin,

    "stream_mat_view" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "stream_txn_sink" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,

    "stream_lake_enrich" ->
      """WITH dim(event_type, category) AS (VALUES
        |  ('click','engage'), ('view','engage'), ('purchase','convert'),
        |  ('signup','acquire'), ('error','ops'))
        |SELECT category, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY category ORDER BY category""".stripMargin,

    "q_stream_join" ->
      """SELECT CAST(imp_id AS BIGINT) AS imp_id, CAST(click_id AS BIGINT) AS click_id
        |FROM (VALUES (1, 100), (3, 102)) AS t(imp_id, click_id)
        |ORDER BY imp_id""".stripMargin,

    "ingest_append_read" ->
      """SELECT CAST(order_id AS VARCHAR) AS order_id,
        |  CAST(customer_name AS VARCHAR) AS customer_name,
        |  CAST(city AS VARCHAR) AS city, CAST(zip AS VARCHAR) AS zip,
        |  CAST(n_items AS INTEGER) AS n_items,
        |  CAST(first_item_count AS INTEGER) AS first_item_count,
        |  CAST(first_price AS REAL) AS first_price, CAST(yr AS INTEGER) AS yr
        |FROM (VALUES
        |  (NULL, 'Customer_100', 'city_26', NULL, 36, NULL, '16.540000915527344', 2024),
        |  (NULL, 'Customer_12', 'city_30', NULL, 48, NULL, '11.319999694824219', 2021),
        |  (NULL, 'Customer_13', 'city_76', NULL, 22, NULL, '10.0', 2024),
        |  (NULL, 'Customer_14', 'city_7', NULL, 24, NULL, '18.34000015258789', 2025),
        |  (NULL, 'Customer_19', 'city_5', NULL, 29, NULL, '18.59000015258789', 2020),
        |  (NULL, 'Customer_20', 'city_60', NULL, 44, NULL, '14.140000343322754', 2024),
        |  (NULL, 'Customer_23', 'city_92', NULL, 42, NULL, '12.270000457763672', 2023),
        |  (NULL, 'Customer_30', 'city_61', NULL, 32, NULL, '17.989999771118164', 2025),
        |  (NULL, 'Customer_32', 'city_96', NULL, 8, NULL, '15.829999923706055', 2021),
        |  (NULL, 'Customer_41', 'city_19', NULL, 30, NULL, '14.329999923706055', 2024),
        |  (NULL, 'Customer_43', 'city_74', NULL, 50, NULL, '17.670000076293945', 2021),
        |  (NULL, 'Customer_52', 'city_19', NULL, 10, NULL, '16.579999923706055', 2020),
        |  (NULL, 'Customer_70', 'city_3', NULL, 38, NULL, '13.539999961853027', 2024),
        |  (NULL, 'Customer_80', 'city_7', NULL, 21, NULL, '10.079999923706055', 2024),
        |  (NULL, 'Customer_84', 'city_17', NULL, 23, NULL, '10.239999771118164', 2023),
        |  (NULL, 'Customer_9', 'city_41', NULL, 48, NULL, '14.319999694824219', 2024),
        |  (NULL, 'Customer_90', 'city_67', NULL, 35, NULL, '16.06999969482422', 2021),
        |  (NULL, 'Customer_93', 'city_32', NULL, 36, NULL, '11.0', 2024),
        |  (NULL, 'Customer_94', 'city_49', NULL, 38, NULL, '10.600000381469727', 2023),
        |  (NULL, 'Customer_95', 'city_13', NULL, 19, NULL, '18.299999237060547', 2020),
        |  ('order_2_0', 'Customer_27', 'city_51', 'zip_25', 9, 3, '19.010000228881836', 2023),
        |  ('order_2_1', 'Customer_7', 'city_10', 'zip_81', 48, 1, '10.489999771118164', 2021),
        |  ('order_2_10', 'Customer_26', 'city_36', 'zip_73', 11, 3, '10.789999961853027', 2022),
        |  ('order_2_11', 'Customer_79', 'city_42', 'zip_54', 27, 5, '19.530000686645508', 2023),
        |  ('order_2_12', 'Customer_88', 'city_34', 'zip_9', 3, 5, '17.3799991607666', 2021),
        |  ('order_2_13', 'Customer_11', 'city_87', 'zip_47', 39, 3, '17.15999984741211', 2020),
        |  ('order_2_14', 'Customer_29', 'city_5', 'zip_50', 15, 1, '12.350000381469727', 2022),
        |  ('order_2_2', 'Customer_41', 'city_80', 'zip_78', 23, 5, '17.5', 2023),
        |  ('order_2_3', 'Customer_56', 'city_60', 'zip_89', 42, 4, '17.100000381469727', 2022),
        |  ('order_2_4', 'Customer_93', 'city_82', 'zip_80', 26, 2, '11.529999732971191', 2024),
        |  ('order_2_5', 'Customer_37', 'city_4', 'zip_44', 14, 4, '17.790000915527344', 2025),
        |  ('order_2_6', 'Customer_29', 'city_38', 'zip_77', 40, 5, '11.880000114440918', 2020),
        |  ('order_2_7', 'Customer_75', 'city_21', 'zip_61', 42, 5, '18.65999984741211', 2020),
        |  ('order_2_8', 'Customer_14', 'city_73', 'zip_79', 38, 1, '12.359999656677246', 2020),
        |  ('order_2_9', 'Customer_12', 'city_58', 'zip_16', 15, 4, '14.430000305175781', 2020))
        |  AS t(order_id, customer_name, city, zip, n_items, first_item_count, first_price, yr)
        |ORDER BY order_id NULLS FIRST, customer_name""".stripMargin,
  )
}

/** Lake read paths under the DuckDB oracle: the DSv2 connector +
  * catalog SQL (record reader, pushdowns) and time travel both produce
  * results hash-checked against plain SQL over the same source rows.
  */
object LakeReadQueries extends QueryModule {
  import graft.lake.{Engine, LakeTable}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_scan_sql" -> QueryModule.micro(4)((s, dir) => {
      // parquet → lake table → catalog SQL with a filter: exercises the
      // connector's record reader, column pruning, and stats skipping
      // under the oracle gate
      val wh = LakeQueries.freshWarehouse("scansql")
      Engine.processTableDefJson(wh,
        """{"database_name":"rq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[],
          |"properties":{"write.sort-order":"c_custkey"}}""".stripMargin)
      LakeTable.load(wh, "rq", "cust").append(
        Tables(s, dir, "customer").select(
          "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      s.conf.set("spark.sql.catalog.graftq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftq.warehouse", wh)
      s.sql(
        """SELECT c_custkey, c_name, c_acctbal AS acctbal
          |FROM graftq.rq.cust
          |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
          |ORDER BY c_custkey""".stripMargin)
    }),

    "q_star_join" -> ((s, dir) => {
      // Flagship STAR JOIN (TPC-H Q5 shape) over LAKE tables through
      // the DSv2 connector: region→nation→customer dims broadcast off
      // the connector's reported size stats, orders carries the
      // selective date window, lineitem is the fact side. At scale the
      // fact scan is additionally pruned by the join's RUNTIME filters
      // (file min/max vs the broadcast keys — PlanAuditSpec pins the
      // mechanism on a clustered fixture, plus broadcasts and zero
      // cartesians on this exact plan). Revenue math in exact
      // decimals, output double (driver compare contract).
      val wh = LakeQueries.freshWarehouse("star")
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"lineitem","columns":[
          |{"column_name":"l_orderkey","data_type":"long"},
          |{"column_name":"l_extendedprice","data_type":"double"},
          |{"column_name":"l_discount","data_type":"double"}],
          |"partitions":[],
          |"properties":{"write.sort-order":"l_orderkey",
          |  "write.sort-buckets":"8"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"orders","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_orderdate","data_type":"timestamp"}],
          |"partitions":[],
          |"properties":{"write.sort-order":"o_orderkey"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"customer","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_nationkey","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"nation","columns":[
          |{"column_name":"n_nationkey","data_type":"long"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"sq","table_name":"region","columns":[
          |{"column_name":"r_regionkey","data_type":"long"},
          |{"column_name":"r_name","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "sq", "lineitem").append(
        Tables(s, dir, "lineitem").select(
          col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_extendedprice"), col("l_discount")))
      LakeTable.load(wh, "sq", "orders").append(
        Tables(s, dir, "orders").select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_custkey").cast("long").as("o_custkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate")))
      LakeTable.load(wh, "sq", "customer").append(
        Tables(s, dir, "customer").select(
          col("c_custkey").cast("long").as("c_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey")))
      LakeTable.load(wh, "sq", "nation").append(
        Tables(s, dir, "nation").select(
          col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey")))
      LakeTable.load(wh, "sq", "region").append(
        Tables(s, dir, "region").select(
          col("r_regionkey").cast("long").as("r_regionkey"),
          col("r_name")))
      s.conf.set("spark.sql.catalog.gstar", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gstar.warehouse", wh)
      s.sql(
        """SELECT n_name, count(*) AS order_lines,
          |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
          |    * (1 - CAST(l_discount AS DECIMAL(18,4)))
          |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM gstar.sq.lineitem
          |JOIN gstar.sq.orders   ON l_orderkey = o_orderkey
          |JOIN gstar.sq.customer ON o_custkey = c_custkey
          |JOIN gstar.sq.nation   ON c_nationkey = n_nationkey
          |JOIN gstar.sq.region   ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name
          |ORDER BY n_name""".stripMargin)
    }),

    "lake_null_skip" -> QueryModule.micro(4)((s, dir) => {
      // null-count + schema-absence file skipping under the oracle
      // gate: v1 files predate the n_regionkey column (they read as
      // all-NULL for it), v2 files carry it fully populated. A pushed
      // IS NOT NULL must plan ONLY the v2 files (schema-absence
      // prune), IS NULL only the v1 files (zero-null counts prune the
      // rest), and the two plans must partition the live set exactly —
      // self-audited before the oracle compare. At 100 TB this is the
      // difference between scanning the whole evolved history and
      // touching just the files that can match.
      import graft.lake.RangeFilter
      val wh = LakeQueries.freshWarehouse("nullskip")
      Engine.processTableDefJson(wh,
        """{"database_name":"nk","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "nk", "nat").append(
        Tables(s, dir, "nation").select("n_nationkey", "n_name"))
      Engine.processTableDefJson(wh,
        """{"database_name":"nk","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "nk", "nat")
      t.append(Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey"))
      val live = t.plannedFiles().size
      val notNull = t.plannedFiles(statsFilters =
        Seq(RangeFilter("n_regionkey", notNull = true))).size
      val isNull = t.plannedFiles(statsFilters =
        Seq(RangeFilter("n_regionkey", isNull = true))).size
      require(notNull < live && isNull < live && notNull + isNull == live,
        s"nullness skipping must partition the live set: " +
          s"live=$live notNull=$notNull isNull=$isNull")
      s.conf.set("spark.sql.catalog.gnull", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gnull.warehouse", wh)
      s.sql(
        """SELECT n_nationkey, n_name, n_regionkey
          |FROM gnull.nk.nat
          |WHERE n_regionkey IS NOT NULL
          |ORDER BY n_nationkey""".stripMargin)
    }),

    "lake_mat_view" -> QueryModule.micro(4)((s, dir) => {
      // materialized view lifecycle: create over half the source,
      // append the rest (the MV must serve the STALE materialized
      // state — self-audited), refresh, read through the view name.
      // The oracle is the defining aggregate over the full source.
      val wh = LakeQueries.freshWarehouse("matview")
      Engine.processTableDefJson(wh,
        """{"database_name":"mv","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select("o_custkey", "o_totalprice")
      LakeTable.load(wh, "mv", "ord")
        .append(orders.filter(col("o_custkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvq.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      // the SQL DDL surface (parser extension): CREATE / REFRESH
      // MATERIALIZED VIEW route through the same MatViewDdl the CALL
      // procedures use
      vsql("CREATE MATERIALIZED VIEW gmvq.mv.cust_rollup AS " +
        "SELECT o_custkey, count(*) AS n_orders, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) " +
        "AS sum_price FROM gmvq.mv.ord GROUP BY o_custkey").collect()
      val staleRows = vsql("SELECT * FROM gmvq.mv.cust_rollup").count()
      LakeTable.load(wh, "mv", "ord")
        .append(orders.filter(col("o_custkey") % 2 =!= 0))
      require(vsql("SELECT * FROM gmvq.mv.cust_rollup").count() ==
        staleRows,
        "an unrefreshed MV must serve the materialized state, not the " +
          "live source")
      vsql("REFRESH MATERIALIZED VIEW gmvq.mv.cust_rollup").collect()
      vsql("SELECT o_custkey, n_orders, sum_price " +
        "FROM gmvq.mv.cust_rollup ORDER BY o_custkey")
    }),

    "lake_mat_view_incr" -> QueryModule.micro(4)((s, dir) => {
      // INCREMENTAL materialized-view refresh: the defining aggregate
      // is detected as self-maintainable at create (decimal sum +
      // count + min/max over one table), so the second refresh pulls
      // ONLY the appended delta and blind-upserts the touched groups —
      // O(delta) source reads at any scale. The oracle recomputes the
      // aggregate from scratch; an incremental merge that drifted by
      // one row or one ulp hash-mismatches.
      val wh = LakeQueries.freshWarehouse("matviewincr")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvi","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvi", "ord")
        .append(orders.filter(col("o_custkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvi2", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvi2.warehouse", wh)
      s.sql("CALL gmvi2.system.create_mat_view('mvi', 'roll', " +
        "'SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvi2.mvi.ord GROUP BY o_custkey')").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mvi", "roll")).get
        .properties.get("graft.mat-view.incr").contains("true"),
        "the aggregate shape must be recorded as incrementally " +
          "maintainable")
      LakeTable.load(wh, "mvi", "ord")
        .append(orders.filter(col("o_custkey") % 2 =!= 0))
      val res = s.sql("CALL gmvi2.system.refresh_mat_view(" +
        "'mvi', 'roll', 'incremental')").collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("SELECT o_custkey, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvi2.mvi.roll ORDER BY o_custkey")
    }),

    "lake_mat_view_avg" -> QueryModule.micro(4)((s, dir) => {
      // AVG over decimals maintained INCREMENTALLY: the backing table
      // stores hidden exact sum/count parts and the fronting view
      // reproduces Spark's own Average division bit-for-bit, so the
      // merged state equals a recompute. The oracle corroborates with
      // the exact decimal sum plus a rounded avg (DuckDB's avg itself
      // accumulates in double, so the raw division is not hashable).
      val wh = LakeQueries.freshWarehouse("matviewavg")
      Engine.processTableDefJson(wh,
        """{"database_name":"mva","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mva", "ord")
        .append(orders.filter(col("o_custkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvavg", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvavg.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvavg.mva.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price, avg(o_price) AS avg_price FROM gmvavg.mva.ord " +
        "GROUP BY o_custkey").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mva", "roll")).get
        .properties.get("graft.mat-view.incr").contains("true"),
        "decimal AVG must be recorded as incrementally maintainable")
      LakeTable.load(wh, "mva", "ord")
        .append(orders.filter(col("o_custkey") % 2 =!= 0))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvavg.mva.roll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      vsql("SELECT o_custkey, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price, " +
        "ROUND(CAST(avg_price AS DOUBLE), 6) AS avg6 " +
        "FROM gmvavg.mva.roll ORDER BY o_custkey")
    }),

    "lake_mat_view_expr" -> QueryModule.micro(4)((s, dir) => {
      // the canonical production MV: a TIME-BUCKETED rollup — group
      // key `date_trunc('DAY', ts)` and an expression aggregate
      // argument (the exactness cast inside the sum), both persisted
      // as SQL and re-evaluated identically over every delta. The
      // oracle recomputes the bucketed rollup from the raw events.
      val wh = LakeQueries.freshWarehouse("matviewexpr")
      Engine.processTableDefJson(wh,
        """{"database_name":"mve","table_name":"ev","columns":[
          |{"column_name":"event_id","data_type":"long"},
          |{"column_name":"ts","data_type":"timestamp"},
          |{"column_name":"value","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val events = Tables(s, dir, "events")
        .select("event_id", "ts", "value")
      LakeTable.load(wh, "mve", "ev")
        .append(events.filter(col("event_id") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvex", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvex.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvex.mve.daily AS " +
        "SELECT date_trunc('DAY', ts) AS day, count(*) AS n_events, " +
        "sum(CAST(value AS DECIMAL(18,4))) AS sv " +
        "FROM gmvex.mve.ev GROUP BY date_trunc('DAY', ts)").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mve", "daily")).get
        .properties.get("graft.mat-view.incr").contains("true"),
        "the bucketed rollup must record an incremental shape")
      LakeTable.load(wh, "mve", "ev")
        .append(events.filter(col("event_id") % 2 =!= 0))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvex.mve.daily INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      vsql("SELECT CAST(day AS DATE) AS day, n_events, " +
        "CAST(sv AS DOUBLE) AS sum_value " +
        "FROM gmvex.mve.daily ORDER BY day")
    }),

    "lake_mat_view_having" -> QueryModule.micro(4)((s, dir) => {
      // HAVING in the incremental class: the condition references an
      // UNSELECTED count(*), which materializes as a hidden storage
      // aggregate the fronting view filters on at read time — groups
      // are maintained unconditionally, so threshold crossings track
      // the deltas exactly. Oracle recomputes the HAVING query from
      // scratch.
      val wh = LakeQueries.freshWarehouse("matviewhav")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvh","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvh", "ord")
        .append(orders.filter(col("o_custkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvhav", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvhav.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvhav.mvh.big AS " +
        "SELECT o_custkey, sum(o_price) AS sum_price " +
        "FROM gmvhav.mvh.ord GROUP BY o_custkey " +
        "HAVING count(*) >= 2").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mvh", "big")).get
        .properties.contains("graft.mat-view.having"),
        "the HAVING must be recorded with the incremental shape")
      LakeTable.load(wh, "mvh", "ord")
        .append(orders.filter(col("o_custkey") % 2 =!= 0))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvhav.mvh.big INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      vsql("SELECT o_custkey, CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvhav.mvh.big ORDER BY o_custkey")
    }),

    "lake_mat_view_filter" -> QueryModule.micro(4)((s, dir) => {
      // WHERE-filtered defining queries in the incremental class: the
      // persisted predicate filters the seed, every delta, and every
      // recompute identically, so a filtered rollup (the common
      // production MV shape) still refreshes in O(delta). The oracle
      // applies the same WHERE from scratch — a delta that bypassed
      // the filter (or double-applied it) hash-mismatches.
      val wh = LakeQueries.freshWarehouse("matviewfil")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvf","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvf", "ord")
        .append(orders.filter(col("o_custkey") % 2 === 0))
      s.conf.set("spark.sql.catalog.gmvfil", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvfil.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvfil.mvf.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvfil.mvf.ord " +
        "WHERE o_price > 1000.0 AND o_custkey % 100 != 7 " +
        "GROUP BY o_custkey").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mvf", "roll")).get
        .properties.contains("graft.mat-view.filter"),
        "the WHERE must be recorded with the incremental shape")
      LakeTable.load(wh, "mvf", "ord")
        .append(orders.filter(col("o_custkey") % 2 =!= 0))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvfil.mvf.roll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      vsql("SELECT o_custkey, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvfil.mvf.roll ORDER BY o_custkey")
    }),

    "lake_mat_view_retract" -> QueryModule.micro(4)((s, dir) => {
      // incremental refresh CONSUMING deletions: copy-on-write and
      // merge-on-read deletes land in the delta as SIGNED changelog
      // rows (inserts add, deletes subtract), and groups whose row
      // count reaches zero are deleted from the materialization — the
      // oracle recomputes over the surviving rows, so a missed
      // retraction or a lingering emptied group hash-mismatches.
      val wh = LakeQueries.freshWarehouse("matviewretr")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvr","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 6 === 0) // bench-sized fixture
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      // half the fixture keeps CoW-rewrite/diff cost down; the delete
      // predicates are chosen so BOTH populations retract: %10==2 hits
      // only EVEN keys (seed rows — groups materialized at create get
      // rows subtracted and some empty out of the backing table), and
      // %10==5 hits only ODD keys (rows first seen in this delta)
      LakeTable.load(wh, "mvr", "ord")
        .append(orders.filter(col("o_custkey") % 4 === 0))
      s.conf.set("spark.sql.catalog.gmvret", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvret.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvret.mvr.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvret.mvr.ord GROUP BY o_custkey").collect()
      // the delta holds appends AND retractions, touching both
      // seed-time groups and rows first seen in this very delta
      LakeTable.load(wh, "mvr", "ord")
        .append(orders.filter(col("o_custkey") % 4 === 1))
      LakeTable.load(wh, "mvr", "ord")
        .delete(s, col("o_custkey") % 10 === 2) // CoW, seed-era rows
      LakeTable.load(wh, "mvr", "ord")
        .deleteMoR(s, col("o_custkey") % 10 === 5) // MoR, delta rows
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvret.mvr.roll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      vsql("SELECT o_custkey, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvret.mvr.roll ORDER BY o_custkey")
    }),

    "lake_mat_view_observe" -> QueryModule.micro(4)((s, dir) => {
      // MV observability: every refresh attempt — mode requested,
      // strategy the engine ran, watermark range, touched groups,
      // outcome (refusals included, with their reason) — lands in a
      // sidecar history served as the `.refreshes` metadata relation,
      // the MV sibling of `.snapshots`. The key drives one append
      // merge, one full recompute, one no-op, and one refusal (a
      // full-content replace on the source), then QUERIES the history;
      // the oracle is the exact expected event list (snapshot ids are
      // deterministic), minus the wall-clock columns.
      val wh = LakeQueries.freshWarehouse("matviewobs")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvo","table_name":"nat","columns":[
          |{"column_name":"n_regionkey","data_type":"int"},
          |{"column_name":"n_nationkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val nation = Tables(s, dir, "nation")
        .select(col("n_regionkey"), col("n_nationkey"))
      LakeTable.load(wh, "mvo", "nat").append(nation)
      s.conf.set("spark.sql.catalog.gmvo2", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvo2.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvo2.mvo.roll AS " +
        "SELECT n_regionkey, count(*) AS n FROM gmvo2.mvo.nat " +
        "GROUP BY n_regionkey").collect()
      LakeTable.load(wh, "mvo", "nat").append(nation) // all 5 regions
      vsql("REFRESH MATERIALIZED VIEW gmvo2.mvo.roll INCREMENTAL")
        .collect()
      vsql("REFRESH MATERIALIZED VIEW gmvo2.mvo.roll").collect()
      vsql("REFRESH MATERIALIZED VIEW gmvo2.mvo.roll INCREMENTAL")
        .collect()
      LakeTable.load(wh, "mvo", "nat").overwrite(nation.limit(1))
      try vsql("REFRESH MATERIALIZED VIEW gmvo2.mvo.roll INCREMENTAL")
        .collect()
      catch { case _: Exception => () } // the refusal still logs
      vsql("SELECT mode, strategy, from_snapshot, to_snapshot, " +
        "groups, outcome FROM gmvo2.mvo.roll.refreshes " +
        "ORDER BY ts_ms, strategy")
    }),

    "lake_mat_view_rewrite" -> QueryModule.micro(4)((s, dir) => {
      // MV QUERY REWRITING: the same aggregate SQL over the SOURCE
      // table answers from the materialized view when it is fresh —
      // O(groups) backing read instead of O(source) scan + shuffle,
      // the half of the MV story that makes materialization pay off
      // without users rewriting their queries. Self-audits: the fresh
      // query's physical plan scans the backing table (and not the
      // lake source), a STALE view falls back to the source and
      // serves the live data, and a refresh re-enables the rewrite.
      // The oracle recomputes the final aggregate raw.
      val wh = LakeQueries.freshWarehouse("matviewrw")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvr","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvr", "ord")
        .append(orders.filter(col("o_custkey") % 9 === 0))
      s.conf.set("spark.sql.catalog.gmvr", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvr.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q,
          rewrite = true)
      vsql("CREATE MATERIALIZED VIEW gmvr.mvr.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, sum(o_price) AS s " +
        "FROM gmvr.mvr.ord GROUP BY o_custkey").collect()
      // the user's aggregate over the SOURCE (aliases their own; the
      // outer CAST projection is above the aggregate and free)
      val q = "SELECT o_custkey, n_orders, CAST(s AS DOUBLE) AS " +
        "sum_price FROM (SELECT o_custkey, count(*) AS n_orders, " +
        "sum(o_price) AS s FROM gmvr.mvr.ord GROUP BY o_custkey) " +
        "ORDER BY o_custkey"
      val hit = vsql(q)
      hit.collect()
      require(graft.sources.MatViewRewrite.lastRewrite
        .contains(("mvr", "roll")), "fresh MV must answer the query")
      require(hit.queryExecution.executedPlan.toString
        .contains("__mat_roll"), "plan must scan the backing table")
      // stale: a source commit the view hasn't merged — fall back to
      // the source and serve the LIVE rows
      LakeTable.load(wh, "mvr", "ord")
        .append(orders.filter(col("o_custkey") % 9 === 1))
      val stale = vsql(q)
      val staleRows = stale.collect()
      require(graft.sources.MatViewRewrite.lastRewrite.isEmpty &&
        !stale.queryExecution.executedPlan.toString
          .contains("__mat_roll"),
        "a stale MV must not answer")
      require(staleRows.length == LakeTable.load(wh, "mvr", "ord")
        .read(s).select("o_custkey").distinct().count(),
        "fallback must aggregate the live source")
      // refreshed → the SAME SQL routes through the view again
      vsql("REFRESH MATERIALIZED VIEW gmvr.mvr.roll INCREMENTAL")
        .collect()
      val again = vsql(q)
      again.collect()
      require(graft.sources.MatViewRewrite.lastRewrite
        .contains(("mvr", "roll")), "refresh must re-enable rewriting")
      again
    }),

    "lake_mat_view_rewrite_rollup" -> QueryModule.micro(4)((s, dir) => {
      // ROLLUP SUBSUMPTION: a COARSER aggregate answers from a FINER
      // fresh MV by re-aggregating its per-group partials — count(*)
      // sums the row counts, sum() sums the partial sums, a WHERE on
      // a GROUP KEY filters the backing table (each group's rows all
      // share the key value), and count(DISTINCT key) counts backing
      // rows. The Calcite-style aggregate-rollup match, scoped to
      // shapes derivable from this engine's own persisted metadata.
      // Self-audits: the rollup plan scans the backing table (source
      // absent), the match kind is "rollup", and a non-key WHERE
      // falls back to the source. The oracle recomputes raw.
      val wh = LakeQueries.freshWarehouse("matviewrwr")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvu","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_prio","data_type":"string"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_custkey"),
          col("o_orderpriority").as("o_prio"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvu", "ord").append(orders)
      s.conf.set("spark.sql.catalog.gmvu", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvu.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q,
          rewrite = true)
      vsql("CREATE MATERIALIZED VIEW gmvu.mvu.fine AS " +
        "SELECT o_custkey, o_prio, count(*) AS n, sum(o_price) AS s " +
        "FROM gmvu.mvu.ord GROUP BY o_custkey, o_prio").collect()
      // coarser grouping + a group-key WHERE, both absorbed by the
      // backing table; the outer CAST projection sits above the
      // rewritten aggregate
      val q = "SELECT o_prio, n_orders, CAST(s AS DOUBLE) AS " +
        "sum_price FROM (SELECT o_prio, count(*) AS n_orders, " +
        "sum(o_price) AS s FROM gmvu.mvu.ord " +
        "WHERE o_custkey % 10 = 0 GROUP BY o_prio) ORDER BY o_prio"
      val hit = vsql(q)
      hit.collect()
      require(graft.sources.MatViewRewrite.lastRewriteKind
        .contains("rollup"), "the coarser aggregate must roll up " +
        s"from the finer MV, got ${
          graft.sources.MatViewRewrite.lastRewriteKind}")
      require(hit.queryExecution.executedPlan.toString
        .contains("__mat_fine"), "plan must scan the backing table")
      // count(DISTINCT group-key) derives from the backing key column
      val dct = vsql("SELECT o_custkey, count(DISTINCT o_prio) AS " +
        "n_prios FROM gmvu.mvu.ord GROUP BY o_custkey " +
        "ORDER BY o_custkey")
      dct.collect()
      require(graft.sources.MatViewRewrite.lastRewriteKind
        .contains("rollup"), "count(DISTINCT key) must roll up")
      // a WHERE on a NON-key column cannot subsume — source answers
      val miss = vsql("SELECT o_prio, count(*) AS n FROM " +
        "gmvu.mvu.ord WHERE o_price > 1000 GROUP BY o_prio " +
        "ORDER BY o_prio")
      miss.collect()
      require(graft.sources.MatViewRewrite.lastRewriteKind.isEmpty &&
        !miss.queryExecution.executedPlan.toString
          .contains("__mat_fine"),
        "a non-key WHERE must fall back to the source")
      vsql(q)
    }),

    "lake_mat_view_join" -> QueryModule.micro(4)((s, dir) => {
      // incremental maintenance of a JOIN-shaped MV (the production
      // fact ⋈ dim rollup): the defining query joins the orders fact
      // to a customer dim and groups by a DIM column. A fact append
      // refreshes by delta-join expansion — γ(ΔF ⋈ D) merged
      // additively, the dim read pinned at its recorded snapshot, so
      // the refresh costs O(fact delta), never O(fact). The oracle
      // recomputes the join from scratch; the key self-audits that the
      // refresh was incremental (no replace snapshot on the backing
      // table) and that a dim movement refuses by name.
      val wh = LakeQueries.freshWarehouse("matviewjoin")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvj","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"mvj","table_name":"cust","columns":[
          |{"column_name":"c_id","data_type":"long"},
          |{"column_name":"c_seg","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 6 === 0) // bench-sized fixture
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvj", "cust").append(
        Tables(s, dir, "customer")
          .select(col("c_custkey").as("c_id"),
            col("c_mktsegment").as("c_seg")))
      LakeTable.load(wh, "mvj", "ord")
        .append(orders.filter(col("o_custkey") % 4 === 0))
      s.conf.set("spark.sql.catalog.gmvj2", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvj2.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvj2.mvj.segroll AS " +
        "SELECT c_seg, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvj2.mvj.ord JOIN gmvj2.mvj.cust " +
        "ON o_custkey = c_id GROUP BY c_seg").collect()
      require(graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "mvj", "segroll")).get
        .properties.contains("graft.mat-view.dims"),
        "the join shape must be recorded as incrementally maintainable")
      // fact delta: an append AND a MoR retraction, both expanded
      // through the pinned dim
      LakeTable.load(wh, "mvj", "ord")
        .append(orders.filter(col("o_custkey") % 4 === 1))
      LakeTable.load(wh, "mvj", "ord")
        .deleteMoR(s, col("o_custkey") % 10 === 4)
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvj2.mvj.segroll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      require(!LakeTable.load(wh, "mvj", "__mat_segroll").metadata
        .snapshots.exists(sn => LakeTable.isReset(sn.operation)),
        "the refresh must merge incrementally, not replace")
      // a DIM movement that can REMOVE rows cannot be expressed by any
      // insert-only leg — refuse by name (append-only dim deltas now
      // maintain; that's lake_mat_view_dimdelta's territory — this key
      // pins the guard on the destructive case)
      LakeTable.load(wh, "mvj", "cust")
        .deleteMoR(s, col("c_id") === 1L)
      val refusal =
        try { vsql("REFRESH MATERIALIZED VIEW gmvj2.mvj.segroll " +
          "INCREMENTAL").collect(); "" }
        catch { case e: Exception =>
          Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" ") }
      require(refusal.contains("dim") &&
        refusal.contains("full refresh"),
        s"dim movement must refuse by name, got: $refusal")
      vsql("SELECT c_seg, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvj2.mvj.segroll ORDER BY c_seg")
    }),

    "lake_txn_observe" -> QueryModule.micro(4)((s, dir) => {
      // TRANSACTION LOG OBSERVABILITY (r11): every coordinated
      // cross-table transaction leaves an intent record + final state
      // in the warehouse commit log, served as a `.transactions`
      // metadata relation (the transactional sibling of .snapshots /
      // .refreshes — zero data IO). The key runs two committed
      // transactions (one programmatic LakeTxn, one SQL BEGIN…COMMIT)
      // and one ABORTED one (a deterministic claim conflict: a direct
      // commit lands on a participant between staging and publish),
      // then queries the log; the oracle is the exact expected
      // (state, participants) multiset. Single-table commits never
      // coordinate and never appear.
      import graft.lake.LakeTxn
      val wh = LakeQueries.freshWarehouse("txnobserve")
      for (t <- Seq("a", "b")) Engine.processTableDefJson(wh,
        s"""{"database_name":"to","table_name":"$t","columns":[
           |{"column_name":"n_nationkey","data_type":"int"},
           |{"column_name":"n_name","data_type":"string"}],
           |"partitions":[]}""".stripMargin)
      val nation = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name")
      // committed transaction 1 (programmatic)
      LakeTxn.transaction(wh) { ctx =>
        ctx.table("to", "a").append(nation.filter(col("n_nationkey") < 5))
        ctx.table("to", "b").append(nation.filter(col("n_nationkey") < 5))
      }
      // committed transaction 2 (SQL BEGIN…COMMIT — same protocol)
      s.conf.set("spark.sql.catalog.gto", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gto.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      try {
        vsql("BEGIN TRANSACTION").collect()
        vsql("INSERT INTO gto.to.a SELECT n_nationkey, n_name FROM " +
          "gto.to.b WHERE n_nationkey < 2").collect()
        vsql("INSERT INTO gto.to.b VALUES (90, 'x')").collect()
        vsql("COMMIT").collect()
      } finally if (graft.lake.SqlTxn.active.nonEmpty)
        graft.lake.SqlTxn.rollback()
      // ABORTED transaction: a conflicting direct commit lands on a
      // participant after staging — the publish claim collides, the
      // coordinator writes the abort record, nothing becomes visible
      val aBefore = LakeTable.load(wh, "to", "a").read(s).count()
      try {
        LakeTxn.transaction(wh) { ctx =>
          ctx.table("to", "a").append(nation.filter(
            col("n_nationkey") >= 5 && col("n_nationkey") < 8))
          ctx.table("to", "b").append(nation.filter(
            col("n_nationkey") >= 5 && col("n_nationkey") < 8))
          LakeTable.load(wh, "to", "a") // the interloper
            .append(nation.filter(col("n_nationkey") === 20))
        }
        require(false, "the claim conflict must abort the transaction")
      } catch {
        case _: java.util.ConcurrentModificationException => ()
      }
      require(LakeTable.load(wh, "to", "a").read(s).count() ==
        aBefore + 1, // the interloper's row, never the aborted txn's
        "the aborted transaction must publish nothing")
      vsql("SELECT state, participants FROM gto.to.a.transactions " +
        "ORDER BY state, participants")
    }),

    "lake_auto_evolve" -> QueryModule.micro(4)((s, dir) => {
      // INGESTION AUTO-EVOLUTION (r11, Delta's mergeSchema): with
      // write.merge-schema=true an append carrying NEW top-level
      // columns adds them as optional and a column arriving legally
      // WIDER (int→long here) evolves up — both through the same
      // SchemaDiff-validated evolution ALTER TABLE runs, committed in
      // ONE transaction flip with the data (self-audited: exactly two
      // snapshots, schema id advanced, key column widened). Pre-
      // evolution rows read NULL for the added column; the oracle
      // reconstructs the same shape from the raw fixture.
      val wh = LakeQueries.freshWarehouse("autoevolve")
      Engine.processTableDefJson(wh,
        """{"database_name":"ae","table_name":"ord",
          |"properties":{"write.merge-schema":"true"},"columns":[
          |{"column_name":"o_ckey","data_type":"int"},
          |{"column_name":"o_price","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
      // writer v1: two columns, int key
      LakeTable.load(wh, "ae", "ord").append(
        orders.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_custkey").cast("int").as("o_ckey"),
            col("o_totalprice").as("o_price")))
      // writer v2: a NEW column (o_prio) and the key arriving as LONG
      LakeTable.load(wh, "ae", "ord").append(
        orders.filter(col("o_orderkey") % 3 === 1)
          .select(col("o_custkey").as("o_ckey"),
            col("o_totalprice").as("o_price"),
            col("o_orderpriority").as("o_prio")))
      val t = LakeTable.load(wh, "ae", "ord")
      require(t.currentSchema.fieldNames.toSeq ==
        Seq("o_ckey", "o_price", "o_prio"),
        s"auto-add must evolve the schema: " +
          t.currentSchema.fieldNames.mkString(","))
      require(graft.lake.Reconcile.clean(t.currentSchema)
        .asInstanceOf[org.apache.spark.sql.types.StructType]("o_ckey")
        .dataType == org.apache.spark.sql.types.LongType,
        "the int key must widen to long")
      require(t.metadata.snapshots.size == 2,
        "evolution and data must share one commit each — no extra " +
          s"snapshots: ${t.metadata.snapshots.size}")
      t.read(s)
        .groupBy(coalesce(col("o_prio"), lit("<none>")).as("o_prio"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_price"))).cast("double").as("sum_price"))
        .orderBy("o_prio")
    }),

    "lake_constraints" -> QueryModule.micro(4)((s, dir) => {
      // CHECK CONSTRAINTS (r11): ALTER TABLE ADD CONSTRAINT name
      // CHECK (expr), enforced on every commit that adds data files,
      // STATS-FIRST — a file whose footer min/max/null-count proves it
      // cannot hold a violating row is accepted without being read
      // (self-audited: the clean far-from-boundary append scans ZERO
      // files), a violating batch refuses BY NAME with nothing landed
      // (the good rows in the same batch must not survive), NULL
      // passes (SQL CHECK semantics), and a CoW UPDATE that would
      // break the constraint refuses like any other write. The oracle
      // recomputes the surviving table.
      val wh = LakeQueries.freshWarehouse("constraints")
      Engine.processTableDefJson(wh,
        """{"database_name":"co","table_name":"ord","columns":[
          |{"column_name":"o_okey","data_type":"long"},
          |{"column_name":"o_prio","data_type":"string"},
          |{"column_name":"o_price","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("o_okey"),
          col("o_orderpriority").as("o_prio"),
          col("o_totalprice").as("o_price"))
      s.conf.set("spark.sql.catalog.gco", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gco.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("ALTER TABLE gco.co.ord ADD CONSTRAINT price_pos " +
        "CHECK (o_price > 0 AND o_prio IS NOT NULL)").collect()
      // clean append, every price far above 0: footer stats must
      // PROVE it — zero validation reads (empty write partitions are
      // trivially violation-free)
      LakeTable.load(wh, "co", "ord")
        .append(orders.filter(col("o_okey") % 4 === 0))
      val (scanned, total) =
        graft.lake.Constraints.lastValidationScan.get
      require(total > 0 && scanned == 0,
        s"stats must prove the clean append without reading it: " +
          s"$scanned/$total")
      // a batch hiding one negated price refuses BY NAME and lands
      // NOTHING — its clean rows must not survive either
      val before = LakeTable.load(wh, "co", "ord").read(s).count()
      val poisoned = orders.filter(col("o_okey") % 4 === 1)
        .withColumn("o_price",
          when(col("o_okey") % 1000 === 1, -col("o_price"))
            .otherwise(col("o_price")))
      val refusal =
        try { LakeTable.load(wh, "co", "ord").append(poisoned); "" }
        catch { case e: Exception =>
          Option(e.getMessage).getOrElse("") }
      require(refusal.contains("price_pos"),
        s"the poisoned batch must refuse by name, got: $refusal")
      require(LakeTable.load(wh, "co", "ord").read(s).count() == before,
        "a refused batch must land nothing")
      // a CoW UPDATE breaking the constraint refuses; a legal one lands
      val updRefusal =
        try { vsql("UPDATE gco.co.ord SET o_price = -1.0 " +
          "WHERE o_okey % 100 = 0").collect(); "" }
        catch { case e: Exception =>
          Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(t => Option(t.getMessage).getOrElse("")).mkString(" ") }
      require(updRefusal.contains("price_pos"),
        s"the violating UPDATE must refuse by name, got: $updRefusal")
      vsql("UPDATE gco.co.ord SET o_price = o_price + 10.0 " +
        "WHERE o_okey % 100 = 0").collect()
      vsql("SELECT o_prio, count(*) AS n_orders, " +
        "CAST(sum(CAST(o_price AS DECIMAL(18,4))) AS DOUBLE) " +
        "AS sum_price FROM gco.co.ord GROUP BY o_prio ORDER BY o_prio")
    }),

    "lake_txn_sql" -> QueryModule.micro(4)((s, dir) => {
      // SQL SESSION TRANSACTIONS (r11): BEGIN TRANSACTION / COMMIT /
      // ROLLBACK over lake tables — every statement in between stages
      // on buffered handles (graft.lake.SqlTxn): reads see the
      // session's own staged writes (statement 2 aggregates statement
      // 1's rows), NOTHING is visible to other sessions until COMMIT
      // (self-audited from a fresh thread), and COMMIT publishes every
      // staged table through the same cross-table final-record
      // protocol as lake_txn_cross. A ROLLBACK block then proves
      // staged changes discard completely. The oracle recomputes the
      // committed rollup from the raw fixture.
      val wh = LakeQueries.freshWarehouse("txnsql")
      for (t <- Seq(
        """{"database_name":"txs","table_name":"acct","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"double"}],
          |"partitions":[]}""".stripMargin,
        """{"database_name":"txs","table_name":"sums","columns":[
          |{"column_name":"bucket","data_type":"long"},
          |{"column_name":"n_orders","data_type":"long"},
          |{"column_name":"sum_price","data_type":"double"}],
          |"partitions":[]}""".stripMargin)) Engine.processTableDefJson(wh, t)
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .select(col("o_custkey"), col("o_totalprice").as("o_price"))
        .createOrReplaceTempView("txsql_orders_src")
      s.conf.set("spark.sql.catalog.gtxs", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gtxs.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      def outside[A](body: => A): A = {
        @volatile var out: A = null.asInstanceOf[A]
        val t = new Thread(() => out = body)
        t.start(); t.join(); out
      }
      try {
        vsql("BEGIN TRANSACTION").collect()
        vsql("INSERT INTO gtxs.txs.acct " +
          "SELECT o_custkey, o_price FROM txsql_orders_src").collect()
        // statement 2: a THREE-CLAUSE MERGE (matched update /
        // not-matched insert / not-matched-by-source delete) walks the
        // DSv2 row-level plumbing INSIDE the transaction — its target
        // scan must see statement 1's staged rows (or the matched
        // clause finds nothing and the not-matched inserts garbage),
        // and its rewrite must stage, not commit
        vsql(
          """MERGE INTO gtxs.txs.acct t
            |USING (SELECT DISTINCT o_custkey AS k FROM txsql_orders_src
            |       WHERE o_custkey % 7 = 0) s
            |ON t.o_custkey = s.k
            |WHEN MATCHED THEN UPDATE SET o_price = t.o_price + 100000.0
            |WHEN NOT MATCHED THEN INSERT (o_custkey, o_price)
            |  VALUES (s.k, 0.0)
            |WHEN NOT MATCHED BY SOURCE AND t.o_custkey % 10 = 3
            |  THEN DELETE""".stripMargin).collect()
        // statement 3 READS the staged MERGE result (read-your-writes
        // across row-level DML) and stages into a SECOND table
        vsql("INSERT INTO gtxs.txs.sums " +
          "SELECT o_custkey % 10 AS bucket, count(*) AS n_orders, " +
          "CAST(sum(CAST(o_price AS DECIMAL(18,4))) AS DOUBLE) " +
          "AS sum_price FROM gtxs.txs.acct " +
          "GROUP BY o_custkey % 10").collect()
        // invisible to every other session until COMMIT
        val pre = outside((
          LakeTable.load(wh, "txs", "acct").read(s).count(),
          LakeTable.load(wh, "txs", "sums").read(s).count()))
        require(pre == ((0L, 0L)),
          s"staged rows leaked before COMMIT: $pre")
        val c = vsql("COMMIT").collect().head
        require(c.getInt(1) == 2, s"both tables must publish: $c")
      } finally if (graft.lake.SqlTxn.active.nonEmpty)
        graft.lake.SqlTxn.rollback()
      // a rolled-back block leaves no trace
      try {
        vsql("BEGIN TRANSACTION").collect()
        vsql("INSERT INTO gtxs.txs.sums VALUES (-1, -1, -1.0)").collect()
        vsql("ROLLBACK").collect()
      } finally if (graft.lake.SqlTxn.active.nonEmpty)
        graft.lake.SqlTxn.rollback()
      vsql("SELECT bucket, n_orders, sum_price FROM gtxs.txs.sums " +
        "ORDER BY bucket")
    }),

    "lake_mat_view_dimupsert" -> QueryModule.micro(4)((s, dir) => {
      // BLIND-UPSERT DIM MOVEMENT maintains incrementally (r12): a dim
      // that moves by equality upsert (the CDC-sink shape — markers +
      // replacement rows in one snapshot) used to refuse the join-MV
      // incremental path by name, forcing a full O(source) refresh.
      // The retracted dim rows are derivable (the pin image still
      // holds them), so the refresh routes to the touched-group
      // recompute: changed dim rows = pin-vs-head multiset diff,
      // touched groups = fact rows joining them expanded through BOTH
      // dim images, recomputed from head. The fixture re-segments a
      // customer slice via upsertMoR while a fact append lands in the
      // same range; self-audits the strategy name
      // ("recompute+dim-upsert"), no full-refresh replace, and the
      // re-pin. The oracle recomputes the join with the moved
      // segments from scratch.
      val wh = LakeQueries.freshWarehouse("matviewdu")
      Engine.processTableDefJson(wh,
        """{"database_name":"mdu","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"mdu","table_name":"cust","columns":[
          |{"column_name":"c_id","data_type":"long"},
          |{"column_name":"c_seg","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("c_id"),
          col("c_mktsegment").as("c_seg"))
      LakeTable.load(wh, "mdu", "cust").append(custs)
      LakeTable.load(wh, "mdu", "ord").append(
        orders.filter(col("o_orderkey") % 12 === 0)
          .select("o_custkey", "o_price"))
      s.conf.set("spark.sql.catalog.gmvdu", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvdu.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvdu.mdu.segroll AS " +
        "SELECT c_seg, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvdu.mdu.ord JOIN gmvdu.mdu.cust " +
        "ON o_custkey = c_id GROUP BY c_seg").collect()
      // the dim MOVES BY BLIND UPSERT: a customer slice re-segments
      // (groups lose their old contributions AND gain new ones — the
      // case no insert-only dim leg can express); a fact append lands
      // in the same refresh range
      LakeTable.load(wh, "mdu", "cust").upsertMoR(s,
        custs.filter(col("c_id") % 10 === 2)
          .withColumn("c_seg", lit("MOVED")),
        keys = Seq("c_id"))
      LakeTable.load(wh, "mdu", "ord").append(
        orders.filter(col("o_orderkey") % 12 === 3)
          .select("o_custkey", "o_price"))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvdu.mdu.segroll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      val strat = vsql("SELECT strategy FROM " +
        "gmvdu.mdu.segroll.refreshes WHERE mode = 'incremental'")
        .collect().map(_.getString(0)).toSeq
      require(strat == Seq("recompute+dim-upsert"),
        s"the refresh must run the dim-upsert recompute, got $strat")
      require(!LakeTable.load(wh, "mdu", "__mat_segroll").metadata
        .snapshots.exists(sn => LakeTable.isReset(sn.operation)),
        "the refresh must upsert touched groups, not full-refresh")
      val custHead = LakeTable.load(wh, "mdu", "cust").metadata
        .snapshots.map(_.id).max
      require(LakeTable.load(wh, "mdu", "__mat_segroll").metadata
        .properties("graft.mat-view.dim-watermark.mdu.cust")
        .split(":")(0).toLong == custHead,
        "the dim-upsert refresh must re-pin the dim at its head")
      vsql("SELECT c_seg, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvdu.mdu.segroll ORDER BY c_seg")
    }),

    "lake_mat_view_dimdelta" -> QueryModule.micro(4)((s, dir) => {
      // APPEND-ONLY DIM DELTAS maintain incrementally (r11): the
      // delta-join identity F_h⋈D_h − F_w⋈D_p = ΔF⋈D_head + F_w⋈ΔD
      // turns a dim append — previously a by-name refusal forcing a
      // full O(fact) refresh — into one extra leg joining the
      // watermark fact image against ONLY the appended dim rows, with
      // the fact scan file-pruned by the Δdim join-key envelope. The
      // fixture seeds the dim with only EVEN customers, so the odd-
      // customer fact rows sit unjoined until the dim delta arrives —
      // the case no fact-side delta can express. The oracle recomputes
      // the final join from scratch; the key self-audits the strategy
      // (.refreshes names "append+dim-delta") and that the backing
      // table saw no full-refresh replace.
      val wh = LakeQueries.freshWarehouse("matviewdd")
      Engine.processTableDefJson(wh,
        """{"database_name":"mdd","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"mdd","table_name":"cust","columns":[
          |{"column_name":"c_id","data_type":"long"},
          |{"column_name":"c_seg","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 4 === 0 || col("o_custkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      val custs = Tables(s, dir, "customer")
        .select(col("c_custkey").as("c_id"),
          col("c_mktsegment").as("c_seg"))
      LakeTable.load(wh, "mdd", "cust")
        .append(custs.filter(col("c_id") % 2 === 0))
      LakeTable.load(wh, "mdd", "ord").append(
        orders.filter(col("o_orderkey") % 12 === 0)
          .select("o_custkey", "o_price"))
      s.conf.set("spark.sql.catalog.gmvdd", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvdd.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvdd.mdd.segroll AS " +
        "SELECT c_seg, count(*) AS n_orders, sum(o_price) AS " +
        "sum_price FROM gmvdd.mdd.ord JOIN gmvdd.mdd.cust " +
        "ON o_custkey = c_id GROUP BY c_seg").collect()
      // the dim delta (odd customers — unlocks the waiting fact rows)
      // AND a fact delta land together: both legs must merge in one
      // incremental refresh
      LakeTable.load(wh, "mdd", "cust")
        .append(custs.filter(col("c_id") % 2 === 1))
      LakeTable.load(wh, "mdd", "ord").append(
        orders.filter(col("o_orderkey") % 12 === 3)
          .select("o_custkey", "o_price"))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvdd.mdd.segroll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      val strat = vsql("SELECT strategy FROM " +
        "gmvdd.mdd.segroll.refreshes WHERE mode = 'incremental'")
        .collect().map(_.getString(0)).toSeq
      require(strat == Seq("append+dim-delta"),
        s"the refresh must run the dim-delta expansion, got $strat")
      require(!LakeTable.load(wh, "mdd", "__mat_segroll").metadata
        .snapshots.exists(sn => LakeTable.isReset(sn.operation)),
        "the refresh must merge incrementally, not replace")
      // the moved dim re-pins at its head in the same flip
      val custHead = LakeTable.load(wh, "mdd", "cust").metadata
        .snapshots.map(_.id).max
      require(LakeTable.load(wh, "mdd", "__mat_segroll").metadata
        .properties("graft.mat-view.dim-watermark.mdd.cust")
        .split(":")(0).toLong == custHead,
        "the dim-delta refresh must re-pin the dim at its head")
      vsql("SELECT c_seg, n_orders, " +
        "CAST(sum_price AS DOUBLE) AS sum_price " +
        "FROM gmvdd.mdd.segroll ORDER BY c_seg")
    }),

    "lake_mat_view_minmax" -> QueryModule.micro(4)((s, dir) => {
      // MIN/MAX shapes through NON-append deltas: a signed merge
      // cannot un-see a removed extremum, so the refresh falls back to
      // recomputing ONLY the touched groups from the source (the delta
      // names them; equality-delete victims come from the watermark
      // image) — O(delta + touched groups), never the full refresh's
      // O(source). The range here mixes an append, MoR deletes, and an
      // equality upsert; the oracle recomputes from scratch, and the
      // key self-audits that the backing table saw no replace snapshot
      // (the incremental path upserts, a full refresh overwrites).
      val wh = LakeQueries.freshWarehouse("matviewmm")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvm","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_okey","data_type":"long"},
          |{"column_name":"o_price","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 6 === 0) // bench-sized fixture
        .select(col("o_custkey"), col("o_orderkey").as("o_okey"),
          col("o_totalprice").as("o_price"))
      LakeTable.load(wh, "mvm", "ord")
        .append(orders.filter(col("o_custkey") % 8 === 0))
      s.conf.set("spark.sql.catalog.gmvmm", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvmm.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvmm.mvm.roll AS " +
        "SELECT o_custkey, count(*) AS n_orders, min(o_price) AS " +
        "min_price, max(o_price) AS max_price FROM gmvmm.mvm.ord " +
        "GROUP BY o_custkey").collect()
      // the delta: an append, MoR deletes (position markers carry the
      // full victim rows), then an equality upsert re-pricing a slice
      // (markers carry only o_okey — the recompute derives the touched
      // groups from the watermark image)
      LakeTable.load(wh, "mvm", "ord")
        .append(orders.filter(col("o_custkey") % 8 === 1))
      LakeTable.load(wh, "mvm", "ord")
        .deleteMoR(s, col("o_okey") % 7 === 3)
      LakeTable.load(wh, "mvm", "ord").upsertMoR(s,
        orders.filter(col("o_custkey") % 8 === 0 &&
          col("o_okey") % 11 === 4)
          .withColumn("o_price", col("o_price") + 1000.0),
        keys = Seq("o_okey"))
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvmm.mvm.roll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      require(!LakeTable.load(wh, "mvm", "__mat_roll").metadata
        .snapshots.exists(sn => LakeTable.isReset(sn.operation)),
        "the refresh must go through the touched-group recompute " +
          "(upsert snapshots), not a full-refresh replace")
      vsql("SELECT o_custkey, n_orders, min_price, max_price " +
        "FROM gmvmm.mvm.roll ORDER BY o_custkey")
    }),

    "lake_mat_view_distinct" -> QueryModule.micro(4)((s, dir) => {
      // COUNT(DISTINCT) in the incremental class: never additively
      // mergeable (even a pure APPEND may duplicate a value the group
      // already counted), so EVERY refresh routes through the
      // touched-group recompute — O(delta + touched groups), never the
      // full refresh's O(source). The range here is an append followed
      // by MoR deletes; the key self-audits that BOTH refreshes ran
      // the recompute strategy (the .refreshes sidecar names it) and
      // that the backing table saw no full-refresh replace. The oracle
      // recomputes the distinct counts from scratch.
      val wh = LakeQueries.freshWarehouse("matviewdct")
      Engine.processTableDefJson(wh,
        """{"database_name":"mvd","table_name":"ord","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_okey","data_type":"long"},
          |{"column_name":"o_prio","data_type":"string"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 6 === 0) // bench-sized fixture
        .select(col("o_custkey"), col("o_orderkey").as("o_okey"),
          col("o_orderpriority").as("o_prio"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"))
      LakeTable.load(wh, "mvd", "ord")
        .append(orders.filter(col("o_custkey") % 32 === 0))
      s.conf.set("spark.sql.catalog.gmvdc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gmvdc.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE MATERIALIZED VIEW gmvdc.mvd.roll AS " +
        "SELECT o_custkey, count(DISTINCT o_prio) AS n_prios, " +
        "sum(DISTINCT o_price) AS sd, avg(DISTINCT o_price) AS ad, " +
        "count(*) AS n_orders FROM gmvdc.mvd.ord " +
        "GROUP BY o_custkey").collect()
      // 1. a pure append — additively UNmergeable for DISTINCT: the
      // appended rows may repeat clerks their groups already counted
      LakeTable.load(wh, "mvd", "ord")
        .append(orders.filter(col("o_custkey") % 32 === 1))
      vsql("REFRESH MATERIALIZED VIEW gmvdc.mvd.roll INCREMENTAL")
        .collect()
      // 2. MoR deletes retract some rows (possibly one of several
      // duplicates of a clerk — only the recompute can tell)
      LakeTable.load(wh, "mvd", "ord")
        .deleteMoR(s, col("o_okey") % 7 === 3)
      val res = vsql(
        "REFRESH MATERIALIZED VIEW gmvdc.mvd.roll INCREMENTAL")
        .collect()
      require(res.head.getLong(1) > res.head.getLong(0),
        "the incremental refresh must advance the watermark")
      val strategies = vsql("SELECT strategy FROM " +
        "gmvdc.mvd.roll.refreshes WHERE mode = 'incremental'")
        .collect().map(_.getString(0)).toSeq
      require(strategies.size == 2 && strategies.forall(_ == "recompute"),
        s"DISTINCT shapes must route every refresh through the " +
          s"touched-group recompute, got $strategies")
      require(!LakeTable.load(wh, "mvd", "__mat_roll").metadata
        .snapshots.exists(sn => LakeTable.isReset(sn.operation)),
        "the refresh must upsert touched groups, not full-refresh")
      vsql("SELECT o_custkey, n_prios, " +
        "CAST(sd AS DOUBLE) AS sum_dprice, " +
        "ROUND(CAST(ad AS DOUBLE), 6) AS avg_dprice6, n_orders " +
        "FROM gmvdc.mvd.roll ORDER BY o_custkey")
    }),

    "lake_views" -> QueryModule.micro(4)((s, dir) => {
      // persistent catalog views with definition versioning: CREATE,
      // then CREATE OR REPLACE (which must APPEND a version, not
      // overwrite — self-audited), then SELECT through the view; the
      // oracle runs the final definition over the raw table. DDL and
      // resolution go through the same parser + substitution rule the
      // session extensions install, so the key is independent of how
      // the driver built its session.
      val wh = LakeQueries.freshWarehouse("views")
      Engine.processTableDefJson(wh,
        """{"database_name":"vw","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "vw", "nat").append(
        Tables(s, dir, "nation")
          .select("n_nationkey", "n_name", "n_regionkey"))
      s.conf.set("spark.sql.catalog.gview", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gview.warehouse", wh)
      def vsql(q: String) =
        org.apache.spark.sql.GraftViewSubstitution.sql(s, q)
      vsql("CREATE VIEW gview.vw.regional AS " +
        "SELECT n_nationkey, n_name FROM gview.vw.nat " +
        "WHERE n_regionkey = 0").collect()
      // the replacing version declares a COLUMN LIST (positional
      // aliases + a comment) — the stored definition must round-trip
      // through SHOW CREATE VIEW and serve the aliased names
      vsql("CREATE OR REPLACE VIEW gview.vw.regional " +
        "(n_nationkey COMMENT 'nation key', tagged) AS " +
        "SELECT n_nationkey, concat(n_name, '/', n_regionkey) " +
        "FROM gview.vw.nat WHERE n_regionkey IN (1, 3)").collect()
      val doc = graft.sources.LakeViews.read(
        graft.sources.LakeViews.path(wh, "vw", "regional")).get
      require(doc.versions.map(_.id) == Seq(1, 2) &&
        doc.currentVersionId == 2,
        s"replace must append a version: ${doc.versions.map(_.id)}")
      val stmt = vsql("SHOW CREATE VIEW gview.vw.regional").collect()
        .head.getString(0)
      require(stmt.contains("COMMENT 'nation key'"),
        s"SHOW CREATE VIEW must carry the column comment: $stmt")
      require(vsql("DESCRIBE gview.vw.regional").collect()
        .map(_.getString(0)).toSeq == Seq("n_nationkey", "tagged"),
        "DESCRIBE must list the aliased view columns")
      vsql("SELECT n_nationkey, tagged FROM gview.vw.regional " +
        "ORDER BY n_nationkey")
    }),

    "lake_txn_multi" -> QueryModule.micro(4)((s, dir) => {
      // one TRANSACTION staging append + UPDATE + DELETE, published
      // through a single pointer flip — the self-audit loads a fresh
      // handle mid-body and requires the base state (atomicity is the
      // operator under test; the oracle pins the final content)
      val wh = LakeQueries.freshWarehouse("txn")
      Engine.processTableDefJson(wh,
        """{"database_name":"tx","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val t = LakeTable.load(wh, "tx", "nat")
      t.append(src.filter(col("n_nationkey") < 5))
      val versionsBefore = t.metadata.snapshots.size
      t.transaction { tx =>
        tx.append(src.filter(col("n_nationkey") >= 5))
        tx.update(s, Map("n_name" ->
          concat(col("n_name"), lit("_TX"))), col("n_regionkey") === 3)
        tx.delete(s, col("n_regionkey") === 0)
        val mid = LakeTable.load(wh, "tx", "nat").read(s).count()
        require(mid == 5,
          s"transaction leaked before the closing flip: mid-body " +
            s"readers saw $mid rows, expected the 5-row base")
      }
      require(LakeTable.load(wh, "tx", "nat").metadata.snapshots.size ==
        versionsBefore + 3, "per-op snapshots must all survive the flip")
      LakeTable.load(wh, "tx", "nat").read(s)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    }),

    "lake_txn_cross" -> QueryModule.micro(4)((s, dir) => {
      // CROSS-TABLE atomic transactions (graft.lake.LakeTxn): a fact
      // table and its audit ledger move together or not at all — the
      // catalog-level commit Iceberg solves with catalog multi-table
      // commits. Three batches: two commit, the third's coordinator
      // DIES between claiming both tables and writing the
      // transaction's final record (the fault-injection seam) — that
      // batch must appear in NEITHER table, while mid-death reads see
      // a consistent pre-transaction state on both. The self-audit
      // also requires the ledger to reconcile against the fact rows
      // batch-by-batch; the oracle recomputes the surviving batches
      // from the raw orders fixture.
      val wh = LakeQueries.freshWarehouse("xtxn")
      Engine.processTableDefJson(wh,
        """{"database_name":"xt","table_name":"fact","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_price","data_type":"decimal(18,4)"},
          |{"column_name":"batch","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"xt","table_name":"audit","columns":[
          |{"column_name":"batch","data_type":"int"},
          |{"column_name":"n_rows","data_type":"long"},
          |{"column_name":"total","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_orderkey") <= 30000)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("o_price"),
          (col("o_orderkey") % 3).cast("int").as("batch"))
        .localCheckpoint()
      def runBatch(b: Int): Unit = LakeTxn.transaction(wh) { ctx =>
        val rows = orders.filter(col("batch") === b)
        ctx.table("xt", "fact").append(rows)
        ctx.table("xt", "audit").append(rows.groupBy("batch").agg(
          count(lit(1)).as("n_rows"),
          sum("o_price").cast("decimal(18,4)").as("total")))
        // mid-body: a FRESH observer must see neither half
        require(LakeTable.load(wh, "xt", "fact").read(s)
          .filter(col("batch") === b).isEmpty, "fact half leaked")
        require(LakeTable.load(wh, "xt", "audit").read(s)
          .filter(col("batch") === b).isEmpty, "audit half leaked")
      }
      runBatch(0); runBatch(1)
      // batch 2's coordinator dies after claiming BOTH tables but
      // before the commit record — nothing may ever become visible.
      // The hook is JVM-global, so scope the injection to THIS
      // thread: the verify pool runs other keys' cross-table commits
      // concurrently, and they must not die for this key's fault.
      class Die extends RuntimeException("coordinator death")
      val self = Thread.currentThread()
      LakeTable.faultHook = name =>
        if (name == "txn-post-claims-pre-final" &&
            (Thread.currentThread() eq self)) throw new Die
      val died =
        try { runBatch(2); false }
        catch { case _: Die => true }
        finally LakeTable.faultHook = _ => ()
      require(died, "fault point never fired")
      val factNow = LakeTable.load(wh, "xt", "fact").read(s)
      require(factNow.filter(col("batch") === 2).isEmpty &&
        LakeTable.load(wh, "xt", "audit").read(s)
          .filter(col("batch") === 2).isEmpty,
        "the dead transaction must be invisible on both tables")
      // ledger reconciliation: every surviving batch's audit row
      // matches the fact rows exactly (pairing is the invariant the
      // coordinator exists to protect)
      val recon = LakeTable.load(wh, "xt", "fact").read(s)
        .groupBy("batch").agg(count(lit(1)).as("fn"),
          sum("o_price").cast("decimal(18,4)").as("ft"))
        .join(LakeTable.load(wh, "xt", "audit").read(s), Seq("batch"),
          "full_outer")
        .filter(col("fn") =!= col("n_rows") ||
          col("ft") =!= col("total") ||
          col("fn").isNull || col("n_rows").isNull)
      require(recon.isEmpty, "ledger does not reconcile with facts")
      LakeTable.load(wh, "xt", "fact").read(s)
        .groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"),
          sum("o_price").cast("double").as("sum_price"))
        .orderBy("o_custkey")
    }),

    "lake_bloom_skip" -> QueryModule.micro(4)((s, dir) => {
      // point-lookup file skipping via opt-in per-file bloom filters
      // (write.bloom-columns): keys are SHUFFLED across the files, so
      // every file's min/max covers nearly the whole key range and
      // range stats prune nothing — the bloom is the only thing that
      // can drop files, and the self-audit requires that it does. At
      // 100 TB this turns `WHERE id = x` on an unsorted id from a
      // full-table scan plan into a handful of candidate files.
      import graft.lake.RangeFilter
      val wh = LakeQueries.freshWarehouse("bloom")
      Engine.processTableDefJson(wh,
        """{"database_name":"bl","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "bl", "cust")
        .updateProperties(Map("write.bloom-columns" -> "c_custkey,c_name"))
      LakeTable.load(wh, "bl", "cust").append(
        Tables(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal").repartition(12))
      val t = LakeTable.load(wh, "bl", "cust")
      val all = t.plannedFiles().size
      val kept = t.plannedFiles(statsFilters = Seq(RangeFilter("c_custkey",
        loNum = Some(BigDecimal(101)), hiNum = Some(BigDecimal(101))))).size
      require(kept < all,
        s"bloom point-lookup must prune files: kept $kept of $all")
      val keptStr = t.plannedFiles(statsFilters = Seq(RangeFilter("c_name",
        loStr = Some("Customer#000000042"),
        hiStr = Some("Customer#000000042")))).size
      require(keptStr < all,
        s"string bloom point-lookup must prune files: kept $keptStr of $all")
      s.conf.set("spark.sql.catalog.gbloom", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gbloom.warehouse", wh)
      s.sql(
        """SELECT c_custkey, c_name, c_acctbal FROM gbloom.bl.cust
          |WHERE c_custkey = 101
          |UNION ALL
          |SELECT c_custkey, c_name, c_acctbal FROM gbloom.bl.cust
          |WHERE c_name = 'Customer#000000042'
          |ORDER BY c_custkey""".stripMargin)
    }),

    "lake_bloom_backfill" -> QueryModule.micro(4)((s, dir) => {
      // bloom BACKFILL: files written before write.bloom-columns was
      // set — plus a parquet file registered by reference via
      // add_files — carry no filters and can never skip; CALL
      // system.build_blooms builds their sidecars in one distributed
      // pass and re-references the same paths (byte-move snapshot, no
      // data rewrite). The self-audit requires pruning to appear only
      // AFTER the call; the oracle pins the lookup results, so a
      // lossy backfill (wrong hash, wrong reconciliation) mismatches.
      import graft.lake.RangeFilter
      val wh = LakeQueries.freshWarehouse("bloombf")
      Engine.processTableDefJson(wh,
        """{"database_name":"bf","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val customers = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      // pre-property files: no blooms at write time
      LakeTable.load(wh, "bf", "cust").append(
        customers.filter(col("c_custkey") % 2 === 0).repartition(8))
      // registered-by-reference files: the other never-bloomed class
      val extDir = java.nio.file.Files
        .createTempDirectory("graft-bloombf-ext")
      customers.filter(col("c_custkey") % 2 =!= 0)
        .coalesce(2).write.mode("overwrite").parquet(extDir.toString)
      val extFiles = java.nio.file.Files.list(extDir).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
      LakeTable.load(wh, "bf", "cust").addFiles(s, extFiles)
      LakeTable.load(wh, "bf", "cust")
        .updateProperties(Map("write.bloom-columns" -> "c_custkey"))
      val probe = Seq(RangeFilter("c_custkey",
        loNum = Some(BigDecimal(101)), hiNum = Some(BigDecimal(101))))
      val t0 = LakeTable.load(wh, "bf", "cust")
      val all = t0.plannedFiles().size
      require(t0.plannedFiles(statsFilters = probe).size == all,
        "before the backfill nothing can prune (keys are shuffled, " +
          "ranges overlap)")
      s.conf.set("spark.sql.catalog.gbloombf", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gbloombf.warehouse", wh)
      val n = s.sql("CALL gbloombf.system.build_blooms('bf', 'cust')")
        .collect().head.getInt(0)
      require(n == all, s"all $all files should backfill, got $n")
      val t = LakeTable.load(wh, "bf", "cust")
      require(t.plannedFiles(statsFilters = probe).size < all,
        "after the backfill the point lookup must prune")
      s.sql(
        """SELECT c_custkey, c_name, c_acctbal FROM gbloombf.bf.cust
          |WHERE c_custkey IN (101, 102, 407)
          |ORDER BY c_custkey""".stripMargin)
    }),

    "lake_merge_nmbs" -> QueryModule.micro(4)((s, dir) => {
      // MERGE with the full three-clause sync shape, including
      // Spark 4's WHEN NOT MATCHED BY SOURCE — conditional delete of
      // target rows the source no longer carries (the "mirror with
      // carve-outs" pattern). Runs through the engine's DSv2
      // row-level-operation plumbing; the oracle reconstructs the
      // merged state from the raw inputs.
      val wh = LakeQueries.freshWarehouse("mergenmbs")
      Engine.processTableDefJson(wh,
        """{"database_name":"ms","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val nation = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      LakeTable.load(wh, "ms", "nat").append(nation)
      // source: updated copies of keys < 10, plus brand-new keys
      nation.filter(col("n_nationkey") < 10)
        .withColumn("n_name", concat(col("n_name"), lit("_v2")))
        .unionByName(nation.filter(col("n_nationkey") < 5)
          .withColumn("n_nationkey", col("n_nationkey") + 100)
          .withColumn("n_name", concat(col("n_name"), lit("_new"))))
        .createOrReplaceTempView("nmbs_src")
      s.conf.set("spark.sql.catalog.gnmbs", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gnmbs.warehouse", wh)
      s.sql(
        """MERGE INTO gnmbs.ms.nat t USING nmbs_src s
          |ON t.n_nationkey = s.n_nationkey
          |WHEN MATCHED THEN UPDATE SET n_name = s.n_name
          |WHEN NOT MATCHED THEN
          |  INSERT (n_nationkey, n_name, n_regionkey)
          |  VALUES (s.n_nationkey, s.n_name, s.n_regionkey)
          |WHEN NOT MATCHED BY SOURCE AND t.n_regionkey = 0 THEN
          |  DELETE""".stripMargin).collect()
      s.sql("SELECT n_nationkey, n_name, n_regionkey " +
        "FROM gnmbs.ms.nat ORDER BY n_nationkey")
    }),

    "lake_ctas" -> QueryModule.micro(4)((s, dir) => {
      // CTAS / RTAS / timestamp time travel through the catalog
      // plugin: Spark's non-atomic CreateTableAsSelect and
      // ReplaceTableAsSelect compose from the catalog's
      // create/drop/write primitives with NO extra code — the point
      // of implementing TableCatalog properly — and `TIMESTAMP AS OF`
      // resolves through loadTable(ident, timestamp). Self-audits:
      // the pre-append timestamp read serves the old row count; RTAS
      // fully replaces the CTAS schema+content. Oracle pins the final
      // replaced table.
      val wh = LakeQueries.freshWarehouse("ctas")
      Engine.processTableDefJson(wh,
        """{"database_name":"ct","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val nation = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      LakeTable.load(wh, "ct", "nat")
        .append(nation.filter(col("n_regionkey") < 2))
      val firstCount = nation.filter(col("n_regionkey") < 2).count()
      Thread.sleep(5) // snapshot timestamps are ms-resolution
      val ts = java.time.Instant.now().toString
      Thread.sleep(5)
      LakeTable.load(wh, "ct", "nat")
        .append(nation.filter(col("n_regionkey") >= 2))
      s.conf.set("spark.sql.catalog.gctas", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gctas.warehouse", wh)
      require(s.sql(
        s"SELECT count(*) FROM gctas.ct.nat TIMESTAMP AS OF '$ts'")
        .collect().head.getLong(0) == firstCount,
        "TIMESTAMP AS OF must serve the pre-append state")
      s.sql("CREATE TABLE gctas.ct.dst AS " +
        "SELECT n_nationkey, upper(n_name) AS uname FROM gctas.ct.nat")
        .collect()
      require(s.sql("SELECT count(*) FROM gctas.ct.dst").collect()
        .head.getLong(0) == nation.count(), "CTAS must copy all rows")
      // RTAS: a different schema entirely must replace the table
      s.sql("REPLACE TABLE gctas.ct.dst AS " +
        "SELECT n_regionkey, count(*) AS n_nations " +
        "FROM gctas.ct.nat GROUP BY n_regionkey").collect()
      s.sql("SELECT n_regionkey, n_nations FROM gctas.ct.dst " +
        "ORDER BY n_regionkey")
    }),

    "lake_sql_dml" -> QueryModule.micro(4)((s, dir) => {
      // the full SQL surface end-to-end through the catalog plugin:
      // CREATE, INSERT, UPDATE, MERGE INTO, DELETE — oracle expresses
      // the same mutations over the source rows in plain SQL
      val wh = LakeQueries.freshWarehouse("sqldml")
      s.conf.set("spark.sql.catalog.graftdml", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftdml.warehouse", wh)
      s.sql("DROP TABLE IF EXISTS graftdml.rq.n")
      s.sql("""CREATE TABLE graftdml.rq.n (
              |  n_nationkey INT, n_name STRING, n_regionkey INT)""".stripMargin)
      Tables(s, dir, "nation").createOrReplaceTempView("nation_src_v")
      s.sql("""INSERT INTO graftdml.rq.n
              |SELECT n_nationkey, n_name, n_regionkey FROM nation_src_v""".stripMargin)
      s.sql("UPDATE graftdml.rq.n SET n_name = concat(n_name, '_EU') WHERE n_regionkey = 3")
      s.sql("""MERGE INTO graftdml.rq.n t
              |USING (SELECT n_nationkey, n_regionkey FROM nation_src_v
              |       WHERE n_regionkey = 1) s
              |ON t.n_nationkey = s.n_nationkey
              |WHEN MATCHED THEN UPDATE SET t.n_regionkey = s.n_regionkey + 100
              |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
              |  VALUES (s.n_nationkey, 'NEW', s.n_regionkey)""".stripMargin)
      s.sql("DELETE FROM graftdml.rq.n WHERE n_regionkey = 0")
      // replace-style sync: rows the source no longer carries are
      // deleted (WHEN NOT MATCHED BY SOURCE DELETE) or tagged stale
      // (WHEN NOT MATCHED BY SOURCE UPDATE)
      s.sql("""MERGE INTO graftdml.rq.n t
              |USING (SELECT n_nationkey FROM nation_src_v
              |       WHERE n_nationkey < 20) s
              |ON t.n_nationkey = s.n_nationkey
              |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      s.sql("""MERGE INTO graftdml.rq.n t
              |USING (SELECT n_nationkey FROM nation_src_v
              |       WHERE n_nationkey >= 5) s
              |ON t.n_nationkey = s.n_nationkey
              |WHEN NOT MATCHED BY SOURCE THEN
              |  UPDATE SET t.n_name = concat(t.n_name, '_OLD')""".stripMargin)
      s.sql("""SELECT n_nationkey, n_name, n_regionkey
              |FROM graftdml.rq.n ORDER BY n_nationkey""".stripMargin)
    }),

    "lake_scan_pushdown" -> QueryModule.micro(4)((s, dir) => {
      // in-file predicate skipping (r12): a MULTI-row-group lake file
      // (tiny parquet blocks via write.option) read through the DSv2
      // connector with range + IN + string filters — the reader
      // translates the pushed ranges into a parquet FilterPredicate,
      // so row groups skip on stats/dictionaries and records filter
      // before assembly; the residual Spark filter keeps exactness
      // either way, and the oracle recomputes the slice from the raw
      // fixture. Self-audit: the filtered scan must READ far fewer
      // source records than the table holds (recordsRead observable —
      // a regression that stops passing the predicate keeps
      // correctness but fails the audit).
      val wh = LakeQueries.freshWarehouse("pushdown")
      Engine.processTableDefJson(wh,
        """{"database_name":"pd","table_name":"li","columns":[
          |{"column_name":"l_okey","data_type":"long"},
          |{"column_name":"l_part","data_type":"long"},
          |{"column_name":"l_ship","data_type":"string"},
          |{"column_name":"l_qty","data_type":"double"}],
          |"partitions":[],
          |"properties":{
          |  "write.option.parquet.block.size":"16384",
          |  "write.option.parquet.page.size":"2048"}}""".stripMargin)
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("l_okey"),
          col("l_partkey").as("l_part"),
          col("l_returnflag").as("l_ship"),
          col("l_quantity").as("l_qty"))
      // one sorted file => row groups carry tight disjoint key ranges
      LakeTable.load(wh, "pd", "li")
        .append(li.repartition(1).sortWithinPartitions("l_okey"))
      s.conf.set("spark.sql.catalog.gpd9", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gpd9.warehouse", wh)
      val records = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      val total = LakeTable.load(wh, "pd", "li").read(s).count()
      s.sparkContext.addSparkListener(listener)
      val rows =
        try {
          val out = s.sql(
            "SELECT l_okey, l_part, l_ship, l_qty FROM gpd9.pd.li " +
              "WHERE l_okey BETWEEN 1000 AND 1200 " +
              "AND l_ship IN ('A', 'R') ORDER BY l_okey, l_part")
            .collect()
          var prev = -1L
          var cur = records.get
          while (prev != cur) {
            Thread.sleep(100); prev = cur; cur = records.get
          }
          // the vectorized reader skips at row-group/page granularity
          // (no record-level filtering in batch mode), so the audit
          // scales with the file: a tiny sf0.001 file has too few
          // groups for a 2x cut — any skipping proves engagement
          // there, while the driver-gated sizes keep the strong bound
          val budget = if (total >= 20000) total / 2 else total * 4 / 5
          require(cur < budget,
            s"the pushed predicate must skip source records: read " +
              s"$cur of $total (budget $budget)")
          out
        } finally s.sparkContext.removeSparkListener(listener)
      import s.implicits._
      rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq
        .toDF("l_okey", "l_part", "l_ship", "l_qty")
        .orderBy("l_okey", "l_part")
    }),

    "lake_rename" -> QueryModule.micro(4)((s, dir) => {
      // ALTER TABLE ... RENAME COLUMN end-to-end: files written under
      // the OLD name must read back under the new one (field-ID
      // reconcile), and a post-rename append under the new name must
      // union cleanly with them.
      val wh = LakeQueries.freshWarehouse("rename")
      s.conf.set("spark.sql.catalog.graftrn", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftrn.warehouse", wh)
      s.sql("DROP TABLE IF EXISTS graftrn.rq.r")
      s.sql("""CREATE TABLE graftrn.rq.r (
              |  n_nationkey INT, n_name STRING, n_regionkey INT)""".stripMargin)
      Tables(s, dir, "nation").createOrReplaceTempView("nation_rn_v")
      s.sql("""INSERT INTO graftrn.rq.r
              |SELECT n_nationkey, n_name, n_regionkey FROM nation_rn_v
              |WHERE n_nationkey < 15""".stripMargin)
      s.sql("ALTER TABLE graftrn.rq.r RENAME COLUMN n_name TO nation_name")
      s.sql("""INSERT INTO graftrn.rq.r
              |SELECT n_nationkey, n_name, n_regionkey FROM nation_rn_v
              |WHERE n_nationkey >= 15""".stripMargin)
      s.sql("""SELECT n_nationkey, nation_name, n_regionkey
              |FROM graftrn.rq.r ORDER BY n_nationkey""".stripMargin)
    }),

    "lake_scan_evolved" -> QueryModule.micro(4)((s, dir) => {
      // vectorized read of an EVOLVED table (r13): files written under
      // schema v1 (int counter, float ratio, old column name) read
      // through the DSv2 batch path AFTER an int→long / float→double
      // promotion, an id-preserving rename, and a post-evolution
      // column add — the requested-schema mapping (LakeVectorize)
      // serves old files columnar, renames resolved by field ID and
      // types widened in place by Spark's vectorized updaters.
      // Self-audit: the scan must actually run COLUMNAR
      // (supportsColumnar pinned on the BatchScanExec) — an evolved
      // table silently dropping to row mode is the 100-TB decode
      // cliff this key exists to prevent.
      val wh = LakeQueries.freshWarehouse("scanevolved")
      Engine.processTableDefJson(wh,
        """{"database_name":"ev","table_name":"sup","columns":[
          |{"column_name":"k","data_type":"long"},
          |{"column_name":"cnt","data_type":"int"},
          |{"column_name":"ratio","data_type":"float"},
          |{"column_name":"sname","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val sup = Tables(s, dir, "supplier")
      LakeTable.load(wh, "ev", "sup").append(
        sup.filter(col("s_suppkey") % 2 === 0)
          .select(col("s_suppkey").as("k"),
            col("s_nationkey").cast("int").as("cnt"),
            col("s_acctbal").cast("float").as("ratio"),
            col("s_name").as("sname")))
      // promote cnt int→long, ratio float→double (same def, wider)
      Engine.processTableDefJson(wh,
        """{"database_name":"ev","table_name":"sup","columns":[
          |{"column_name":"k","data_type":"long"},
          |{"column_name":"cnt","data_type":"long"},
          |{"column_name":"ratio","data_type":"double"},
          |{"column_name":"sname","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      LakeTable.load(wh, "ev", "sup").renameColumn("sname", "label")
      s.conf.set("spark.sql.catalog.gse", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gse.warehouse", wh)
      s.sql("ALTER TABLE gse.ev.sup ADD COLUMN extra STRING")
      LakeTable.load(wh, "ev", "sup").append(
        sup.filter(col("s_suppkey") % 2 === 1)
          .select(col("s_suppkey").as("k"),
            col("s_nationkey").cast("long").as("cnt"),
            col("s_acctbal").as("ratio"),
            col("s_name").as("label"),
            concat(lit("x"), col("s_suppkey").cast("string")).as("extra")))
      val out = s.sql(
        "SELECT k, cnt, ratio, label, extra FROM gse.ev.sup ORDER BY k")
      val scans = out.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b }
      require(scans.nonEmpty && scans.forall(_.supportsColumnar),
        "an evolved table's clean scan must stay on the vectorized path")
      out
    }),

    "lake_timetravel" -> QueryModule.micro(4)((s, dir) => {
      // two appends split on a deterministic predicate; reading AS OF
      // the first snapshot must return exactly the first batch
      val wh = LakeQueries.freshWarehouse("timetravel")
      Engine.processTableDefJson(wh,
        """{"database_name":"rq","table_name":"sup","columns":[
          |{"column_name":"s_suppkey","data_type":"long"},
          |{"column_name":"s_name","data_type":"string"},
          |{"column_name":"s_nationkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rq", "sup")
      val sup = Tables(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_nationkey")
      val firstSnap = t.append(sup.filter(col("s_nationkey") < 12)).id
      t.append(sup.filter(col("s_nationkey") >= 12))
      t.read(s, asOfSnapshot = Some(firstSnap))
        .orderBy("s_suppkey")
    }),

    "lake_rollback_tag" -> QueryModule.micro(4)((s, dir) => {
      // tag the good snapshot, append a bad batch, roll back to the
      // tag via CALL: history truncates instantly (metadata-only) and
      // the read surface returns to the tagged state; the final read
      // goes through VERSION AS OF '<tag>' so ref resolution sits
      // under the oracle too
      val wh = LakeQueries.freshWarehouse("rollback")
      Engine.processTableDefJson(wh,
        """{"database_name":"rq","table_name":"nat","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rq", "nat")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val good = t.append(nat.filter(col("n_nationkey") < 13)).id
      t.createRef("validated", good)
      t.append(nat.filter(col("n_nationkey") >= 13)) // the "bad" batch
      s.conf.set("spark.sql.catalog.grbt", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.grbt.warehouse", wh)
      s.sql("CALL grbt.system.rollback_to_snapshot(db => 'rq', " +
        s"`table` => 'nat', snapshot_id => ${good}L)")
      s.sql("""SELECT n_nationkey, n_name, n_regionkey
              |FROM grbt.rq.nat VERSION AS OF 'validated'
              |ORDER BY n_nationkey""".stripMargin)
    }),

    "lake_wap" -> QueryModule.micro(4)((s, dir) => {
      // write-audit-publish: a bad batch is staged (invisible to
      // readers), fails its audit on the staged view, and is discarded;
      // a good batch is staged, passes, and is published via CALL — the
      // final table state is base + good batch only. Iceberg's wap.id +
      // cherrypick flow re-expressed on the engine's staged snapshots.
      val wh = LakeQueries.freshWarehouse("wap")
      Engine.processTableDefJson(wh,
        """{"database_name":"wq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "wq", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      // parity split so both incoming batches are non-empty at every
      // scale factor (negative odd-key balances exist from sf0.001 up)
      t.append(cust.filter(col("c_custkey") % 2 === 0))
      // audit rule: no negative balances may enter the table
      t.appendStaged(cust.filter(col("c_custkey") % 2 === 1 &&
        col("c_acctbal") < 0), wapId = "batch-bad")
      t.appendStaged(cust.filter(col("c_custkey") % 2 === 1 &&
        col("c_acctbal") >= 0), wapId = "batch-good")
      // staged rows must be invisible until published — fail loudly if
      // the staging leaks (keeps the key self-auditing, not just
      // oracle-checked on the happy path)
      val baseRows = t.read(s).count()
      // audit the prospective table state, scoped to the incoming key
      // space (the base batch predates the rule and is grandfathered)
      def violations(wap: String): Long =
        t.readStaged(s, wap)
          .filter(col("c_custkey") % 2 === 1 && col("c_acctbal") < 0).count()
      require(violations("batch-bad") > 0, "bad batch should fail audit")
      require(violations("batch-good") == 0, "good batch should pass audit")
      s.conf.set("spark.sql.catalog.grwp", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.grwp.warehouse", wh)
      s.sql("CALL grwp.system.discard_wap(db => 'wq', `table` => 'cust', " +
        "wap_id => 'batch-bad')")
      s.sql("CALL grwp.system.publish_wap(db => 'wq', `table` => 'cust', " +
        "wap_id => 'batch-good')")
      require(LakeTable.load(wh, "wq", "cust").read(s).count() > baseRows,
        "published rows should be visible")
      s.sql("""SELECT c_custkey, c_name, c_acctbal
              |FROM grwp.wq.cust ORDER BY c_custkey""".stripMargin)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "lake_scan_sql" ->
      """SELECT c_custkey, c_name, c_acctbal AS acctbal
        |FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin,

    "lake_scan_pushdown" ->
      """SELECT l_orderkey AS l_okey, l_partkey AS l_part,
        |  l_returnflag AS l_ship, l_quantity AS l_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 1200
        |  AND l_returnflag IN ('A', 'R')
        |ORDER BY l_okey, l_part""".stripMargin,

    "q_star_join" ->
      """SELECT n_name, count(*) AS order_lines,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * (1 - CAST(l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
        |  AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    // even suppkeys were written pre-evolution (float ratio, no extra
    // column): REAL round-trips the float32 narrowing the lake file
    // stored, widened back to double on read — bit-equal on both sides
    "lake_scan_evolved" ->
      """SELECT s_suppkey AS k, CAST(s_nationkey AS BIGINT) AS cnt,
        |  CAST(CAST(s_acctbal AS REAL) AS DOUBLE) AS ratio,
        |  s_name AS label, CAST(NULL AS VARCHAR) AS extra
        |FROM supplier WHERE s_suppkey % 2 = 0
        |UNION ALL
        |SELECT s_suppkey AS k, CAST(s_nationkey AS BIGINT) AS cnt,
        |  CAST(s_acctbal AS DOUBLE) AS ratio,
        |  s_name AS label, 'x' || CAST(s_suppkey AS VARCHAR) AS extra
        |FROM supplier WHERE s_suppkey % 2 = 1
        |ORDER BY k""".stripMargin,

    "lake_sql_dml" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN n_name || '_OLD'
        |       ELSE n_name END AS n_name,
        |  n_regionkey FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_regionkey = 3 THEN n_name || '_EU' ELSE n_name END AS n_name,
        |    CASE WHEN n_regionkey = 1 THEN n_regionkey + 100 ELSE n_regionkey END AS n_regionkey
        |  FROM nation)
        |WHERE n_regionkey <> 0 AND n_nationkey < 20
        |ORDER BY n_nationkey""".stripMargin,

    "lake_timetravel" ->
      """SELECT s_suppkey, s_name, s_nationkey FROM supplier
        |WHERE s_nationkey < 12 ORDER BY s_suppkey""".stripMargin,

    "lake_rename" ->
      """SELECT n_nationkey, n_name AS nation_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "lake_rollback_tag" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_nationkey < 13 ORDER BY n_nationkey""".stripMargin,

    "lake_wap" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey % 2 = 0
        |   OR (c_custkey % 2 = 1 AND c_acctbal >= 0)
        |ORDER BY c_custkey""".stripMargin,
  )
}

/** Copy-on-write row-level ops (DELETE / UPDATE / MERGE) exercised
  * end-to-end against the driver testdata, each with a DuckDB oracle
  * expressing the same final table state in plain SQL. The lake side
  * round-trips through a scratch table: create → append the real
  * parquet rows → row-level op (file-pruned rewrite) → read back →
  * aggregate/order deterministically.
  *
  * Scale posture: the op rewrites only files whose partition values /
  * stats / rows match (RowOpsSpec pins that), so at 100 TB a
  * predicate hitting one partition rewrites one partition — the rest
  * of the table is untouched metadata.
  */
object RowOpsQueries extends QueryModule {
  import graft.lake.Engine

  private def scratch(tag: String): String = LakeQueries.freshWarehouse(tag)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lake_delete" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowdel")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_cow","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_cow")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      // partition-pruned CoW delete: only status=F files are opened
      t.delete(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      t.read(s).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_delete_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read DELETE: position-delete files, no data-file
      // rewrite; read back through the DSv2 connector so the oracle
      // gate covers the reader-side position skipping too
      val wh = scratch("rowdelmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_mor","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_mor")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "orders_mor").load()
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_update_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read UPDATE: matched rows become position deletes plus
      // appended updated copies — no data-file rewrite; read back via
      // the DSv2 connector so the gate covers reader-side skipping
      val wh = scratch("rowupdmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_umor","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[{"column":"c_mktsegment","name":"seg"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_umor")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      t.updateMoR(s, Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))),
        col("c_mktsegment") === "BUILDING",
        prune = Map("seg" -> Set("BUILDING")))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "customer_umor").load()
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_delete_vectors" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3-style deletion vectors (format-version=3):
      // two overlapping MoR deletes plus an update — each commit's
      // vector REPLACES the file's earlier delete state, so the live
      // structures stay one bitmap per file instead of an accumulating
      // delete-file list. Read back through the DSv2 connector so the
      // oracle gate covers the reader-side bitmap probe, and
      // self-audit that no positional parquet survived the vectoring.
      val wh = scratch("rowdelvec")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_dv","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"},
          |{"column_name":"o_orderpriority","data_type":"string"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_dv")
      t.updateProperties(Map("format-version" -> "3"))
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0,
        prune = Map("status" -> Set("F")))
      val t2 = LakeTable.load(wh, "rowops", "orders_dv")
      t2.deleteMoR(s, col("o_totalprice") > 300000.0)
      val t3 = LakeTable.load(wh, "rowops", "orders_dv")
      t3.updateMoR(s, Map("o_orderpriority" -> lit("0-VECTORED")),
        col("o_totalprice") < 10000.0)
      val t4 = LakeTable.load(wh, "rowops", "orders_dv")
      val live = LakeTable.liveDeletes(t4.metadata.snapshots)
      require(live.nonEmpty &&
        live.values.forall(ds => ds.dv.isDefined && ds.paths.isEmpty),
        "lake_delete_vectors: expected every live delete to be a " +
          "vector with no positional parquet residue")
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "orders_dv").load()
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    "lake_analyze" -> QueryModule.micro(4)((s, dir) => {
      // ANALYZE TABLE (Iceberg's statistics-file concept): one scan
      // computes per-column ndv + null counts, committed into table
      // metadata with snapshot provenance; the DSv2 scan serves them
      // to Spark's CBO (columnStats), and the `.stats` metadata
      // relation exposes them to SQL — which is the oracle-gated
      // result here, exact mode vs DuckDB's exact COUNT(DISTINCT).
      val wh = scratch("analyze")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_an","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_nationkey","data_type":"long"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_an")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
      s.conf.set("spark.sql.catalog.gan", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gan.warehouse", wh)
      s.sql("CALL gan.system.analyze(db => 'rowops', " +
        "`table` => 'customer_an', mode => 'exact')")
      s.sql("""SELECT column_name, ndv, null_count
              |FROM gan.rowops.customer_an.stats
              |ORDER BY column_name""".stripMargin)
    }),

    "lake_row_lineage" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3 row lineage: stable _row_id assigned at commit and
      // PRESERVED across a copy-on-write update and a full compaction
      // (rewrites materialize the ids). Self-audited distributed-ly:
      // per-key ids before vs after must be identical, all non-null,
      // all distinct — a rewrite that re-identified rows fails here
      // long before the (data-only) oracle could notice.
      val wh = scratch("rowlineage")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_rl","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_rl")
      t.updateProperties(Map("format-version" -> "3"))
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      val before = t.readLineage(s)
        .select(col("c_custkey"), col("_row_id").as("rid_before"))
      t.update(s, Map("c_acctbal" -> (col("c_acctbal") + 100.0)),
        col("c_mktsegment") === "BUILDING")
      val t2 = LakeTable.load(wh, "rowops", "customer_rl")
      t2.compact(s)
      val t3 = LakeTable.load(wh, "rowops", "customer_rl")
      val after = t3.readLineage(s)
      val drift = after
        .select(col("c_custkey"), col("_row_id").as("rid_after"))
        .join(before, Seq("c_custkey"))
        .filter(col("rid_after").isNull ||
          !(col("rid_after") === col("rid_before")))
        .limit(1).collect()
      require(drift.isEmpty,
        s"lake_row_lineage: a rewrite re-identified rows: " +
          drift.mkString(", "))
      val Array(nAll, nIds) = after.agg(
        count(lit(1)), countDistinct(col("_row_id"))).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
      require(nAll == nIds,
        s"lake_row_lineage: $nAll rows but $nIds distinct ids")
      after.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_merge_mor" -> QueryModule.micro(4)((s, dir) => {
      // merge-on-read MERGE: matched target rows → position deletes +
      // source-valued copies, unmatched source rows append — only
      // deltas are written, no target file rewrite
      val wh = scratch("rowmrgmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_mmor","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_mmor")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"))
      val src = Tables(s, dir, "supplier").select(
        col("s_suppkey").as("c_custkey"), col("s_name").as("c_name"),
        lit("SUPPLIER").as("c_mktsegment"))
      t.mergeMoR(s, src, Seq("c_custkey"))
      s.read.format("graft-lake")
        .option("warehouse", wh).option("database", "rowops")
        .option("table", "customer_mmor").load()
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_truncate_part" -> QueryModule.micro(4)((s, dir) => {
      // truncate[W] hidden partitioning (Iceberg's order-preserving
      // clustering): ids land in contiguous W-wide dirs, so the range
      // predicate prunes to a dir run; read back through the catalog
      // so SQL + pruning sit under the oracle gate
      val wh = scratch("truncpart")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_tr","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[{"column":"o_orderkey","transform":"truncate[10000]"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_tr")
      t.append(Tables(s, dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"))
      s.conf.set("spark.sql.catalog.gtrp", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gtrp.warehouse", wh)
      s.sql("""SELECT o_orderstatus,
              |  count(*) AS n_orders,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
              |FROM gtrp.rowops.orders_tr
              |WHERE o_orderkey >= 10000 AND o_orderkey < 30000
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    "lake_update" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowupd")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_cow","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"},
          |{"column_name":"c_acctbal","data_type":"double"}],
          |"partitions":[{"column":"c_mktsegment","name":"seg"}]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_cow")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
      t.update(s, Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))),
        col("c_mktsegment") === "BUILDING",
        prune = Map("seg" -> Set("BUILDING")))
      t.read(s).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(Tables.dec(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy("c_mktsegment")
    }),

    "lake_merge" -> QueryModule.micro(4)((s, dir) => {
      val wh = scratch("rowmrg")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"customer_m","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "customer_m")
      t.append(Tables(s, dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"))
      // upsert suppliers over the customer key space: matched keys take
      // the supplier identity, unmatched suppliers are inserted
      val src = Tables(s, dir, "supplier").select(
        col("s_suppkey").as("c_custkey"), col("s_name").as("c_name"),
        lit("SUPPLIER").as("c_mktsegment"))
      t.merge(s, src, Seq("c_custkey"))
      t.read(s).select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_ff" -> QueryModule.micro(4)((s, dir) => {
      // writable-branch lifecycle WITH divergence: a branch takes an
      // isolated commit (main keeps serving the fork-base state), main
      // then moves past the fork — fast-forward refuses the diverged
      // branch, an explicit rebase re-forks it at the new head (sound:
      // branch commits are append-only), and fast-forward publishes.
      // Zero data movement at publish or rebase. Final state = base +
      // main's divergent append + the branch commit, under the oracle.
      val wh = LakeQueries.freshWarehouse("branchff")
      Engine.processTableDefJson(wh,
        """{"database_name":"bq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bq", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust.filter(col("c_custkey") % 2 === 0))
      t.createBranch("ingest")
      t.appendToBranch(cust.filter(col("c_custkey") % 4 === 1), "ingest")
      // isolation audit, loud before the oracle
      val mainRows = t.read(s).count()
      require(t.readBranch(s, "ingest").count() > mainRows,
        "branch overlay must see its commit")
      // main diverges past the fork base
      LakeTable.load(wh, "bq", "cust")
        .append(cust.filter(col("c_custkey") % 4 === 3))
      val t2 = LakeTable.load(wh, "bq", "cust")
      require(scala.util.Try(t2.fastForward("ingest")).isFailure,
        "fast-forward must refuse a diverged branch")
      t2.rebaseBranch("ingest")
      require(t2.readBranch(s, "ingest").count() == cust.count(),
        "rebased branch view must overlay main's divergent commit")
      t2.fastForward("ingest")
      LakeTable.load(wh, "bq", "cust").read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_mor" -> QueryModule.micro(4)((s, dir) => {
      // row-level ops ON A BRANCH: a curation pass stages a
      // merge-on-read delete (bad keys) and a blind upsert (patched
      // rows) against a branch — main keeps serving the untouched
      // table while the fixes are audited, then fast-forward publishes
      // both commits under their real operations. Write cost is
      // O(keys + patched rows) regardless of table size (equality
      // deletes: no read, no rewrite), and isolation costs zero data
      // movement — the 100 TB "fix the corpus without blocking
      // readers" shape. Final state under the oracle: keys ending in 3
      // gone, keys ending in 7 re-segmented, everything else intact.
      val wh = LakeQueries.freshWarehouse("branchmor")
      Engine.processTableDefJson(wh,
        """{"database_name":"bm","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bm", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust)
      t.createBranch("curate")
      // the whole curation pass runs from SQL: key/source rows travel
      // as registered views (CALL args are scalars), the branch verbs
      // are CALL procedures, the audit reads VERSION AS OF '<branch>',
      // and publish is CALL system.fast_forward
      s.conf.set("spark.sql.catalog.graftbm", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftbm.warehouse", wh)
      cust.filter(col("c_custkey") % 10 === 3).select("c_custkey")
        .createOrReplaceTempView("bm_bad_keys")
      cust.filter(col("c_custkey") % 10 === 7)
        .withColumn("c_mktsegment", lit("PATCHED"))
        .createOrReplaceTempView("bm_patched")
      s.sql("CALL graftbm.system.branch_delete(" +
        "'bm', 'cust', 'curate', 'bm_bad_keys')").collect()
      s.sql("CALL graftbm.system.branch_upsert(" +
        "'bm', 'cust', 'curate', 'bm_patched', 'c_custkey')").collect()
      // isolation audit, loud before the oracle: main serves the full
      // table; the branch view dropped the deleted keys
      val full = cust.count()
      require(s.sql("SELECT count(*) FROM graftbm.bm.cust")
        .head.getLong(0) == full,
        "main must keep serving the untouched table")
      require(s.sql(
        "SELECT count(*) FROM graftbm.bm.cust VERSION AS OF 'curate'")
        .head.getLong(0) ==
        full - cust.filter(col("c_custkey") % 10 === 3).count(),
        "branch view must drop the MoR-deleted keys")
      s.sql("CALL graftbm.system.fast_forward('bm', 'cust', 'curate')")
        .collect()
      LakeTable.load(wh, "bm", "cust").read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_branch_cow" -> QueryModule.micro(4)((s, dir) => {
      // COPY-ON-WRITE row-level ops ON A BRANCH (round-6 What's-missing
      // #1, now built): the same curation pass as lake_branch_mor but
      // as file REWRITES — CoW delete of bad keys, CoW update
      // re-segmenting others — staged in branch isolation while main
      // keeps serving the untouched table. fast_forward publishes the
      // rewrites as "overwrite" snapshots after the rebase check
      // verifies no rewritten file moved under the branch; unlike the
      // MoR variant the published table carries ZERO read-side debt
      // (no delete files, no equality batches to merge at read time) —
      // the audited-rewrite shape for read-heavy 100 TB tables.
      val wh = LakeQueries.freshWarehouse("branchcow")
      Engine.processTableDefJson(wh,
        """{"database_name":"bc","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"},
          |{"column_name":"c_mktsegment","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "bc", "cust")
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      t.append(cust)
      t.createBranch("fix")
      // the whole pass runs from SQL (predicates travel as SQL exprs)
      s.conf.set("spark.sql.catalog.graftbc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.graftbc.warehouse", wh)
      s.sql("CALL graftbc.system.branch_delete_cow(" +
        "'bc', 'cust', 'fix', 'c_custkey % 10 = 3')").collect()
      s.sql("CALL graftbc.system.branch_update_cow(" +
        "'bc', 'cust', 'fix', 'c_mktsegment', '''PATCHED''', " +
        "'c_custkey % 10 = 7')").collect()
      // isolation audit, loud before the oracle: main serves the full
      // table; the branch view shows the rewrite
      val full = cust.count()
      require(s.sql("SELECT count(*) FROM graftbc.bc.cust")
        .head.getLong(0) == full,
        "main must keep serving the untouched table")
      require(s.sql(
        "SELECT count(*) FROM graftbc.bc.cust VERSION AS OF 'fix'")
        .head.getLong(0) ==
        full - cust.filter(col("c_custkey") % 10 === 3).count(),
        "branch view must drop the CoW-deleted keys")
      val published = LakeTable.load(wh, "bc", "cust")
      val snaps = published.fastForward("fix")
      require(snaps.nonEmpty && snaps.forall(_.operation == "overwrite"),
        s"CoW publish must produce overwrite snapshots, got " +
          snaps.map(_.operation).mkString(", "))
      published.read(s)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "lake_cdc_apply" -> QueryModule.micro(4)((s, dir) => {
      // the full CDC replication loop: a source table evolves by
      // append + blind upsert; a replica pulls each snapshot range
      // incrementally (changesBetween — metadata-only planning, only
      // the added rows are read) and applies it with the same blind
      // upsert — the replica converges to the source with zero full
      // scans on either side, O(delta) per pull. This is the
      // cross-region/cross-tier mirror shape at 100 TB.
      val wh = LakeQueries.freshWarehouse("cdcapply")
      def mk(name: String): LakeTable = {
        Engine.processTableDefJson(wh,
          s"""{"database_name":"cq","table_name":"$name","columns":[
            |{"column_name":"n_nationkey","data_type":"int"},
            |{"column_name":"n_name","data_type":"string"},
            |{"column_name":"n_regionkey","data_type":"int"}],
            |"partitions":[]}""".stripMargin)
        LakeTable.load(wh, "cq", name)
      }
      val src = mk("src")
      val dst = mk("dst")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      val s1 = src.append(nat).id
      val s2 = LakeTable.load(wh, "cq", "src").upsertMoR(s,
        nat.filter(col("n_nationkey") < 10)
          .withColumn("n_name", concat(col("n_name"), lit("_v2"))),
        keys = Seq("n_nationkey")).id
      // two incremental pulls, each applied as a blind upsert
      var d = dst
      Seq((0L, s1), (s1, s2)).foreach { case (from, to) =>
        val delta = LakeTable.load(wh, "cq", "src")
          .changesBetween(s, from, to)
        d.upsertMoR(s, delta, keys = Seq("n_nationkey"))
        d = LakeTable.load(wh, "cq", "dst")
      }
      // replica must equal the source exactly — fail loudly before the
      // oracle if the mirror diverged
      val srcRows = LakeTable.load(wh, "cq", "src").read(s)
      require(d.read(s).except(srcRows).isEmpty &&
        srcRows.except(d.read(s)).isEmpty, "replica diverged from source")
      d.read(s).orderBy("n_nationkey")
    }),

    "lake_changelog" -> QueryModule.micro(4)((s, dir) => {
      // changelog replication WITH delete markers: a history mixing
      // appends, a positional MoR delete, a blind upsert and a keyed
      // MoR delete is replayed into a mirror from `changelogBetween`'s
      // (_change_type, _change_ordinal) rows — the history
      // `changesBetween` alone cannot replicate (it never surfaces the
      // deletes). Per ordinal the mirror applies deletes then inserts,
      // mirroring sequence-number semantics; the replay loop is
      // O(snapshots) driver-side with O(delta) work per step.
      // the 6-commit MoR source is SHARED with the other changelog
      // keys (built once per JVM+dir); only the mirror is per-query
      val srcWh = LakeQueries.changelogSource(s, dir)
      val wh = LakeQueries.freshWarehouse("changelog")
      Engine.processTableDefJson(wh,
        """{"database_name":"clq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val srcT = LakeTable.load(srcWh, "cls", "src")
      val log = LakeQueries.changelogSourceLog(s, dir)
      // one metadata-scale collect tells each ordinal's change kinds
      // ONE dst handle across the replay: every commit goes through it,
      // so it can never be stale — reloading per ordinal paid a full
      // metadata parse per step for nothing
      val d = LakeTable.load(wh, "clq", "dst")
      LakeQueries.replayChangelog(d, log, Seq("n_nationkey"),
        Seq("n_nationkey", "n_name", "n_regionkey"))
      // mirror must equal the source exactly — fail loudly before the
      // oracle if the changelog replay diverged
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(srcT.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"), "changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_cow" -> QueryModule.micro(4)((s, dir) => {
      // changelog over COPY-ON-WRITE commits (closes the last
      // acknowledged changelog gap): an overwrite records replaced
      // FILES, not rows, so by default it refuses — includeCowDiffs
      // opts into computing the row delta (removed-files-before vs
      // rewritten-output, multiset except: kept rows cancel, only the
      // CoW-deleted/updated rows surface) at O(rewritten bytes) per
      // such snapshot. The log replays into a mirror that must equal
      // the source — deletes carry FULL rows here (unlike eq-delete
      // key markers), so the replay keys on the row identity. SQL
      // surface: create_changelog_view(..., include_cow => 'true').
      val wh = LakeQueries.freshWarehouse("chlogcow")
      Engine.processTableDefJson(wh,
        """{"database_name":"ccq","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int","required":true},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"n_nationkey"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"ccq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "ccq", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      // CoW UPDATE: region-1 names get a suffix (file rewrite)
      src.update(s, Map("n_name" -> concat(col("n_name"), lit("_cow"))),
        col("n_regionkey") === 1)
      // CoW DELETE: multiples of 7 go away (another rewrite)
      src.delete(s, col("n_nationkey") % 7 === 0)
      val maxId = src.metadata.snapshots.map(_.id).max
      // the raw mode refuses WITHOUT the opt-in — pin the refusal text
      val refused = scala.util.Try(
        src.changelogBetween(s, 0L, maxId).count())
      require(refused.isFailure && refused.failed.get.getMessage
        .contains("includeCowDiffs"),
        "CoW changelog must refuse without the opt-in")
      // SQL surface builds the view; the replay consumes it
      s.conf.set("spark.sql.catalog.gccq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gccq.warehouse", wh)
      s.sql(
        s"""CALL gccq.system.create_changelog_view(db => 'ccq',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'ccq_log', include_cow => 'true')""".stripMargin)
      val d = LakeTable.load(wh, "ccq", "dst")
      LakeQueries.replayChangelog(d, s.table("ccq_log"),
        Seq("n_nationkey"), Seq("n_nationkey", "n_name", "n_regionkey"))
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(src.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"), "CoW changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_replace" -> QueryModule.micro(4)((s, dir) => {
      // changelog over FULL-CONTENT REPLACE snapshots (INSERT
      // OVERWRITE / RTAS — the last changelog refusal): a replace
      // resets the replay rather than naming changed rows, so by
      // default it refuses; include_replace opts into COMPUTING the
      // row diff — the whole before state (every live delete applied)
      // multiset-excepted against the replace's own content, so kept
      // rows cancel and only genuine deletes/inserts surface, at
      // O(replaced bytes). The range here mixes a plain append, a MoR
      // delete, the replace, and a post-replace append; the log
      // replays into a mirror that must equal the source.
      val wh = LakeQueries.freshWarehouse("chlogrep")
      Engine.processTableDefJson(wh,
        """{"database_name":"crq","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int","required":true},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[],
          |"properties":{"identifier-fields":"n_nationkey"}}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"crq","table_name":"dst","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "crq", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      // a MoR delete BEFORE the replace: the before-image must apply it
      LakeTable.load(wh, "crq", "src")
        .deleteMoR(s, col("n_nationkey") % 5 === 0)
      // the replace: derived from the visible content — drop region 2,
      // suffix region-0 names (an INSERT OVERWRITE SELECT shape)
      val t2 = LakeTable.load(wh, "crq", "src")
      val replaced = t2.read(s).filter(col("n_regionkey") =!= 2)
        .withColumn("n_name", when(col("n_regionkey") === 0,
          concat(col("n_name"), lit("_r"))).otherwise(col("n_name")))
        .localCheckpoint()
      t2.overwrite(replaced)
      // life goes on after the replace
      LakeTable.load(wh, "crq", "src").append(
        nat.filter(col("n_nationkey") < 5)
          .withColumn("n_nationkey", col("n_nationkey") + 200)
          .withColumn("n_name", concat(col("n_name"), lit("_post"))))
      val srcT = LakeTable.load(wh, "crq", "src")
      val maxId = srcT.metadata.snapshots.map(_.id).max
      // the raw mode refuses WITHOUT the opt-in — pin the refusal text
      val refused = scala.util.Try(
        srcT.changelogBetween(s, 0L, maxId).count())
      require(refused.isFailure && refused.failed.get.getMessage
        .contains("includeReplaceDiffs"),
        "replace changelog must refuse without the opt-in")
      s.conf.set("spark.sql.catalog.gcrq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gcrq.warehouse", wh)
      s.sql(
        s"""CALL gcrq.system.create_changelog_view(db => 'crq',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'crq_log', include_replace => 'true')""".stripMargin)
      val d = LakeTable.load(wh, "crq", "dst")
      LakeQueries.replayChangelog(d, s.table("crq_log"),
        Seq("n_nationkey"), Seq("n_nationkey", "n_name", "n_regionkey"))
      val dstRows = d.read(s)
      LakeQueries.requireMirrorEqual(srcT.read(s), dstRows,
        Seq("n_nationkey", "n_name", "n_regionkey"),
        "replace changelog mirror")
      dstRows.orderBy("n_nationkey")
    }),

    "lake_changelog_updates" -> QueryModule.micro(4)((s, dir) => {
      // changelog UPDATE pairing + net changes (Iceberg's
      // create_changelog_view(compute_updates / net_changes)) on a
      // table whose row identity is DECLARED (identifier-fields), so
      // the upsert runs key-less and the pairing needs no explicit
      // identifier columns. The same mixed history as lake_changelog;
      // ordinal 2's blind upsert emits one delete + one insert per key,
      // which the updates view re-tags update_before / update_after.
      // Net mode is self-audited: every identity born inside the range
      // nets to a plain insert, and the net key set must equal the
      // source's final state.
      // the 6-commit MoR source is SHARED with the other changelog
      // keys (built once per JVM+dir; identity declared there, so the
      // key-less upsert and the default identifier pairing both hold)
      val wh = LakeQueries.changelogSource(s, dir)
      val src = LakeTable.load(wh, "cls", "src")
      val maxId = src.metadata.snapshots.map(_.id).max
      s.conf.set("spark.sql.catalog.gclu", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gclu.warehouse", wh)
      s.sql(
        s"""CALL gclu.system.create_changelog_view(db => 'cls',
           |`table` => 'src', from_snapshot => 0, to_snapshot => $maxId,
           |view_name => 'clu_updates', mode => 'updates')""".stripMargin)
      // net-mode self-audit: the whole range starts from an empty
      // table, so every surviving identity nets to a plain insert and
      // the net key set IS the final state. Net runs over the SHARED
      // materialized log (no second per-ordinal marker read), and both
      // checks fold into ONE action: non-insert rows and any key-set
      // asymmetry vs the final state surface through the same frame.
      val net = src.changelogNet(
        LakeQueries.changelogSourceLog(s, dir), Seq.empty)
      val problems = net
        .filter(col("_change_type") =!= "insert")
        .select(lit("non-insert net row for key").as("why"),
          col("n_nationkey"))
        .unionByName(net.select("n_nationkey").withColumn("_w", lit(1))
          .unionByName(src.read(s).select("n_nationkey")
            .withColumn("_w", lit(-1)))
          .groupBy("n_nationkey").agg(sum("_w").as("_d"))
          .filter(col("_d") =!= 0)
          .select(lit("net/final key mismatch").as("why"),
            col("n_nationkey")))
        .limit(5).collect()
      require(problems.isEmpty,
        "net changelog audit failed: " + problems.mkString("; "))
      s.table("clu_updates")
        .select(col("n_nationkey"), col("_change_type").as("change_type"),
          col("_change_ordinal").as("ord"))
        .orderBy("ord", "change_type", "n_nationkey")
    }),

    "lake_incr_rollup" -> QueryModule.micro(4)((s, dir) => {
      // incremental materialized-view maintenance: a per-customer
      // rollup follows an append-only source through CDC reads. Each
      // refresh pulls ONLY the new snapshots' rows (changesBetween —
      // O(delta) metadata-planned read; the source is never
      // rescanned), aggregates the delta, joins it against the
      // CURRENT rollup values of just the touched groups, and
      // blind-upserts the merged rows (equality-delete supersede —
      // O(changed groups) write, no rollup rewrite). At 100 TB the
      // refresh cost tracks the delta, not the table. Sums accumulate
      // in DECIMAL so incremental addition is exact-associative and
      // matches the oracle's one-pass aggregate bit-for-bit.
      val wh = LakeQueries.freshWarehouse("incrroll")
      Engine.processTableDefJson(wh,
        """{"database_name":"iq","table_name":"src","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      Engine.processTableDefJson(wh,
        """{"database_name":"iq","table_name":"roll","columns":[
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"n_orders","data_type":"long"},
          |{"column_name":"sum_price","data_type":"decimal(18,4)"}],
          |"partitions":[]}""".stripMargin)
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 4 === 0) // bench-sized fixture
        .select("o_orderkey", "o_custkey", "o_totalprice")
      var lastSeen = 0L
      Seq(0, 1, 2).foreach { m =>
        val src = LakeTable.load(wh, "iq", "src")
        val snap = src.append(orders.filter(col("o_orderkey") % 3 === m))
        // refresh: delta rows only, then merge-add into the rollup
        val delta = src.changesBetween(s, lastSeen, snap.id)
        lastSeen = snap.id
        val deltaAgg = delta.groupBy("o_custkey")
          .agg(count(lit(1)).as("d_n"),
            sum(Tables.dec(col("o_totalprice")))
              .cast("decimal(18,4)").as("d_sum"))
        val roll = LakeTable.load(wh, "iq", "roll")
        if (m == 0) {
          // first refresh of an empty view = full load: no current
          // values to merge and no keys to supersede, so a plain
          // append skips both the rollup read/join and the
          // equality-delete key batch
          roll.append(deltaAgg.select(col("o_custkey"),
            col("d_n").as("n_orders"), col("d_sum").as("sum_price")))
        } else {
          // one materialization: upsertMoR evaluates its source twice
          // (key batch + data write), and the merge join is not free
          val merged = deltaAgg
            .join(roll.read(s), Seq("o_custkey"), "left")
            .select(col("o_custkey"),
              (col("d_n") + coalesce(col("n_orders"), lit(0L)))
                .as("n_orders"),
              (col("d_sum") + coalesce(col("sum_price"),
                lit(BigDecimal(0)).cast("decimal(18,4)")))
                .cast("decimal(18,4)").as("sum_price"))
            .localCheckpoint()
          roll.upsertMoR(s, merged, keys = Seq("o_custkey"))
        }
      }
      // compaction materializes the accumulated equality deletes so
      // the served rollup is plain data files again
      val served = LakeTable.load(wh, "iq", "roll")
      served.compact(s)
      served.read(s)
        .select(col("o_custkey"), col("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
        .orderBy("o_custkey")
    }),

    "lake_compact_zorder" -> QueryModule.micro(4)((s, dir) => {
      // z-order clustered compaction: three unsorted append snapshots
      // (every file's key ranges span the whole table — nothing prunes)
      // are compacted under a zorder(o_orderkey, o_custkey) sort order
      // into Morton-clustered files whose min/max footprints are
      // NARROW on both dimensions — a 2-D range predicate then skips
      // files on metadata alone. The key self-audits the skip (planned
      // < live files) and the oracle pins the surviving rows.
      import graft.lake.RangeFilter
      val wh = LakeQueries.freshWarehouse("zorder")
      Engine.processTableDefJson(wh,
        """{"database_name":"zq","table_name":"ord","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[],
          |"properties":{"write.sort-order":"zorder(o_orderkey,o_custkey)",
          |"write.sort-buckets":"8"}}""".stripMargin)
      val t = LakeTable.load(wh, "zq", "ord")
      val orders = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 2 === 0) // bench-sized fixture
        .select("o_orderkey", "o_custkey", "o_totalprice")
      // interleave by modulus so every append spans the full key range
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t.compact(s)
      val t2 = LakeTable.load(wh, "zq", "ord")
      // scale-relative 2-D range: the low fifth of each key space, so
      // the prune assertion holds at every scale factor (one tiny
      // metadata-size agg computes the bounds)
      val (maxOk, maxCk) = {
        val r = orders.agg(max("o_orderkey"), max("o_custkey")).head()
        (r.getLong(0) / 5, r.getLong(1) / 5)
      }
      val filters = Seq(
        RangeFilter("o_orderkey", hiNum = Some(BigDecimal(maxOk))),
        RangeFilter("o_custkey", hiNum = Some(BigDecimal(maxCk))))
      val live = t2.plannedFiles().size
      val planned = t2.plannedFiles(statsFilters = filters).size
      require(live > 1 && planned < live,
        s"z-order stats pruning must skip files ($planned of $live planned)")
      t2.read(s, statsFilters = filters)
        .filter(col("o_orderkey") <= maxOk && col("o_custkey") <= maxCk)
        .groupBy(lit(1).as("grp"))
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("grp")
    }),

    "lake_add_files" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg's add_files / migrate: the shared orders.parquet is
      // registered into the table BY REFERENCE — zero copy, zero
      // rewrite, footer-only IO (the 100-TB onboarding path). The key
      // self-audits that nothing landed under the table's own data dir
      // and that the live set points at the external file, then mixes
      // the referenced data with an ordinary append and a keyed MoR
      // delete (equality batches apply to external files through the
      // same sequence rules) before the oracle compare.
      val wh = LakeQueries.freshWarehouse("addfiles")
      Engine.processTableDefJson(wh,
        """{"database_name":"af","table_name":"orders_ext","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_custkey","data_type":"long"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      s.conf.set("spark.sql.catalog.gaf", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gaf.warehouse", wh)
      val proc = s.sql(
        s"""CALL gaf.system.add_files(db => 'af', `table` => 'orders_ext',
           |paths => '$dir/orders.parquet')""".stripMargin).head()
      val t = LakeTable.load(wh, "af", "orders_ext")
      val dataDir = java.nio.file.Paths.get(wh, "af", "orders_ext", "data")
      require(!java.nio.file.Files.exists(dataDir) ||
        scala.util.Using.resource(java.nio.file.Files.list(dataDir))(
          s => !s.findAny().isPresent),
        "add_files must not copy data under the table")
      require(t.plannedFiles().map(_.path).toSet ==
        Set(s"$dir/orders.parquet"),
        "live set must reference the external file")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      require(proc.getAs[Long]("added_rows") == orders.count(),
        "footer row count must match the file")
      t.append(orders.filter(col("o_orderkey") < 10)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
      t.deleteByKeysMoR(s,
        orders.filter(col("o_orderkey") < 100).select("o_orderkey"))
      s.sql(
        """SELECT CAST(o_orderkey % 3 AS BIGINT) AS bucket,
          |  COUNT(*) AS n_orders,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_price
          |FROM gaf.af.orders_ext
          |GROUP BY 1 ORDER BY bucket""".stripMargin)
    }),

    "lake_snapshot_clone" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg's snapshot procedure: a zero-copy dev clone of a table
      // with MoR history — full metadata copy (snapshot log, delete
      // files) referencing the SAME data by path, no bytes moved. The
      // clone then evolves independently (a blind upsert lands only
      // under the clone), time travel works over the cloned history,
      // and the clone refuses orphan sweeps (gc.enabled=false: it
      // shares files it does not own). Self-audited on all four before
      // the oracle compare.
      val wh = LakeQueries.freshWarehouse("snapclone")
      Engine.processTableDefJson(wh,
        """{"database_name":"sn","table_name":"src","columns":[
          |{"column_name":"n_nationkey","data_type":"int"},
          |{"column_name":"n_name","data_type":"string"},
          |{"column_name":"n_regionkey","data_type":"int"}],
          |"partitions":[]}""".stripMargin)
      val src = LakeTable.load(wh, "sn", "src")
      val nat = Tables(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
      src.append(nat)
      src.deleteMoR(s, col("n_regionkey") === 4)
      s.conf.set("spark.sql.catalog.gsnap", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsnap.warehouse", wh)
      s.sql(
        """CALL gsnap.system.snapshot(db => 'sn', `table` => 'src',
          |to_db => 'sn', to_table => 'dev')""".stripMargin)
      val dev = LakeTable.load(wh, "sn", "dev")
      val devData = java.nio.file.Paths.get(wh, "sn", "dev", "data")
      require(!java.nio.file.Files.exists(devData),
        "snapshot clone must copy zero data bytes")
      LakeQueries.requireMirrorEqual(src.read(s), dev.read(s),
        Seq("n_nationkey", "n_name", "n_regionkey"), "snapshot clone")
      // cloned history time-travels: the pre-delete state is intact
      require(dev.read(s, asOfSnapshot = Some(1L)).count() == nat.count(),
        "clone must time-travel over the cloned history")
      // the clone evolves independently — its upsert must not touch src
      dev.upsertMoR(s, nat.filter(col("n_nationkey") < 5)
        .withColumn("n_name", concat(lit("dev_"), col("n_name"))),
        keys = Seq("n_nationkey"))
      require(LakeTable.load(wh, "sn", "src").read(s).count() ==
        dev.read(s).count() - nat.filter(col("n_nationkey") < 5 &&
          col("n_regionkey") === 4).count(),
        "source must not observe the clone's writes")
      // gc refusal: a sweep from the clone's references is never safe
      val refused =
        try { dev.removeOrphanFiles(0); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "removeOrphanFiles must refuse on a clone")
      dev.read(s).orderBy("n_nationkey")
    }),

    "lake_compact_scoped" -> QueryModule.micro(4)((s, dir) => {
      // partition-scoped compaction (Iceberg's rewrite_data_files
      // (where => ...)): three interleaved appends leave every status
      // partition with three small files, a pruned MoR delete attaches
      // position deletes to status=F — then ONLY that partition is
      // compacted, via the SQL CALL surface. Untouched partitions are
      // carried by reference; the key self-audits that their files keep
      // exact (path, seq) through the replay, that every pre-compaction
      // F file is gone, that F's delete files are materialized away, and
      // that a second scoped pass with a tiny small-file threshold is a
      // no-op (the fresh F file is no longer "small"). At 100 TB this is
      // the difference between rewriting one hot day-partition and a
      // full-table rewrite.
      val wh = LakeQueries.freshWarehouse("scoped")
      Engine.processTableDefJson(wh,
        """{"database_name":"sc","table_name":"orders_sc","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[{"column":"o_orderstatus","name":"status"}]}""".stripMargin)
      val t = LakeTable.load(wh, "sc", "orders_sc")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.append(orders.filter(col("o_orderkey") % 3 === 0))
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      t.deleteMoR(s,
        col("o_orderstatus") === "F" && col("o_totalprice") > 200000.0,
        prune = Map("status" -> Set("F")))
      val t1 = LakeTable.load(wh, "sc", "orders_sc")
      val before = t1.plannedFiles()
        .map(f => (f.path, f.seq, f.partitionValues("status")))
      s.conf.set("spark.sql.catalog.gsc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gsc.warehouse", wh)
      val proc = s.sql(
        """CALL gsc.system.rewrite_data_files(db => 'sc',
          |`table` => 'orders_sc', where_field => 'status',
          |where_values => 'F', smaller_than_bytes => 0)""".stripMargin).head()
      val t2 = LakeTable.load(wh, "sc", "orders_sc")
      val after = t2.plannedFiles()
        .map(f => (f.path, f.seq, f.partitionValues("status")))
      require(before.filterNot(_._3 == "F").toSet ==
        after.filterNot(_._3 == "F").toSet,
        "untouched partitions must keep exact file paths and seqs")
      require(after.filter(_._3 == "F").map(_._1).toSet
        .intersect(before.filter(_._3 == "F").map(_._1).toSet).isEmpty,
        "every in-scope file must be rewritten")
      require(proc.getAs[Int]("carried_files") ==
        before.count(_._3 != "F"), "carried count must match")
      require(graft.lake.LakeTable.liveDeletes(t2.metadata.snapshots).isEmpty,
        "scoped compaction must materialize the partition's deletes")
      require(t2.compactScoped(s, Map("status" -> Set("F")),
        smallerThanBytes = 1L).isEmpty,
        "re-running with a tiny threshold must be a no-op")
      t2.read(s).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "lake_upsert_eq" -> QueryModule.micro(4)((s, dir) => {
      // blind streaming upserts via equality deletes (Iceberg v2 CDC
      // sink shape): each upsert writes only its key batch + rows —
      // zero reads of the table — and sequence numbers make the later
      // batch win on overlap. Compaction then materializes the deletes
      // (so the SQL catalog read serves the final state) — the full
      // upsert → compact → serve lifecycle under one oracle.
      val wh = scratch("upserteq")
      Engine.processTableDefJson(wh,
        """{"database_name":"rowops","table_name":"orders_eq","columns":[
          |{"column_name":"o_orderkey","data_type":"long"},
          |{"column_name":"o_orderstatus","data_type":"string"},
          |{"column_name":"o_totalprice","data_type":"double"}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "rowops", "orders_eq")
      val orders = Tables(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.append(orders.filter(col("o_orderkey") < 2000))
      t.upsertMoR(s,
        orders.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 3000)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        keys = Seq("o_orderkey"))
      LakeTable.load(wh, "rowops", "orders_eq").upsertMoR(s,
        orders.filter(col("o_orderkey") >= 2500 && col("o_orderkey") < 3500)
          .withColumn("o_totalprice", col("o_totalprice") * 3),
        keys = Seq("o_orderkey"))
      s.conf.set("spark.sql.catalog.greq", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.greq.warehouse", wh)
      s.sql("CALL greq.system.compact(db => 'rowops', `table` => 'orders_eq')")
      s.sql("""SELECT o_orderkey, o_orderstatus, o_totalprice
              |FROM greq.rowops.orders_eq ORDER BY o_orderkey""".stripMargin)
    }),

    "lake_default_cols" -> QueryModule.micro(4)((s, dir) => {
      // Iceberg-v3 INITIAL DEFAULTS under the oracle: rows written
      // before `ALTER TABLE ... ADD COLUMN tier STRING DEFAULT
      // 'standard'` read the default; rows written after keep their
      // explicit values INCLUDING explicit NULLs. The fill is
      // metadata-driven at read time — zero data rewrites at any
      // table size — and this key serves it through the DSv2 Group
      // reader under the DuckDB oracle.
      val wh = LakeQueries.freshWarehouse("defaults")
      s.conf.set("spark.sql.catalog.gdc", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gdc.warehouse", wh)
      Engine.processTableDefJson(wh,
        """{"database_name":"dq","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"c_name","data_type":"string"}],
          |"partitions":[]}""".stripMargin)
      val cust = Tables(s, dir, "customer").select("c_custkey", "c_name")
      LakeTable.load(wh, "dq", "cust")
        .append(cust.filter(col("c_custkey") % 2 === 0))
      s.sql("ALTER TABLE gdc.dq.cust ADD COLUMN tier STRING " +
        "DEFAULT 'standard'")
      LakeTable.load(wh, "dq", "cust").append(
        cust.filter(col("c_custkey") % 2 === 1).withColumn("tier",
          when(col("c_custkey") % 10 === 1, lit("gold"))))
      s.sql("""SELECT c_custkey, c_name, tier
              |FROM gdc.dq.cust ORDER BY c_custkey""".stripMargin)
    }),

    "lake_eq_nested" -> QueryModule.micro(4)((s, dir) => {
      // equality-delete keys resolving through STRUCT nesting by field
      // id (Iceberg v2 keys on any nested scalar): purge one segment
      // via `meta.segment` — one key tuple deletes every matching row,
      // zero reads, zero rewrites — then a blind upsert RE-KEYED on
      // the same nested field replaces a second segment with patch
      // rows. Served through the SQL catalog WITHOUT compaction, so
      // the DSv2 reader applies the nested-key DeleteFilter
      // executor-side (chain resolved by field id per file schema).
      import s.implicits._
      val wh = LakeQueries.freshWarehouse("eqnested")
      Engine.processTableDefJson(wh,
        """{"database_name":"en","table_name":"cust","columns":[
          |{"column_name":"c_custkey","data_type":"long"},
          |{"column_name":"meta","data_type":"struct","struct_def":[
          |  {"column_name":"segment","data_type":"string"},
          |  {"column_name":"name","data_type":"string"}]}],
          |"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "en", "cust")
      t.append(Tables(s, dir, "customer").select(col("c_custkey"),
        struct(col("c_mktsegment").as("segment"),
          col("c_name").as("name")).as("meta")))
      t.deleteByKeysMoR(s, Seq("BUILDING").toDF("meta.segment"))
      LakeTable.load(wh, "en", "cust").upsertMoR(s,
        Seq((-1L, "MACHINERY", "patch_1"), (-2L, "MACHINERY", "patch_2"))
          .toDF("c_custkey", "segment", "name")
          .select(col("c_custkey"),
            struct(col("segment"), col("name")).as("meta")),
        keys = Seq("meta.segment"))
      s.conf.set("spark.sql.catalog.gren", "graft.sources.LakeCatalog")
      s.conf.set("spark.sql.catalog.gren.warehouse", wh)
      s.sql("""SELECT c_custkey, meta.segment AS segment,
              |  meta.name AS name
              |FROM gren.en.cust ORDER BY c_custkey""".stripMargin)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "lake_delete" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_delete_mor" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_delete_vectors" ->
      """SELECT o_orderstatus,
        | CASE WHEN o_totalprice < 10000.0 THEN '0-VECTORED'
        |      ELSE o_orderpriority END AS o_orderpriority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 150000.0)
        |  AND NOT (o_totalprice > 300000.0)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "lake_analyze" ->
      """SELECT column_name, ndv, null_count FROM (
        |  SELECT 'c_custkey' AS column_name,
        |    count(DISTINCT c_custkey) AS ndv,
        |    count(*) - count(c_custkey) AS null_count FROM customer
        |  UNION ALL
        |  SELECT 'c_name', count(DISTINCT c_name),
        |    count(*) - count(c_name) FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(DISTINCT c_mktsegment),
        |    count(*) - count(c_mktsegment) FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', count(DISTINCT c_nationkey),
        |    count(*) - count(c_nationkey) FROM customer
        |) ORDER BY column_name""".stripMargin,

    "lake_row_lineage" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // MoR produces the same visible table state as CoW — identical oracles
    "lake_update_mor" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "lake_merge_mor" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM (
        |  SELECT c.c_custkey,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_name ELSE c.c_name END AS c_name,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN 'SUPPLIER' ELSE c.c_mktsegment END AS c_mktsegment
        |  FROM customer c LEFT JOIN supplier s ON c.c_custkey = s.s_suppkey
        |  UNION ALL
        |  SELECT s_suppkey, s_name, 'SUPPLIER' FROM supplier
        |  WHERE s_suppkey NOT IN (SELECT c_custkey FROM customer)
        |) ORDER BY c_custkey""".stripMargin,

    "lake_truncate_part" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderkey >= 10000 AND o_orderkey < 30000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_update" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        | CAST(sum(CAST(CASE WHEN c_mktsegment = 'BUILDING'
        |                    THEN c_acctbal + 100.0 ELSE c_acctbal END
        |               AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "lake_merge" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM (
        |  SELECT c.c_custkey,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN s.s_name ELSE c.c_name END AS c_name,
        |    CASE WHEN s.s_suppkey IS NOT NULL THEN 'SUPPLIER' ELSE c.c_mktsegment END AS c_mktsegment
        |  FROM customer c LEFT JOIN supplier s ON c.c_custkey = s.s_suppkey
        |  UNION ALL
        |  SELECT s_suppkey, s_name, 'SUPPLIER' FROM supplier
        |  WHERE s_suppkey NOT IN (SELECT c_custkey FROM customer)
        |) ORDER BY c_custkey""".stripMargin,

    "lake_branch_ff" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "lake_branch_mor" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 7 THEN 'PATCHED'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    "lake_changelog_cow" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 1 THEN n_name || '_cow' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation WHERE n_nationkey % 7 <> 0
        |ORDER BY n_nationkey""".stripMargin,

    "lake_changelog_replace" ->
      """SELECT * FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_regionkey = 0 THEN n_name || '_r' ELSE n_name END
        |      AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE n_nationkey % 5 <> 0 AND n_regionkey <> 2
        |  UNION ALL
        |  SELECT n_nationkey + 200, n_name || '_post', n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |) ORDER BY n_nationkey""".stripMargin,

    "lake_branch_cow" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 7 THEN 'PATCHED'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer WHERE c_custkey % 10 <> 3
        |ORDER BY c_custkey""".stripMargin,

    "lake_incr_rollup" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_custkey % 4 = 0
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_null_skip" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "lake_bloom_skip" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey = 101 OR c_name = 'Customer#000000042'
        |ORDER BY c_custkey""".stripMargin,

    "lake_mat_view_incr" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_merge_nmbs" ->
      """SELECT * FROM (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 10 OR n_regionkey <> 0
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name || '_new', n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |) ORDER BY n_nationkey""".stripMargin,

    "lake_ctas" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations
        |FROM nation GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,

    "lake_bloom_backfill" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey IN (101, 102, 407)
        |ORDER BY c_custkey""".stripMargin,

    "lake_mat_view_avg" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price,
        |  ROUND(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
        |    6) AS avg6
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_expr" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
        |    AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "lake_mat_view_having" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 2
        |ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_filter" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) > 1000.0
        |  AND o_custkey % 100 <> 7
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_retract" ->
      """SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey % 6 = 0 AND o_custkey % 4 IN (0, 1)
        |  AND o_custkey % 10 <> 2 AND o_custkey % 10 <> 5
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_observe" ->
      """SELECT * FROM (VALUES
        |  ('incremental', 'append', CAST(1 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(5 AS BIGINT), 'ok'),
        |  ('full', 'recompute-all', CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(5 AS BIGINT), 'ok'),
        |  ('incremental', 'no-op', CAST(2 AS BIGINT),
        |   CAST(2 AS BIGINT), CAST(0 AS BIGINT), 'ok'),
        |  ('incremental', '', CAST(-1 AS BIGINT),
        |   CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'refused'))
        |  AS t(mode, strategy, from_snapshot, to_snapshot, groups,
        |       outcome)
        |ORDER BY mode, strategy""".stripMargin,

    "lake_mat_view_rewrite" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_custkey % 9 IN (0, 1)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_rewrite_rollup" ->
      """SELECT o_orderpriority AS o_prio, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey % 5 = 0 AND o_custkey % 10 = 0
        |GROUP BY o_orderpriority
        |ORDER BY o_prio""".stripMargin,

    "lake_mat_view_join" ->
      """SELECT c_mktsegment AS c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 6 = 0
        |  AND o_custkey % 4 IN (0, 1) AND o_custkey % 10 <> 4
        |GROUP BY c_mktsegment ORDER BY c_seg""".stripMargin,

    "lake_txn_observe" ->
      """SELECT * FROM (VALUES
        |  ('abort', 'to.a,to.b'),
        |  ('commit', 'to.a,to.b'),
        |  ('commit', 'to.a,to.b'))
        |  AS t(state, participants)
        |ORDER BY state, participants""".stripMargin,

    "lake_auto_evolve" ->
      """SELECT CASE WHEN o_orderkey % 3 = 1 THEN o_orderpriority
        |  ELSE '<none>' END AS o_prio,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY 1 ORDER BY o_prio""".stripMargin,

    "lake_constraints" ->
      """SELECT o_orderpriority AS o_prio,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice +
        |    CASE WHEN o_orderkey % 100 = 0 THEN 10.0 ELSE 0.0 END
        |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderkey % 4 = 0
        |GROUP BY o_orderpriority ORDER BY o_prio""".stripMargin,

    "lake_txn_sql" ->
      """WITH src AS (
        |  SELECT o_custkey, o_totalprice AS o_price
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |merged AS (
        |  SELECT o_custkey,
        |    CASE WHEN o_custkey % 7 = 0 THEN o_price + 100000.0
        |         ELSE o_price END AS o_price
        |  FROM src
        |  WHERE o_custkey % 7 = 0 OR o_custkey % 10 <> 3)
        |SELECT o_custkey % 10 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_price AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM merged
        |GROUP BY o_custkey % 10 ORDER BY bucket""".stripMargin,

    "lake_mat_view_dimupsert" ->
      """SELECT c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN (
        |  SELECT c_custkey AS c_id,
        |    CASE WHEN c_custkey % 10 = 2 THEN 'MOVED'
        |         ELSE c_mktsegment END AS c_seg
        |  FROM customer) ON o_custkey = c_id
        |WHERE o_orderkey % 12 IN (0, 3) AND o_custkey % 4 = 0
        |GROUP BY c_seg ORDER BY c_seg""".stripMargin,

    "lake_mat_view_dimdelta" ->
      """SELECT c_mktsegment AS c_seg,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 12 IN (0, 3)
        |  AND o_custkey % 4 IN (0, 1)
        |GROUP BY c_mktsegment ORDER BY c_seg""".stripMargin,

    "lake_mat_view_minmax" ->
      """WITH base AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 6 = 0 AND o_custkey % 8 IN (0, 1)),
        |live AS (
        |  SELECT o_custkey, o_totalprice FROM base
        |  WHERE o_orderkey % 7 <> 3
        |    AND NOT (o_custkey % 8 = 0 AND o_orderkey % 11 = 4)
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice + 1000.0 FROM base
        |  WHERE o_custkey % 8 = 0 AND o_orderkey % 11 = 4)
        |SELECT o_custkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM live GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_mat_view_distinct" ->
      """SELECT o_custkey,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
        |  CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DOUBLE) AS sum_dprice,
        |  ROUND(CAST(AVG(DISTINCT CAST(o_totalprice AS DECIMAL(18,4)))
        |    AS DOUBLE), 6) AS avg_dprice6,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderkey % 6 = 0 AND o_custkey % 32 IN (0, 1)
        |  AND o_orderkey % 7 <> 3
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "lake_views" ->
      """SELECT n_nationkey, n_name || '/' || n_regionkey AS tagged
        |FROM nation WHERE n_regionkey IN (1, 3)
        |ORDER BY n_nationkey""".stripMargin,

    "lake_txn_multi" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 3 THEN n_name || '_TX' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation WHERE n_regionkey <> 0
        |ORDER BY n_nationkey""".stripMargin,

    "lake_txn_cross" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderkey <= 30000 AND o_orderkey % 3 < 2
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "lake_cdc_apply" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey < 10 THEN n_name || '_v2' ELSE n_name END
        |    AS n_name,
        |  n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // same mixed history as lake_changelog, replayed through the
    // changelog-mode STREAM into the mirror
    "stream_lake_changelog" ->
      """WITH finalstate AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE (n_nationkey < 10 OR n_regionkey <> 4)
        |    AND n_nationkey NOT IN (3, 7, 22)
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), 'new_' || n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |)
        |SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM finalstate ORDER BY n_nationkey""".stripMargin,

    // history: append all; positional-delete region 4; blind upsert
    // keys<10 as _v2 (re-inserting even region-4 ones); keyed-delete
    // 3/7/22; append keys<5 shifted +100 — replayed via the changelog
    "lake_changelog" ->
      """WITH finalstate AS (
        |  SELECT n_nationkey,
        |    CASE WHEN n_nationkey < 10 THEN n_name || '_v2'
        |         ELSE n_name END AS n_name,
        |    n_regionkey
        |  FROM nation
        |  WHERE (n_nationkey < 10 OR n_regionkey <> 4)
        |    AND n_nationkey NOT IN (3, 7, 22)
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), 'new_' || n_name,
        |    n_regionkey
        |  FROM nation WHERE n_nationkey < 5
        |)
        |SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM finalstate ORDER BY n_nationkey""".stripMargin,

    // history: append all (ord 0); positional-delete region 4 (ord 1);
    // key-less blind upsert keys<10 as _v2 (ord 2 — one delete marker +
    // one insert per key, paired into update_before/update_after);
    // keyed-delete 3/7/22 (ord 3); append keys<5 shifted +100 (ord 4)
    "lake_changelog_updates" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, change_type,
        |  CAST(ord AS INTEGER) AS ord FROM (
        |  SELECT n_nationkey, 'insert' AS change_type, 0 AS ord FROM nation
        |  UNION ALL SELECT n_nationkey, 'delete', 1 FROM nation
        |    WHERE n_regionkey = 4
        |  UNION ALL SELECT n_nationkey, 'update_before', 2 FROM nation
        |    WHERE n_nationkey < 10
        |  UNION ALL SELECT n_nationkey, 'update_after', 2 FROM nation
        |    WHERE n_nationkey < 10
        |  UNION ALL SELECT n_nationkey, 'delete', 3 FROM nation
        |    WHERE n_nationkey IN (3, 7, 22)
        |  UNION ALL SELECT n_nationkey + 100, 'insert', 4 FROM nation
        |    WHERE n_nationkey < 5
        |) ORDER BY ord, change_type, n_nationkey""".stripMargin,

    "lake_compact_zorder" ->
      """WITH base AS (SELECT * FROM orders WHERE o_custkey % 2 = 0)
        |SELECT 1 AS grp, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM base
        |WHERE o_orderkey <= (SELECT max(o_orderkey) // 5 FROM base)
        |  AND o_custkey <= (SELECT max(o_custkey) // 5 FROM base)
        |GROUP BY 1 ORDER BY grp""".stripMargin,

    // clone of (append nation; MoR-delete region 4), then a clone-local
    // blind upsert of keys<5 as dev_ (re-adding even region-4 ones)
    "lake_snapshot_clone" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        |  CASE WHEN n_nationkey < 5 THEN 'dev_' || n_name
        |       ELSE n_name END AS n_name,
        |  CAST(n_regionkey AS INTEGER) AS n_regionkey
        |FROM nation WHERE n_nationkey < 5 OR n_regionkey <> 4
        |ORDER BY n_nationkey""".stripMargin,

    // referenced orders.parquet + appended keys<10 shifted +10M, then
    // keyed MoR delete of keys<100 (shifted rows unaffected)
    "lake_add_files" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        |  FROM orders WHERE o_orderkey < 10
        |)
        |SELECT CAST(o_orderkey % 3 AS BIGINT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM src WHERE o_orderkey >= 100
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    "lake_compact_scoped" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice > 200000.0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "lake_upsert_eq" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= 2500 THEN o_totalprice * 3
        |       WHEN o_orderkey >= 1000 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey < 3500
        |ORDER BY o_orderkey""".stripMargin,

    "lake_default_cols" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'standard'
        |       WHEN c_custkey % 10 = 1 THEN 'gold'
        |       ELSE NULL END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "lake_eq_nested" ->
      """SELECT c_custkey, segment, name FROM (
        |  SELECT c_custkey, c_mktsegment AS segment, c_name AS name
        |  FROM customer WHERE c_mktsegment NOT IN ('BUILDING','MACHINERY')
        |  UNION ALL
        |  SELECT * FROM (VALUES (CAST(-1 AS BIGINT), 'MACHINERY', 'patch_1'),
        |                        (CAST(-2 AS BIGINT), 'MACHINERY', 'patch_2'))
        |    v(c_custkey, segment, name)
        |) ORDER BY c_custkey""".stripMargin,
  )
}
