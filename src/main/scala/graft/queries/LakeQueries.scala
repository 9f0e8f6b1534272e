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
