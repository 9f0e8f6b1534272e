package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Multi-PROCESS commit torture: N real JVMs hammer one table with
  * append + blind MoR upsert + compact concurrently. Every prior
  * concurrency test ran writers in a single JVM, where the in-process
  * `loadedVersion` check alone masks most races; separate processes
  * share nothing but the filesystem, so this exercises the actual
  * Iceberg-style optimistic protocol: version-hint read → CREATE_NEW
  * claim of v{N+1}.json (the CAS) → atomic pointer flip. Remove the
  * CREATE_NEW claim and two processes clobber each other's metadata:
  * rows vanish or upserts resurrect stale values, which the exact
  * final-content assertion below catches.
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Workers = 3
  private val Iters = 4

  private def mkTable(tag: String): String = {
    val wh = Files.createTempDirectory(tag).toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long","required":true},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    wh
  }

  /** Spawn `n` worker JVMs against `wh` and return (worker, rc, log). */
  private def runWorkers(wh: String, n: Int, iters: Int,
      mode: String): Seq[(Int, Int, String)] = {
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
      .toString
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val outDir = Files.createTempDirectory("graft-conc-out")
    val procs = (0 until n).map { w =>
      val out = outDir.resolve(s"worker-$w.log").toFile
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1500m", "-Dspark.ui.enabled=false",
        "-Dgraft.commit.audit=true",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.ConcurrencyWorker",
        wh, "d", "t", w.toString, iters.toString, mode)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (w, pb.start(), out)
    }
    procs.map { case (w, p, out) =>
      val finished = p.waitFor(8, java.util.concurrent.TimeUnit.MINUTES)
      assert(finished, s"worker $w timed out; log:\n" +
        new String(Files.readAllBytes(out.toPath)).takeRight(4000))
      (w, p.exitValue(), new String(Files.readAllBytes(out.toPath)))
    }
  }

  /** Per-version snapshot-id chain: which ids each persisted vN.json
    * carries — a fork (v_{k+1} missing an id v_k had) is the signature
    * of a commit built on a stale load slipping past the CAS.
    */
  private def forensics(wh: String): String = {
    val metaDir = Paths.get(wh, "d", "t", "metadata")
    val versions = scala.util.Using.resource(Files.list(metaDir)) { st =>
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
        .toSeq.sorted
    }
    versions.map { v =>
      try {
        val m = graft.lake.MetadataIO.fromJson(graft.schema.Json.parse(
          Files.readString(metaDir.resolve(s"v$v.json"))),
          metaDir)
        s"v$v:[${m.snapshots.map(s => s"${s.id}${s.operation.take(1)}")
          .mkString(",")}]"
      } catch { case e: Exception => s"v$v:<unreadable ${e.getMessage}>" }
    }.mkString(" ") +
      s" hint=${Files.readString(metaDir.resolve("version-hint.text")).trim}" +
      "\ncommit audit:\n" + (try Files.readString(
        metaDir.resolve("commit-audit.log")) catch {
        case _: Exception => "<none>" })
  }

  test("N processes of append+upsert+compact: no lost commits, " +
      "monotonic history, no orphan metadata") {
    val wh = mkTable("graft-conc")
    val results = runWorkers(wh, Workers, Iters, "disjoint")
    results.foreach { case (w, rc, log) =>
      assert(rc == 0, s"worker $w exited $rc; log tail:\n" +
        log.takeRight(4000))
      assert(log.contains(s"RESULT ok appends=$Iters upserts=$Iters"),
        s"worker $w under-reported; log tail:\n" + log.takeRight(4000))
    }
    val compactsDone = results.map { case (_, _, log) =>
      "compacts=(\\d+)".r.findFirstMatchIn(log).get.group(1).toInt
    }.sum

    // --- no lost commits: every operation is exactly one snapshot ----
    val t = LakeTable.load(wh, "d", "t")
    val ops = t.metadata.snapshots.groupBy(_.operation)
      .map { case (k, v) => k -> v.size }
    assert(ops.getOrElse("append", 0) == Workers * Iters,
      s"lost append commits: $ops\nforensics: ${forensics(wh)}\n" +
        "worker logs:\n" +
        results.map { case (w, _, log) =>
          s"-- w$w: " + log.takeRight(600) }.mkString("\n"))
    assert(ops.getOrElse("upsert", 0) == Workers * Iters,
      s"lost upsert commits: $ops")
    assert(ops.getOrElse("rewrite", 0) == compactsDone,
      s"lost compact commits: $ops vs reported $compactsDone")
    assert(t.metadata.staged.isEmpty, "no staged snapshots expected")

    // --- monotonic history: ids strictly increasing, no duplicates ---
    val ids = t.metadata.snapshots.map(_.id)
    assert(ids == ids.sorted && ids.distinct == ids,
      s"snapshot ids not strictly monotonic: $ids")

    // --- version chain: one vN.json per commit, no gaps, hint = head -
    val totalCommits = 1 + t.metadata.snapshots.size // +1 = CREATE TABLE
    val metaDir = Paths.get(wh, "d", "t", "metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text"))
      .trim.toInt
    assert(hint == totalCommits,
      s"version-hint $hint != expected $totalCommits commits")
    (1 to totalCommits).foreach { v =>
      assert(Files.exists(metaDir.resolve(s"v$v.json")),
        s"gap in the version chain: v$v.json missing")
    }

    // --- no orphan metadata: every live manifest resolves -----------
    t.metadata.snapshots.foreach { s =>
      LakeTable.manifestParts(s.files).foreach { mp =>
        assert(Files.exists(metaDir.resolve(mp.manifestName)),
          s"snapshot ${s.id} references missing manifest " +
            mp.manifestName)
      }
    }

    // --- exact final content: any clobbered commit loses rows or
    //     resurrects a stale upsert value -----------------------------
    val got = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectAppends = (for {
      w <- 0 until Workers; i <- 0 until Iters; r <- 0 to 1
    } yield (1000000L + w * 10000L + i * 10L + r,
      s"a-w$w-i$i-$r")).toMap
    val expectUpserts = (for {
      w <- 0 until Workers; k <- 0 to 2
    } yield (w * 10L + k, s"u-w$w-i${Iters - 1}-k$k")).toMap
    assert(got == expectAppends ++ expectUpserts,
      s"content drift — missing: ${(expectAppends ++ expectUpserts)
        .toSet.diff(got.toSet).take(10)}; unexpected: ${got.toSet
        .diff((expectAppends ++ expectUpserts).toSet).take(10)}")
  }

  test("N processes of append + vector-delete + scoped-compact on a " +
      "v3 table: no lost commits, exact content, vector-only state") {
    val wh = mkTable("graft-conc-v3")
    LakeTable.load(wh, "d", "t")
      .updateProperties(Map("format-version" -> "3"))
    val results = runWorkers(wh, Workers, Iters, "v3")
    results.foreach { case (w, rc, log) =>
      assert(rc == 0, s"worker $w exited $rc; log tail:\n" +
        log.takeRight(4000))
      assert(log.contains(s"RESULT ok appends=$Iters upserts=$Iters"),
        s"worker $w under-reported; log tail:\n" + log.takeRight(4000))
    }

    val t = LakeTable.load(wh, "d", "t")
    val ops = t.metadata.snapshots.groupBy(_.operation)
      .map { case (k, v) => k -> v.size }
    def hist = t.metadata.snapshots.map(s =>
      s"${s.id}:${s.operation}:f${s.files.size}:rm${s.removedPaths.size}")
      .mkString(", ") + "\nworker logs:\n" + results.map {
        case (w, _, log) => s"-- w$w: " +
          "RESULT.*".r.findFirstIn(log).getOrElse(log.takeRight(300))
      }.mkString("\n")
    assert(ops.getOrElse("append", 0) == Workers * Iters,
      s"lost append commits: $ops; history: $hist\n" +
        s"forensics: ${forensics(wh)}")
    assert(ops.getOrElse("delete", 0) == Workers * Iters,
      s"lost vector-delete commits: $ops; history: $hist\n" +
        s"forensics: ${forensics(wh)}")

    // exact final content: each (worker, iter) keeps rows k=0,1 only —
    // a lost or double-applied vector delete breaks this
    val got = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = (for {
      w <- 0 until Workers; i <- 0 until Iters; k <- 0 to 1
    } yield (1000000L + w * 100000L + i * 10L + k,
      s"v3-w$w-i$i-k$k")).toMap
    assert(got == expect,
      s"content drift — missing: ${expect.toSet.diff(got.toSet).take(10)}; " +
        s"unexpected: ${got.toSet.diff(expect.toSet).take(10)}")

    // delete state stayed vector-shaped through the races: every live
    // entry is ONE vector, no positional parquet leaked in
    val live = LakeTable.liveDeletes(t.metadata.snapshots)
    assert(live.values.forall(ds => ds.dv.isDefined && ds.paths.isEmpty),
      "v3 torture must leave vector-only delete state")

    // metadata-only count and connector read agree with the content
    val conn = spark.read.format("graft-lake")
      .option("warehouse", wh).option("database", "d").option("table", "t")
      .load()
    assert(conn.count() == expect.size.toLong)

    // row lineage survived the melee: all ids distinct and non-null
    val lin = t.readLineage(spark).select("_row_id").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    assert(lin.forall(_.isDefined), "null row id after v3 torture")
    assert(lin.flatten.distinct.length == lin.length,
      "duplicate row ids after v3 torture")
  }

  test("N processes of transactions: atomic across real races — every " +
      "published version carries its txn's snapshots together") {
    val wh = mkTable("graft-conc-txn")
    val results = runWorkers(wh, Workers, Iters, "txn")
    results.foreach { case (w, rc, log) =>
      assert(rc == 0, s"worker $w exited $rc; log tail:\n" +
        log.takeRight(4000))
      assert(log.contains(s"RESULT ok appends=$Iters"),
        s"worker $w under-reported; log tail:\n" + log.takeRight(4000))
    }
    val t = LakeTable.load(wh, "d", "t")
    // each transaction = append + CoW update = exactly 2 snapshots,
    // published through ONE version flip
    assert(t.metadata.snapshots.size == Workers * Iters * 2,
      s"expected ${Workers * Iters} txns x 2 snapshots, got " +
        s"${t.metadata.snapshots.map(s => s"${s.id}:${s.operation}")}\n" +
        s"forensics: ${forensics(wh)}")
    // ATOMICITY ACROSS PROCESSES: walk every persisted version
    // document — each one must add 0 or exactly 2 snapshots relative
    // to its predecessor; a half-transaction in any vN.json means the
    // buffered publish leaked
    val metaDir = Paths.get(wh, "d", "t", "metadata")
    val hint = Files.readString(metaDir.resolve("version-hint.text"))
      .trim.toInt
    var prev = 0
    (1 to hint).foreach { v =>
      val m = graft.lake.MetadataIO.fromJson(graft.schema.Json.parse(
        Files.readString(metaDir.resolve(s"v$v.json"))), metaDir)
      val n = m.snapshots.size
      assert(n == prev || n == prev + 2,
        s"v$v.json carries a HALF transaction: $prev -> $n snapshots\n" +
          s"forensics: ${forensics(wh)}")
      prev = n
    }
    // a transaction's two snapshots have CONSECUTIVE ids (no foreign
    // snapshot can land between them — the flip is atomic)
    val ids = t.metadata.snapshots.map(_.id)
    assert(ids.grouped(2).forall { case Seq(a, b) => b == a + 1 },
      s"interleaved transaction snapshots: $ids")
    // exact final content: the update's value won inside every txn
    val got = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = (for {
      w <- 0 until Workers; i <- 0 until Iters
    } yield Seq(
      (1000000L + w * 100000L + i * 10L, s"t-w$w-i$i-U"),
      (1000000L + w * 100000L + i * 10L + 1L, s"t-w$w-i$i-b"))).flatten.toMap
    assert(got == expect,
      s"content drift — missing: ${expect.toSet.diff(got.toSet).take(10)}; " +
        s"unexpected: ${got.toSet.diff(expect.toSet).take(10)}")
  }

  test("N processes blind-upserting the SAME keys converge to the " +
      "committed order's last write (audited against raw storage)") {
    val wh = mkTable("graft-conc-shared")
    val results = runWorkers(wh, Workers, Iters, "shared")
    results.foreach { case (w, rc, log) =>
      assert(rc == 0, s"worker $w exited $rc; log tail:\n" +
        log.takeRight(4000))
      assert(log.contains(s"RESULT ok appends=0 upserts=$Iters"),
        s"worker $w under-reported; log tail:\n" + log.takeRight(4000))
    }
    val t = LakeTable.load(wh, "d", "t")
    val snaps = t.metadata.snapshots
    assert(snaps.size == Workers * Iters &&
      snaps.forall(_.operation == "upsert"), "every upsert = one commit")
    // INDEPENDENT last-write-wins model: read each snapshot's data
    // files RAW (plain parquet, no engine) — the winning value per key
    // is whatever the highest-id snapshot carrying that key wrote. The
    // table read (which applies equality-batch sequencing) must agree
    // byte-for-byte: this pins the reader's merge-on-read semantics
    // against the storage the commit race actually produced.
    val expected = snaps.sortBy(_.id).flatMap { sn =>
      spark.read.parquet(sn.files.map(_.path): _*).collect()
        .map(r => r.getLong(r.fieldIndex("id")) ->
          r.getString(r.fieldIndex("v")))
    }.toMap // later snapshots overwrite earlier entries in toMap
    val got = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected,
      s"reader diverged from raw last-write-wins: got $got expected $expected")
    assert(got.keySet == (0L to 4L).toSet)
  }

  test("cross-table transactions across JVMs + crashing coordinators: " +
      "no observer ever reads a half-transaction") {
    val wh = Files.createTempDirectory("graft-conc-xtxn").toString
    Seq("a", "b").foreach { t =>
      Engine.processTableDefJson(wh,
        s"""{"database_name":"d","table_name":"$t","columns":[
           |{"column_name":"id","data_type":"long","required":true},
           |{"column_name":"v","data_type":"string"}],
           |"partitions":[]}""".stripMargin)
      // short recovery grace so the spec's healing pass can abort the
      // crashed coordinator's pending claims without waiting 30 s
      LakeTable.load(wh, "d", t).updateProperties(
        Map("commit.recovery.grace-ms" -> "1000"))
    }
    val javaBin = Paths.get(System.getProperty("java.home"), "bin",
      "java").toString
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val outDir = Files.createTempDirectory("graft-xtxn-out")
    def launch(tag: String, wid: Int, iters: Int, mode: String) = {
      val out = outDir.resolve(s"$tag.log").toFile
      val pb = new ProcessBuilder((Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx1500m", "-Dspark.ui.enabled=false",
        "-Dgraft.commit.audit=true",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", cp, "graft.XTxnWorker",
        wh, wid.toString, iters.toString, mode)).asJava)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (tag, pb.start(), out)
    }
    // 3 concurrent JVMs beyond this one: an observer sampling both
    // tables, a clean writer, and a coordinator that DIES between the
    // transaction's commit record and its pointer flips — the window
    // where naive ordered flips would expose table a without table b
    val observer = launch("observer", 9, 0, "observe")
    val writers = Seq(
      launch("clean", 0, 4, "clean"),
      launch("crash-prefinal", 1, 3, "crash:txn-post-claims-pre-final"),
      launch("crash-midflips", 2, 3, "crash:txn-mid-flips"))
    val wres = writers.map { case (tag, p, out) =>
      val fin = p.waitFor(8, java.util.concurrent.TimeUnit.MINUTES)
      assert(fin, s"$tag timed out; log:\n" +
        new String(Files.readAllBytes(out.toPath)).takeRight(4000))
      (tag, p.exitValue(), new String(Files.readAllBytes(out.toPath)))
    }
    wres.foreach { case (tag, rc, log) =>
      if (tag == "clean")
        assert(rc == 0 && log.contains("RESULT ok txns=4"),
          s"$tag rc=$rc log tail:\n" + log.takeRight(4000))
      else
        assert(rc == 137 && log.contains("XTXN halting"),
          s"$tag rc=$rc (wanted halt 137); log tail:\n" +
            log.takeRight(4000))
    }
    // healing pass: a later writer on each table collides with any
    // leftover claim; recovery (grace 1 s) aborts the pre-final
    // crash's pending transaction and rolls the committed one forward
    def heal(t: String, id: Long): Unit = {
      import SparkTestSession.spark.implicits._
      var n = 0
      while (n < 40) {
        n += 1
        try {
          LakeTable.load(wh, "d", t)
            .append(Seq((id, "heal")).toDF("id", "v"))
          return
        } catch {
          case _: java.util.ConcurrentModificationException =>
            Thread.sleep(250)
        }
      }
      fail(s"could not heal $t after $n attempts")
    }
    heal("a", 5000000L); heal("b", 5000001L)
    // release the observer and audit its samples
    Files.writeString(Paths.get(wh, "_observer_stop"), "stop")
    val ofin = observer._2.waitFor(2, java.util.concurrent.TimeUnit.MINUTES)
    val olog = new String(Files.readAllBytes(observer._3.toPath))
    assert(ofin && observer._2.exitValue() == 0 &&
      olog.contains("RESULT ok"),
      s"observer saw a half-transaction; log tail:\n" +
        olog.takeRight(4000))
    // exact final contents: the pre-final crash's last transaction in
    // NEITHER table, the post-final crash's in BOTH, plus every clean
    // transaction and the heal sentinels
    def ids(t: String): Set[Long] =
      LakeTable.load(wh, "d", t).read(spark)
        .select("id").collect().map(_.getLong(0)).toSet
    val (ia, ib) = (ids("a"), ids("b"))
    assert((ia - 5000000L) == (ib - 5000001L),
      s"tables diverged: only-a=${(ia -- ib).take(5)} " +
        s"only-b=${(ib -- ia).take(5)}")
    val expect = (0 until 4).map(i => 1000000L + i).toSet ++ // clean
      (0 until 2).map(i => 1100000L + i).toSet ++ // prefinal: last lost
      (0 until 3).map(i => 1200000L + i).toSet // midflips: last kept
    assert((ia - 5000000L) == expect,
      s"missing=${(expect -- ia).take(5)} extra=${(ia -- expect - 5000000L).take(5)}")
  }
}
