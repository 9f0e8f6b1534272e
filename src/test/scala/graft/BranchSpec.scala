package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Writable branches: commits land as branch-tagged staged snapshots,
  * reads overlay them on the frozen fork base, fast-forward publishes
  * onto main only when main hasn't moved, and divergence is resolved
  * by an explicit rebase (sound because branch writes are append-only)
  * — never silently merged (the nightly-build isolation pattern).
  */
class BranchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mk(tag: String): (String, LakeTable) = {
    val wh = Files.createTempDirectory(s"graft-branch-$tag").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    (wh, LakeTable.load(wh, "d", "t"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("branch commits are invisible to main until fast-forward") {
    import spark.implicits._
    val (wh, t) = mk("ff")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("nightly")
    t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "nightly")
    t.appendToBranch(Seq((3L, "c")).toDF("id", "v"), "nightly")
    // main unchanged; branch sees base + both commits
    assert(ids(t.read(spark)) == Set(1L))
    assert(ids(t.readBranch(spark, "nightly")) == Set(1L, 2L, 3L))
    // survives a reload (ref + staged round-trip)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(ids(t2.readBranch(spark, "nightly")) == Set(1L, 2L, 3L))
    val published = t2.fastForward("nightly")
    assert(published.size == 2)
    assert(published.map(_.operation).distinct == Seq("append"))
    val t3 = LakeTable.load(wh, "d", "t")
    assert(ids(t3.read(spark)) == Set(1L, 2L, 3L))
    // branch commits arrive in order and CDC sees them
    val changes = t3.changesBetween(spark, published.head.id - 1,
      published.last.id)
    assert(ids(changes) == Set(2L, 3L))
    // the ref is re-based at the new head — a new branch cycle works
    t3.appendToBranch(Seq((4L, "d")).toDF("id", "v"), "nightly")
    assert(ids(t3.read(spark)) == Set(1L, 2L, 3L))
    assert(ids(t3.readBranch(spark, "nightly")) == Set(1L, 2L, 3L, 4L))
  }

  test("fast-forward refuses a diverged branch; discard orphans its files") {
    import spark.implicits._
    val (wh, t) = mk("div")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("exp")
    t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "exp")
    // main moves past the fork base
    LakeTable.load(wh, "d", "t").append(Seq((9L, "z")).toDF("id", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    val e = intercept[IllegalArgumentException](t2.fastForward("exp"))
    assert(e.getMessage.contains("diverged"))
    // the branch view still shows its frozen base (no row 9)
    assert(ids(t2.readBranch(spark, "exp")) == Set(1L, 2L))
    // discard: ref gone, files aged out as orphans
    assert(t2.discardBranch("exp") >= 1)
    val t3 = LakeTable.load(wh, "d", "t")
    assert(t3.metadata.refs.isEmpty && t3.metadata.staged.isEmpty)
    assert(t3.removeOrphanFiles(olderThanMillis = 0).nonEmpty)
    assert(ids(t3.read(spark)) == Set(1L, 9L))
  }

  test("rebase re-forks a diverged branch at the new head; " +
      "fast-forward then publishes") {
    import spark.implicits._
    val (wh, t) = mk("rebase")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("exp")
    t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "exp")
    // main moves past the fork base → fastForward refuses
    LakeTable.load(wh, "d", "t").append(Seq((9L, "z")).toDF("id", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    intercept[IllegalArgumentException](t2.fastForward("exp"))

    // rebase: branch view now overlays main's newer commit, own
    // append survives
    val newBase = t2.rebaseBranch("exp")
    assert(newBase == t2.metadata.snapshots.map(_.id).max)
    assert(ids(t2.readBranch(spark, "exp")) == Set(1L, 2L, 9L))
    // idempotent: rebasing at head is a no-op (no metadata churn)
    val v = t2.metadata.snapshots.size
    assert(t2.rebaseBranch("exp") == newBase)
    assert(t2.metadata.snapshots.size == v)

    val published = t2.fastForward("exp")
    assert(published.size == 1)
    val t3 = LakeTable.load(wh, "d", "t")
    assert(ids(t3.read(spark)) == Set(1L, 2L, 9L))
    assert(t3.metadata.staged.isEmpty)
  }

  test("rebasing an empty branch moves its head pointer with the base") {
    import spark.implicits._
    val (wh, t) = mk("rebase-empty")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("idle")
    LakeTable.load(wh, "d", "t").append(Seq((2L, "b")).toDF("id", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    t2.rebaseBranch("idle")
    val ref = t2.metadata.refs("idle")
    assert(ref.baseSnapshotId.contains(ref.snapshotId),
      "an empty branch's head tracks its base")
    assert(ids(t2.readBranch(spark, "idle")) == Set(1L, 2L))
    // SQL procedure surface drives the same rebase
    spark.conf.set("spark.sql.catalog.grbr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.grbr.warehouse", wh)
    t2.appendToBranch(Seq((3L, "c")).toDF("id", "v"), "idle")
    LakeTable.load(wh, "d", "t").append(Seq((4L, "d")).toDF("id", "v"))
    val row = spark.sql(
      "CALL grbr.system.rebase_branch('d', 't', 'idle')").collect().head
    assert(row.getString(0) == "idle")
    val t3 = LakeTable.load(wh, "d", "t")
    assert(row.getLong(1) == t3.metadata.snapshots.map(_.id).max)
    assert(ids(t3.readBranch(spark, "idle")) == Set(1L, 2L, 3L, 4L))
  }

  test("maintenance cannot strand branch commits; names don't resurrect") {
    import spark.implicits._
    val (wh, t) = mk("strand")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.createBranch("b1")
    t.appendToBranch(Seq((3L, "c")).toDF("id", "v"), "b1")
    // rollback past the fork base: the branch AND its staged commits go
    t.rollbackTo(1L)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.metadata.refs.isEmpty && t2.metadata.staged.isEmpty)
    assert(t2.removeOrphanFiles(olderThanMillis = 0).nonEmpty)

    // dropRef on a writable branch purges its staged work too, so a
    // re-created branch of the same name starts clean
    t2.createBranch("b2")
    t2.appendToBranch(Seq((7L, "x")).toDF("id", "v"), "b2")
    t2.dropRef("b2")
    val t3 = LakeTable.load(wh, "d", "t")
    assert(t3.metadata.staged.isEmpty)
    t3.createBranch("b2")
    assert(t3.readBranch(spark, "b2").collect().map(_.getLong(0)).toSet
      == Set(1L), "a fresh branch must not adopt dead commits")

    // expire keeps a branch whose base survives as the squash point,
    // even though its HEAD is a staged snapshot
    t3.appendToBranch(Seq((8L, "y")).toDF("id", "v"), "b2")
    t3.expireSnapshots(keepAfter = 1L)
    val t4 = LakeTable.load(wh, "d", "t")
    assert(t4.metadata.refs.contains("b2"))
    assert(t4.readBranch(spark, "b2").collect().map(_.getLong(0)).toSet
      == Set(1L, 8L))
  }

  test("fast-forward refuses commits staged under an older schema") {
    import spark.implicits._
    val (wh, t) = mk("evoff")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("evo")
    t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "evo")
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"},
        |{"column_name":"extra","data_type":"int"}],"partitions":[]}""".stripMargin)
    val t2 = LakeTable.load(wh, "d", "t")
    val e = intercept[IllegalArgumentException](t2.fastForward("evo"))
    assert(e.getMessage.contains("re-branch"))
    assert(t2.discardBranch("evo") >= 1)
  }

  test("branch isolation: main writes after the fork stay invisible") {
    import spark.implicits._
    val (wh, t) = mk("iso")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("b1")
    LakeTable.load(wh, "d", "t").append(Seq((5L, "m")).toDF("id", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    t2.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "b1")
    assert(ids(t2.readBranch(spark, "b1")) == Set(1L, 2L),
      "post-fork main writes must not leak into the branch view")
    assert(ids(t2.read(spark)) == Set(1L, 5L))
  }

  test("branch MoR delete/upsert stay isolated; fast-forward publishes " +
      "them under their real operations") {
    import spark.implicits._
    val (wh, t) = mk("mor")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.createBranch("fix")
    t.deleteFromBranchMoR(spark, "fix", Seq(Tuple1(2L)).toDF("id"))
    t.upsertToBranchMoR(spark, "fix",
      Seq((3L, "c2"), (4L, "d")).toDF("id", "v"), Seq("id"))
    // main untouched; branch view: 2 deleted, 3 superseded, 4 inserted
    assert(ids(t.read(spark)) == Set(1L, 2L, 3L))
    def view(tb: LakeTable) = tb.readBranch(spark, "fix").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(view(t) == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
    // survives a reload (staged eq-delete round-trip)
    val t2 = LakeTable.load(wh, "d", "t")
    assert(view(t2) == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
    val published = t2.fastForward("fix")
    assert(published.map(_.operation) == Seq("delete", "upsert"))
    // re-stamped sequences: batch seq == its published snapshot id
    assert(published.flatMap(_.eqDeletes).map(_.seq)
      == published.filter(_.eqDeletes.nonEmpty).map(_.id))
    val t3 = LakeTable.load(wh, "d", "t")
    assert(t3.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "a", 3L -> "c2", 4L -> "d"))
  }

  test("branch MoR commits rebase (blind writes: last-wins per key)") {
    import spark.implicits._
    val (wh, t) = mk("mor-rebase")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("fix")
    t.deleteFromBranchMoR(spark, "fix", Seq(Tuple1(1L), Tuple1(7L)).toDF("id"))
    t.upsertToBranchMoR(spark, "fix", Seq((2L, "b")).toDF("id", "v"), Seq("id"))
    // main diverges — including a row whose key the branch deleted
    LakeTable.load(wh, "d", "t")
      .append(Seq((5L, "m"), (7L, "x")).toDF("id", "v"))
    val t2 = LakeTable.load(wh, "d", "t")
    intercept[IllegalArgumentException](t2.fastForward("fix"))
    t2.rebaseBranch("fix")
    // overlay sees main's newer rows, minus branch-deleted keys
    assert(ids(t2.readBranch(spark, "fix")) == Set(2L, 5L))
    t2.fastForward("fix")
    assert(ids(LakeTable.load(wh, "d", "t").read(spark)) == Set(2L, 5L))
  }

  test("SQL VERSION AS OF serves branch MoR overlay; discard counts " +
      "eq-delete files") {
    import spark.implicits._
    val (wh, t) = mk("mor-sql")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createBranch("wb")
    t.deleteFromBranchMoR(spark, "wb", Seq(Tuple1(1L)).toDF("id"))
    t.upsertToBranchMoR(spark, "wb", Seq((9L, "z")).toDF("id", "v"), Seq("id"))
    // catalog name unique to this test: the session CACHES catalog
    // instances by name, so reusing another spec's name would silently
    // keep its warehouse
    spark.conf.set("spark.sql.catalog.gbmor", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gbmor.warehouse", wh)
    assert(spark.sql("SELECT id FROM gbmor.d.t VERSION AS OF 'wb'")
      .collect().map(_.getLong(0)).toSet == Set(2L, 9L))
    assert(spark.sql("SELECT id FROM gbmor.d.t").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // discard orphans the upsert's data files AND both key batches
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.discardBranch("wb") >= 3)
    val t3 = LakeTable.load(wh, "d", "t")
    assert(t3.metadata.staged.isEmpty)
    assert(t3.removeOrphanFiles(olderThanMillis = 0).nonEmpty)
    assert(ids(t3.read(spark)) == Set(1L, 2L))
  }

  test("CALL system.fast_forward publishes a branch from SQL") {
    import spark.implicits._
    val (wh, t) = mk("ffsql")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    spark.conf.set("spark.sql.catalog.gffs", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gffs.warehouse", wh)
    t.createBranch("rel")
    LakeTable.load(wh, "d", "t")
      .appendToBranch(Seq((2L, "b")).toDF("id", "v"), "rel")
    val row = spark.sql(
      "CALL gffs.system.fast_forward('d', 't', 'rel')").collect().head
    assert(row.getString(0) == "rel" && row.getInt(1) == 1)
    assert(ids(LakeTable.load(wh, "d", "t").read(spark)) == Set(1L, 2L))
  }

  test("metadata-only maintenance is not divergence: fast-forward " +
      "publishes over a rewrite_manifests commit") {
    import spark.implicits._
    val (wh, t) = mk("ff-rwm")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("b")
    t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "b")
    // routine maintenance moves the head, but moves no data
    LakeTable.load(wh, "d", "t").rewriteManifests()
    val t2 = LakeTable.load(wh, "d", "t")
    val published = t2.fastForward("b")
    assert(published.size == 1)
    assert(ids(LakeTable.load(wh, "d", "t").read(spark)) == Set(1L, 2L))
    // a real data commit after the fork still refuses
    val (wh2, s) = mk("ff-rwm2")
    s.append(Seq((1L, "a")).toDF("id", "v"))
    s.createBranch("b")
    s.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "b")
    LakeTable.load(wh2, "d", "t").append(Seq((9L, "z")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](
      LakeTable.load(wh2, "d", "t").fastForward("b"))
    assert(e.getMessage.contains("diverged"))
    // an INSERT OVERWRITE is a data-CHANGING reset ("replace"), not a
    // byte-moving rewrite — it too must count as divergence
    val (wh3, r) = mk("ff-repl")
    r.append(Seq((1L, "a")).toDF("id", "v"))
    r.createBranch("b")
    r.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "b")
    LakeTable.load(wh3, "d", "t")
      .overwrite(Seq((9L, "z")).toDF("id", "v"))
    val e2 = intercept[IllegalArgumentException](
      LakeTable.load(wh3, "d", "t").fastForward("b"))
    assert(e2.getMessage.contains("diverged"))
    // rebase resolves it explicitly; publish then lands on the new base
    val r2 = LakeTable.load(wh3, "d", "t")
    r2.rebaseBranch("b")
    r2.fastForward("b")
    assert(ids(LakeTable.load(wh3, "d", "t").read(spark)) == Set(2L, 9L))
  }

  test("evolution cannot drop a column keyed by a STAGED branch batch") {
    import spark.implicits._
    val (wh, t) = mk("dropstaged")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("fix")
    t.deleteFromBranchMoR(spark, "fix", Seq("a").toDF("v"))
    // no batch lives on MAIN, but the branch view resolves v by id —
    // dropping it would strand the branch with no escape but discard
    val resp = Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[]}""".stripMargin)
    assert(resp.hasError &&
      resp.messageList.exists(_.contains("equality-delete")))
    val t2 = LakeTable.load(wh, "d", "t")
    assert(t2.currentSchema.fieldNames.toSeq == Seq("id", "v"))
    assert(ids(t2.readBranch(spark, "fix")).isEmpty)
    // discarding the branch releases the column
    t2.discardBranch("fix")
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"}],"partitions":[]}""".stripMargin)
    assert(LakeTable.load(wh, "d", "t").currentSchema.fieldNames.toSeq
      == Seq("id"))
  }

  test("guards: tags not writable; SQL VERSION AS OF serves the branch overlay") {
    import spark.implicits._
    val (wh, t) = mk("guard")
    val s1 = t.append(Seq((1L, "a")).toDF("id", "v")).id
    t.createRef("rel", s1) // tag
    val e1 = intercept[IllegalArgumentException](
      t.appendToBranch(Seq((2L, "b")).toDF("id", "v"), "rel"))
    assert(e1.getMessage.contains("not a writable branch"))
    t.createBranch("wb")
    t.appendToBranch(Seq((3L, "c")).toDF("id", "v"), "wb")
    // main moves on; the branch SQL view stays on base + branch commits
    LakeTable.load(wh, "d", "t").append(Seq((7L, "m")).toDF("id", "v"))
    spark.conf.set("spark.sql.catalog.gbr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    val branchIds = spark.sql(
      "SELECT id FROM gbr.d.t VERSION AS OF 'wb'")
      .collect().map(_.getLong(0)).toSet
    assert(branchIds == Set(1L, 3L))
    assert(spark.sql("SELECT id FROM gbr.d.t").collect()
      .map(_.getLong(0)).toSet == Set(1L, 7L))
    // writes through a branch-pinned relation are refused — drive the
    // guard directly via the catalog's versioned loadTable (plain SQL
    // can't even express an INSERT at a version, so the SQL layer never
    // reaches it)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, SupportsDelete}
    val cat = spark.sessionState.catalogManager.catalog("gbr")
      .asInstanceOf[TableCatalog]
    val pinned = cat.loadTable(Identifier.of(Array("d"), "t"), "wb")
    val e2 = intercept[IllegalArgumentException] {
      pinned.asInstanceOf[SupportsDelete]
        .deleteWhere(Array.empty[org.apache.spark.sql.sources.Filter])
    }
    assert(e2.getMessage.contains("VERSION AS OF"))
    // reserved wap-id prefix — staged AND the WAP publish/discard verbs
    val e3 = intercept[IllegalArgumentException](
      t.appendStaged(Seq((4L, "d")).toDF("id", "v"), "branch:x"))
    assert(e3.getMessage.contains("reserved"))
    val t2 = LakeTable.load(wh, "d", "t")
    val e4 = intercept[IllegalArgumentException](
      t2.publishStaged("branch:wb"))
    assert(e4.getMessage.contains("fastForward"))
    val e5 = intercept[IllegalArgumentException](
      t2.discardStaged("branch:wb"))
    assert(e5.getMessage.contains("discardBranch"))
    // the refs relation shows the branch base; tags carry null
    val refs = spark.sql(
      """SELECT name, kind, base_snapshot_id
        |FROM gbr.d.t.refs ORDER BY name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(refs.toSeq == Seq(("rel", "tag", -1L), ("wb", "branch", s1)))
  }

  test("branch CoW delete/update rewrite files in the branch view only, " +
      "publish as overwrite snapshots") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val (_, t) = mk("cow")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.createBranch("fix")
    t.appendToBranch(Seq((4L, "d")).toDF("id", "v"), "fix")
    // CoW delete in the branch: id=2 (a fork-base file's row) goes away
    assert(t.deleteFromBranchCoW(spark, "fix", col("id") === 2L).isDefined)
    // CoW update in the branch: id=4 (a BRANCH file's row) gets rewritten
    assert(t.updateBranchCoW(spark, "fix",
      Map("v" -> concat(col("v"), lit("!"))), col("id") === 4L).isDefined)
    def content(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(content(t.readBranch(spark, "fix")) ==
      Map(1L -> "a", 3L -> "c", 4L -> "d!"))
    // main is untouched until publish
    assert(content(t.read(spark)) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // a second CoW over an earlier CoW's replacement file still works
    assert(t.deleteFromBranchCoW(spark, "fix", col("id") === 1L).isDefined)
    val published = t.fastForward("fix")
    assert(published.count(_.operation == "overwrite") == 3)
    assert(content(t.read(spark)) == Map(3L -> "c", 4L -> "d!"))
  }

  test("branch CoW publish is rebase-checked; rebase refuses CoW commits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (_, t) = mk("cowrb")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createBranch("fix")
    assert(t.deleteFromBranchCoW(spark, "fix", col("id") === 1L).isDefined)
    // main compacts after the fork: a byte-move, so plain appends would
    // still fast-forward — but the CoW rewrote a file compaction just
    // replaced, so publishing would silently duplicate; named refusal
    t.compact(spark)
    val e = intercept[IllegalArgumentException] { t.fastForward("fix") }
    assert(e.getMessage.contains("copy-on-write") &&
      e.getMessage.contains("no longer live"))
    // rebase is refused too: a rewrite cannot be carried over a moved base
    val e2 = intercept[IllegalArgumentException] { t.rebaseBranch("fix") }
    assert(e2.getMessage.contains("copy-on-write"))
    // discard stays available and frees the branch's files
    assert(t.discardBranch("fix") > 0)
  }

  test("branch CoW refuses when equality batches are live in the view") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (_, t) = mk("coweq")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createBranch("fix")
    t.upsertToBranchMoR(spark, "fix", Seq((2L, "b2")).toDF("id", "v"),
      Seq("id"))
    val e = intercept[IllegalArgumentException] {
      t.deleteFromBranchCoW(spark, "fix", col("id") === 1L)
    }
    assert(e.getMessage.contains("equality-delete"))
  }

  test("CALL branch_delete/branch_upsert mutate the branch from SQL") {
    import spark.implicits._
    val (wh, t) = mk("mor-call")
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    t.createBranch("fix")
    spark.conf.set("spark.sql.catalog.gbcall", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.gbcall.warehouse", wh)
    Seq(Tuple1(2L)).toDF("id").createOrReplaceTempView("bcall_keys")
    Seq((3L, "C2"), (9L, "z")).toDF("id", "v")
      .createOrReplaceTempView("bcall_src")
    spark.sql(
      "CALL gbcall.system.branch_delete('d', 't', 'fix', 'bcall_keys')")
      .collect()
    spark.sql("CALL gbcall.system.branch_upsert(" +
      "'d', 't', 'fix', 'bcall_src', 'id')").collect()
    // branch view reflects both; main untouched until fast-forward
    assert(spark.sql("SELECT id, v FROM gbcall.d.t VERSION AS OF 'fix'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (3L, "C2"), (9L, "z")))
    assert(spark.sql("SELECT id FROM gbcall.d.t").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    spark.sql("CALL gbcall.system.fast_forward('d', 't', 'fix')").collect()
    assert(spark.sql("SELECT id, v FROM gbcall.d.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
      == Set((1L, "a"), (3L, "C2"), (9L, "z")))
    // guards surface through SQL: unknown branch, and a tag is not
    // a writable branch
    locally {
      val t2 = LakeTable.load(wh, "d", "t")
      t2.createRef("rel1", t2.metadata.snapshots.map(_.id).max, "tag")
    }
    intercept[Exception](spark.sql(
      "CALL gbcall.system.branch_delete('d', 't', 'nope', 'bcall_keys')")
      .collect())
    intercept[Exception](spark.sql(
      "CALL gbcall.system.branch_delete('d', 't', 'rel1', 'bcall_keys')")
      .collect())
  }
}
