package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Randomized model check for writable-branch semantics: seeded
  * interleavings of main writes (append / blind upsert / eq-delete /
  * metadata rewrites) and branch ops (append / MoR delete / MoR
  * upsert / rebase / fast-forward / discard) must keep BOTH views
  * equal to their models at every step.
  *
  * The branch model is the publish-faithful contract pinned by
  * `readBranch`'s re-sequencing: the view equals the branch's op list
  * folded, in commit order, over main's state AS OF the fork base —
  * regardless of how staged ids interleave with main's. Rebase moves
  * the base to main's current state; fast-forward requires a
  * non-diverged base (rewrite-only suffixes allowed — they move
  * bytes, not data) and folds the ops into main.
  */
class BranchRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private sealed trait BOp
  private case class BAppend(rows: Seq[(Long, String)]) extends BOp
  private case class BDelete(keys: Seq[Long]) extends BOp
  private case class BUpsert(rows: Seq[(Long, String)]) extends BOp

  private def applyOp(state: Map[Long, String], op: BOp): Map[Long, String] =
    op match {
      // plain append: duplicate ids would multiply rows; the generator
      // only appends fresh ids so a Map model stays faithful
      case BAppend(rows) => state ++ rows
      case BDelete(keys) => state -- keys
      case BUpsert(rows) => state ++ rows
    }

  private def runScenario(seed: Long, ops: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory(s"graft-brrnd-$seed").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"t","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"v","data_type":"string"}],"partitions":[]}""".stripMargin)
    var t = LakeTable.load(wh, "d", "t")
    var main = Map.empty[Long, String]
    // branch state: base snapshot of main's model + the op list
    var branch: Option[(Map[Long, String], Vector[BOp])] = None
    // main data commits since the fork (rewrites don't count)
    var divergence = 0
    var nextFresh = 1000L

    def freshRows(n: Int): Seq[(Long, String)] =
      (1 to n).map { _ => nextFresh += 1; (nextFresh, s"v$nextFresh") }

    def existingKeys(state: Map[Long, String], n: Int): Seq[Long] =
      if (state.isEmpty) Seq.empty
      else Seq.fill(n)(state.keySet.toSeq(rnd.nextInt(state.size))).distinct

    def branchView: Option[Map[Long, String]] =
      branch.map { case (base, bops) => bops.foldLeft(base)(applyOp) }

    def readMain(): Map[Long, String] = t.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def readBr(): Map[Long, String] = t.readBranch(spark, "b").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    (1 to ops).foreach { i =>
      rnd.nextInt(12) match {
        case 0 | 1 => // main append (fresh keys)
          val rows = freshRows(1 + rnd.nextInt(2))
          t.append(rows.toDF("id", "v"))
          main = main ++ rows
          if (branch.isDefined) divergence += 1
        case 2 => // main blind upsert
          val rows = (existingKeys(main, 1).map(k => (k, s"mu$i-$k")) ++
            freshRows(1)).distinct
          t.upsertMoR(spark, rows.toDF("id", "v"), Seq("id"))
          main = main ++ rows
          if (branch.isDefined) divergence += 1
        case 3 => // main eq-delete
          val keys = existingKeys(main, 1 + rnd.nextInt(2))
          if (keys.nonEmpty) {
            t.deleteByKeysMoR(spark, keys.toDF("id"))
            main = main -- keys
            if (branch.isDefined) divergence += 1
          }
        case 4 => // metadata-only rewrite: moves the head, not the data
          t.rewriteManifests()
          t = LakeTable.load(wh, "d", "t")
        case 5 if branch.isEmpty => // fork
          t.createBranch("b")
          branch = Some((main, Vector.empty))
          divergence = 0
        case 5 => ()
        case 6 | 7 if branch.isDefined => // branch append (fresh keys)
          val rows = freshRows(1 + rnd.nextInt(2))
          t.appendToBranch(rows.toDF("id", "v"), "b")
          branch = branch.map { case (b, o) => (b, o :+ BAppend(rows)) }
        case 8 if branch.isDefined => // branch MoR delete
          val keys = existingKeys(branchView.get, 1 + rnd.nextInt(2))
          if (keys.nonEmpty) {
            t.deleteFromBranchMoR(spark, "b", keys.toDF("id"))
            branch = branch.map { case (b, o) => (b, o :+ BDelete(keys)) }
          }
        case 9 if branch.isDefined => // branch MoR upsert
          val rows = (existingKeys(branchView.get, 1)
            .map(k => (k, s"bu$i-$k")) ++ freshRows(1)).distinct
          t.upsertToBranchMoR(spark, "b", rows.toDF("id", "v"), Seq("id"))
          branch = branch.map { case (b, o) => (b, o :+ BUpsert(rows)) }
        case 10 if branch.isDefined => // rebase onto the current head
          t.rebaseBranch("b")
          branch = branch.map { case (_, o) => (main, o) }
          divergence = 0
        case 11 if branch.isDefined => // fast-forward or discard
          if (divergence == 0) {
            t.fastForward("b")
            main = branchView.get
            // ref survives, re-based at the new head with no ops
            branch = Some((main, Vector.empty))
          } else {
            // diverged: publishing must refuse; then discard
            intercept[IllegalArgumentException](t.fastForward("b"))
            t.discardBranch("b")
            branch = None
          }
          t = LakeTable.load(wh, "d", "t")
        case _ => // reload (round-trip staged/ref metadata)
          t = LakeTable.load(wh, "d", "t")
      }
      if (i % 5 == 0) {
        assert(readMain() == main, s"main divergence at op $i (seed $seed)")
        branchView.foreach(bv => assert(readBr() == bv,
          s"branch-view divergence at op $i (seed $seed)"))
      }
    }
    assert(readMain() == main, s"final main divergence (seed $seed)")
    branchView.foreach(bv => assert(readBr() == bv,
      s"final branch divergence (seed $seed)"))
  }

  test("random main/branch interleavings match the publish-faithful model") {
    runScenario(seed = 81361L, ops = 40)
  }

  test("a second seed exercises a different interleaving") {
    runScenario(seed = 271828L, ops = 40)
  }
}
