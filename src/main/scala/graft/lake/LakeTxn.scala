package graft.lake

import java.nio.file.{Files, Path, Paths}
import java.nio.file.StandardOpenOption.CREATE_NEW

import graft.schema.{JArray, JNumber, JObject, JString, Json}

/** Cross-table atomic transactions — the catalog-level commit the
  * per-table optimistic protocol can't express. Stage operations on
  * any number of lake tables, publish with all-or-nothing visibility:
  * no reader ever observes one table's half of the transaction.
  *
  * Protocol (warehouse-local commit log under `<warehouse>/_txns/`):
  *
  *  1. Every staged table CLAIMS its next metadata version
  *     (`v{N+1}.json` via CREATE_NEW — the existing single-table CAS)
  *     with a `pending-txn: <id>` field embedded in the SAME atomic
  *     file create. A pending claim is invisible: readers and
  *     recovery resolve its fate through the transaction record, never
  *     through claim validity alone.
  *  2. ONE CREATE_NEW of `_txns/<id>.final` containing `commit` is the
  *     commit point for the WHOLE transaction. Recovery of a stalled
  *     transaction races the same file with `abort` — exactly one
  *     outcome ever exists.
  *  3. The per-table pointer flips follow in canonical order. They are
  *     mere publication: the moment the final record says commit,
  *     every reader treats each participant's claim as the table head
  *     ([[LakeTxn.committedClaim]] in `LakeTable.load`), so a crash
  *     between flips can't expose a mixed state; stragglers are rolled
  *     forward by the next reader or committer (`recoverTornClaim`).
  *
  * Failure matrix: die before the final record → recovery (after the
  * commit grace) writes `abort` and deletes the claims, nothing was
  * ever visible; die after → every participant is already visible and
  * the flips self-heal. A concurrent single-table commit on any
  * participant collides with its claim and aborts the transaction
  * (or the transaction's claim loses and the transaction aborts) —
  * standard optimistic semantics, retried by [[withRetry]].
  *
  * Scale: the commit log is O(transactions) tiny JSON files, the claim
  * round is O(participants) metadata writes, and data files were
  * already written by the staged operations — the coordinator itself
  * never touches data. Records are never read on the hot path once a
  * transaction's pointers have flipped.
  */
object LakeTxn {

  /** Hands out per-table handles inside [[transaction]]; every handle
    * is in buffered mode — operations stage in memory and publish
    * together at the closing commit. */
  final class TxnContext private[LakeTxn] (warehouse: String) {
    private[LakeTxn] val handles =
      scala.collection.mutable.LinkedHashMap
        .empty[(String, String), (LakeTable, TableMetadata)]
    def table(db: String, name: String): LakeTable =
      handles.getOrElseUpdate((db, name), {
        // loadRaw: a programmatic transaction must stage on its OWN
        // handles even if a SQL transaction is open on this thread
        val t = LakeTable.loadRaw(warehouse, db, name)
        (t, t.txnBegin())
      })._1
  }

  /** Run `body` against any number of tables; publish atomically.
    * Zero staged tables → no-op; one → the plain single-table commit
    * (no coordination cost); two or more → the full protocol above.
    * Conflicts surface as `ConcurrentModificationException` — reload
    * and retry the whole body ([[withRetry]]).
    */
  def transaction[A](warehouse: String)(body: TxnContext => A): A = {
    val ctx = new TxnContext(warehouse)
    val result =
      try body(ctx)
      catch {
        case e: Throwable =>
          ctx.handles.values.foreach { case (t, base) =>
            t.txnRollback(base) }
          throw e
      }
    val staged = ctx.handles.values.toSeq.flatMap { case (t, base) =>
      t.txnEnd(base).map(n => (t, n)) }
    staged match {
      case Seq() => ()
      case Seq((t, next)) => t.commitNext(next)
      case many =>
        // canonical claim order (by location) so two transactions over
        // the same tables collide deterministically instead of
        // claiming in opposite orders
        commitCross(warehouse, many.sortBy(_._1.location.toString))
    }
    result
  }

  /** Whole-body reload-retry around [[transaction]] — the cross-table
    * analog of `LakeTable.transactionWithRetry` (fresh handles each
    * attempt, jittered backoff, conflicts rethrown when exhausted). */
  def withRetry[A](warehouse: String, attempts: Int = 5)(
      body: TxnContext => A): A = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var n = 0
    while (true) {
      n += 1
      try return transaction(warehouse)(body)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (n >= attempts) throw e
          Thread.sleep(scala.util.Random.nextInt(40 * n).toLong + 5)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[lake] def commitCross(warehouse: String,
      parts: Seq[(LakeTable, TableMetadata)]): Unit = {
    val txnId = java.util.UUID.randomUUID().toString
    val dir = Paths.get(warehouse, "_txns")
    Files.createDirectories(dir)
    // the intent record is audit/ops surface (what the transaction
    // meant to touch); recovery needs only the claims' embedded ids
    // and the final record
    Files.writeString(dir.resolve(s"$txnId.json"), Json.write(JObject(
      Map("ts-ms" -> JNumber(System.currentTimeMillis()),
        "participants" -> JArray(parts.map { case (t, _) =>
          JObject(Map(
            "database" -> JString(t.metadata.database),
            "table" -> JString(t.metadata.table))) })))), CREATE_NEW)
    val claims = scala.collection.mutable.Buffer.empty[LakeTable.Claim]
    try
      parts.foreach { case (t, next) =>
        claims += t.writeClaim(next, Some(txnId))
        LakeTable.faultPoint("txn-mid-claims")
      }
    catch {
      case e: Throwable =>
        // abort FIRST (a zombie resurrection of this coordinator must
        // find the decision already made), then clean our claims
        decideAbort(dir, txnId)
        claims.foreach(c => c.table.abandonClaim(c, txnId))
        throw e
    }
    LakeTable.faultPoint("txn-post-claims-pre-final")
    // THE commit point: one atomic file create decides every table
    try Files.writeString(dir.resolve(s"$txnId.final"), "commit",
      CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        // recovery declared us dead during a >grace stall and aborted;
        // our claims are condemned (some may already be deleted — and
        // their version numbers may have been RE-CLAIMED by live
        // writers, which the ownership check inside abandonClaim
        // protects)
        claims.foreach(c => c.table.abandonClaim(c, txnId))
        throw new java.util.ConcurrentModificationException(
          s"cross-table transaction $txnId was aborted by recovery " +
            "during a stall; reload and retry")
    }
    LakeTable.faultPoint("txn-post-final-pre-flips")
    // publication: every claim is already committed-by-record; flips
    // make the pointers catch up (readers roll forward regardless)
    claims.foreach { c =>
      c.table.flipClaim(c)
      LakeTable.faultPoint("txn-mid-flips")
    }
  }

  /** The warehouse's cross-table transaction log, for observability
    * (`SELECT * FROM <cat>.<db>.<t>.transactions`): every intent
    * record joined with its final state — "commit", "abort", or
    * "pending" while undecided. O(transactions) tiny JSON reads;
    * single-table commits never coordinate, so they never appear.
    */
  private[graft] def records(warehouse: String)
      : Seq[(Long, String, String, Seq[(String, String)])] = {
    val dir = Paths.get(warehouse, "_txns")
    if (!Files.isDirectory(dir)) return Seq.empty
    scala.util.Using.resource(Files.list(dir)) { st =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator)
        .asScala.filter(_.getFileName.toString.endsWith(".json"))
        .flatMap { p =>
          try {
            val id = p.getFileName.toString.stripSuffix(".json")
            val o = Json.parse(Files.readString(p)).asObj
            val ts = o.get("ts-ms").map(_.asLong).getOrElse(-1L)
            val parts = o.get("participants").map(_.asArr.map { e =>
              val m = e.asObj
              (m("database").asStr, m("table").asStr)
            }).getOrElse(Seq.empty)
            val state = finalState(dir, id).getOrElse("pending")
            Some((ts, id, state, parts))
          } catch { case scala.util.control.NonFatal(_) => None }
        }.toList.sortBy(r => (r._1, r._2))
    }
  }

  // ---- commit-log primitives (shared with LakeTable recovery) --------

  /** `<warehouse>/_txns` for a table location `<warehouse>/<db>/<t>`. */
  private[lake] def txnsDir(tableLocation: Path): Path =
    tableLocation.getParent.getParent.resolve("_txns")

  /** The transaction's decided outcome: Some("commit"), Some("abort"),
    * or None while undecided. */
  private[lake] def finalState(txns: Path, txnId: String): Option[String] =
    try {
      val f = txns.resolve(s"$txnId.final")
      if (Files.exists(f)) Some(Files.readString(f).trim) else None
    } catch { case _: Exception => None }

  /** Race the final record with `abort` — first writer wins; losing to
    * the coordinator's own `commit` is the expected benign outcome. */
  private[lake] def decideAbort(txns: Path, txnId: String): Unit =
    try {
      Files.createDirectories(txns)
      Files.writeString(txns.resolve(s"$txnId.final"), "abort",
        CREATE_NEW)
    } catch { case _: Exception => () }

  /** Complete the mandatory flip of a committed cross-table claim at
    * `version` (called by a committer whose handle was loaded through
    * the roll-forward read path while the pointer still lags). True
    * when the claim is commit-final and the pointer now reads at least
    * `version`; false for plain claims, pending/aborted transactions,
    * or any read failure (the caller then surfaces its conflict).
    */
  private[lake] def healCommittedClaim(loc: Path, version: Int): Boolean =
    try {
      val metadataDir = loc.resolve("metadata")
      val target = metadataDir.resolve(s"v$version.json")
      if (!Files.exists(target)) return false
      val txnId = Json.parse(Files.readString(target)).asObj
        .get("pending-txn").map(_.asStr).getOrElse(return false)
      if (!finalState(txnsDir(loc), txnId).contains("commit"))
        return false
      val hint = metadataDir.resolve("version-hint.text")
      if (Files.readString(hint).trim.toInt < version) {
        val tmp = metadataDir.resolve(".version-hint.tmp-heal")
        Files.writeString(tmp, version.toString)
        Files.move(tmp, hint,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // our check-then-move may have regressed a concurrent flip
        healForward(loc, version)
      }
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Repair a possible pointer REGRESSION after a heal-move. The
    * grace-aged healers are check-then-move: a concurrent committer
    * can flip the hint PAST the healer's target between its check and
    * its ATOMIC_MOVE, and the move then drags the pointer BACKWARDS —
    * an acknowledged commit turns invisible until some later collision
    * runs recovery. After every heal-move, walk forward over whatever
    * claims exist: a plain PARSEABLE claim always rolls forward (a
    * claim body is complete before the CREATE_NEW lands — the same
    * rule graced torn-claim recovery applies, and an early flip of a
    * live claimer is exactly the pointer-already-past state
    * `flipClaim` tolerates); a pending-txn claim rolls forward only
    * through a commit-final record; anything else stops the walk. The
    * healer that caused a regression thereby repairs it itself, in
    * the same call. (A healer that crashes between its move and this
    * walk leaves the stale pointer until the next writer collides and
    * recovery rolls forward — bounded, and no worse than the
    * pre-existing torn-claim window.)
    */
  private[lake] def healForward(loc: Path, written: Int): Unit = {
    val metadataDir = loc.resolve("metadata")
    var v = written
    var continueWalk = true
    while (continueWalk) {
      continueWalk = false
      val next = metadataDir.resolve(s"v${v + 1}.json")
      if (Files.exists(next)) {
        val publishable =
          try {
            val parsed = Json.parse(Files.readString(next))
            parsed.asObj.get("pending-txn").map(_.asStr) match {
              case Some(id) =>
                finalState(txnsDir(loc), id).contains("commit")
              case None =>
                MetadataIO.fromJson(parsed, metadataDir); true
            }
          } catch { case scala.util.control.NonFatal(_) => false }
        if (publishable) {
          try {
            val hint = metadataDir.resolve("version-hint.text")
            if (Files.readString(hint).trim.toInt < v + 1) {
              val tmp = metadataDir.resolve(".version-hint.tmp-fwd")
              Files.writeString(tmp, (v + 1).toString)
              Files.move(tmp, hint,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          } catch { case scala.util.control.NonFatal(_) => () }
          v += 1
          continueWalk = true
        }
      }
    }
  }

  /** The committed-but-unflipped claim above version `v` of the table
    * at `loc`, if one exists: Some((metadata, v+1)) when `v{N+1}.json`
    * is present, carries `pending-txn`, and that transaction's final
    * record says commit. Called on EVERY load — the cost when no claim
    * exists is a single Files.exists. Also heals the lagging pointer
    * when the claim is old enough that the coordinator is presumed
    * dead (same grace the torn-claim recovery uses).
    */
  private[lake] def committedClaim(loc: Path,
      v: Int): Option[(TableMetadata, Int)] = {
    val metadataDir = loc.resolve("metadata")
    val target = metadataDir.resolve(s"v${v + 1}.json")
    if (!Files.exists(target)) return None
    try {
      val parsed = Json.parse(Files.readString(target))
      val txnId = parsed.asObj.get("pending-txn").map(_.asStr)
        .getOrElse(return None)
      if (!finalState(txnsDir(loc), txnId).contains("commit"))
        return None // pending or aborted: invisible
      val md = MetadataIO.fromJson(parsed, metadataDir)
      // dead-coordinator healing: flip the pointer ourselves once the
      // claim has outlived the grace window (a live coordinator flips
      // within microseconds of the final record)
      val graceMs = md.properties.get("commit.recovery.grace-ms")
        .flatMap(x => scala.util.Try(x.toLong).toOption).getOrElse(30000L)
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(target).toMillis
      if (age > graceMs) {
        val hint = metadataDir.resolve("version-hint.text")
        if (Files.readString(hint).trim.toInt < v + 1) {
          val tmp = metadataDir.resolve(".version-hint.tmp-rollfwd")
          Files.writeString(tmp, (v + 1).toString)
          Files.move(tmp, hint,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // our check-then-move may have regressed a concurrent flip
          healForward(loc, v + 1)
        }
      }
      Some((md, v + 1))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
