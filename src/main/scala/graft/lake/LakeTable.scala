package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema._

/** A lake table: parquet data files + versioned JSON metadata with
  * Iceberg-style semantics — field-ID schema evolution, hidden
  * partitioning with identity/hour/day/month/year transforms,
  * partition-spec evolution, snapshot log, metadata-level partition
  * pruning. Replaces the reference's PyIceberg+Glue machinery
  * (`iceberg_helper.py`) on the public Spark API alone.
  *
  * Layout: `<warehouse>/<db>/<table>/metadata/v{N}.json` + a
  * `version-hint.text` pointer committed by atomic rename
  * (single-writer model, matching the reference's lack of any retry
  * logic); data under `data/snap-{id}/`, Hive-style `_p_*=value`
  * partition dirs.
  *
  * Scale: metadata is O(schemas + specs + files); reads are grouped by
  * schema version (one reconciling projection per group — not per
  * file) and unioned, so the plan size is bounded by the number of
  * schema versions, not file count.
  */
class LakeTable private (val location: Path, private var md: TableMetadata,
    initialVersion: Int = -1) {

  def metadata: TableMetadata = md
  def currentSchema: StructType = md.currentSchema

  /** Schema current AT a snapshot (validates the id with context). */
  def schemaAsOf(snapshotId: Long): StructType = {
    val snap = md.snapshots.find(_.id == snapshotId).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot $snapshotId in $location (have " +
          s"${md.snapshots.map(_.id).mkString(", ")})"))
    md.schemaById(snap.schemaId)
  }

  private def metadataDir = location.resolve("metadata")
  private def dataDir = location.resolve("data")

  /** Metadata version this handle last observed — the optimistic-
    * concurrency baseline for commit(). MUST be the version whose
    * document `md` actually holds: `load` passes the hint value it
    * resolved the document from, because re-reading the hint here
    * would race a concurrent commit landing between the two reads —
    * the handle would then carry STALE metadata under a FRESH version
    * number, sail through the commit CAS, and silently drop the
    * interleaved snapshot (found by the multi-process torture test's
    * one-in-ten lost-commit flake).
    */
  private var loadedVersion: Int =
    if (initialVersion >= 0) initialVersion else currentHintVersion()

  private def currentHintVersion(): Int = {
    val hint = metadataDir.resolve("version-hint.text")
    if (Files.exists(hint)) Files.readString(hint).trim.toInt else 0
  }

  // ---- commit ----------------------------------------------------------

  /** Move a snapshot's file list out-of-line: already-manifested lists
    * keep their handle (the existing manifest file is re-referenced
    * byte-for-byte — the unchanged-history part of a commit costs zero
    * manifest IO); fresh lists get a new immutable manifest. Empty
    * lists (MoR delete/eq-delete snapshots) stay inline — no point in
    * a file holding `[]`.
    */
  private def externalize(s: SnapshotMeta,
      created: scala.collection.mutable.Buffer[Path]): SnapshotMeta =
    s.files match {
      case _: ManifestFiles => s
      case _: ManifestSet => s
      case fs if fs.isEmpty => s
      case fs =>
        // partition-cluster wide lists (more distinct partition tuples
        // than a summary can hold) into several manifests so every
        // part keeps a prunable summary — one fat manifest would lose
        // it and force full-inventory planning on every pruned read
        def writeOne(part: Seq[DataFileMeta]): ManifestFiles = {
          val p = metadataDir.resolve(s"manifest-${s.id}-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}.json")
          val mf = ManifestIO.write(p, part.toVector)
          created += p
          mf
        }
        ManifestIO.cluster(fs) match {
          case Seq(single) => s.copy(files = writeOne(single))
          case parts => s.copy(files =
            new ManifestSet(parts.map(writeOne).toVector))
        }
    }

  /** Stamp sequential row-lineage id ranges (Iceberg v3 `next-row-id`
    * assignment) onto the data files of snapshots NEWLY ADDED by this
    * commit: each freshly-written file takes the running counter and
    * advances it by its row count, so `_row_id = firstRowId +
    * row_position` is unique table-wide.
    *
    * Scope rules (each one an identity invariant):
    *   - v1/v2 tables don't stamp at all — row lineage is a v3
    *     feature, and ids handed out pre-upgrade would flip when the
    *     upgrade re-baselines `next-row-id`. Checked against `next`,
    *     not `md`, so the upgrade commit itself starts assigning.
    *   - Only snapshots whose id is new relative to the loaded
    *     metadata stamp; pre-existing snapshots (v1/v2 history, or a
    *     pre-lineage table's inline lists) must keep reading exactly
    *     what time-travel always showed.
    *   - Within a new snapshot, only freshly-written files (no
    *     explicit data sequence) stamp. Carried copies — expire
    *     squashes, rewrite_manifests, publish — keep their original
    *     `firstRowId`, INCLUDING its absence: stamping an unstamped
    *     carried copy would make the same physical row expose -1 via
    *     one snapshot and a real id via another.
    *   - Files with an unknown row count (-1 footer sentinel) stay
    *     unstamped: an open range would collide with the next
    *     assignment.
    * Manifest-backed (carried-by-reference) lists stay untouched —
    * their files were stamped when first committed.
    */
  private def assignRowIds(next: TableMetadata): TableMetadata = {
    val v3 = next.formatVersion >= 3 || next.properties
      .get("format-version").exists(_.trim.toIntOption.exists(_ >= 3))
    if (!v3) return next
    val known = (md.snapshots ++ md.staged).map(_.id).toSet
    var counter = next.nextRowId
    var changed = false
    def stampSnap(s: SnapshotMeta): SnapshotMeta =
      if (known(s.id)) s
      else s.files match {
        case _: ManifestFiles | _: ManifestSet => s
        case fs =>
          val stampedFiles = fs.map { f =>
            if (f.firstRowId >= 0 || f.rows < 0 || f.seq >= 0) f
            else {
              val base = counter
              counter += f.rows
              changed = true
              f.copy(firstRowId = base)
            }
          }
          if (stampedFiles == fs) s else s.copy(files = stampedFiles)
      }
    val snaps = next.snapshots.map(stampSnap)
    val staged = next.staged.map(stampSnap)
    if (!changed) next
    else next.copy(snapshots = snaps, staged = staged, nextRowId = counter)
  }

  /** Test-only commit auditing (`-Dgraft.commit.audit=true`): one line
    * per commit attempt appended (O_APPEND — atomic for small writes)
    * to `metadata/commit-audit.log`, so a cross-process torture test
    * can reconstruct the exact claim/flip interleaving post-mortem.
    * Never enabled in production paths.
    */
  private def audit(msg: => String): Unit =
    if (java.lang.Boolean.getBoolean("graft.commit.audit")) {
      try {
        val line = s"${ProcessHandle.current().pid()} " +
          s"${System.nanoTime()} $msg\n"
        Files.write(metadataDir.resolve("commit-audit.log"),
          line.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case _: Exception => () }
    }

  // ---- transaction -----------------------------------------------------

  private var txnActive = false

  /** Single-table multi-operation transaction (Iceberg's
    * `Table.newTransaction`): every operation this handle runs inside
    * `body` — appends, row-level ops, schema/property changes,
    * compaction — stages against the in-memory metadata, and ONE
    * atomic pointer flip at the end publishes all of it. Readers (and
    * fresh loads) see either none of the transaction's snapshots or
    * all of them; time travel and the changelog keep every
    * per-operation snapshot, exactly as if they had committed
    * individually.
    *
    * Concurrency: the optimistic contract is unchanged — a concurrent
    * commit landing during the body surfaces at the final CAS (or at
    * an op's own staleness check) and ABORTS the whole transaction;
    * the handle rolls back to its pre-transaction view. Data files
    * written by aborted operations are unreferenced orphans for
    * `removeOrphanFiles`, identical to any lost commit attempt.
    * Op-level conflict retry is disabled inside a transaction: a
    * retry would rebuild on another writer's state and smuggle it
    * into this transaction's single publish.
    */
  def transaction[A](body: LakeTable => A): A = {
    val baseMd = txnBegin()
    val result =
      try body(this)
      catch {
        case e: Throwable => txnRollback(baseMd); throw e
      }
    txnEnd(baseMd) match {
      case None => result // body staged nothing
      case Some(next) =>
        // constraints validated per staged op inside the body
        try commit(next, skipValidate = true)
        catch { case e: Throwable => md = baseMd; throw e }
        result
    }
  }

  /** Enter buffered mode (the [[transaction]] internals, exposed for
    * the multi-table coordinator): staleness fail-fast, then every
    * operation stages in-memory until the coordinator claims+flips.
    * Returns the base metadata to restore on rollback.
    */
  private[lake] def txnBegin(): TableMetadata = {
    require(!txnActive, "transaction already active on this handle")
    // fail fast rather than buy work guaranteed to lose the final CAS.
    // A pointer lagging ONE version behind a committed cross-table
    // claim this handle loaded through (the roll-forward read path) is
    // not a conflict — complete the mandatory flip and proceed.
    if (currentHintVersion() != loadedVersion &&
        !(currentHintVersion() == loadedVersion - 1 &&
          LakeTxn.healCommittedClaim(location, loadedVersion) &&
          currentHintVersion() == loadedVersion))
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val baseMd = md
    txnActive = true
    baseMd
  }

  /** Whether this handle's loaded version is still the table head —
    * the read-set validation SQL-transaction COMMIT runs on read-only
    * participants. Tolerates the committed-but-unflipped lag exactly
    * like [[txnBegin]]'s fail-fast does.
    */
  /** Is this handle's loaded version still the table head — AND is no
    * commit already in flight past it? A `v{loaded+1}.json` claim is a
    * conflict even while the pointer lags: a plain parseable claim
    * always rolls forward (torn-claim recovery), and a pending-txn
    * claim may be committed-by-record already — treating either as
    * "still current" would validate a read the next microsecond
    * falsifies. Conservative on aborted-txn claims (spurious conflict,
    * retried), never unsound.
    */
  private[lake] def stillCurrent: Boolean =
    (currentHintVersion() == loadedVersion ||
      (currentHintVersion() == loadedVersion - 1 &&
        LakeTxn.healCommittedClaim(location, loadedVersion) &&
        currentHintVersion() == loadedVersion)) &&
      !Files.exists(metadataDir.resolve(s"v${loadedVersion + 1}.json"))

  private[lake] def txnRollback(baseMd: TableMetadata): Unit = {
    md = baseMd
    txnActive = false
  }

  /** Leave buffered mode; Some(next) when the body staged changes
    * (with `md` reset to base — the commit diffs against it). */
  private[lake] def txnEnd(baseMd: TableMetadata): Option[TableMetadata] = {
    txnActive = false
    if (md eq baseMd) None
    else {
      val next = md
      md = baseMd
      Some(next)
    }
  }

  private def commit(next: TableMetadata,
      skipValidate: Boolean = false): String = {
    // `skipValidate`: the transaction publish paths (single- and
    // cross-table) — every staged op already validated at its own
    // buffered commit, and re-validating here would re-scan the
    // unproven files for nothing
    if (!skipValidate) validateConstraints(next)
    if (txnActive) {
      // buffered: row-id stamping runs NOW (its known-snapshot set is
      // the current buffered state, so each staged op stamps exactly
      // its own new files); the claim+flip waits for the transaction's
      // closing commit
      md = assignRowIds(next)
      return "<txn-buffered>"
    }
    val claim = writeClaim(next, None)
    // crash window under test (MaintenanceSpec torn-claim recovery): a
    // death HERE leaves v{N+1}.json claimed but the pointer at N —
    // recoverTornClaim on the next committer rolls it forward
    LakeTable.faultPoint("post-claim-pre-flip")
    flipClaim(claim)
    claim.target.toString
  }

  /** CHECK-constraint enforcement ([[Constraints]] scaladoc): every
    * commit validates the DATA FILES it adds against the table's
    * declared constraints — stats-proven files skip the read,
    * byte-moves (compaction/zorder) skip entirely (their rows already
    * passed when first written, and ADD CONSTRAINT validated existing
    * data). A buffered (transaction) op validates at its own staged
    * commit, fail-fast; the closing publish re-checks cheaply (the
    * stats proof is in-memory).
    */
  private def validateConstraints(next: TableMetadata): Unit = {
    val declared = Constraints.of(next.properties).map {
      case (n, sql) => s"CHECK constraint '$n'" -> sql
    }
    // REQUIRED (non-nullable) top-level columns enforce as implicit
    // IS NOT NULL checks through the same stats-first machinery —
    // footer null counts prove a clean file for free, so the Iceberg
    // required-field contract costs O(footers) per commit (a column
    // without null accounting falls back to the delta scan)
    val required = Reconcile.clean(next.currentSchema)
      .asInstanceOf[StructType].fields.toSeq
      .filterNot(_.nullable).map(f =>
        s"required column '${f.name}'" ->
          s"`${f.name.replace("`", "``")}` IS NOT NULL")
    val cons = declared ++ required
    if (cons.isEmpty) return
    val before = md.snapshots.map(_.id).toSet
    val beforeStaged = md.staged.map(_.id).toSet
    val added = (next.snapshots.filterNot(s => before(s.id)) ++
      next.staged.filterNot(s => beforeStaged(s.id)))
      .filterNot(s => LakeTable.isByteMove(s.operation))
      .flatMap(_.files)
    if (added.nonEmpty)
      validateFiles(added, next.currentSchema, cons.toMap)
  }

  /** One constraint pass over `files`: per constraint (the label is
    * the human phrase — "CHECK constraint 'x'" or "required column
    * 'y'"), drop every file whose footer stats prove it cannot hold a
    * violating row, then run the `limit(1)` violation scan over the
    * remainder. Refuses BY NAME on the first violation — the commit
    * never happens, so a bad batch can't land partially.
    */
  private[lake] def validateFiles(files: Seq[DataFileMeta],
      schema: StructType, cons: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    var scanned = 0
    cons.toSeq.sortBy(_._1).foreach { case (label, sql) =>
      // a zero-row file (an empty write partition) carries no stats
      // and no rows — trivially violation-free
      val nonEmpty = files.filter(_.rows != 0)
      val unproven = Constraints.violationFilters(sql, schema) match {
        case Some(vfs) => nonEmpty.filter(f => vfs.exists(vf =>
          FileStats.mightMatch(f.stats, schema, Seq(vf))))
        case None => nonEmpty
      }
      if (unproven.nonEmpty) {
        scanned += unproven.size
        // active is thread-local; a writer on a pool thread (driver
        // mains, foreachBatch) still has the default session
        val spark = org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .getOrElse(throw new IllegalStateException(
            s"validating $label needs a Spark session"))
        val viol = readFiles(spark, unproven, schema)
          .filter(not(coalesce(expr(sql), lit(true))))
          .limit(1).count()
        require(viol == 0L,
          s"$label ($sql) is violated by incoming rows — " +
            "commit refused")
      }
    }
    // always recorded — both counts are already in hand, so the
    // observable costs one volatile write (unlike the MatViews scan
    // audits, which pay an extra planning pass and stay conf-gated)
    Constraints.lastValidationScan =
      Some((scanned, files.size * cons.size))
  }

  /** The table's declared CHECK constraints (name → SQL). */
  def constraints: Map[String, String] = Constraints.of(md.properties)

  /** `ALTER TABLE … ADD CONSTRAINT name CHECK (sql)`: parses and
    * binds the expression, validates EXISTING rows (stats-first, with
    * merge-on-read deletes applied on the unproven remainder), and
    * publishes the property — all inside one transaction, so the
    * closing CAS refuses if a concurrent write lands mid-validate.
    */
  def addConstraint(spark: org.apache.spark.sql.SparkSession,
      name: String, sql: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"constraint name must be an identifier, got '$name'")
    require(!Constraints.of(md.properties).contains(name),
      s"constraint '$name' already exists")
    val refs =
      try Constraints.referencedCols(sql)
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"CHECK expression does not parse: $sql", e) }
    refs.foreach(r => require(md.currentSchema.fieldNames.contains(r),
      s"CHECK constraint '$name' references unknown column '$r'"))
    require(!md.staged.exists(_.files.nonEmpty),
      s"cannot add constraint '$name' with staged (branch/WAP) " +
        "snapshots pending — publish or discard them first")
    transaction { t =>
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      val schema = md.currentSchema
      val live = LakeTable.liveFiles(md.snapshots, Map.empty, schema)
      val unproven = Constraints.violationFilters(sql, schema) match {
        case Some(vfs) => live.filter(f => vfs.exists(vf =>
          FileStats.mightMatch(f.stats, schema, Seq(vf))))
        case None => live
      }
      if (unproven.nonEmpty) {
        // scan ONLY the unproven files, with merge-on-read deletes
        // applied — a violating row that is already deleted is fine,
        // and the stats-proven majority of a large table is never read
        val viol = readFiles(spark, unproven, schema,
            LakeTable.liveDeletes(md.snapshots),
            LakeTable.liveEqDeletes(md.snapshots))
          .filter(not(coalesce(expr(sql), lit(true))))
          .limit(1).count()
        require(viol == 0L,
          s"cannot add CHECK constraint '$name' ($sql): existing " +
            "rows violate it")
      }
      Constraints.lastValidationScan = Some((unproven.size, live.size))
      t.updateProperties(Map(Constraints.Prefix + name -> sql))
    }
  }

  def dropConstraint(name: String, ifExists: Boolean = false): Unit = {
    if (!Constraints.of(md.properties).contains(name)) {
      if (ifExists) return
      throw new IllegalArgumentException(
        s"no constraint named '$name' on this table")
    }
    updateProperties(Map.empty, unset = Seq(Constraints.Prefix + name))
  }

  /** Phase 1 of a commit: staleness CAS, row-id stamping, manifest
    * externalization, then the CREATE_NEW claim of `v{N+1}.json`. With
    * `txnId` set (the cross-table coordinator), the claim file carries
    * a `pending-txn` field — readers and recovery then resolve its
    * fate through the transaction's final record instead of treating
    * it as a plain torn claim. Claim and transaction id land in ONE
    * atomic file create, so a claim can never be misattributed.
    */
  private[lake] def writeClaim(next: TableMetadata,
      txnId: Option[String]): LakeTable.Claim = {
    Files.createDirectories(metadataDir)
    // optimistic concurrency: refuse to clobber a commit made through
    // another handle since this one loaded (the reference has no retry
    // logic either — surfacing the conflict is the contract)
    var observed = currentHintVersion()
    if (observed == loadedVersion - 1 &&
        LakeTxn.healCommittedClaim(location, loadedVersion))
      // this handle was loaded THROUGH a committed-but-unflipped
      // cross-table claim (the roll-forward read path); the flip is
      // mandatory-eventual, so complete it here and commit on top
      // instead of surfacing a phantom conflict
      observed = currentHintVersion()
    if (observed != loadedVersion) {
      audit(s"stale observed=$observed loaded=$loadedVersion")
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently " +
          s"(expected v$loadedVersion, found v$observed); reload and retry")
    }
    // row-lineage assignment sits HERE, the one choke point every
    // write path funnels through, so appends, MoR deltas, WAP stages,
    // branch commits, and compactions all get stamped without opting
    // in — and a CAS retry re-runs it against the reloaded counter
    val stamped = assignRowIds(next)
    // write new manifests BEFORE claiming the version: a commit appends
    // O(delta) manifest bytes and the table JSON stays O(snapshots)
    val createdManifests = scala.collection.mutable.Buffer.empty[Path]
    val ext = stamped.copy(
      snapshots = stamped.snapshots.map(externalize(_, createdManifests)),
      staged = stamped.staged.map(externalize(_, createdManifests)))
    val version = observed + 1
    val target = metadataDir.resolve(s"v$version.json")
    val body = txnId match {
      case Some(id) => Json.write(JObject(
        MetadataIO.toJson(ext).asObj + ("pending-txn" -> JString(id))))
      case None => Json.write(MetadataIO.toJson(ext))
    }
    // CREATE_NEW atomically claims this version number: two handles that
    // both observed vN race to create v{N+1}.json and the loser gets
    // FileAlreadyExistsException instead of silently clobbering the
    // winner's metadata and flipping the pointer over it
    try
      Files.writeString(target, body,
        java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        audit(s"claim-collision v$version " +
          s"adds=${next.snapshots.map(_.id).diff(md.snapshots.map(_.id))
            .mkString("/")}")
        // the lost race must not leak this attempt's manifests
        createdManifests.foreach(Files.deleteIfExists(_))
        // a claim whose writer DIED before flipping the pointer would
        // wedge the table forever (every retry re-claims the same
        // version and re-collides) — self-heal it before surfacing
        // the conflict
        recoverTornClaim(version, target)
        throw new java.util.ConcurrentModificationException(
          s"table $location was committed concurrently " +
            s"(v$version.json already exists); reload and retry")
    }
    LakeTable.Claim(this, version, target, ext, createdManifests.toSeq)
  }

  /** Phase 2: the atomic pointer flip — the per-table commit point
    * (for a cross-table transaction, visibility is decided earlier by
    * the transaction's final record; this flip then merely publishes
    * the already-committed claim). Tolerates a pointer already at or
    * past the claim (recovery or a roll-forward reader flipped first —
    * both write the same value).
    */
  private[lake] def flipClaim(claim: LakeTable.Claim): Unit = {
    if (currentHintVersion() < claim.version) {
      val tmp = metadataDir.resolve(s".version-hint.tmp")
      Files.writeString(tmp, claim.version.toString)
      Files.move(tmp, metadataDir.resolve("version-hint.text"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    audit(s"committed v${claim.version} " +
      s"adds=${claim.ext.snapshots.map(_.id).diff(md.snapshots.map(_.id))
        .mkString("/")} maxSnap=${claim.ext.snapshots.map(_.id)
        .foldLeft(0L)(math.max)}")
    md = claim.ext
    loadedVersion = claim.version
  }

  /** Abandon a claim this handle made (the cross-table abort path):
    * removes the claim file and the manifests it externalized. Only
    * ever called on claims whose transaction's final record says
    * `abort` — the claim can no longer win.
    *
    * OWNERSHIP CHECK before the delete: a ZOMBIE coordinator (stalled
    * past the recovery grace, aborted by recovery, its claim files
    * already deleted) can wake AFTER a fresh writer re-claimed the
    * same version number with its own CREATE_NEW — deleting by path
    * alone would destroy that writer's live (possibly already
    * flipped) metadata. Only a file still carrying THIS transaction's
    * pending-txn id is ours to remove.
    */
  private[lake] def abandonClaim(claim: LakeTable.Claim,
      txnId: String): Unit = {
    val ours =
      try Json.parse(Files.readString(claim.target)).asObj
        .get("pending-txn").map(_.asStr).contains(txnId)
      catch { case scala.util.control.NonFatal(_) => false }
    if (ours) {
      Files.deleteIfExists(claim.target)
      audit(s"txn-abandon v${claim.version}")
    } else audit(s"txn-abandon-skip v${claim.version} (re-claimed)")
    // the manifests were created by THIS attempt under fresh unique
    // names — never shared with a re-claimer — so they are always
    // ours to clean
    claim.manifests.foreach(Files.deleteIfExists(_))
  }

  /** Publish the metadata a [[txnEnd]] returned — the single-table
    * fast path of the cross-table coordinator (no coordination needed
    * when only one table staged changes). Constraint validation
    * already ran per staged op.
    */
  private[lake] def commitNext(next: TableMetadata): Unit =
    commit(next, skipValidate = true)

  /** Self-heal a torn metadata claim. A `v{N+1}.json` that exists while
    * the hint still reads N is either a concurrent committer inside its
    * claim→flip window (microseconds), or a writer that DIED there.
    * The dead case is a LIVENESS hole without recovery: every future
    * commit observes hint N, claims v{N+1}, collides, reloads (hint
    * unchanged) and fails identically, forever. Once the claim is old
    * enough to rule out a live writer (`commit.recovery.grace-ms`,
    * default 30 s — generous against GC pauses):
    *   - valid JSON → the commit is complete on disk except the flip
    *     (manifests and data files are always written BEFORE the
    *     claim), so roll it FORWARD by flipping the pointer; the
    *     colliding commit then retries from the recovered head like
    *     any lost race.
    *   - torn JSON → the writer died mid-write; delete the claim so
    *     the next attempt can take the version number.
    * Best-effort by design: any failure here leaves the conflict
    * exception to stand, and a raced recovery is idempotent (both
    * recoverers flip to the same version). The residual hazard — a
    * live writer pausing longer than the grace window between claim
    * and flip while TWO further commits complete inside this method's
    * read-check-flip window — needs a >30 s stall at exactly the wrong
    * instant; on a cloud object store the same protocol would use a
    * conditional put instead.
    */
  private def recoverTornClaim(version: Int, target: Path): Unit =
    try {
      if (currentHintVersion() >= version) return // completed normally
      val graceMs = md.properties.get("commit.recovery.grace-ms")
        .flatMap(v => scala.util.Try(v.toLong).toOption).getOrElse(30000L)
      val age = System.currentTimeMillis() -
        Files.getLastModifiedTime(target).toMillis
      // a claim carrying `pending-txn` belongs to a cross-table
      // transaction: its fate is decided by the transaction's FINAL
      // record, never by claim validity alone — rolling forward a
      // pending participant would publish half a transaction
      val txnId =
        try Json.parse(Files.readString(target)).asObj
          .get("pending-txn").map(_.asStr)
        catch { case _: Exception => None }
      txnId match {
        case Some(id) =>
          val txns = LakeTxn.txnsDir(location)
          LakeTxn.finalState(txns, id) match {
            case Some("commit") =>
              // the commit record is authoritative — the flip is
              // mandatory-eventual, no grace needed
              audit(s"txn-rollforward v$version txn=$id")
              val tmp = metadataDir.resolve(".version-hint.tmp-recover")
              Files.writeString(tmp, version.toString)
              Files.move(tmp, metadataDir.resolve("version-hint.text"),
                StandardCopyOption.ATOMIC_MOVE,
                StandardCopyOption.REPLACE_EXISTING)
              // the unconditional move may have regressed a
              // concurrent flip — walk forward over any later claims
              LakeTxn.healForward(location, version)
            case Some(_) => // aborted — the claim can never win
              audit(s"txn-abort-clean v$version txn=$id")
              deleteClaimIfStillTxn(target, id)
            case None =>
              if (age < graceMs) return // live coordinator mid-commit
              // kill the stalled transaction: CREATE_NEW of the final
              // record races the coordinator's own `commit` write —
              // exactly one outcome wins, then act on whichever did
              LakeTxn.decideAbort(txns, id)
              LakeTxn.finalState(txns, id) match {
                case Some("commit") => recoverTornClaim(version, target)
                case _ =>
                  audit(s"txn-abort-stale v$version txn=$id")
                  deleteClaimIfStillTxn(target, id)
              }
          }
          return
        case None => ()
      }
      if (age < graceMs) return // probably a live claimer mid-flip
      val valid =
        try {
          MetadataIO.fromJson(Json.parse(Files.readString(target)),
            metadataDir)
          true
        } catch { case _: Exception => false }
      if (valid) {
        audit(s"torn-rollforward v$version")
        val tmp = metadataDir.resolve(".version-hint.tmp-recover")
        Files.writeString(tmp, version.toString)
        Files.move(tmp, metadataDir.resolve("version-hint.text"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        // the check-then-move may have regressed a concurrent flip
        LakeTxn.healForward(location, version)
      } else {
        audit(s"torn-delete v$version")
        Files.deleteIfExists(target)
      }
    } catch { case _: Exception => () }

  /** Delete an aborted transaction's claim only if the file STILL
    * carries that transaction's id — between the earlier read and
    * this delete, the abandoned version number may have been
    * re-claimed by a live writer whose metadata must not be
    * destroyed (the same ownership rule as [[abandonClaim]]).
    */
  private def deleteClaimIfStillTxn(target: Path, id: String): Unit = {
    val still =
      try Json.parse(Files.readString(target)).asObj
        .get("pending-txn").map(_.asStr).contains(id)
      catch { case _: Exception => false }
    if (still) Files.deleteIfExists(target)
  }

  // ---- evolution -------------------------------------------------------

  /** Apply a new table definition: diff → validate → new schema version
    * (+ new spec version when the partition fields changed). Returns
    * the reference-style message list (`iceberg_helper.py:306-385`).
    *
    * `initialDefaults` (column name → literal string) annotates
    * top-level columns of the NEW schema version with Iceberg-v3
    * initial defaults, in the SAME commit as the evolution — the SQL
    * catalog's `ADD COLUMN ... DEFAULT v` path. Atomic by
    * construction: a failed ALTER can never leave columns added with
    * their defaults lost.
    */
  def evolve(tableDef: TableDef,
      initialDefaults: Map[String, String] = Map.empty)
      : (Seq[String], Boolean) = {
    val messages = Seq.newBuilder[String]
    val targetNoIds = TypeMapper.toStructType(tableDef.columns)
    val changes = SchemaDiff.diff(md.currentSchema, targetNoIds)

    val disallowed = changes.collect { case d: DisallowedChange => d }
    if (disallowed.nonEmpty) {
      disallowed.foreach(d =>
        messages += s"Disallowed change for column ${d.path}: ${d.reason}")
      messages += s"Latest Meta file: ${latestMetaFile()}"
      return (messages.result(), true)
    }

    // a CHECK constraint binds to column NAMES — dropping or renaming
    // a referenced column would make every future commit's validation
    // throw; fail the evolution by name instead (drop the constraint
    // first if the column really must go)
    Constraints.of(md.properties).foreach { case (n, sql) =>
      val refs =
        try Constraints.referencedCols(sql)
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      refs.foreach(r => require(targetNoIds.fieldNames.contains(r),
        s"cannot drop/rename column '$r': referenced by CHECK " +
          s"constraint '$n' — drop the constraint first"))
    }

    // a live equality-delete batch resolves its key columns by field
    // id at read time — dropping one would make every read (and
    // compact, the escape hatch) throw; fail the evolution instead.
    // STAGED batches (branch MoR commits) count too: their branch
    // views resolve the same way, and fast-forward's schema check
    // would strand the branch with no escape but discard.
    val eqKeyIds = (LakeTable.liveEqDeletes(md.snapshots) ++
      md.staged.flatMap(_.eqDeletes)).flatMap(_.fieldIds).toSet
    if ((eqKeyIds.nonEmpty || md.identifierFieldIds.nonEmpty) &&
        changes.exists(_.isInstanceOf[DropColumn])) {
      val dropped = changes.collect { case DropColumn(p) => p }
      // a drop takes its nested descendants with it — dropping a
      // struct that CONTAINS a key field orphans the batch just as
      // surely as dropping the key itself
      val flat = FieldIds.flatten(md.currentSchema)
      val droppedIds = dropped.flatMap { p =>
        flat.collect { case (path, f)
            if (path == p || path.startsWith(p + ".")) &&
              FieldIds.hasId(f) => FieldIds.idOf(f) }
      }
      require(droppedIds.forall(!eqKeyIds.contains(_)),
        s"cannot drop columns ${dropped.mkString(", ")}: referenced by a " +
          "live equality-delete batch — run compact() to materialize first")
      // the declared row identity must outlive any single writer:
      // dropping an identifier field would leave every key-less CDC
      // writer with no keys mid-stream. Redeclare identifier-fields in
      // the SAME evolution to move the identity — and the redeclared
      // list must actually EXCLUDE the dropped columns (carrying the
      // old property forward doesn't count; that would only fail later
      // with a misleading "no such column")
      val redeclaredAway = tableDef.properties.get("identifier-fields")
        .exists(p => p.split(",").map(_.trim).filter(_.nonEmpty)
          .forall(n => !dropped.contains(n)))
      require(droppedIds.forall(!md.identifierFieldIds.contains(_)) ||
          redeclaredAway,
        s"cannot drop columns ${dropped.mkString(", ")}: part of the " +
          "table's identifier fields — redeclare 'identifier-fields' " +
          "(excluding them) in the same evolution to change the row " +
          "identity")
    }

    changes.foreach {
      case AddColumn(p, _) => messages += s"Added column $p"
      case DropColumn(p) => messages += s"Dropped column $p"
      case UpdateColumnType(p, from, to) =>
        messages += s"Updated column $p: ${from.simpleString} -> ${to.simpleString}"
      case _: DisallowedChange => ()
    }

    var next = md
    if (changes.nonEmpty) {
      val (withIds, nextId) =
        FieldIds.carryOver(md.currentSchema, targetNoIds, md.lastFieldId + 1)
      // initial defaults ride the SAME schema version commit
      // (validated at annotation time — see Defaults.withDefault)
      initialDefaults.keys.foreach(n =>
        require(withIds.fields.exists(_.name == n),
          s"initial default for unknown column '$n'"))
      val annotated = StructType(withIds.fields.map(f =>
        initialDefaults.get(f.name)
          .map(graft.schema.Defaults.withDefault(f, _)).getOrElse(f)))
      val newSchemaId = md.schemas.map(_.id).max + 1
      next = next.copy(
        schemas = next.schemas :+ SchemaVersion(newSchemaId, annotated),
        currentSchemaId = newSchemaId,
        lastFieldId = nextId - 1)
    }

    // partition-spec evolution (iceberg_helper.py:364-378): rebuild the
    // spec against the (possibly new) schema; if fields differ, commit a
    // new spec version — old files keep their old spec id.
    val newSpecFields = LakeTable.buildSpecFields(tableDef.partitions,
      next.currentSchema)
    if (newSpecFields.map(f => (f.sourceFieldId, f.transform, f.name)) !=
        md.currentSpec.fields.map(f => (f.sourceFieldId, f.transform, f.name))) {
      val newSpecId = md.specs.map(_.id).max + 1
      next = next.copy(
        specs = next.specs :+ PartitionSpecMeta(newSpecId, newSpecFields),
        currentSpecId = newSpecId)
      messages += s"Updated partition spec to [${newSpecFields.map(f =>
        s"${f.transform}(src=${f.sourceFieldId}) as ${f.name}").mkString(", ")}]"
    }

    if (tableDef.properties.nonEmpty &&
        tableDef.properties.exists { case (k, v) => md.properties.get(k) != Some(v) }) {
      next = next.copy(properties = md.properties ++ tableDef.properties)
      messages += "Updated table properties"
    }

    // a redeclared identity resolves against the NEW schema (so an
    // evolution can move identity onto a just-added column atomically);
    // changing it with live equality batches outstanding is refused —
    // the old-keyed batches and new-keyed writers would disagree on
    // which rows supersede which
    tableDef.properties.get("identifier-fields").foreach { p =>
      val ids = LakeTable.resolveIdentifierFields(Some(p), next.currentSchema)
      if (ids != md.identifierFieldIds) {
        require(eqKeyIds.isEmpty,
          "cannot change identifier-fields with live equality-delete " +
            "batches — run compact() to materialize them first")
        next = next.copy(identifierFieldIds = ids)
        messages += s"Updated identifier fields to [$p]"
      }
    }

    if (next != md) {
      val metaFile = commit(next)
      messages += s"Latest Meta file: $metaFile"
    } else {
      messages += "No schema changes detected"
      messages += s"Latest Meta file: ${latestMetaFile()}"
    }
    (messages.result(), false)
  }

  /** RENAME COLUMN: a new schema version maps the SAME field ID to the
    * new name — data files are untouched and stay readable because
    * every read reconciles file columns to the target schema by field
    * ID (Reconcile.scala). This is the one evolution verb the
    * reference cannot express: its diff is name-based
    * (`iceberg_helper.py:265-295` would see a drop + an add and lose
    * the column's history), so the engine exposes it directly rather
    * than through a table-def diff. Returns the committed meta file.
    */
  def renameColumn(oldName: String, newName: String): String = {
    val cur = md.currentSchema
    require(cur.fieldNames.contains(oldName),
      s"RENAME: no such column '$oldName' (have ${cur.fieldNames.mkString(", ")})")
    require(!cur.fieldNames.contains(newName),
      s"RENAME: column '$newName' already exists")
    val renamed = StructType(cur.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    val newSchemaId = md.schemas.map(_.id).max + 1
    commit(md.copy(
      schemas = md.schemas :+ SchemaVersion(newSchemaId, renamed),
      currentSchemaId = newSchemaId))
  }

  // ---- refs & rollback --------------------------------------------------

  /** Create (or move) a named snapshot pointer — Iceberg's refs. A
    * `tag` marks an immutable release point ("training-set-2026-08");
    * a `branch` is a movable head the caller advances explicitly.
    * Metadata-only: one map entry, no data touched.
    */
  def createRef(name: String, snapshotId: Long,
      kind: String = "tag"): String = {
    require(Seq("tag", "branch").contains(kind),
      s"ref kind must be tag|branch, got '$kind'")
    require(md.snapshots.exists(_.id == snapshotId),
      s"ref '$name': no snapshot $snapshotId " +
        s"(have ${md.snapshots.map(_.id).mkString(", ")})")
    require(name.nonEmpty && scala.util.Try(name.toLong).isFailure,
      s"ref name '$name' would be ambiguous with a snapshot id")
    commit(md.copy(refs = md.refs + (name -> RefMeta(snapshotId, kind))))
  }

  def dropRef(name: String): String = {
    val ref = md.refs.getOrElse(name,
      throw new IllegalArgumentException(s"no such ref '$name'"))
    // dropping a writable branch takes its unpublished staged commits
    // with it (files become orphans) — leaving them would strand the
    // snapshots and ghost-resurrect them under a re-created branch
    val purge: SnapshotMeta => Boolean =
      if (ref.kind == "branch" && ref.baseSnapshotId.isDefined)
        s => s.wapId.contains(branchMarker(name))
      else _ => false
    commit(md.copy(refs = md.refs - name,
      staged = md.staged.filterNot(purge)))
    name
  }

  /** Resolve a ref name to its pinned snapshot id. */
  def refSnapshot(name: String): Option[Long] =
    md.refs.get(name).map(_.snapshotId)

  /** Roll the table back so `snapshotId` is the latest snapshot
    * (Iceberg's rollback_to_snapshot): later snapshots leave the
    * metadata — their data files stay on disk as orphans until
    * removeOrphanFiles ages them out, so a rollback is instant and
    * the rolled-back state is still recoverable from older metadata
    * versions. Refs pointing past the rollback point are dropped
    * (they would dangle). Returns the number of snapshots removed.
    */
  def rollbackTo(snapshotId: Long): Int = {
    require(md.snapshots.exists(_.id == snapshotId),
      s"rollback: no snapshot $snapshotId " +
        s"(have ${md.snapshots.map(_.id).mkString(", ")})")
    val (keep, dropped) = md.snapshots.partition(_.id <= snapshotId)
    if (dropped.isEmpty) return 0
    // a ref survives if its anchor is still in the kept history: tags
    // anchor at snapshotId; writable branches anchor at their fork
    // BASE (their head may legitimately be a staged snapshot). Dropped
    // writable branches take their unpublished staged commits with
    // them — a stranded branch-tagged snapshot would leak forever and
    // ghost-resurrect under a re-created branch of the same name.
    val (keptRefs, droppedRefs) = md.refs.partition { case (_, r) =>
      val anchor = r.baseSnapshotId.getOrElse(r.snapshotId)
      keep.exists(_.id == anchor)
    }
    val deadMarkers = droppedRefs.collect {
      case (n, r) if r.kind == "branch" && r.baseSnapshotId.isDefined =>
        branchMarker(n)
    }.toSet
    commit(md.copy(snapshots = keep, refs = keptRefs,
      staged = md.staged.filterNot(s =>
        s.wapId.exists(deadMarkers.contains))))
    dropped.size
  }

  private def latestMetaFile(): String = {
    val hint = metadataDir.resolve("version-hint.text")
    if (Files.exists(hint))
      metadataDir.resolve(s"v${Files.readString(hint).trim}.json").toString
    else "<none>"
  }

  // ---- append ----------------------------------------------------------

  /** Align `df` to the current schema, derive hidden partition columns,
    * write one snapshot of parquet files, record per-file partition
    * values in metadata (A24).
    *
    * With table property `write.merge-schema=true` (Delta's
    * mergeSchema), the append AUTO-EVOLVES first: new top-level
    * columns in the frame are added to the schema (optional, the
    * frame's type), and an existing column that arrived WIDER evolves
    * up when the promotion is legal (int→long, float→double, decimal
    * precision at equal scale) — both through the same
    * SchemaDiff-validated evolution ALTER TABLE runs, committed in
    * the SAME transaction flip as the data. Auto-evolution never
    * weakens validation (illegal promotions are simply not applied —
    * the frame aligns by cast as always); without the property, extra
    * columns keep being dropped by the alignment, exactly as before.
    */
  def append(df: DataFrame, streamBatchId: Option[Long] = None,
      streamId: Option[String] = None): SnapshotMeta = {
    def write() = writeSnapshot(Align(df, md.currentSchema),
      operation = "append", streamBatchId = streamBatchId,
      streamId = streamId)
    if (!autoEvolveNeeded(df)) write()
    else if (txnActive) { autoEvolveFor(df); write() }
    else transaction { _ => autoEvolveFor(df); write() }
  }

  /** Recursive schema merge for auto-evolution: the table's type wins
    * except where the frame legally extends it — new struct fields
    * (any nesting depth, including array-of-struct elements) join as
    * OPTIONAL, and a primitive that arrived legally wider promotes
    * ([[graft.schema.SchemaDiff.promotionAllowed]]); anything else
    * keeps the table's declared type (the frame then aligns by cast,
    * as always). The table side keeps its field-id annotations so the
    * evolution diff matches existing fields untouched.
    */
  private def mergeTypes(table: DataType, in: DataType,
      ci: Boolean): DataType =
    (Reconcile.clean(table), in) match {
      case (_: StructType, i: StructType) =>
        def norm(n: String) =
          if (ci) n.toLowerCase(java.util.Locale.ROOT) else n
        val t = table.asInstanceOf[StructType]
        val known = t.fields.map(f => norm(f.name)).toSet
        StructType(t.fields.map { tf =>
          i.fields.find(f => norm(f.name) == norm(tf.name)) match {
            case Some(inf) =>
              tf.copy(dataType = mergeTypes(tf.dataType, inf.dataType, ci))
            case None => tf
          }
        } ++ i.fields.filterNot(f => known(norm(f.name))).map(f =>
          StructField(f.name, f.dataType, nullable = true)))
      case (_: ArrayType, ArrayType(ie, _)) =>
        val a = table.asInstanceOf[ArrayType]
        a.copy(elementType = mergeTypes(a.elementType, ie, ci))
      case (t, i) if t != i &&
          graft.schema.SchemaDiff.promotionAllowed(t, i).isRight => i
      case _ => table
    }

  /** Adds/changes are resolved with spark.sql.caseSensitive-aware
    * matching (Delta's mergeSchema contract): under the default
    * case-insensitive resolution a frame column differing only in
    * case ("Price" vs "price") maps onto the EXISTING column — adding
    * it as a new one would produce case-duplicate names that every
    * subsequent resolution makes ambiguous. Change keys carry the
    * TABLE's spelling, which is what `autoEvolveFor` rebuilds from.
    */
  private def autoEvolveDelta(df: DataFrame)
      : (Seq[StructField], Map[String, DataType]) = {
    val ci = !df.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def norm(n: String) =
      if (ci) n.toLowerCase(java.util.Locale.ROOT) else n
    val byName = md.currentSchema.fields.map(f => norm(f.name) -> f).toMap
    val adds = df.schema.fields.toSeq
      .filterNot(f => byName.contains(norm(f.name)))
    val changes = df.schema.fields.toSeq.flatMap { f =>
      byName.get(norm(f.name)).flatMap { tf =>
        val merged = mergeTypes(tf.dataType, f.dataType, ci)
        if (Reconcile.clean(merged) == Reconcile.clean(tf.dataType))
          None
        else Some(tf.name -> merged)
      }
    }.toMap
    (adds, changes)
  }

  private def autoEvolveNeeded(df: DataFrame): Boolean =
    md.properties.get("write.merge-schema").contains("true") && {
      val (adds, changes) = autoEvolveDelta(df)
      adds.nonEmpty || changes.nonEmpty
    }

  /** Run the auto-evolution itself — same TableDef path as ALTER
    * TABLE, so field-id assignment, eq-delete/constraint guards, and
    * partition-spec preservation all apply unchanged.
    */
  private def autoEvolveFor(df: DataFrame): Unit = {
    val (adds, changes) = autoEvolveDelta(df)
    val cols = md.currentSchema.fields.toSeq.map { f =>
      graft.schema.TypeMapper.toColumnDef(f.name,
        changes.getOrElse(f.name, f.dataType), f.nullable)
    } ++ adds.map(f =>
      graft.schema.TypeMapper.toColumnDef(f.name, f.dataType,
        nullable = true))
    val spec = md.currentSpec.fields.map { f =>
      val src = graft.schema.FieldIds.flatten(md.currentSchema)
        .collectFirst { case (p, fd)
          if graft.schema.FieldIds.hasId(fd) &&
            graft.schema.FieldIds.idOf(fd) == f.sourceFieldId => p }.get
      graft.schema.PartitionDef(src, f.transform, f.name)
    }
    val db = location.getParent.getFileName.toString
    val tbl = location.getFileName.toString
    val (msgs, hadError) = evolve(graft.schema.TableDef(
      db, tbl, cols, spec, md.properties))
    require(!hadError,
      s"write.merge-schema auto-evolution rejected: " +
        msgs.mkString("; "))
  }

  /** Highest micro-batch id this stream (identified by checkpoint) ever
    * committed into this table — the idempotence baseline for
    * StreamIngest replays. Scoped per stream: batch ids restart at 0
    * under a fresh checkpoint.
    */
  def lastStreamBatchId(streamId: String): Option[Long] =
    // staged snapshots count too: a stream writing to a BRANCH must
    // not replay an epoch it already staged
    (md.snapshots ++ md.staged).filter(_.streamId.contains(streamId))
      .flatMap(_.streamBatchId).reduceOption(_ max _)

  /** SQL `INSERT OVERWRITE` (full table): replace the visible content
    * with `df` as ONE replay-resetting "replace" snapshot — the same
    * reset mechanics as a compaction rewrite, but distinguishable from
    * one because it CHANGES data: branch fast-forward must treat it as
    * divergence (a compaction rewrite is not), while everything else
    * (replay reset, retired position/equality deletes, fresh forward
    * planning, time travel to older ids, CDC/streaming skipping) works
    * the same. No path enumeration — an overwrite-with-removedPaths
    * would inline every live path into the metadata JSON of every
    * later version. Not retried on conflict: a full-content write's
    * meaning depends on what it replaces.
    */
  def overwrite(df: DataFrame): SnapshotMeta =
    writeSnapshot(Align(df, md.currentSchema), operation = "replace")

  /** Compact the table: rewrite the current live file set (already
    * reconciled to the current schema) into one snapshot under the
    * current partition spec. The rewrite snapshot *replaces* all prior
    * files on read — the small-files/dead-schema-version cure at scale:
    * after compaction every live file carries the current schema and
    * spec, so reads become a single scan group again.
    */
  /** Rename a lineage read's projection to the materialized column
    * names a rewrite stores (`_graft_row_id` / `_graft_last_updated`);
    * `touched` rows — the ones this op modifies — null their
    * last-updated so v3 inheritance stamps them with the NEW file's
    * data sequence while untouched rows carry their old one.
    */
  private def matLineage(df: DataFrame,
      touched: Option[Column] = None): DataFrame = {
    val lastUpd = touched match {
      case Some(cond) => when(cond, lit(null).cast(LongType))
        .otherwise(col("_last_updated_sequence_number"))
      case None => col("_last_updated_sequence_number")
    }
    df.withColumn("_graft_row_id", col("_row_id"))
      .withColumn("_graft_last_updated", lastUpd)
      .drop("_row_id", "_last_updated_sequence_number")
  }

  def compact(spark: SparkSession): SnapshotMeta =
    // v3 tables preserve row lineage through the rewrite: ids and
    // last-updated sequences materialize as columns in the compacted
    // files (Iceberg v3's rule — a rewrite must not re-identify rows)
    if (!writesVectors) writeSnapshot(read(spark), operation = "rewrite")
    else writeSnapshot(matLineage(readLineage(spark)),
      operation = "rewrite", lineage = true)

  /** Partition-scoped / small-file compaction (Iceberg's
    * `rewrite_data_files(where => ..., options => min-file-size)`): rewrite
    * ONLY the live files that (a) fall inside `partitionFilter`
    * (partition-field name → allowed transformed values; empty = all) and
    * (b) need it — smaller than `smallerThanBytes`, carrying merge-on-read
    * position deletes, covered by a live equality-delete batch, or written
    * under a non-current schema. Everything else is carried BY REFERENCE:
    * the commit is an "overwrite" snapshot whose `removedPaths` are exactly
    * the rewritten inputs, so untouched files keep their paths AND their
    * data sequence numbers through the `liveFiles` replay — at 100 TB this
    * is the difference between compacting one hot day-partition and
    * rewriting the whole table (which full `compact` does).
    *
    * Sequence correctness: the rewritten rows are read WITH all applicable
    * deletes applied, and the output files take the new snapshot's seq —
    * higher than every live equality batch, so no batch re-applies to
    * them; untouched files keep lower seqs, so still-applicable batches
    * keep applying to them. Returns None (no commit) when nothing in
    * scope needs rewriting — a no-op compaction must not create an empty
    * overwrite snapshot that CDC/incremental readers would then see.
    */
  def compactScoped(spark: SparkSession,
      partitionFilter: Map[String, Set[String]] = Map.empty,
      smallerThanBytes: Long = Long.MaxValue): Option[SnapshotMeta] = {
    val live = LakeTable.liveFiles(md.snapshots)
    val deletes = LakeTable.liveDeletes(md.snapshots)
    val eqBatches = LakeTable.liveEqDeletes(md.snapshots)
    def inScope(f: DataFileMeta): Boolean =
      partitionFilter.forall { case (k, vs) =>
        f.partitionValues.get(k).exists(vs.contains) }
    def needsRewrite(f: DataFileMeta): Boolean =
      smallerThanBytes == Long.MaxValue ||
        (f.bytes >= 0 && f.bytes < smallerThanBytes) ||
        deletes.contains(LakeTable.normalizePath(f.path)) ||
        eqBatches.exists(_.seq > f.seq) ||
        f.schemaId != md.currentSchemaId
    val selected = live.filter(f => inScope(f) && needsRewrite(f))
    // one surviving clean file alone gains nothing from a rewrite
    val worthIt = selected.size > 1 || selected.exists(f =>
      deletes.contains(LakeTable.normalizePath(f.path)) ||
        eqBatches.exists(_.seq > f.seq) || f.schemaId != md.currentSchemaId)
    if (selected.isEmpty || !worthIt) None
    else Some(writeSnapshot({
      val frame = readFiles(spark, selected, md.currentSchema, deletes,
        eqBatches, lineage = writesVectors)
      Align.keeping(if (writesVectors) matLineage(frame) else frame,
        md.currentSchema, LakeTable.matLineageCols)
    },
      // "rewrite-data", NOT "overwrite": the replay removes the
      // rewritten paths like a CoW overwrite, but CDC/changelog/
      // streaming readers and branch fast-forward treat it as the byte
      // move it is — a routine scoped compaction must never wedge a
      // changelog consumer or strand a branch publish
      operation = "rewrite-data", removedPaths = selected.map(_.path),
      retryConflicts = false, lineage = writesVectors))
  }

  /** `retryConflicts = false` opts an append OUT of conflict retry for
    * callers whose frame was derived from a read of the table (merge's
    * anti-joined insert set): their content is stale after a
    * concurrent commit, so the conflict must surface.
    */
  private def writeSnapshot(aligned: DataFrame, operation: String,
      streamBatchId: Option[Long] = None,
      streamId: Option[String] = None,
      removedPaths: Seq[String] = Seq.empty,
      retryConflicts: Boolean = true,
      lineage: Boolean = false): SnapshotMeta = {
    // Spark's default parquet timestamp encoding is INT96 (legacy);
    // pin INT64 micros so footer min/max stats exist for timestamp
    // columns and the graft-lake record reader's INT64 fast path holds
    aligned.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // the files' true write schema: captured BEFORE any reload, since
    // `aligned` was coerced to it by the caller (a retry that crosses
    // a concurrent evolution keeps this id; reads reconcile per group)
    val schemaIdAtWrite = md.currentSchemaId
    // fail fast before writing any data if another handle committed
    // since we loaded — except for retriable plain appends, which
    // catch up NOW (cheaper than burning a commit attempt on a
    // guaranteed conflict) and retry any later conflict in
    // commitSnapshot
    val retriable = retryConflicts && operation == "append" &&
      removedPaths.isEmpty && streamBatchId.isEmpty
    if (currentHintVersion() != loadedVersion) {
      if (retriable) reload()
      else throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    }
    val snapshotId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    // unique dir per write attempt: a racing writer that loses the
    // commit leaves orphan files behind instead of clobbering the
    // winner's snapshot (Iceberg's orphan-file model). The id in the
    // name is a hint — a retried commit may land under a later id.
    val outDir = dataDir.resolve(
      s"snap-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}")
    val profT0 = System.nanoTime()
    val files0 = writeDataFiles(aligned, outDir)
    if (sys.props.contains("graft.prof.write")) {
      val t1 = System.nanoTime()
      val r = commitSnapshot(
        (if (lineage) files0.map(_.copy(lineageCols = true)) else files0),
        schemaIdAtWrite, operation, streamBatchId, streamId,
        removedPaths, retryConflicts)
      println(f"    [write ${(t1 - profT0) / 1e6}%6.1f ms  " +
        f"commit ${(System.nanoTime() - t1) / 1e6}%6.1f ms]")
      return r
    }
    // a lineage rewrite physically wrote _graft_row_id /
    // _graft_last_updated columns — record the flag so lineage reads
    // know to consume them (and inherit through their null cells)
    val files = if (lineage) files0.map(_.copy(lineageCols = true)) else files0
    // crash window under test (MaintenanceSpec torn-write recovery): a
    // death HERE strands outDir as unreferenced files — readers never
    // see them, the orphan sweep collects them, a retry recommits
    LakeTable.faultPoint("post-write-pre-commit")
    commitSnapshot(files, schemaIdAtWrite, operation,
      streamBatchId, streamId, removedPaths, retryConflicts)
  }

  // ---- write-audit-publish (Iceberg's wap.id staging) ------------------

  /** Stage an append without making it visible: the snapshot is
    * committed into the metadata's `staged` list (so its files are
    * referenced, not orphans) but no read/time-travel/CDC path sees it
    * until `publishStaged`. Mirrors Iceberg's write-audit-publish flow
    * (`spark.wap.id` + `cherrypick_snapshot`); the reference has no
    * equivalent — engine extension.
    */
  def appendStaged(df: DataFrame, wapId: String): SnapshotMeta = {
    require(wapId.nonEmpty, "wapId must be non-empty")
    require(!wapId.startsWith("branch:"),
      "the 'branch:' wap-id prefix is reserved for branch commits " +
        "(use appendToBranch)")
    require(!md.staged.exists(_.wapId.contains(wapId)),
      s"wap id '$wapId' already staged")
    val aligned = Align(df, md.currentSchema)
    aligned.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val snapshotId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    val outDir = dataDir.resolve(
      s"snap-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}")
    val files = writeDataFiles(aligned, outDir)
    val snap = SnapshotMeta(snapshotId, files, md.currentSchemaId,
      operation = "staged-append",
      timestampMs = System.currentTimeMillis(), wapId = Some(wapId))
    commit(md.copy(staged = md.staged :+ snap))
    snap
  }

  def stagedSnapshot(wapId: String): Option[SnapshotMeta] =
    md.staged.find(_.wapId.contains(wapId))

  /** Audit read: the current live table plus the staged snapshot's
    * rows — what the table WOULD look like if `wapId` were published
    * now. Other staged snapshots stay invisible.
    */
  def readStaged(spark: SparkSession, wapId: String): DataFrame = {
    val snap = stagedSnapshot(wapId).getOrElse(
      throw new IllegalArgumentException(s"no staged snapshot '$wapId'"))
    val current = md.currentSchema
    // staged files carry no explicit seq — stamp the staged snapshot's
    // own id so live equality batches (seq < staged id) apply to the
    // LIVE rows but not to the staged batch itself, exactly as they
    // will after publish
    readFiles(spark,
      LakeTable.liveFiles(md.snapshots) ++
        snap.files.map(f => if (f.seq >= 0) f else f.copy(seq = snap.id)),
      current, LakeTable.liveDeletes(md.snapshots),
      LakeTable.liveEqDeletes(md.snapshots))
  }

  /** Publish a staged snapshot: cherry-pick its files onto the head as
    * a fresh "append" snapshot (new id, commit-time timestamp — the
    * history stays monotonic even if other writes landed since the
    * stage). The wap id is carried for lineage; CDC/incremental readers
    * see the rows at publish time, matching Iceberg's
    * `cherrypick_snapshot` semantics.
    */
  def publishStaged(wapId: String): SnapshotMeta = {
    require(!wapId.startsWith("branch:"),
      "branch commits publish via fastForward, not publish_wap " +
        "(a branch may hold several commits; publish_wap moves one)")
    val snap = stagedSnapshot(wapId).getOrElse(
      throw new IllegalArgumentException(s"no staged snapshot '$wapId'"))
    require(snap.schemaId == md.currentSchemaId,
      s"staged snapshot '$wapId' was written under schema ${snap.schemaId}; " +
        s"table is now at ${md.currentSchemaId} — re-stage after evolution")
    val newId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    val published = snap.copy(id = newId, operation = "append",
      timestampMs = System.currentTimeMillis())
    commit(md.copy(snapshots = md.snapshots :+ published,
      staged = md.staged.filterNot(_.wapId.contains(wapId))))
    published
  }

  /** Drop a staged snapshot without publishing. Its data files become
    * orphans (removed by `removeOrphanFiles` once aged). Returns the
    * number of data files orphaned.
    */
  def discardStaged(wapId: String): Int = {
    require(!wapId.startsWith("branch:"),
      "branch commits are discarded via discardBranch, not discard_wap")
    val snap = stagedSnapshot(wapId).getOrElse(
      throw new IllegalArgumentException(s"no staged snapshot '$wapId'"))
    commit(md.copy(staged = md.staged.filterNot(_.wapId.contains(wapId))))
    snap.files.size
  }

  // ---- writable branches (Iceberg branch write + fast-forward) --------

  /** Branch commits are staged snapshots tagged `branch:<name>`; the
    * branch ref tracks its head and the main snapshot it forked from.
    * Reads overlay the branch commits on the frozen base state;
    * fast-forward publishes them onto main iff main hasn't moved —
    * the nightly-build isolation pattern without copying any data.
    */
  private def branchMarker(name: String) = s"branch:$name"

  private def branchSnaps(name: String): Seq[SnapshotMeta] =
    md.staged.filter(_.wapId.contains(branchMarker(name))).sortBy(_.id)

  def createBranch(name: String): RefMeta = {
    require(name.nonEmpty && scala.util.Try(name.toLong).isFailure,
      s"branch name '$name' would be ambiguous with a snapshot id")
    require(!md.refs.contains(name), s"ref '$name' already exists")
    require(branchSnaps(name).isEmpty,
      s"stale staged commits tagged 'branch:$name' exist — a new branch " +
        "must not adopt a dead branch's unpublished work")
    val head = md.snapshots.map(_.id).foldLeft(0L)(math.max)
    val ref = RefMeta(head, "branch", baseSnapshotId = Some(head))
    commit(md.copy(refs = md.refs + (name -> ref)))
    ref
  }

  private def branchRef(name: String): RefMeta =
    md.refs.get(name) match {
      case Some(r) if r.kind == "branch" && r.baseSnapshotId.isDefined => r
      case Some(r) if r.kind == "branch" => throw new IllegalArgumentException(
        s"ref '$name' is a pointer branch (createRef); writable branches " +
          "are created with createBranch")
      case Some(r) => throw new IllegalArgumentException(
        s"ref '$name' is a ${r.kind}, not a writable branch")
      case None => throw new IllegalArgumentException(s"no branch '$name'")
    }

  def appendToBranch(df: DataFrame, name: String): SnapshotMeta = {
    branchRef(name)
    val aligned = Align(df, md.currentSchema)
    aligned.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val provisionalId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    val outDir = dataDir.resolve(
      s"snap-$provisionalId-${java.util.UUID.randomUUID().toString.take(8)}")
    stageBranchSnapshot(name, writeDataFiles(aligned, outDir),
      md.currentSchemaId)
  }

  /** The branch view: main AS OF the fork base, overlaid with the
    * branch's own commits — writes to main after the fork stay
    * invisible (that isolation is the point of branching).
    *
    * Branch commits are RE-SEQUENCED above the fork base in commit
    * order — exactly the stamping `fastForward` applies at publish —
    * so the view always equals the state publishing would produce
    * (write-AUDIT-publish: the audit must show the publish result).
    * Without this, staged ids interleave with main's post-fork
    * snapshot ids and a rebased branch's eq-delete would skip main
    * rows committed after it was staged, then delete them anyway at
    * publish. Re-sequencing keeps branch MoR batches newer than every
    * visible file (they supersede base rows and earlier branch rows,
    * never rows written alongside them) and keeps main's eq-deletes
    * older than branch rows — blind-write last-wins, before and after
    * publish alike.
    */
  def readBranch(spark: SparkSession, name: String): DataFrame = {
    val ref = branchRef(name)
    val base = ref.baseSnapshotId.get
    val visible = md.snapshots.filter(_.id <= base)
    val (files, eqs) = LakeTable.resequenceOverlay(base, branchSnaps(name))
    // staged copy-on-write commits rewrite files INSIDE the branch:
    // drop their inputs from the combined set. A flat subtraction is
    // exact — a CoW only ever removes files visible at its staging
    // time, and replacement files get fresh UUID paths.
    val cowRemoved = branchSnaps(name).flatMap(_.removedPaths)
      .map(LakeTable.normalizePath).toSet
    readFiles(spark,
      (LakeTable.liveFiles(visible) ++ files)
        .filterNot(f => cowRemoved(LakeTable.normalizePath(f.path))),
      md.currentSchema, LakeTable.liveDeletes(visible),
      LakeTable.liveEqDeletes(visible) ++ eqs)
  }

  /** Merge-on-read DELETE on a branch: stage an equality-delete batch
    * tagged to the branch — O(keys) write cost, zero reads, exactly
    * `deleteByKeysMoR` but invisible to main until publish. The branch
    * stops being append-only, which is fine: publish re-stamps the
    * batch's sequence, so post-rebase semantics stay append/last-wins
    * per key (see `rebaseBranch`).
    */
  def deleteFromBranchMoR(spark: SparkSession, name: String,
      keys: DataFrame): SnapshotMeta = {
    resolveKeys(keys.columns.toSeq, "deleteFromBranchMoR")
    writeMoR(spark, None, Left(keys), Some(name))
  }

  /** Blind merge-on-read upsert on a branch: one staged snapshot
    * carries the source rows plus an equality-delete batch for their
    * keys (the batch's sequence equals the snapshot's, so it kills
    * older rows with those keys but not the rows written alongside
    * it) — `upsertMoR` under branch isolation, O(batch) at any table
    * size.
    */
  def upsertToBranchMoR(spark: SparkSession, name: String,
      source: DataFrame, keys: Seq[String] = Seq.empty): SnapshotMeta = {
    val ks = resolveKeys(keys, "upsertToBranchMoR")
    requireUpsertKeys(source, ks)
    writeMoR(spark, Some(source), Right(ks), Some(name))
  }

  /** Shared core of the four blind MoR write verbs (delete/upsert ×
    * main/branch): allocate the next snapshot id, write the key batch
    * (given directly for deletes, derived from the aligned source for
    * upserts) plus the upsert's data files, and commit — onto main, or
    * staged under the branch marker with the branch head advanced.
    * One body means concurrency checks, sequencing, and key
    * validation cannot diverge between the main and branch forms.
    *
    * Commit conflicts RETRY like plain appends (reload + fresh id +
    * re-stamped batch sequence + recommit — no data rewrite): blind
    * writes are read-independent by contract — "these keys die / these
    * rows win as of my commit" — so landing after a concurrent commit
    * is exactly the documented last-write-wins semantic. The multi-
    * writer CDC-sink shape depends on this. Stream-replay upserts
    * (streamBatchId) opt out: their idempotence bookkeeping must
    * observe the conflict. One retry hazard is re-checked after every
    * reload: a concurrent evolution may have dropped a key field,
    * which would orphan the batch — surfaced, not committed.
    */
  private def writeMoR(spark: SparkSession, source: Option[DataFrame],
      keys: Either[DataFrame, Seq[String]], branch: Option[String],
      streamBatchId: Option[Long] = None,
      streamId: Option[String] = None): SnapshotMeta = {
    val retriable = streamBatchId.isEmpty
    // catch up FIRST: alignment, key derivation, the recorded write
    // schema, and the branch-ref check must all observe ONE schema —
    // the same stale-consistency invariant the append path keeps by
    // capturing everything BEFORE its reload (either order is sound;
    // mixing them is not)
    if (currentHintVersion() != loadedVersion) {
      if (retriable) reload()
      else throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    }
    branch.foreach(branchRef)
    val aligned = source.map(Align(_, md.currentSchema))
    aligned.foreach(_.sparkSession.conf
      .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"))
    // the files'/batch's true write schema, captured before any
    // further reload — reads reconcile by id per schema version
    val schemaIdAtWrite = md.currentSchemaId
    val provisionalId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    val batch0 = writeEqDeleteBatch(
      keys.fold(identity, ks => keyColumns(aligned.get, ks)), provisionalId)
    val files = aligned.map { a =>
      writeDataFiles(a, dataDir.resolve(
        s"snap-$provisionalId-${java.util.UUID.randomUUID().toString.take(8)}"))
    }.getOrElse(Seq.empty)
    val op = (source.isDefined, branch.isDefined) match {
      case (true, true) => "staged-upsert"
      case (true, false) => "upsert"
      case (false, true) => "staged-delete"
      case (false, false) => "delete"
    }
    retryingCommit(retriable,
      build = snapshotId => SnapshotMeta(snapshotId, files,
        schemaIdAtWrite, operation = op, streamBatchId = streamBatchId,
        streamId = streamId, timestampMs = System.currentTimeMillis(),
        wapId = branch.map(branchMarker),
        eqDeletes = Seq(batch0.copy(seq = snapshotId))),
      apply = snap => branch match {
        case Some(b) =>
          val ref = branchRef(b)
          md.copy(staged = md.staged :+ snap,
            refs = md.refs + (b -> ref.copy(snapshotId = snap.id)))
        case None => md.copy(snapshots = md.snapshots :+ snap)
      },
      afterReload = e => {
        // a concurrent evolution that dropped a key field would
        // orphan the batch at read time — and no amount of retrying
        // can fix it, so say that, not "reload and retry"
        if (!batch0.fieldIds.forall(id =>
          LakeTable.structPathOfId(md.currentSchema, id).isDefined))
          throw new IllegalStateException(
            "an equality-delete key column was dropped concurrently; " +
              "re-derive the keys under the new schema", e)
        // a branch commit staged under an outdated schema could never
        // fast-forward (publish checks schema equality) — surface the
        // conflict so the caller re-stages under the new schema
        if (branch.isDefined && md.currentSchemaId != schemaIdAtWrite)
          throw e
      })
  }

  /** Copy-on-write DELETE on a branch: the affected files of the
    * BRANCH VIEW (fork-base files plus earlier branch commits) are
    * rewritten without the matching rows and staged as one
    * "staged-cow" snapshot whose `removedPaths` are exactly the
    * rewritten inputs — the branch-scoped form of `delete`. Publish is
    * REBASE-CHECKED: `fastForward` verifies every rewritten input is
    * still live at publish time (a compaction that moved files under
    * the branch would make the baked-in rewrite stale) and
    * `rebaseBranch` refuses branches carrying CoW commits — unlike the
    * blind MoR verbs, a file rewrite cannot be carried over a moved
    * base. Iceberg's cherry-pick of overwrite snapshots has the same
    * constraint.
    */
  def deleteFromBranchCoW(spark: SparkSession, name: String,
      predicate: Column): Option[SnapshotMeta] =
    branchCoW(spark, name, predicate, assignments = None)

  /** Copy-on-write UPDATE on a branch — same staging/publish contract
    * as `deleteFromBranchCoW`; every assignment RHS sees the
    * pre-update row, like `update`.
    */
  def updateBranchCoW(spark: SparkSession, name: String,
      assignments: Map[String, Column], predicate: Column)
      : Option[SnapshotMeta] = {
    val bad = assignments.keySet.filterNot(md.currentSchema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: $bad")
    branchCoW(spark, name, predicate, Some(assignments))
  }

  private def branchCoW(spark: SparkSession, name: String,
      predicate: Column, assignments: Option[Map[String, Column]])
      : Option[SnapshotMeta] = {
    val what =
      if (assignments.isDefined) "updateBranchCoW" else "deleteFromBranchCoW"
    val ref = branchRef(name)
    // read-dependent write: a concurrent commit invalidates the view
    // this rewrite is computed from — surface it, never retry blindly
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val base = ref.baseSnapshotId.get
    val visible = md.snapshots.filter(_.id <= base)
    // same contract as the main-table CoW verbs (`delete`/`update`):
    // live equality batches don't mix with a file rewrite — batches
    // staged on this branch count too, since the rewrite would bake
    // them in and change their replay semantics at publish
    require(LakeTable.liveEqDeletes(visible).isEmpty &&
      branchSnaps(name).forall(_.eqDeletes.isEmpty),
      s"$what: equality-delete batches are live in the branch view; " +
        "use the MoR branch verbs (deleteFromBranchMoR/upsertToBranchMoR) " +
        "or compact first")
    val cowRemoved = branchSnaps(name).flatMap(_.removedPaths)
      .map(LakeTable.normalizePath).toSet
    val (overlayFiles, _) =
      LakeTable.resequenceOverlay(base, branchSnaps(name))
    val candidates = (LakeTable.liveFiles(visible) ++ overlayFiles)
      .filterNot(f => cowRemoved(LakeTable.normalizePath(f.path)))
    val affected = affectedFiles(spark, predicate,
      candidatesOverride = Some(candidates))
    if (affected.isEmpty) return None
    // v3 branch rewrites preserve row lineage exactly like the
    // main-table CoW verbs: survivors carry their id + last-updated
    // verbatim, updated rows keep their id and null the last-updated
    // so inheritance re-stamps the PUBLISH commit's sequence — without
    // this, a curation pass on a branch would silently re-identify
    // every row it touched at publish.
    //
    // STAGED-ORIGIN survivors are the exception to "carry verbatim":
    // a row an EARLIER staged commit rewrote inherits a sequence that
    // only exists pre-publish (fastForward re-numbers every staged
    // snapshot) — materializing it would bake a dangling id into the
    // parquet. Those rows keep NULL lineage and land in their own
    // output files whose file-meta `seq` names the SOURCE staged
    // snapshot; publish remaps that seq to the source's published id
    // (the file-meta seq is exactly the format's deferred-sequencing
    // mechanism), so after publish they still read the sequence of
    // the commit that last changed them.
    val rows = readFiles(spark, affected, md.currentSchema,
      LakeTable.liveDeletes(visible), lineage = writesVectors)
    val p = coalesce(predicate, lit(false))
    val valueCols: Seq[Column] = assignments match {
      case None => md.currentSchema.fieldNames.toSeq.map(n => col(s"`$n`"))
      case Some(as) => md.currentSchema.fieldNames.toSeq.map { n =>
        as.get(n) match {
          case Some(v) => when(p, v).otherwise(col(s"`$n`")).as(n)
          case None => col(s"`$n`").as(n)
        }
      }
    }
    val base0 = if (assignments.isDefined) rows else rows.filter(!p)
    // staged snapshots' PREDICTED sequences on the branch view
    // (resequenceOverlay's numbering) → their staged ids
    val stagedByPredicted: Map[Long, Long] =
      branchSnaps(name).map(_.id).sorted.zipWithIndex
        .map { case (id, i) => (base + i + 1) -> id }.toMap
    val affectedStaged = writesVectors &&
      affected.exists(f => stagedByPredicted.contains(f.seq))
    val provisionalId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    def freshOutDir() = dataDir.resolve(
      s"snap-$provisionalId-${java.util.UUID.randomUUID().toString.take(8)}")
    def writeGroup(df: DataFrame): Seq[DataFileMeta] = {
      val aligned = Align.keeping(df, md.currentSchema,
        LakeTable.matLineageCols)
      aligned.sparkSession.conf
        .set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val fs = writeDataFiles(aligned, freshOutDir())
      // an origin group may hold zero rows (all its candidates were
      // touched) — drop the empty file rather than commit it
      fs.filter { f =>
        if (f.rows == 0L) { Files.deleteIfExists(Paths.get(f.path)); false }
        else true
      }.map(f => if (writesVectors) f.copy(lineageCols = true) else f)
    }
    val written =
      if (!affectedStaged) {
        // no staged inputs: every inherited sequence is a stable MAIN
        // id — materialize verbatim (the pre-existing fast path)
        val kept =
          if (!writesVectors) base0.select(valueCols: _*)
          else base0.select(valueCols ++ Seq(
            col("_row_id").as("_graft_row_id"),
            when(if (assignments.isDefined) p else lit(false),
              lit(null).cast(LongType))
              .otherwise(col("_last_updated_sequence_number"))
              .as("_graft_last_updated")): _*)
        writeGroup(kept)
      } else {
        val touched = if (assignments.isDefined) p else lit(false)
        val full = base0.select(valueCols ++ Seq(
          col("_row_id").as("__rid"),
          col("_last_updated_sequence_number").as("__orig"),
          touched.as("__touched")): _*).localCheckpoint()
        val dataCols = md.currentSchema.fieldNames.toSeq
          .map(n => col(s"`$n`"))
        val predictedKeys = stagedByPredicted.keys.toSeq
        val mainish = full.filter(col("__touched") ||
          col("__orig").isNull ||
          !col("__orig").isin(predictedKeys: _*))
          .select(dataCols ++ Seq(
            col("__rid").as("_graft_row_id"),
            when(col("__touched"), lit(null).cast(LongType))
              .otherwise(col("__orig")).as("_graft_last_updated")): _*)
        val stagedParts = stagedByPredicted.toSeq.sortBy(_._1).flatMap {
          case (pred, sid) =>
            writeGroup(full.filter(!col("__touched") &&
              col("__orig") === pred)
              .select(dataCols ++ Seq(
                col("__rid").as("_graft_row_id"),
                lit(null).cast(LongType).as("_graft_last_updated")): _*))
              .map(_.copy(seq = sid))
        }
        writeGroup(mainish) ++ stagedParts
      }
    Some(stageBranchSnapshot(name, written,
      md.currentSchemaId, operation = "staged-cow",
      removedPaths = affected.map(_.path)))
  }

  /** Optimistic-concurrency commit loop shared by retriable appends
    * and blind MoR writes: build a fresh snapshot per attempt (ids
    * share one space with staged snapshots), commit, and on conflict
    * back off with jitter, reload, run the caller's post-reload
    * validity check, and go again — up to Iceberg's
    * commit.retry.num-retries.
    */
  private def retryingCommit(retriable: Boolean,
      build: Long => SnapshotMeta,
      apply: SnapshotMeta => TableMetadata,
      afterReload: java.util.ConcurrentModificationException => Unit =
        _ => ()): SnapshotMeta = {
    // tolerant parse: a malformed value (pre-validation metadata) must
    // not brick every write — fall back to the default
    val maxRetries = md.properties.get("commit.retry.num-retries")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(4)
    var attempts = 0
    while (true) {
      val snapshotId = (md.snapshots ++ md.staged).map(_.id)
        .foldLeft(0L)(math.max) + 1
      val snap = build(snapshotId)
      try {
        commit(apply(snap))
        return snap
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempts += 1
          if (!retriable || attempts > maxRetries) throw e
          // jittered linear backoff so a herd of writers doesn't
          // re-collide in lockstep
          Thread.sleep(
            scala.util.Random.nextInt(10L.max(attempts * 20L).toInt).toLong)
          reload()
          afterReload(e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Publish the branch onto main, in commit order, as fresh append
    * snapshots (monotonic ids). Refused when main advanced past the
    * fork base — divergence needs a conflict strategy, not a silent
    * overwrite; discard the branch or re-branch from the new head.
    * Returns the published snapshots; the ref stays a branch, re-based
    * at the new head.
    */
  def fastForward(name: String): Seq[SnapshotMeta] = {
    val ref = branchRef(name)
    val base = ref.baseSnapshotId.get
    val head = md.snapshots.map(_.id).foldLeft(0L)(math.max)
    // a post-base suffix of REWRITE snapshots is not divergence:
    // compaction / rewrite_manifests move bytes, not data, so the
    // branch's fork-base state is semantically the current state —
    // routine maintenance must not strand branch publishes
    require(head == base ||
      md.snapshots.filter(_.id > base)
        .forall(s => LakeTable.isByteMove(s.operation)),
      s"branch '$name' forked at $base but main is at $head — " +
        "diverged; rebase_branch to re-fork at the new head (sound: " +
        "branch commits are blind writes), or discard the branch")
    val snaps = branchSnaps(name)
    snaps.foreach(s => require(s.schemaId == md.currentSchemaId,
      s"branch '$name' has a commit under schema ${s.schemaId}; table " +
        s"is now at ${md.currentSchemaId} — discard and re-branch " +
        "after evolution"))
    var nextId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max)
    // the rebase check for staged copy-on-write commits: every
    // rewritten input must STILL be live at publish time — tracked
    // through the publish sequence itself, since a later branch CoW
    // may legitimately rewrite files an earlier branch commit added.
    // A compaction since the fork (allowed by the byte-move clause
    // above) moves file paths, which makes a baked-in rewrite stale —
    // that surfaces here as a named refusal, not silent duplication.
    var liveNow = LakeTable.liveFiles(md.snapshots)
      .map(f => LakeTable.normalizePath(f.path)).toSet
    // staged id → published id, built as the walk publishes: a later
    // staged commit's file whose explicit seq NAMES an earlier staged
    // snapshot (deferred staged-origin lineage — see branchCoW) must
    // re-point at that snapshot's PUBLISHED id, or the baked reference
    // dangles the moment the staged entries are dropped
    val pubOf = scala.collection.mutable.Map.empty[Long, Long]
    val published = snaps.map { s =>
      nextId += 1
      // branch MoR commits publish under their real operation;
      // equality batches re-stamp to the published sequence so they
      // supersede everything older than the publish (append-wins —
      // identical to what the branch view already showed: main's
      // state at publish equals the fork-base state, since anything
      // past the base is a rewrite that moves bytes, not data)
      val op = s.operation match {
        case "staged-delete" => "delete"
        case "staged-upsert" => "upsert"
        case "staged-cow" => "overwrite"
        case _ => "append"
      }
      if (s.removedPaths.nonEmpty) {
        val gone = s.removedPaths.map(LakeTable.normalizePath)
          .filterNot(liveNow)
        require(gone.isEmpty,
          s"branch '$name' carries a copy-on-write rewrite of " +
            s"${gone.size} file(s) no longer live on main (e.g. " +
            s"${gone.take(2).mkString(", ")}) — the base moved under " +
            "the rewrite; discard the branch and re-apply the change")
      }
      liveNow = liveNow --
        s.removedPaths.map(LakeTable.normalizePath) ++
        s.files.map(f => LakeTable.normalizePath(f.path))
      val remapped =
        if (s.files.exists(f => f.seq >= 0 && pubOf.contains(f.seq)))
          s.files.map(f =>
            if (f.seq >= 0 && pubOf.contains(f.seq))
              f.copy(seq = pubOf(f.seq))
            else f).toSeq
        else s.files
      pubOf(s.id) = nextId
      s.copy(id = nextId, operation = op, files = remapped,
        eqDeletes = s.eqDeletes.map(_.copy(seq = nextId)),
        timestampMs = System.currentTimeMillis())
    }
    val newHead = published.lastOption.map(_.id).getOrElse(head)
    commit(md.copy(snapshots = md.snapshots ++ published,
      staged = md.staged.filterNot(_.wapId.contains(branchMarker(name))),
      refs = md.refs + (name -> RefMeta(newHead, "branch",
        baseSnapshotId = Some(newHead)))))
    published
  }

  /** Re-fork a diverged branch at the current main head (rebase).
    * Branch commits are blind writes by construction — appends, or
    * MoR deletes/upserts whose equality batches carry their own keys —
    * so carrying them over the moved base cannot conflict with
    * anything main did since the fork: the branch view simply starts
    * overlaying main's newer commits (which branch eq-batches, being
    * newer still, supersede per key), and `fastForward` becomes
    * possible again. Schema compatibility stays fast-forward's check
    * (a rebase is also how a branch catches up to see an evolution).
    * The branch view re-sequences its commits above whatever base it
    * currently has (`readBranch`), so before and after a rebase the
    * view equals what publishing would produce — blind-write
    * last-wins per key, with no view/publish divergence. Returns the
    * new base snapshot id; no-op when already based at head.
    */
  def rebaseBranch(name: String): Long = {
    val ref = branchRef(name)
    val head = md.snapshots.map(_.id).foldLeft(0L)(math.max)
    if (ref.baseSnapshotId.contains(head)) return head
    // blind writes rebase soundly; a staged copy-on-write rewrite does
    // NOT — it baked in the fork-base content of the files it replaced,
    // and main may have changed those rows since
    require(branchSnaps(name).forall(_.removedPaths.isEmpty),
      s"branch '$name' carries copy-on-write rewrites pinned to base " +
        s"${ref.baseSnapshotId.get} — a rebase cannot carry a file " +
        "rewrite over a moved base; fastForward (if main only " +
        "compacted) or discard the branch and re-apply")
    // an empty branch's head pointer tracks its base
    val newSnapId = if (branchSnaps(name).isEmpty) head else ref.snapshotId
    commit(md.copy(refs = md.refs + (name ->
      RefMeta(newSnapId, "branch", baseSnapshotId = Some(head)))))
    head
  }

  /** Drop a branch and its unpublished commits; their data files
    * become orphans. Returns the number of files orphaned.
    */
  def discardBranch(name: String): Int = {
    branchRef(name)
    val snaps = branchSnaps(name)
    commit(md.copy(
      staged = md.staged.filterNot(_.wapId.contains(branchMarker(name))),
      refs = md.refs - name))
    snaps.map(s => s.files.size + s.eqDeletes.map(_.paths.size).sum).sum
  }

  // ---- equality deletes (Iceberg v2's second delete-file kind) --------

  /** Write `keys` (distinct) as an equality-delete parquet batch.
    * Columns are stored as `k<fieldId>` so later renames of the key
    * columns cannot orphan the batch — readers resolve names per
    * schema version by id. Key columns may be struct-NESTED scalars
    * (dotted paths, e.g. `meta.region` — Iceberg's equality deletes
    * likewise key on any nested field id); paths through arrays/maps
    * are refused (such a field doesn't identify a row).
    */
  private def writeEqDeleteBatch(keys: DataFrame, snapshotId: Long)
      : EqDeleteMeta = {
    val schema = md.currentSchema
    val fields = keys.columns.toSeq.map { c =>
      // exact top-level match first: a column NAMED with a dot must
      // not be re-parsed as a nested path
      val f = schema.fields.find(_.name == c)
        .orElse(LakeTable.resolveStructPath(schema, c)).getOrElse(
        throw new IllegalArgumentException(
          s"equality-delete key '$c' is not a table column or a " +
            "struct-nested path (array/map paths cannot key a row)"))
      require(Seq(IntegerType, LongType, StringType, BooleanType,
        FloatType, DoubleType, DateType, TimestampType, TimestampNTZType)
        .contains(f.dataType) || f.dataType.isInstanceOf[DecimalType],
        s"equality-delete key '$c' must be a scalar of a supported " +
          s"type, got ${f.dataType.simpleString}")
      c -> f
    }
    val ids = fields.map { case (_, f) => FieldIds.idOf(f) }
    val proj = keys.select(fields.map { case (c, f) =>
      col(s"`$c`").cast(f.dataType).as(s"k${FieldIds.idOf(f)}")
    }: _*)
    val dir = dataDir.resolve(
      s"eqdel-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}")
    // a bounded LOCAL key set (the incremental-MV / touched-group
    // publication shape): dedupe on the driver, write the one marker
    // file driver-side (no Spark job), and INLINE the keys into the
    // metadata up to the cap — every later read of the batch then
    // plans a LocalRelation instead of a parquet scan + broadcast job
    if (LakeTable.isLocalPlan(keys)) {
      proj.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          val types = fields.map(_._2.dataType)
          val seen = scala.collection.mutable.LinkedHashMap
            .empty[Seq[Option[String]],
              org.apache.spark.sql.catalyst.InternalRow]
          lr.data.foreach { r =>
            val k = types.zipWithIndex.map { case (dt, i) =>
              LakeTable.renderInlineKey(dt, r, i) }
            if (!seen.contains(k)) seen += k -> r.copy()
          }
          Files.createDirectories(dir)
          val p = dir.resolve("keys-00000.snappy.parquet")
          LakeTable.writeLocalParquetFile(
            StructType(ids.zip(types).map { case (id, dt) =>
              StructField(s"k$id", dt, nullable = true) }),
            seen.values.toSeq, p)
          val inline = seen.size <= LakeTable.InlineKeyCap
          return EqDeleteMeta(Seq(p.toString), ids, snapshotId,
            inlineKeys = if (inline) Some(seen.keys.toSeq) else None,
            inlineTypes =
              if (inline) Some(types.map(_.simpleString)) else None)
        case _ => ()
      }
    }
    val typed = proj.distinct()
    typed.write.parquet(dir.toString)
    EqDeleteMeta(listParquet(dir).map(_.toString), ids, snapshotId)
  }

  /** The table's identifier fields resolved to their CURRENT names —
    * rename-proof because the metadata stores field ids. Empty when the
    * table declares no row identity.
    */
  def identifierFieldNames: Seq[String] =
    md.identifierFieldIds.map(id =>
      LakeTable.structPathOfId(md.currentSchema, id).map(_._1).getOrElse(
        throw new IllegalStateException(
          s"identifier field id $id not in current schema")))

  /** Key resolution shared by every keyed MoR verb: no keys → the
    * table's identifier fields (loud failure when none are declared);
    * explicit keys on an identity-declaring table must MATCH the
    * identity — otherwise two CDC writers using different keys would
    * silently produce diverging last-write-wins outcomes.
    */
  private def resolveKeys(keys: Seq[String], op: String): Seq[String] = {
    val ident = identifierFieldNames
    if (keys.isEmpty) {
      require(ident.nonEmpty,
        s"$op: no keys given and table ${md.database}.${md.table} declares " +
          "no identifier fields (set table property 'identifier-fields')")
      ident
    } else {
      require(ident.isEmpty || keys.toSet == ident.toSet,
        s"$op keys [${keys.mkString(", ")}] differ from the table's " +
          s"identifier fields [${ident.mkString(", ")}] — omit keys to " +
          "use the declared row identity")
      keys
    }
  }

  /** DELETE WHERE key IN (keys) — merge-on-read equality deletes:
    * writes only the key tuples, reads and rewrites NOTHING (contrast
    * position deletes, which scan to find row positions). The batch
    * deletes matching rows from every data file with a lower sequence
    * number at read time. O(keys) write cost at any table size — the
    * CDC/GDPR delete shape for 100 TB tables. The key frame's COLUMNS
    * are the key set, so identity-declaring tables refuse a frame
    * whose columns drift from the declared identity.
    */
  /** One CDC delta as ONE snapshot: an equality-delete batch for `keys`
    * plus the appended `rows`, both at the new snapshot's sequence —
    * the batch kills strictly OLDER rows with those keys, never the
    * rows written alongside it, so delete-then-insert semantics hold
    * within the single commit. A replayed changelog ordinal (or any
    * CDC frame's deletes+inserts) lands as one commit instead of two.
    * Blind write: retries on conflict like `upsertMoR`.
    */
  def applyDeltaMoR(spark: SparkSession, keys: DataFrame,
      rows: DataFrame): SnapshotMeta = {
    resolveKeys(keys.columns.toSeq, "applyDeltaMoR")
    writeMoR(spark, Some(rows), Left(keys), None)
  }

  def deleteByKeysMoR(spark: SparkSession, keys: DataFrame): SnapshotMeta = {
    resolveKeys(keys.columns.toSeq, "deleteByKeysMoR")
    writeMoR(spark, None, Left(keys), None)
  }

  /** Blind streaming upsert (the Flink/Iceberg CDC-sink shape): ONE
    * snapshot carries an equality-delete batch for the source keys
    * plus the source rows as new data files. The batch's sequence
    * equals the snapshot's, so it kills older rows with those keys but
    * not the rows written alongside it — last write wins per key, with
    * zero reads of the existing table at write time. At 100 TB that is
    * the difference between O(batch) and O(table) per commit.
    */
  def upsertMoR(spark: SparkSession, source: DataFrame,
      keys: Seq[String] = Seq.empty, streamBatchId: Option[Long] = None,
      streamId: Option[String] = None): SnapshotMeta = {
    val ks = resolveKeys(keys, "upsertMoR")
    requireUpsertKeys(source, ks)
    writeMoR(spark, Some(source), Right(ks), None, streamBatchId, streamId)
  }

  /** Touched-group publication (the incremental-MV maintenance shape):
    * ONE snapshot whose equality-delete batch strikes EVERY given key
    * — including groups whose recompute produced no surviving row —
    * while `source` re-adds the live groups. The batch's sequence
    * equals the snapshot's, so the markers kill older rows but never
    * the rows written alongside them. Equivalent to
    * `upsertMoR(source) + deleteByKeysMoR(deadKeys)` in HALF the
    * commits (one manifest write, one snapshot) and without computing
    * the dead set at all. `keys` may be a superset of the source's key
    * values; it must never miss one, or the stale row survives next to
    * its replacement.
    */
  def upsertWithDeletesMoR(spark: SparkSession, source: DataFrame,
      keys: DataFrame): SnapshotMeta = {
    resolveKeys(keys.columns.toSeq, "upsertWithDeletesMoR")
    writeMoR(spark, Some(source), Left(keys), None)
  }

  /** An upsert SOURCE must physically carry every key — a top-level
    * column, or for dotted keys the full struct path. Accepting a
    * missing nested key would let Align null-fill the struct and the
    * batch would silently eq-delete every null-keyed row instead of
    * failing loudly like the top-level case.
    */
  private def requireUpsertKeys(source: DataFrame, keys: Seq[String]): Unit =
    require(keys.nonEmpty && keys.forall(k =>
      source.columns.contains(k) ||
        LakeTable.resolveStructPath(source.schema, k).isDefined),
      s"source must contain every key column: $keys")

  /** The upsert key columns of an aligned frame, one column per key —
    * dotted keys navigate into structs and come back aliased to their
    * dotted path, which `writeEqDeleteBatch` resolves against the
    * current schema.
    */
  private def keyColumns(aligned: DataFrame, keys: Seq[String]): DataFrame =
    aligned.select(keys.map(k =>
      (if (aligned.columns.contains(k)) col(s"`$k`") else col(k))
        .as(k)): _*)

  /** Row-level ops (CoW rewrite or position-delete MoR) assume every
    * live row is physically present in its data file; live equality
    * deletes break that. Materialize them first (compact). Loud guard,
    * not silent corruption.
    */
  private def requireNoLiveEqDeletes(op: String): Unit =
    require(LakeTable.liveEqDeletes(md.snapshots).isEmpty,
      s"$op with live equality deletes is unsupported — run compact() " +
        "(CALL system.compact) to materialize them first")

  /** The driver-side single-file write behind [[writeDataFiles]]'s
    * LocalRelation fast path: Spark's own parquet WriteSupport over
    * the already-folded InternalRows, so the bytes are identical to
    * what a one-task FileFormatWriter job would produce (INT64-micros
    * timestamps, CORRECTED rebase, snappy) at none of the
    * job/commit-protocol cost. Stats/blooms attach exactly as on the
    * distributed path.
    */
  private def writeLocalDataFile(source: DataFrame,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow],
      outDir: Path): Seq[DataFileMeta] = {
    Files.createDirectories(outDir)
    val p = outDir.resolve(
      s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    LakeTable.writeLocalParquetFile(source.schema, rows, p)
    val (nrows, stats) =
      FileStats.fromFooterWithRows(p.toString, md.currentSchema)
    val meta = DataFileMeta(p.toString, md.currentSchemaId,
      md.currentSpec.id, rows = nrows, partitionValues = Map.empty,
      stats = stats,
      bytes = try Files.size(p) catch { case _: Exception => -1L },
      sortedByIds = Seq.empty)
    attachBlooms(source.sparkSession, outDir, Seq(meta), Some(source))
  }

  /** Write one aligned DataFrame as parquet data files under `outDir` —
    * hidden-partition columns, write clustering, writer options, and
    * per-file metadata (rows / partition values / stats / bytes) — the
    * shared back half of every snapshot-producing write.
    */
  private def writeDataFiles(aligned0: DataFrame,
      outDir: Path): Seq[DataFileMeta] = {
    // a frame whose OPTIMIZED plan is a LocalRelation (rows already on
    // the driver, every expression folded) writes its one file on the
    // DRIVER — no Spark job, no FileFormatWriter/commit-protocol
    // round-trip (~100 ms of the ~130 ms a tiny publication costs).
    // Only for unpartitioned, uncustered, default-option writes — the
    // incremental-MV/marker publication shape; anything else keeps the
    // full distributed path.
    if (md.currentSpec.fields.isEmpty &&
        !md.properties.contains("write.sort-order") &&
        !md.properties.keys.exists(_.startsWith("write.option.")) &&
        !sys.props.contains("graft.write.nolocal") &&
        LakeTable.isLocalPlan(aligned0)) {
      // the isLocalPlan pre-check keeps the extra optimizer pass off
      // scan-derived writes — only an all-LocalRelation plan can fold
      aligned0.queryExecution.optimizedPlan match {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          return writeLocalDataFile(aligned0, lr.data, outDir)
        case _ => ()
      }
    }
    // a LocalRelation source is bounded by construction (rows already
    // collected on the driver) — publish as ONE file: LocalTableScan
    // otherwise parallelizes to leafNodeDefaultParallelism slices
    // (= cores), and N tiny files' footer/stats/manifest cost
    // dominates the commit (the incremental-MV publication path)
    val aligned = if (LakeTable.isLocalPlan(aligned0))
      aligned0.coalesce(1) else aligned0
    val schema = md.currentSchema
    val spec = md.currentSpec
    val pCols = spec.fields.map { f =>
      val (srcName, srcField) = FieldIds.flatten(schema)
        .collectFirst { case (p, fd) if FieldIds.idOf(fd) == f.sourceFieldId => (p, fd) }
        .getOrElse(throw new IllegalStateException(
          s"spec source field ${f.sourceFieldId} not in schema"))
      (s"_p_${f.name}",
        Transforms.expr(f.transform, col(srcName), Some(srcField.dataType)))
    }
    val withP0 = pCols.foldLeft(aligned) { case (d, (n, e)) => d.withColumn(n, e) }
    // hash-distribute rows by the partition values before writing
    // (Iceberg's write.distribution-mode=hash default): each partition
    // value lands in ONE task, so a partitioned append produces one
    // file per partition dir instead of one per (task × dir) — commit
    // time footer reads, metadata size, and later scan planning all
    // scale with partitions, not parallelism. Skipped when a
    // write.sort-order takes its own range-partition path; opt out
    // with write.distribution-mode=none (e.g. one giant hot partition).
    val withP =
      if (pCols.isEmpty || md.properties.contains("write.sort-order") ||
          md.properties.get("write.distribution-mode").contains("none"))
        withP0
      else withP0.repartition(pCols.map(p => col(s"`${p._1}`")): _*)
    // write clustering ("write.sort-order" table property): either a
    // comma-separated column list (lexicographic sort) or
    // "zorder(a,b,…)" (Morton-curve interleave — narrow min/max ranges
    // on EVERY listed column, so predicates on any dimension prune
    // files). Range-partition + sort so each file covers a narrow
    // range — this is what makes stats pruning bite at 100 TB.
    // "write.sort-buckets" pins the range-partition count (else the
    // session default + AQE coalescing decide).
    // plain-column sort orders are recorded per file (field IDs) so the
    // scan can report per-partition ordering; zorder clusters without
    // producing a source-column ordering, so it records nothing
    var plainSortCols: Seq[String] = Seq.empty
    val clustered = md.properties.get("write.sort-order") match {
      case None => withP
      case Some(spec) =>
        val zorderRe = """(?i)zorder\s*\(([^)]*)\)""".r
        val sortExprs = spec.trim match {
          case zorderRe(colSpec)
              if colSpec.split(",").count(_.trim.nonEmpty) >= 2 =>
            // z-order needs each column scaled to its batch min/max
            // (raw 64-bit interleave would collapse — see ZOrderValue):
            // one cheap columnar min/max pass over the batch, then bin
            // to 2^(63/n) buckets and interleave
            val cols = colSpec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val bits = 63 / cols.size
            val bins = BigDecimal(1L << bits)
            val statsRow = withP.select(cols.flatMap(c => Seq(
              min(col(s"`$c`").cast("double")), max(col(s"`$c`").cast("double")))): _*)
              .collect()(0)
            graft.functions.VectorFunctions.register(withP.sparkSession)
            val binned = cols.zipWithIndex.map { case (c, i) =>
              val lo = Option(statsRow.get(2 * i)).map(_.toString.toDouble).getOrElse(0.0)
              val hi = Option(statsRow.get(2 * i + 1)).map(_.toString.toDouble).getOrElse(0.0)
              val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
              least(
                floor((col(s"`$c`").cast("double") - lit(lo)) / lit(span) * lit(bins.toDouble)),
                lit(bins.toDouble - 1)).cast("long")
            }
            Seq(graft.functions.VectorFunctions.zorder(binned: _*))
          case other =>
            // single-column zorder(c) degenerates to a plain sort on c
            // (and 63/1 bits would overflow the bin count); zorder()
            // with no columns means no clustering
            val plain = other match {
              case zorderRe(colSpec) => colSpec
              case p => p
            }
            val cols = plain.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            plainSortCols = cols
            cols.map(c => col(s"`$c`"))
        }
        if (sortExprs.isEmpty) withP
        else {
          // prefix the partition-dir columns: FileFormatWriter requires
          // rows ordered by partition columns for dynamic-partition
          // writes and would otherwise insert its own (unstable) sort,
          // destroying the within-file order this clustering (and the
          // recorded sortedByIds) promises. With the prefix, the
          // writer's requirement is already satisfied and each file —
          // where the partition value is constant — is truly sorted by
          // the declared order.
          val dirSort = pCols.map(p => col(s"`${p._1}`"))
          val ranged = md.properties.get("write.sort-buckets")
            .map(_.trim.toInt) match {
            case Some(n) => withP.repartitionByRange(n, sortExprs: _*)
            case None => withP.repartitionByRange(sortExprs: _*)
          }
          ranged.sortWithinPartitions(dirSort ++ sortExprs: _*)
        }
    }
    // "write.option.<k>" table properties pass through to the parquet
    // writer — e.g. write.option.parquet.bloom.filter.enabled#col=true
    // adds a bloom filter for row-group skipping on point lookups
    val writerOpts = md.properties.collect {
      case (k, v) if k.startsWith("write.option.") =>
        k.stripPrefix("write.option.") -> v
    }
    // identical for every file of this write; case-insensitive to
    // match how col(`c`) resolved the sort itself (an id that fails to
    // resolve leaves sortedByIds empty = ordering unknown)
    val sortedIds = plainSortCols.flatMap(c =>
      schema.fields.find(_.name.equalsIgnoreCase(c)).map(FieldIds.idOf))
    val recordedSortIds =
      if (sortedIds.size == plainSortCols.size) sortedIds else Seq.empty
    val writer = clustered.write.mode("overwrite").options(writerOpts)
    (if (pCols.nonEmpty) writer.partitionBy(pCols.map(_._1): _*) else writer)
      .parquet(outDir.toString)

    listParquet(outDir).map { p =>
      // parse only the segments below outDir (an ancestor dir containing
      // '=' must not be misread as a partition value) and undo Spark's
      // Hive-style %XX escaping — NOT URLDecoder, which would corrupt
      // literal '+' (e.g. 'c++', '+01:00') into a space
      val partVals = outDir.relativize(p).iterator().asScala.map(_.toString)
        .filter(_.contains("=")).map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k.stripPrefix("_p_") ->
            org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(v)
        }.toMap
      val (rows, stats) = FileStats.fromFooterWithRows(p.toString, schema)
      DataFileMeta(p.toString, md.currentSchemaId, spec.id,
        rows = rows, partitionValues = partVals,
        stats = stats,
        bytes = try Files.size(p) catch { case _: Exception => -1L },
        sortedByIds = recordedSortIds)
    } match {
      case metas => attachBlooms(aligned.sparkSession, outDir, metas,
        Some(aligned0).filter(LakeTable.isLocalPlan))
    }
  }

  /** Opt-in per-file bloom filters (`write.bloom-columns=a,b`): one
    * distributed pass over ONLY the named columns of the just-written
    * delta builds a filter per (file, column) over
    * `xxhash64(cast(col AS STRING))`, each TASK writes its own `.gbf`
    * sidecar container for the files it grouped, and each manifest
    * entry carries ~40 bytes of blob reference ([[BloomRef]]) — scan
    * planning can then drop files on point-lookup equality that
    * min/max ranges cannot prune (high-cardinality ids spread across
    * every file). Cost is O(delta rows × bloom columns) at write, zero
    * on non-bloom reads. Ineligible columns (non-integral, non-string
    * — their cast-to-string is not promotion-stable) are skipped
    * silently: skipping is always conservative.
    *
    * The container write is EXECUTOR-SIDE (the manifest supports any
    * number of containers): only the O(files × columns × 40 B) refs
    * come back to the driver, never the filter bits — a 10k-file
    * compaction with MiB-sized blobs would otherwise stage gigabytes
    * on the driver. A failed/retried task's half-written container is
    * an unreferenced orphan, cleaned like any lost data file.
    */
  private def attachBlooms(spark: SparkSession, outDir: Path,
      metas: Seq[DataFileMeta],
      source: Option[DataFrame] = None): Seq[DataFileMeta] = {
    val targets = bloomTargets()
    if (targets.isEmpty || metas.isEmpty) return metas
    // bounded local publication (ONE file from a LocalRelation — the
    // incremental-MV shape): hash the rows we already hold instead of
    // reading the file back through two Spark jobs. The projection
    // folds to a LocalRelation (ConvertToLocalRelation), so the
    // collect is driver-only; the container write is driver IO.
    source.filter(s =>
      metas.size == 1 && LakeTable.isLocalPlan(s)) match {
      case Some(s) =>
        val rows = s.select(bloomHashCols(targets.map(_._1)): _*)
          .collect()
        val blobs = targets.indices.map { i =>
          BloomFilters.serialize(BloomFilters.build(
            rows.iterator.filterNot(_.isNullAt(i))
              .map(_.getLong(i)).toArray))
        }
        Files.createDirectories(dataDir)
        val container = dataDir.resolve(
          s"blooms-${java.util.UUID.randomUUID().toString.take(12)}.gbf")
        val spans = BloomFilters.writeContainer(container, blobs)
        val refs = targets.zip(spans).map { case ((_, fid), (off, len)) =>
          BloomRef(fid, container.toString, off, len, BloomFilters.K)
        }
        return metas.map(_.copy(blooms = refs))
      case None => ()
    }
    val built = buildBloomRefs(spark, spark.read
      .parquet(outDir.toString)
      .select(col("_metadata.file_path").as("_fp") +:
        bloomHashCols(targets.map(_._1)): _*), targets)
    val refsByPath: Map[String, Seq[BloomRef]] = built.toMap
    metas.map(m => refsByPath.get(LakeTable.normalizePath(m.path))
      .map(refs => m.copy(blooms = refs)).getOrElse(m))
  }

  /** The (column name, field id) pairs `write.bloom-columns` names,
    * restricted to bloom-eligible types — shared by the write path and
    * the backfill verb.
    */
  private def bloomTargets(): Seq[(String, Int)] = {
    val schema = md.currentSchema
    md.properties
      .get("write.bloom-columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
      .flatMap(n => schema.fields.find(_.name == n)
        .filter(f => BloomFilters.eligible(f.dataType) && FieldIds.hasId(f))
        .map(f => n -> FieldIds.idOf(f)))
  }

  /** `xxhash64(cast(col AS STRING))` per bloom column, null-gated:
    * xxhash64 is non-nullable (a null input leaves the seed), so
    * without the gate every null cell would plant the constant
    * seed-hash bit in the filter.
    */
  private def bloomHashCols(names: Seq[String]): Seq[Column] =
    names.map(n =>
      when(col(s"`$n`").isNotNull,
        xxhash64(col(s"`$n`").cast("string"))).as(s"_h_$n"))

  /** The distributed bloom build over a (`_fp`, hash...) frame: group
    * rows by file, build one filter per (file, column), write one
    * `.gbf` container PER TASK executor-side, and return only the
    * ~40-byte span refs per file.
    */
  private def buildBloomRefs(spark: SparkSession, hashFrame: DataFrame,
      targets: Seq[(String, Int)]): Array[(String, Seq[BloomRef])] = {
    import spark.implicits._
    val names = targets.map(_._1)
    val fids = targets.map(_._2)
    val dataDirStr = dataDir.toString
    Files.createDirectories(dataDir)
    hashFrame
      .groupByKey(r => LakeTable.normalizePath(r.getString(0)))
      .mapGroups { (path, it) =>
        // nulls carry no bloom bit: equality can't match null, and
        // IS NULL pruning is the null-count stats' job
        val bufs = Array.fill(names.size)(
          new scala.collection.mutable.ArrayBuffer[Long]())
        it.foreach { r =>
          var i = 0
          while (i < names.size) {
            if (!r.isNullAt(i + 1)) bufs(i) += r.getLong(i + 1)
            i += 1
          }
        }
        (path, bufs.toSeq.map(b =>
          BloomFilters.serialize(BloomFilters.build(b.toArray))))
      }
      .mapPartitions { groups =>
        // one container per non-empty task: the blobs this task built
        // are written HERE and dropped; only the span refs travel
        val entries = groups.toVector
        if (entries.isEmpty) Iterator.empty
        else {
          val container = java.nio.file.Paths.get(dataDirStr).resolve(
            s"blooms-${java.util.UUID.randomUUID().toString.take(12)}.gbf")
          val spans = BloomFilters.writeContainer(container,
            entries.flatMap(_._2)).toIndexedSeq
          var idx = -1
          entries.iterator.map { case (p, blobs) =>
            (p, fids.zip(blobs).map { case (fid, _) =>
              idx += 1
              BloomRef(fid, container.toString, spans(idx)._1,
                spans(idx)._2, BloomFilters.K)
            })
          }
        }
      }.collect()
  }

  /** Backfill per-file bloom filters for LIVE files that predate
    * `write.bloom-columns` (or were registered by reference via
    * `add_files`) — without it, a migrated table never skips. One
    * distributed build pass (per-task `.gbf` containers, refs-only on
    * the driver, same as the write path), then ONE metadata-only
    * "rewrite-data" snapshot re-referencing the same data paths with
    * blooms attached: byte-move semantics, so CDC/changelog/streaming
    * readers skip it, and the explicit `seq` carry preserves data
    * sequences (equality-delete applicability) and row lineage. Rows
    * already deleted still contribute bits — conservative (a probe may
    * keep a file whose matches are all deleted, never the reverse).
    *
    * Old-schema files reconcile to the CURRENT schema before hashing
    * (renames resolve by field id, promoted types canonicalize through
    * the cast-to-string hash, added-with-DEFAULT columns hash the fill
    * value), so probes against today's names stay lossless. Returns
    * the number of files that gained filters (0 = nothing to do).
    */
  def buildBlooms(spark: SparkSession): Int = {
    val current = md.currentSchema
    val targets = bloomTargets()
    require(targets.nonEmpty,
      "build_blooms: set write.bloom-columns to bloom-eligible " +
        "(integral/string) columns first")
    val wanted = targets.map(_._2).toSet
    val missing = plannedFiles().filter(f =>
      !wanted.subsetOf(f.blooms.map(_.fieldId).toSet))
    if (missing.isEmpty) return 0
    val names = targets.map(_._1)
    // one reconciling scan group per schema version (the readFiles
    // rule): each group projects to the current schema, then hashes
    val hashFrame = missing.groupBy(_.schemaId).map { case (sid, group) =>
      val fileSchema = md.schemaById(sid)
      val clean = Reconcile.clean(fileSchema).asInstanceOf[StructType]
      spark.read.schema(clean).parquet(group.map(_.path): _*)
        .select(col("_metadata.file_path").as("_fp") +:
          Reconcile.projection(fileSchema, current): _*)
        .select(col("_fp") +: bloomHashCols(names): _*)
    }.reduce(_.unionByName(_))
    val refsByPath = buildBloomRefs(spark, hashFrame, targets).toMap
    val updated = missing.flatMap(f =>
      refsByPath.get(LakeTable.normalizePath(f.path)).map { refs =>
        // keep refs for columns outside today's target set (a column
        // later removed from write.bloom-columns keeps answering)
        f.copy(blooms =
          f.blooms.filterNot(r => wanted.contains(r.fieldId)) ++ refs)
      })
    // zero-row files produce no hash group and no refs — nothing to
    // attach, and stats already prune them
    if (updated.isEmpty) return 0
    val snapshotId = md.snapshots.map(_.id).foldLeft(0L)(math.max) + 1
    val snap = SnapshotMeta(snapshotId, updated, md.currentSchemaId,
      operation = "rewrite-data",
      removedPaths = updated.map(_.path),
      timestampMs = System.currentTimeMillis())
    commit(md.copy(snapshots = md.snapshots :+ snap))
    updated.size
  }

  /** Iceberg's `add_files` / migrate shape: register EXISTING parquet
    * files into the table BY REFERENCE — no read, no copy, no rewrite;
    * O(files) footer IO for row counts and min/max stats. The 100-TB
    * onboarding path: pointing the table at data that already exists
    * instead of re-ingesting it.
    *
    * External files carry no graft field ids, so reads match their
    * columns by NAME against the schema current at registration: every
    * file column that shares a name with a current column must match
    * its type EXACTLY (both readers pin the registered schema; a
    * mismatched physical type would fail row-by-row later — refuse at
    * registration instead). Current-schema columns absent from a file
    * read as null/initial-default via the normal reconciliation; extra
    * file columns are ignored. Later renames/evolutions work like any
    * other old-schema file (the registered schema version keeps the
    * names the files were matched under). Unpartitioned specs only —
    * external files carry no partition values. The files are
    * REFERENCED, not owned: compaction rewrites them into owned files,
    * and the orphan sweep (table-dir-scoped) never touches them.
    */
  def addFiles(spark: SparkSession, paths: Seq[String],
      partitionBase: Option[String] = None): SnapshotMeta = {
    require(paths.nonEmpty, "add_files: no paths given")
    val spec = md.currentSpec
    // partitioned specs: partition values come from the files' hive
    // layout (`k=v` dir segments below `partitionBase`), exactly
    // Iceberg's add_files-from-a-Hive-table shape. Identity transforms
    // only — a hive dir carries SOURCE values, and for any other
    // transform the metadata would need the transformed ones.
    val partColOfSpecField: Seq[(String, String)] =
      if (spec.fields.isEmpty) Seq.empty
      else {
        require(partitionBase.isDefined,
          "add_files on a partitioned table: pass the hive-layout base " +
            "dir so partition values can be derived from k=v segments")
        require(spec.fields.forall(_.transform == "identity"),
          "add_files supports identity partition specs only (hive dirs " +
            s"carry source values; spec has ${spec.fields.map(f =>
              s"${f.transform}(${f.name})").mkString(", ")})")
        val flat = FieldIds.flatten(md.currentSchema)
        spec.fields.map { f =>
          val src = flat.collectFirst {
            case (p, fd) if FieldIds.idOf(fd) == f.sourceFieldId => p
          }.getOrElse(throw new IllegalStateException(
            s"spec source field ${f.sourceFieldId} not in schema"))
          f.name -> src
        }
      }
    // duplicates refused WITHIN the call too, not just against the
    // live set — registering one path twice would double-count rows
    val inCallDup = paths.map(LakeTable.normalizePath)
      .groupBy(identity).collect { case (p, ps) if ps.size > 1 => p }
    require(inCallDup.isEmpty,
      s"add_files: path(s) given more than once: ${inCallDup.mkString(", ")}")
    val live = LakeTable.liveFiles(md.snapshots)
      .map(f => LakeTable.normalizePath(f.path)).toSet
    val dup = paths.filter(p => live(LakeTable.normalizePath(p)))
    require(dup.isEmpty,
      s"add_files: already part of the live set: ${dup.mkString(", ")}")
    val cur = Reconcile.clean(md.currentSchema).asInstanceOf[StructType]
    val withVals = paths.map { p =>
      require(Files.exists(Paths.get(p)), s"add_files: no such file $p")
      val fs = spark.read.parquet(p).schema
      // match the way Spark's reader will resolve at read time: CASE-
      // INSENSITIVELY (default spark.sql.caseSensitive=false) — a
      // case-differing mismatch must not escape the registration check
      def fileField(name: String): Option[StructField] =
        fs.fields.find(_.name.equalsIgnoreCase(name))
      cur.fields.foreach { tf =>
        fileField(tf.name).foreach { ff =>
          require(ff.dataType == tf.dataType,
            s"add_files: $p column '${ff.name}' is " +
              s"${ff.dataType.simpleString}, table expects " +
              s"'${tf.name}' ${tf.dataType.simpleString} — evolve the " +
              "table or rewrite the file first")
        }
      }
      val partVals: Map[String, String] =
        if (partColOfSpecField.isEmpty) Map.empty
        else {
          // the engine's readers never re-inject dir values into rows
          // (identity-partition data files always CARRY their source
          // columns) — refuse files that dropped them, or every row
          // would silently read the column as null
          val dirVals = Paths.get(partitionBase.get).relativize(Paths.get(p))
            .iterator().asScala.map(_.toString).filter(_.contains("="))
            .map { seg =>
              val Array(k, v) = seg.split("=", 2)
              k -> org.apache.spark.sql.catalyst.catalog
                .ExternalCatalogUtils.unescapePathName(v)
            }.toMap
          partColOfSpecField.map { case (specField, srcCol) =>
            // source may be struct-nested (identity on a.b): resolve
            // through nesting, case-insensitive at the top level
            require(fileField(srcCol).isDefined ||
                LakeTable.resolveStructPath(fs, srcCol).isDefined,
              s"add_files: $p does not carry partition source column " +
                s"'$srcCol' (hive writers drop it; rewrite the file " +
                "with the column retained)")
            val v = dirVals.getOrElse(srcCol,
              throw new IllegalArgumentException(
                s"add_files: $p has no '$srcCol=' dir segment below " +
                  s"${partitionBase.get}"))
            specField -> v
          }.toMap
        }
      p -> partVals
    }
    // retryConflicts=false: a retried commit would re-append the files
    // WITHOUT re-running the duplicate-registration check (a concurrent
    // add of the same path would double-count) — surface the conflict
    // and let the caller re-invoke addFiles against the fresh head
    commitExternalFiles(withVals, md.currentSchemaId, md.currentSpecId,
      retryConflicts = false)
  }

  /** Register externally written parquet files (the DSv2 sink's and
    * row-level ops' executor-side writers) as one snapshot: row counts
    * and min/max stats come from the footers, partition values were
    * derived per row by the writer under `writtenSpecId` (captured at
    * query start — a concurrent spec evolution must not re-label
    * them), and streaming commits carry (queryId, epochId) for replay
    * idempotence.
    */
  def commitExternalFiles(paths: Seq[(String, Map[String, String])],
      writtenSchemaId: Int,
      writtenSpecId: Int,
      streamBatchId: Option[Long] = None,
      streamId: Option[String] = None,
      operation: String = "append",
      removedPaths: Seq[String] = Seq.empty,
      branch: Option[String] = None,
      retryConflicts: Boolean = true): SnapshotMeta = {
    // files carry the schema they were WRITTEN under (captured at query
    // start) — a mid-stream evolution then reconciles on read like any
    // other old-schema file instead of corrupting metadata; partition
    // values were derived executor-side by the writer
    val schema = md.schemaById(writtenSchemaId)
    val files = paths.sortBy(_._1).map { case (p, partVals) =>
      val (rows, stats) = FileStats.fromFooterWithRows(p, schema)
      DataFileMeta(p, writtenSchemaId, writtenSpecId,
        rows = rows, partitionValues = partVals,
        stats = stats,
        bytes = try Files.size(Paths.get(p)) catch { case _: Exception => -1L })
    }
    branch match {
      case Some(b) =>
        // streaming write-audit-publish: epochs stage onto the branch
        // (invisible to main) and fastForward publishes the audited
        // run. Conflicts surface — the stream retries the epoch under
        // its own idempotence bookkeeping.
        require(operation == "append" && removedPaths.isEmpty,
          s"branch streaming supports plain appends, got $operation " +
            s"with ${removedPaths.size} removals")
        // an epoch staged under an outdated schema could NEVER publish
        // (fast-forward checks schema equality) while the stream's
        // checkpoint advances past it — fail the epoch at the
        // evolution point so the loss is bounded, like the MoR branch
        // retry does
        require(writtenSchemaId == md.currentSchemaId,
          s"table evolved mid-stream (schema $writtenSchemaId -> " +
            s"${md.currentSchemaId}); restart the stream to pick up " +
            "the new schema before staging more branch epochs")
        stageBranchSnapshot(b, files, writtenSchemaId, streamBatchId,
          streamId)
      case None =>
        commitSnapshot(files, writtenSchemaId, operation, streamBatchId,
          streamId, removedPaths, retryConflicts)
    }
  }

  /** Stage one append snapshot onto a branch — next id over the shared
    * id space, the branch marker tag, and the ref head bump, in one
    * commit. The single home of the branch-staging invariant, shared
    * by `appendToBranch` and the streaming branch sink.
    */
  private def stageBranchSnapshot(name: String, files: Seq[DataFileMeta],
      schemaId: Int, streamBatchId: Option[Long] = None,
      streamId: Option[String] = None,
      operation: String = "staged-append",
      removedPaths: Seq[String] = Seq.empty): SnapshotMeta = {
    val ref = branchRef(name)
    val snapshotId = (md.snapshots ++ md.staged).map(_.id)
      .foldLeft(0L)(math.max) + 1
    val snap = SnapshotMeta(snapshotId, files, schemaId,
      operation = operation, streamBatchId = streamBatchId,
      streamId = streamId, removedPaths = removedPaths,
      timestampMs = System.currentTimeMillis(),
      wapId = Some(branchMarker(name)))
    commit(md.copy(staged = md.staged :+ snap,
      refs = md.refs + (name -> ref.copy(snapshotId = snapshotId))))
    snap
  }

  /** Register an executor-written merge-on-read delta — position-delete
    * parquets plus replacement/insert data files — as one snapshot
    * (operation "delete": replay adds the data files and accumulates
    * the deletes). The SQL WriteDelta path commits through here.
    */
  def commitExternalDelta(dataFiles: Seq[(String, Map[String, String])],
      deleteFiles: Seq[String], deleteCounts: Map[String, Long],
      writtenSchemaId: Int, writtenSpecId: Int,
      spark: Option[SparkSession] = None): Option[SnapshotMeta] = {
    if (dataFiles.isEmpty && deleteFiles.isEmpty) return None
    val schema = md.schemaById(writtenSchemaId)
    val files = dataFiles.sortBy(_._1).map { case (p, partVals) =>
      val (rows, stats) = FileStats.fromFooterWithRows(p, schema)
      DataFileMeta(p, writtenSchemaId, writtenSpecId,
        rows = rows, partitionValues = partVals,
        stats = stats,
        bytes = try Files.size(Paths.get(p)) catch { case _: Exception => -1L })
    }
    val snapshotId = md.snapshots.map(_.id).foldLeft(0L)(math.max) + 1
    // a v3 table converts the task-written positional parquet into
    // deletion vectors AT COMMIT: one distributed pass over the delta
    // (the SQL WriteDelta scan emitted live rows only, so every pair
    // is newly deleted — writeVectorContainer's merge contract). The
    // parquet stage files become unreferenced and fall to the orphan
    // sweep; deleting them eagerly here would race a concurrent
    // reader that planned against them between our write and commit.
    val vectorized: Option[(Seq[DvMeta], Map[String, Long])] =
      if (writesVectors && deleteFiles.nonEmpty) {
        val s = spark.getOrElse(throw new IllegalStateException(
          "format-version=3 delta commit needs a SparkSession to " +
            "vectorize its position deletes"))
        writeVectorContainer(s,
          s.read.parquet(deleteFiles: _*).select("file_path", "pos"),
          snapshotId)
      } else None
    val snap = vectorized match {
      case Some((dvMetas, counts)) =>
        SnapshotMeta(snapshotId, files, writtenSchemaId,
          operation = "delete", deleteCounts = counts,
          timestampMs = System.currentTimeMillis(), dvs = dvMetas)
      case None =>
        SnapshotMeta(snapshotId, files, writtenSchemaId,
          operation = "delete", deletePaths = deleteFiles.sorted,
          deleteCounts = deleteCounts.map { case (p, n) =>
            LakeTable.normalizePath(p) -> n
          }, timestampMs = System.currentTimeMillis())
    }
    commit(md.copy(snapshots = md.snapshots :+ snap))
    Some(snap)
  }

  /** Reload this handle's view of the table to the committed head —
    * the optimistic-concurrency retry primitive.
    */
  private def reload(): Unit = {
    // a reload would clobber the buffered transactional state and
    // rebuild later ops on another writer's commit — the transaction
    // must abort instead. ConcurrentModificationException, NOT an
    // IllegalState: the caller's documented contract is
    // "reload-and-retry on CME", and a mid-body conflict must hit the
    // same catch as the closing-CAS conflict so whole-transaction
    // retries work (the txn wrapper rolls the handle back first)
    if (txnActive) throw new java.util.ConcurrentModificationException(
      s"table $location was committed concurrently mid-transaction; " +
        "the transaction aborted — reload and retry the whole body")
    val v = currentHintVersion()
    md = MetadataIO.fromJson(Json.parse(
      Files.readString(metadataDir.resolve(s"v$v.json"))), metadataDir)
    loadedVersion = v
  }

  /** Plain appends are read-independent — the new files reference no
    * stale rewrite/removal decision — so a commit conflict retries
    * Iceberg-style: reload the head, re-point the already-written data
    * files at a fresh snapshot id, commit again. Correct across a
    * concurrent schema/spec evolution too (files keep their write-time
    * schemaId/specId; the read path reconciles per group), and a fresh
    * higher snapshot id keeps equality-delete sequencing right (live
    * batches never mask rows appended after them). Copy-on-write and
    * merge-on-read row-level ops do NOT retry — their rewrite sets
    * were computed against the stale snapshot — and streaming-batch
    * appends don't either (their idempotence check must re-run against
    * the new head). An abandoned version claim (vN+1 exists, pointer
    * never flipped) still surfaces after the bounded retries.
    */
  private def commitSnapshot(files: Seq[DataFileMeta], schemaId: Int,
      operation: String, streamBatchId: Option[Long],
      streamId: Option[String],
      removedPaths: Seq[String] = Seq.empty,
      retryConflicts: Boolean = true): SnapshotMeta = {
    val retriable = retryConflicts && operation == "append" &&
      removedPaths.isEmpty && streamBatchId.isEmpty
    retryingCommit(retriable,
      build = snapshotId => SnapshotMeta(snapshotId, files, schemaId,
        operation, streamBatchId, streamId, removedPaths,
        timestampMs = System.currentTimeMillis()),
      apply = snap => md.copy(snapshots = md.snapshots :+ snap))
  }

  private def listParquet(dir: Path): Seq[Path] =
    scala.util.Using.resource(Files.walk(dir)) { st =>
      st.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq.sortBy(_.toString)
    }

  // ---- partition-spec evolution (SQL surface) --------------------------

  /** Current spec rendered back to PartitionDefs (source field ids →
    * schema paths) — the editable form `ALTER TABLE ... ADD/DROP
    * PARTITION FIELD` manipulates.
    */
  private def currentPartitionDefs: Seq[PartitionDef] = {
    val flat = FieldIds.flatten(md.currentSchema)
    md.currentSpec.fields.map { f =>
      val path = flat.collectFirst {
        case (p, sf) if FieldIds.hasId(sf) &&
          FieldIds.idOf(sf) == f.sourceFieldId => p
      }.getOrElse(throw new IllegalStateException(
        s"spec source field ${f.sourceFieldId} not in current schema"))
      PartitionDef(path, f.transform, f.name)
    }
  }

  /** `ALTER TABLE ... ADD PARTITION FIELD <transform> [AS name]`:
    * append one derived field and commit a new spec version — the same
    * multi-spec semantics as the table-def path (reference
    * `iceberg_helper.py:364-378`): old files keep their old spec id
    * (reads prune conservatively across specs), new writes partition
    * by the extended spec. Auto-names follow Iceberg's convention
    * (`ts_day`, `id_bucket`, `id_trunc`; identity keeps the column
    * name).
    */
  def addPartitionField(column: String, transform: String,
      name: Option[String] = None): Seq[String] = {
    require(Transforms.isSupported(transform),
      s"unsupported partition transform '$transform' (identity/year/" +
        "month/day/hour/bucket[N]/truncate[W])")
    val base = column.replace('.', '_')
    val auto =
      if (transform == "identity") base
      else if (Transforms.bucketCount(transform).isDefined) s"${base}_bucket"
      else if (Transforms.truncateWidth(transform).isDefined) s"${base}_trunc"
      else s"${base}_$transform"
    val n = name.getOrElse(auto)
    val defs = currentPartitionDefs
    require(!defs.exists(_.name == n),
      s"partition field '$n' already exists")
    require(!defs.exists(d => d.column == column && d.transform == transform),
      s"partition field $transform($column) already exists as " +
        defs.find(d => d.column == column && d.transform == transform)
          .get.name)
    evolveSpecTo(defs :+ PartitionDef(column, transform, n))
  }

  /** `ALTER TABLE ... DROP PARTITION FIELD` by field name. */
  def dropPartitionField(name: String): Seq[String] = {
    val defs = currentPartitionDefs
    require(defs.exists(_.name == name),
      s"no partition field '$name' (have " +
        s"${defs.map(_.name).mkString(", ")})")
    evolveSpecTo(defs.filterNot(_.name == name))
  }

  /** `ALTER TABLE ... DROP PARTITION FIELD <transform>(<col>)`. */
  def dropPartitionField(column: String, transform: String): Seq[String] = {
    val defs = currentPartitionDefs
    require(defs.exists(d => d.column == column && d.transform == transform),
      s"no partition field $transform($column) (have " +
        defs.map(d => s"${d.transform}(${d.column})").mkString(", ") + ")")
    evolveSpecTo(defs.filterNot(d =>
      d.column == column && d.transform == transform))
  }

  private def evolveSpecTo(defs: Seq[PartitionDef]): Seq[String] = {
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val newFields = LakeTable.buildSpecFields(defs, md.currentSchema)
    if (newFields.map(f => (f.sourceFieldId, f.transform, f.name)) ==
        md.currentSpec.fields.map(f => (f.sourceFieldId, f.transform, f.name)))
      return Seq("No partition-spec changes detected")
    val newSpecId = md.specs.map(_.id).max + 1
    commit(md.copy(
      specs = md.specs :+ PartitionSpecMeta(newSpecId, newFields),
      currentSpecId = newSpecId))
    Seq(s"Updated partition spec to [${newFields.map(f =>
      s"${f.transform}(src=${f.sourceFieldId}) as ${f.name}").mkString(", ")}]")
  }

  // ---- read ------------------------------------------------------------

  /** Unified read across every snapshot and schema version: files are
    * grouped by the schema they were written under, each group gets one
    * field-ID reconciling projection to the current schema, groups are
    * unioned (SURVEY.md §4.3).
    *
    * `prune`: partition-field name → allowed values. A file is skipped
    * only when its own spec recorded that field with a non-matching
    * value — files from specs without the field are conservatively kept
    * (multi-spec correctness, SURVEY.md §7.2). `statsFilters` further
    * drops files by min/max column statistics.
    *
    * Incremental scan (Iceberg-style CDC read): rows appended by
    * snapshots in (fromSnapshot, toSnapshot], reconciled to the current
    * schema. Rewrite (compaction) snapshots are skipped — they move
    * bytes, not data — so incremental consumers never see reprocessed
    * rows.
    */
  /** Latest snapshot committed at or before `epochMs` (TIMESTAMP AS OF
    * resolution). Snapshots without a recorded time (pre-upgrade
    * metadata) are never matched by time travel.
    */
  def snapshotAsOfTime(epochMs: Long): Option[Long] = {
    val hits = md.snapshots.filter(s =>
      s.timestampMs >= 0 && s.timestampMs <= epochMs)
    if (hits.isEmpty) None else Some(hits.maxBy(s => (s.timestampMs, s.id)).id)
  }

  def changesBetween(spark: SparkSession, fromSnapshot: Long,
      toSnapshot: Long): DataFrame = {
    val current = md.currentSchema
    val files = md.snapshots
      .filter(s => s.id > fromSnapshot && s.id <= toSnapshot &&
        (s.operation == "append" || s.operation == "upsert"))
      .flatMap(_.files)
    readFiles(spark, files, current)
  }

  /** Changelog scan with delete markers (Iceberg's
    * `create_changelog_view` shape): every row added or removed by
    * snapshots in (fromSnapshot, toSnapshot], tagged with
    * `_change_type` ("insert" | "delete"), `_change_ordinal` (dense
    * commit order within the range) and `_change_snapshot_id`. Unlike
    * `changesBetween` (added rows only), a mirror can replay a history
    * containing plain MoR deletes: apply each ordinal's deletes, then
    * its inserts (an upsert's own rows must survive its own key batch,
    * mirroring sequence-number semantics).
    *
    * Marker content: positional deletes emit the FULL deleted rows
    * (the delete files pin (file, pos); the rows are read back from
    * the data files — O(affected files)); equality-delete batches emit
    * the KEY columns (nested keys materialize their enclosing struct
    * path) with every other column null — the batch never knew the
    * victim rows, only their keys, and re-deriving them would need the
    * pre-image of the whole table.
    *
    * Rewrites move bytes, not data — skipped, no ordinal consumed.
    * Copy-on-write commits (overwrite/replace) carry no row-level
    * change information (removed paths were REWRITTEN, with survivors,
    * into new files) and are refused.
    */
  def changelogBetween(spark: SparkSession, fromSnapshot: Long,
      toSnapshot: Long, includeCowDiffs: Boolean = false,
      includeReplaceDiffs: Boolean = false): DataFrame = {
    val current = md.currentSchema
    val clean = Reconcile.clean(current).asInstanceOf[StructType]
    val range = md.snapshots
      .filter(s => s.id > fromSnapshot && s.id <= toSnapshot)
    // a copy-on-write "overwrite" records which FILES it replaced, not
    // which rows changed — by default that refuses (Iceberg's changelog
    // has the same limitation). includeCowDiffs opts into COMPUTING the
    // row delta: removed-files-as-visible-before minus new files =
    // deletes, the reverse = inserts (multiset exceptAll, so kept rows
    // cancel exactly). Cost is O(rewritten bytes) for those snapshots —
    // proportional to what the CoW itself already rewrote, never the
    // table. Full-content "replace" (INSERT OVERWRITE / RTAS) refuses
    // by default too — it resets the replay rather than changing
    // identifiable rows; includeReplaceDiffs opts into the SAME
    // computed diff over the whole before/after states (multiset
    // exceptAll — kept rows cancel), at O(replaced bytes): the content
    // the replace itself rewrote, which IS the whole table at that
    // point.
    val allowed = Set("append", "upsert", "delete") ++
      (if (includeCowDiffs) Set("overwrite") else Set.empty) ++
      (if (includeReplaceDiffs) Set("replace") else Set.empty)
    val bad = range.filterNot(s =>
      allowed.contains(s.operation) || LakeTable.isByteMove(s.operation))
    require(bad.isEmpty,
      s"changelog cannot represent snapshot(s) " +
        bad.map(s => s"${s.id}(${s.operation})").mkString(", ") +
        (if (bad.exists(_.operation == "replace"))
          ": full-content replaces reset the replay (pass " +
            "includeReplaceDiffs=true to compute the before/after row " +
            "diff at O(replaced bytes) cost)"
        else ": copy-on-write commits carry no row-level change " +
          "information (pass includeCowDiffs=true to compute the row " +
          "delta at O(rewritten bytes) cost)"))
    // map-typed columns can't join a multiset except directly —
    // cowDiff normalizes them to key-sorted entry arrays for the diff
    // and rebuilds the map shape after, so any schema participates

    def tagged(df: DataFrame, typ: String, ord: Int, sid: Long): DataFrame =
      df.withColumn("_change_type", lit(typ))
        .withColumn("_change_ordinal", lit(ord))
        .withColumn("_change_snapshot_id", lit(sid))

    // equality markers: key columns (possibly struct-nested) filled
    // from the batch's k<id> columns, everything else null
    def eqMarkers(b: EqDeleteMeta): DataFrame = {
      val keyIds = b.fieldIds.toSet
      def hasKey(f: StructField): Boolean =
        FieldIds.flatten(StructType(Seq(f))).exists { case (_, sf) =>
          FieldIds.hasId(sf) && keyIds.contains(FieldIds.idOf(sf)) }
      def build(f: StructField): Column = f.dataType match {
        case st: StructType if hasKey(f) =>
          struct(st.fields.toSeq.map(c => build(c).as(c.name)): _*)
        case dt =>
          if (FieldIds.hasId(f) && keyIds.contains(FieldIds.idOf(f)))
            col(s"k${FieldIds.idOf(f)}").cast(dt)
          else lit(null).cast(dt)
      }
      // per-batch read: key files on either side of a type promotion
      // have heterogeneous physical types (same rule as readFiles);
      // inline-keyed batches resolve as LocalRelations, zero IO
      LakeTable.eqBatchFrame(spark, b)
        .select(current.fields.toSeq.map(f => build(f).as(f.name)): _*)
    }

    // positional markers: read the affected data files' rows at the
    // deleted positions — full row content, reconciled to the current
    // schema. O(files actually touched by the delete).
    def posMarkers(sn: SnapshotMeta): DataFrame = {
      val affected = sn.deleteCounts.keySet
      val byPath = md.snapshots.filter(_.id <= sn.id).flatMap(_.files)
        .map(f => LakeTable.normalizePath(f.path) -> f).toMap
      // an affected data file no longer listed by any snapshot <= sn
      // (expired/squashed history) means the deleted ROWS cannot be
      // read back — a silent drop would emit a changelog missing
      // retractions, and an empty group would die later in an opaque
      // reduce; name the problem instead
      val missing = affected.filterNot(byPath.contains)
      require(missing.isEmpty,
        s"changelog: snapshot ${sn.id}'s position deletes reference " +
          s"data file(s) no longer in history (expired?): " +
          missing.toSeq.sorted.mkString(", "))
      val metas = affected.toSeq.sorted.flatMap(byPath.get)
      // vector commits: the container's DELTA blob holds exactly the
      // positions this snapshot deleted — a per-row bitmap probe
      // (kept = deleted) replaces the semi-join entirely
      val dvDeltaRefs = sn.dvs.map(d =>
        LakeTable.normalizePath(d.dataPath) ->
          ((d.dvPath, d.deltaOffset, d.deltaLength))).toMap
      lazy val del = spark.read.parquet(sn.deletePaths: _*)
        .select(col("file_path").as("_graft_dfile"),
          col("pos").as("_graft_dpos"))
      metas.groupBy(_.schemaId).map { case (schemaId, group) =>
        val fileSchema = md.schemaById(schemaId)
        val scan = spark.read
          .schema(Reconcile.clean(fileSchema).asInstanceOf[StructType])
          .parquet(group.map(_.path): _*)
        val marked =
          if (dvDeltaRefs.nonEmpty)
            scan.filter(LakeTable.dvDeletedCol(spark,
              col("_metadata.file_path"), col("_metadata.row_index"),
              dvDeltaRefs))
          else scan
            .withColumn("_graft_dfile",
              LakeTable.normalizeUdf(col("_metadata.file_path")))
            .withColumn("_graft_dpos", col("_metadata.row_index"))
            .join(del, Seq("_graft_dfile", "_graft_dpos"), "left_semi")
        marked.select(Reconcile.projection(fileSchema, current): _*)
      }.reduce(_.unionByName(_))
    }

    // the row delta of one CoW overwrite: rows of the replaced files AS
    // VISIBLE just before it (their accumulated position deletes still
    // applied — CoW verbs refuse while equality batches are live, so
    // positional state is the only kind that can exist) diffed against
    // the rewritten output. Kept rows cancel in the multiset except;
    // only genuinely deleted/changed rows surface.
    def cowDiff(sn: SnapshotMeta): (DataFrame, DataFrame) = {
      val byPath = md.snapshots.filter(_.id < sn.id).flatMap(_.files)
        .map(f => LakeTable.normalizePath(f.path) -> f).toMap
      val removedMetas = sn.removedPaths.map(LakeTable.normalizePath).map(p =>
        byPath.getOrElse(p, throw new IllegalStateException(
          s"changelog: overwrite ${sn.id} replaced $p, which no " +
            s"snapshot < ${sn.id} lists (expired history?)")))
      val before = readFiles(spark, removedMetas, current,
        LakeTable.liveDeletes(md.snapshots.filter(_.id < sn.id)))
      val after = readFiles(spark, sn.files, current)
      if (!current.fields.exists(f => LakeTable.hasMapType(f.dataType)))
        (before.exceptAll(after), after.exceptAll(before))
      else {
        // maps → key-sorted entry arrays for the diff (orderable,
        // entry-order-insensitive), back to maps after — the diff
        // semantics stay full-row multiset equality
        def norm(df: DataFrame) = df.select(current.fields.toSeq.map(f =>
          LakeTable.mapNormExpr(col(s"`${f.name}`"), f.dataType)
            .as(f.name)): _*)
        def denorm(df: DataFrame) = df.select(current.fields.toSeq.map(f =>
          LakeTable.mapDenormExpr(col(s"`${f.name}`"), f.dataType)
            .as(f.name)): _*)
        val nb = norm(before)
        val na = norm(after)
        (denorm(nb.exceptAll(na)), denorm(na.exceptAll(nb)))
      }
    }

    // the row delta of one full-content replace: the WHOLE table as
    // visible at the preceding snapshot (every live delete applied —
    // read-at-snapshot handles positional, vector, and equality state
    // alike) diffed against the replace's own file set. Kept rows
    // cancel in the multiset except — a replace that re-writes 99% of
    // the table unchanged emits only the 1% that moved.
    def replaceDiff(sn: SnapshotMeta): (DataFrame, DataFrame) = {
      val prev = md.snapshots.filter(_.id < sn.id).map(_.id)
        .reduceOption(_ max _)
      val before = prev match {
        case Some(p) => read(spark, asOfSnapshot = Some(p))
        case None => spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          clean)
      }
      val after = readFiles(spark, sn.files, current)
      if (!current.fields.exists(f => LakeTable.hasMapType(f.dataType)))
        (before.exceptAll(after), after.exceptAll(before))
      else {
        def norm(df: DataFrame) = df.select(current.fields.toSeq.map(f =>
          LakeTable.mapNormExpr(col(s"`${f.name}`"), f.dataType)
            .as(f.name)): _*)
        def denorm(df: DataFrame) = df.select(current.fields.toSeq.map(f =>
          LakeTable.mapDenormExpr(col(s"`${f.name}`"), f.dataType)
            .as(f.name)): _*)
        val nb = norm(before)
        val na = norm(after)
        (denorm(nb.exceptAll(na)), denorm(na.exceptAll(nb)))
      }
    }

    val parts = range.sortBy(_.id)
      .filterNot(s => LakeTable.isByteMove(s.operation))
      .zipWithIndex.flatMap { case (sn, ord) =>
        if (sn.operation == "replace") {
          // reachable only under includeReplaceDiffs (require above)
          val (delRows, insRows) = replaceDiff(sn)
          Seq(tagged(delRows, "delete", ord, sn.id),
            tagged(insRows, "insert", ord, sn.id))
        } else if (sn.operation == "overwrite") {
          // reachable only under includeCowDiffs (the require above)
          val (delRows, insRows) = cowDiff(sn)
          Seq(tagged(delRows, "delete", ord, sn.id),
            tagged(insRows, "insert", ord, sn.id))
        } else {
          val dels =
            (if (sn.deletePaths.nonEmpty || sn.dvs.nonEmpty)
              Seq(posMarkers(sn)) else Seq.empty) ++
              sn.eqDeletes.map(eqMarkers)
          val ins =
            if (sn.files.nonEmpty) Seq(readFiles(spark, sn.files, current))
            else Seq.empty
          dels.map(tagged(_, "delete", ord, sn.id)) ++
            ins.map(tagged(_, "insert", ord, sn.id))
        }
      }
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        // data columns nullable: marker rows null-fill non-key columns
        StructType(clean.fields.toSeq.map(_.copy(nullable = true)) ++ Seq(
          StructField("_change_type", StringType, nullable = false),
          StructField("_change_ordinal", IntegerType, nullable = false),
          StructField("_change_snapshot_id", LongType, nullable = false))))
    else parts.reduce(_.unionByName(_))
  }

  /** `identifierCols` resolved: explicit → as given; empty → the
    * table's declared identifier fields; neither → loud failure.
    */
  private def changelogIdentity(identifierCols: Seq[String],
      op: String): Seq[String] = {
    val ident =
      if (identifierCols.nonEmpty) identifierCols else identifierFieldNames
    require(ident.nonEmpty,
      s"$op needs identifier columns — pass them explicitly or declare " +
        "the 'identifier-fields' table property")
    ident
  }

  /** Changelog with UPDATE pairing (Iceberg's `create_changelog_view
    * (compute_updates => true)`): within one change ordinal, a delete
    * and an insert sharing the row identity are re-tagged
    * "update_before" / "update_after". Multiplicity is paired off by
    * rank — k deletes and m inserts of one identity yield min(k,m)
    * update pairs, the remainder keep their original type. The pairing
    * is one window over (ordinal, identity) — shuffle by fine-grained
    * keys, no global sort, so it scales with the changed rows, not the
    * table. Equality-delete markers carry only key columns, so an
    * update_before row sourced from one has its non-key columns null
    * (the batch never knew the victim row — documented limitation).
    */
  def changelogWithUpdates(spark: SparkSession, fromSnapshot: Long,
      toSnapshot: Long, identifierCols: Seq[String] = Seq.empty): DataFrame =
    changelogWithUpdates(
      changelogBetween(spark, fromSnapshot, toSnapshot), identifierCols)

  /** Same pairing over a PRECOMPUTED changelog frame: a caller that
    * needs several derived views of ONE range (updates + net + a
    * replay) computes `changelogBetween` once — localCheckpoint it —
    * and feeds it to each, instead of paying the per-ordinal marker
    * reads again per view.
    */
  def changelogWithUpdates(log: DataFrame,
      identifierCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ident = changelogIdentity(identifierCols, "changelogWithUpdates")
    // rank order must be deterministic AND orderable: maps (anywhere in
    // the type) cannot sort in Spark, so restrict to orderable data
    // columns — the identity columns are always orderable scalars, so
    // the order-by list can never be empty
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: StructType => s.fields.forall(f => orderable(f.dataType))
        case org.apache.spark.sql.types.ArrayType(e, _) => orderable(e)
        case _ => true
      }
    val dataCols = log.schema.fields
      .filterNot(f => f.name.startsWith("_change_"))
      .filter(f => orderable(f.dataType)).map(_.name).toSeq
    val grp = col("_change_ordinal") +: ident.map(c => col(s"`$c`"))
    val w = Window.partitionBy(grp: _*)
    // rank within (ordinal, identity, type), deterministic via the
    // orderable data columns; delete rank r pairs with insert rank r
    val wTyped = Window.partitionBy((grp :+ col("_change_type")): _*)
      .orderBy(dataCols.map(c => col(s"`$c`")): _*)
    val isIns = when(col("_change_type") === "insert", 1).otherwise(0)
    log
      .withColumn("_n_ins", sum(isIns).over(w))
      .withColumn("_n_del", sum(lit(1) - isIns).over(w))
      .withColumn("_rn", row_number().over(wTyped))
      .withColumn("_change_type",
        when(col("_rn") <= least(col("_n_ins"), col("_n_del")),
          when(col("_change_type") === "delete", "update_before")
            .otherwise("update_after"))
          .otherwise(col("_change_type")))
      .drop("_n_ins", "_n_del", "_rn")
  }

  /** Net changes over the range (Iceberg's `create_changelog_view
    * (net_changes => true)`): collapse each identity's change chain to
    * its net effect. Whether the identity existed BEFORE the range is
    * read off its first event (a delete ⇒ it existed), whether it
    * exists AFTER off its last (an insert ⇒ it does); event order is
    * (ordinal, deletes-before-inserts), mirroring replay order.
    *   existed → exists : first delete + last insert survive
    *   absent  → exists : last insert survives ("insert")
    *   existed → absent : first delete survives ("delete")
    *   absent  → absent : nothing (born and died inside the range)
    * One window over the identity — same scaling argument as updates.
    *
    * Blind-upsert caveat: an upsert's key batch emits a delete marker
    * without knowing whether the key existed, so an identity BORN by a
    * blind upsert reads as "existed" here — it nets to an update pair
    * (if it survives) or an idempotent delete (if killed in-range)
    * instead of a plain insert / nothing. Both stay correct as REPLAY
    * instructions (delete-then-insert ≡ insert on a mirror; deleting an
    * absent key is a no-op); only the labels are conservative.
    */
  def changelogNet(spark: SparkSession, fromSnapshot: Long,
      toSnapshot: Long, identifierCols: Seq[String] = Seq.empty): DataFrame =
    changelogNet(
      changelogBetween(spark, fromSnapshot, toSnapshot), identifierCols)

  /** Net changes over a PRECOMPUTED changelog frame (see the
    * `changelogWithUpdates` log overload for when to use this). */
  def changelogNet(log: DataFrame,
      identifierCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ident = changelogIdentity(identifierCols, "changelogNet")
    val w = Window.partitionBy(ident.map(c => col(s"`$c`")): _*)
    // event key: ordinal * 2 + (1 if insert) — deletes replay first
    val key = col("_change_ordinal") * 2 +
      when(col("_change_type") === "insert", 1).otherwise(0)
    log
      .withColumn("_k", key)
      .withColumn("_kmin", min(col("_k")).over(w))
      .withColumn("_kmax", max(col("_k")).over(w))
      .withColumn("_pre", col("_kmin") % 2 === 0)
      .withColumn("_post", col("_kmax") % 2 === 1)
      .filter(
        (col("_pre") && col("_post") &&
          (col("_k") === col("_kmin") || col("_k") === col("_kmax"))) ||
        (!col("_pre") && col("_post") && col("_k") === col("_kmax")) ||
        (col("_pre") && !col("_post") && col("_k") === col("_kmin")))
      .withColumn("_change_type",
        when(col("_pre") && col("_post"),
          when(col("_change_type") === "delete", "update_before")
            .otherwise("update_after"))
          .otherwise(col("_change_type")))
      .drop("_k", "_kmin", "_kmax", "_pre", "_post")
  }

  def read(spark: SparkSession,
      prune: Map[String, Set[String]] = Map.empty,
      asOfSnapshot: Option[Long] = None,
      statsFilters: Seq[RangeFilter] = Seq.empty): DataFrame = {
    // time travel: restrict to snapshots <= asOf and reconcile to the
    // schema that was current when that snapshot committed
    val visible = asOfSnapshot match {
      case Some(sid) =>
        require(md.snapshots.exists(_.id == sid), s"no snapshot $sid")
        md.snapshots.filter(_.id <= sid)
      case None => md.snapshots
    }
    val current = asOfSnapshot match {
      case Some(sid) => md.schemaById(visible.find(_.id == sid).get.schemaId)
      case None => md.currentSchema
    }
    readFiles(spark,
      LakeTable.matchingFiles(
        LakeTable.liveFiles(visible, prune, current, statsFilters),
        current, prune, statsFilters, md.schemaOpt),
      current, LakeTable.liveDeletes(visible),
      LakeTable.liveEqDeletes(visible))
  }

  /** The table with its row-lineage columns (Iceberg v3): `_row_id` —
    * a table-wide stable identity assigned at first commit and
    * PRESERVED by rewrites (compaction, copy-on-write, update copies
    * carry a materialized id column) — and
    * `_last_updated_sequence_number`, the data sequence of the commit
    * that last wrote the row. Rows written before lineage existed
    * (unstamped files) read a null `_row_id` until a rewrite
    * materializes them. Same snapshot/delete semantics as [[read]].
    *
    * Scale note: this Spark-native path ships one (path → firstRowId)
    * entry per scanned file inside the plan's lookup expression —
    * O(files) plan bytes, fine for tooling-scale reads. For a
    * full-table lineage scan at cluster scale prefer the DSv2
    * connector's `_graft_row_id`/`_graft_last_updated` metadata
    * columns, where each input partition carries ONLY its own file's
    * constants (O(1) per task, like Iceberg's per-split first_row_id).
    */
  def readLineage(spark: SparkSession,
      asOfSnapshot: Option[Long] = None): DataFrame = {
    val visible = asOfSnapshot match {
      case Some(sid) =>
        require(md.snapshots.exists(_.id == sid), s"no snapshot $sid")
        md.snapshots.filter(_.id <= sid)
      case None => md.snapshots
    }
    val current = asOfSnapshot match {
      case Some(sid) => md.schemaById(visible.find(_.id == sid).get.schemaId)
      case None => md.currentSchema
    }
    readFiles(spark,
      LakeTable.liveFiles(visible, Map.empty, current),
      current, LakeTable.liveDeletes(visible),
      LakeTable.liveEqDeletes(visible), lineage = true)
  }

  /** Live files surviving partition + stats pruning under the current
    * schema — the scan-planning primitive, exposed for tooling/tests.
    */
  def plannedFiles(prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty,
      asOfSnapshot: Option[Long] = None): Seq[DataFileMeta] = {
    val visible = asOfSnapshot match {
      case Some(sid) =>
        require(md.snapshots.exists(_.id == sid), s"no snapshot $sid")
        md.snapshots.filter(_.id <= sid)
      case None => md.snapshots
    }
    val current = asOfSnapshot match {
      case Some(sid) => md.schemaById(visible.find(_.id == sid).get.schemaId)
      case None => md.currentSchema
    }
    LakeTable.matchingFiles(
      LakeTable.liveFiles(visible, prune, current, statsFilters),
      current, prune, statsFilters, md.schemaOpt)
  }

  /** One reconciling scan group per schema version, unioned; rows at
    * positions marked by live merge-on-read delete files are dropped
    * via an anti-join on (file URI, row position) — `_metadata` columns
    * on the read side match the values captured at delete-write time,
    * and the (small) delete set broadcasts.
    */
  private def readFiles(spark: SparkSession, files: Seq[DataFileMeta],
      target: StructType,
      deletes: Map[String, DeleteSet] = Map.empty,
      eqDeletes: Seq[EqDeleteMeta] = Seq.empty,
      lineage: Boolean = false): DataFrame = {
    if (files.isEmpty) {
      val clean = Reconcile.clean(target).asInstanceOf[StructType]
      val out = if (!lineage) clean else StructType(clean.fields ++
        LakeTable.lineageFields)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], out)
    }
    // equality-delete applicability is per file sequence: batch seq >
    // file seq. Batches sorted by seq → a file's applicable set is a
    // suffix, so grouping by (schema, suffix start) keeps the plan
    // bounded by schemas × batches, never file count.
    val batches = eqDeletes.sortBy(_.seq)
    def suffixIdx(fseq: Long): Int = {
      val i = batches.indexWhere(_.seq > fseq)
      if (i < 0) batches.size else i
    }
    // lineage reads additionally split groups on the materialized-
    // column flag: rewritten files physically carry _graft_row_id /
    // _graft_last_updated, plain appends don't, and the read schema
    // must match the file
    files.groupBy(f => (f.schemaId, suffixIdx(f.seq),
        lineage && f.lineageCols)).map {
      case ((schemaId, bIdx, withMatCols), group) =>
      val fileSchema = md.schemaById(schemaId)
      val cleanSchema = Reconcile.clean(fileSchema).asInstanceOf[StructType]
      val base = spark.read
        .schema(if (withMatCols) StructType(cleanSchema.fields ++ Seq(
            StructField("_graft_row_id", LongType),
            StructField("_graft_last_updated", LongType)))
          else cleanSchema)
        .parquet(group.map(_.path): _*)
      val groupDel = group
        .flatMap(f => deletes.get(LakeTable.normalizePath(f.path)))
      // v3 deletion vectors: a per-row bitmap probe INSIDE the scan's
      // codegen stage — no delete-file read, no anti-join, no shuffle;
      // each executor seeks the container blob once per file
      val dvRefs = groupDel.flatMap(_.dv)
        .map(d => LakeTable.normalizePath(d.dataPath) ->
          ((d.dvPath, d.offset, d.length))).toMap
      val vecAlive = if (dvRefs.isEmpty) base else
        base.filter(!LakeTable.dvDeletedCol(spark,
          col("_metadata.file_path"), col("_metadata.row_index"), dvRefs))
      val delPaths = groupDel.flatMap(_.paths).distinct
      val alive = if (delPaths.isEmpty) vecAlive else {
        // delete files store plain normalized paths; _metadata.file_path
        // is a url-encoded URI — normalize it for the join
        val del = spark.read.parquet(delPaths: _*)
          .withColumnRenamed("file_path", "_graft_dfile")
          .withColumnRenamed("pos", "_graft_dpos")
        vecAlive
          .withColumn("_graft_dfile",
            LakeTable.normalizeUdf(col("_metadata.file_path")))
          .withColumn("_graft_dpos", col("_metadata.row_index"))
          .join(del, Seq("_graft_dfile", "_graft_dpos"), "left_anti")
      }
      // row lineage (v3 inheritance rule): a row's id is its
      // materialized _graft_row_id when the file carries one and the
      // cell is non-null, else firstRowId + row_position; the
      // last-updated sequence inherits the file's data sequence the
      // same way. Both file constants resolve through a codegen'd
      // path-keyed lookup — no join, stays in the scan stage.
      val lineageCols: Seq[Column] = if (!lineage) Seq.empty else {
        val firstRefs = group.collect {
          case f if f.firstRowId >= 0 =>
            LakeTable.normalizePath(f.path) -> f.firstRowId
        }.toMap
        val seqRefs = group.collect {
          case f if f.seq >= 0 => LakeTable.normalizePath(f.path) -> f.seq
        }.toMap
        val path = col("_metadata.file_path")
        val pos = col("_metadata.row_index")
        val computedId =
          LakeTable.fileConstCol(spark, path, firstRefs) + pos
        val computedSeq = LakeTable.fileConstCol(spark, path, seqRefs)
        if (withMatCols) Seq(
          coalesce(col("_graft_row_id"), computedId).as("_row_id"),
          coalesce(col("_graft_last_updated"), computedSeq)
            .as("_last_updated_sequence_number"))
        else Seq(computedId.as("_row_id"),
          computedSeq.as("_last_updated_sequence_number"))
      }
      val projected = alive.select(
        Reconcile.projection(fileSchema, target) ++ lineageCols: _*)
      // anti-join the applicable equality batches, one join per
      // distinct key-column set; keys resolve by FIELD ID against the
      // target schema (rename-proof — batches store columns as k<id>).
      // Null-safe equality: an eq-delete with a NULL key matches NULL
      // (Iceberg's delete-file semantics). The key sets are
      // upsert-batch-sized → broadcast build sides.
      batches.drop(bIdx).groupBy(_.fieldIds).foldLeft(projected) {
        case (df, (ids, bs)) =>
          // key ids resolve to (possibly struct-nested) paths in the
          // target schema; df("a.b") navigates the struct. A TOP-LEVEL
          // name is backticked so a literal dot in it is not
          // misparsed as nesting.
          val resolved = ids.map { id =>
            LakeTable.structPathOfId(target, id)
              .getOrElse(throw new IllegalStateException(
                s"equality-delete key field id $id not in current schema"))
          }
          val names = resolved.map(_._1)
          // batches written on either side of a key promotion
          // (int->long, float->double) have heterogeneous PHYSICAL
          // types, and one multi-path parquet read fails on mixed
          // INT32/INT64 files — read each batch (homogeneous by
          // construction) separately, cast its keys to the target
          // schema's key types, then union (the DSv2 reader path
          // reconciles per file the same way).
          val keyDf = bs.map { b =>
            LakeTable.eqBatchFrame(spark, b).select(
              ids.zip(resolved).map { case (id, (_, f)) =>
                col(s"k$id").cast(f.dataType).as(s"k$id")
              }: _*)
          }.reduce(_.unionByName(_))
          val cond = ids.zip(names).map { case (id, n) =>
            val c = if (target.fieldNames.contains(n)) df(s"`$n`") else df(n)
            c <=> keyDf(s"k$id")
          }.reduce(_ && _)
          df.join(keyDf, cond, "left_anti")
      }
    }.reduce(_.unionByName(_))
  }

  // ---- maintenance -----------------------------------------------------

  /** Expire snapshots with id <= `keepAfter`, keeping at least the
    * current live state readable: expired snapshots are squashed into
    * one synthetic "rewrite" snapshot holding the live file set AS OF
    * the newest expired snapshot, so later appends/overwrites replay
    * unchanged. Time travel to expired ids stops working (that is the
    * point — bounded metadata); data files still referenced by the
    * squashed live set are kept on disk, now-unreferenced ones become
    * orphans for removeOrphanFiles. Streaming note: the squash keeps no
    * per-snapshot streamBatchId, so keep `keepAfter` older than any
    * stream checkpoint that might still replay (Iceberg's own
    * expire-vs-streaming caveat).
    */
  /** One "rewrite" snapshot representing the LIVE state of `snaps`:
    * live files with their original sequence numbers (stamped by
    * `liveFiles`), live merge-on-read position-delete state, and live
    * equality batches carried with their original sequences. Replay
    * treats a rewrite as a reset, so the result replays identically to
    * the snapshots it summarizes. Shared by the expire squash (which
    * REPLACES the prefix) and `rewriteManifests` (which APPENDS it).
    */
  private def liveStateSnapshot(snaps: Seq[SnapshotMeta], id: Long,
      schemaId: Int, timestampMs: Long): SnapshotMeta = {
    val liveDel = LakeTable.liveDeletes(snaps)
    // parquet-positional and vector delete state carry separately:
    // replay of the squash reconstructs parquet entries from
    // delete-counts and vector entries from the carried DvMeta (whose
    // cardinality IS the live deleted count — see `liveDeletes`)
    val (vectored, positional) = liveDel.partition(_._2.dv.isDefined)
    SnapshotMeta(
      id = id,
      files = LakeTable.liveFiles(snaps),
      schemaId = schemaId,
      timestampMs = timestampMs,
      operation = "rewrite",
      deletePaths = positional.values.flatMap(_.paths).toSeq.distinct,
      deleteCounts = positional.map { case (p, ds) => p -> ds.rows },
      eqDeletes = LakeTable.liveEqDeletes(snaps),
      dvs = vectored.values.flatMap(_.dv).toSeq.sortBy(_.dataPath))
  }

  /** `ALTER TABLE ... SET/UNSET TBLPROPERTIES`: merge `set` into and
    * drop `unset` from the table properties — the knobs steering
    * write clustering (write.sort-order), distribution, commit retry,
    * and metadata retention. Metadata-only commit; snapshots and
    * schemas untouched.
    */
  def updateProperties(set: Map[String, String],
      unset: Seq[String] = Seq.empty): Unit = {
    // numeric knobs validate at DDL time — a malformed value would
    // otherwise surface as a parse error on every later write
    Seq("commit.retry.num-retries", "metadata.previous-versions-max",
      "write.sort-buckets").foreach(k => set.get(k).foreach(v =>
      require(scala.util.Try(v.toInt).isSuccess,
        s"table property '$k' needs an integer value, got '$v'")))
    var next = md.copy(properties = md.properties ++ set -- unset)
    // format-version is the table's STRUCTURAL version (Iceberg's
    // upgrade flow: SET TBLPROPERTIES('format-version'='3') promotes
    // the metadata field). Monotonic — a v3 table has vectored delete
    // state a v2 reader would misread, so downgrades refuse.
    set.get("format-version").foreach { v =>
      val fv = v.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"table property 'format-version' needs an integer, got '$v'"))
      require(fv >= md.formatVersion,
        s"cannot downgrade format-version from ${md.formatVersion} to $fv")
      next = next.copy(formatVersion = fv)
    }
    require(!unset.contains("format-version"),
      "format-version is structural metadata — it cannot be unset")
    // identifier-fields is not just a string knob: the declared row
    // identity lives in metadata as resolved FIELD IDS. Re-resolve on
    // every set/unset so the SQL TBLPROPERTIES path cannot leave the
    // property and the identity silently diverged — with the same
    // live-equality-batch guard as a declared-identity evolution.
    if (set.contains("identifier-fields") ||
        unset.contains("identifier-fields")) {
      val ids = LakeTable.resolveIdentifierFields(
        next.properties.get("identifier-fields"), md.currentSchema)
      if (ids != md.identifierFieldIds) {
        require(LakeTable.liveEqDeletes(md.snapshots).isEmpty &&
            md.staged.forall(_.eqDeletes.isEmpty),
          "cannot change identifier-fields with live equality-delete " +
            "batches — run compact() to materialize them first")
        next = next.copy(identifierFieldIds = ids)
      }
    }
    commit(next)
  }

  /** ANALYZE TABLE: one scan computing, per top-level column, the
    * distinct-value count (HLL estimate by default, exact
    * COUNT(DISTINCT) with `exact = true`) and null count, committed
    * into table metadata as [[TableStatsMeta]] with snapshot
    * provenance — the DSv2 scan then serves them to Spark's
    * cost-based optimizer (`columnStats`), so lake-to-lake join plans
    * see real cardinalities. Map-typed columns are skipped (not
    * distinct-countable). Metadata-only commit; snapshots untouched.
    * Stats are a snapshot-stamped approximation: re-run after bulk
    * changes, like Iceberg's statistics files.
    */
  def analyze(spark: SparkSession, exact: Boolean = false): TableStatsMeta = {
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    def hasMap(dt: DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case org.apache.spark.sql.types.ArrayType(e, _) => hasMap(e)
      case _ => false
    }
    val cols = md.currentSchema.fields.filterNot(f => hasMap(f.dataType))
    val frame = read(spark)
    val aggs = count(lit(1)).as("_rows") +: cols.toSeq.flatMap { f =>
      val c = col(s"`${f.name}`")
      Seq(
        (if (exact) countDistinct(c) else approx_count_distinct(c))
          .as(s"_ndv_${f.name}"),
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"_nul_${f.name}"))
    }
    val row = frame.agg(aggs.head, aggs.tail: _*).collect()(0)
    val stats = TableStatsMeta(
      snapshotId = md.snapshots.map(_.id).foldLeft(0L)(math.max),
      rowCount = row.getLong(0),
      exact = exact,
      cols = cols.toSeq.zipWithIndex.map { case (f, i) =>
        ColumnStatsMeta(FieldIds.idOf(f),
          ndv = row.getLong(1 + 2 * i),
          nullCount = if (row.isNullAt(2 + 2 * i)) 0L
            else row.getLong(2 + 2 * i))
      })
    commit(md.copy(tableStats = Some(stats)))
    stats
  }

  /** `ALTER COLUMN ... SET DEFAULT v` / `DROP DEFAULT`: change (or
    * clear) a top-level column's mutable WRITE default — the value
    * future writers get when they omit the column. The initial
    * default filling pre-column history is immutable by design; this
    * never touches it, so history reads the same forever. Metadata-
    * only commit on the current schema version: files already written
    * under it carry the column physically, so nothing re-interprets.
    */
  def setWriteDefault(column: String, value: Option[String]): Unit = {
    val cur = md.currentSchema
    require(cur.fields.exists(_.name == column), s"no column '$column'")
    val updated = StructType(cur.fields.map(f =>
      if (f.name == column)
        graft.schema.Defaults.withWriteDefault(f, value)
      else f))
    commit(md.copy(schemas = md.schemas.map(sv =>
      if (sv.id == md.currentSchemaId) sv.copy(schema = updated) else sv)))
  }

  /** Metadata-only manifest compaction (Iceberg's `rewrite_manifests`):
    * append one "rewrite" snapshot carrying the current live file set
    * in a single fresh manifest. Data files are untouched and history
    * stays fully readable — time travel to older ids replays the old
    * manifests — but forward reads now replay from ONE fat manifest
    * plus later deltas instead of the whole commit trail, resetting
    * planning cost after a long run of small commits. Incremental
    * consumers (CDC, streaming) skip rewrite snapshots, so no rows
    * re-deliver. Driver cost is O(live files) to write the merged
    * manifest — the op's inherent price, same as the expire squash.
    */
  def rewriteManifests(): SnapshotMeta = {
    require(md.snapshots.nonEmpty, "no snapshots to rewrite")
    // staleness first: a no-op verdict from a stale handle would hide
    // commits made through other handles ("metadata is compact" while
    // 500 unmerged commits exist) — surface the conflict like every
    // other write verb
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    // fixpoint guard: when the head is already a rewrite there is
    // nothing to merge — an unconditional maintenance loop must not
    // append a fresh full-inventory manifest per run forever
    if (LakeTable.isReset(md.snapshots.last.operation))
      return md.snapshots.last
    val snap = liveStateSnapshot(md.snapshots,
      id = (md.snapshots ++ md.staged).map(_.id).foldLeft(0L)(math.max) + 1,
      schemaId = md.currentSchemaId,
      timestampMs = System.currentTimeMillis())
    commit(md.copy(snapshots = md.snapshots :+ snap))
    snap
  }

  /** Iceberg's `rewrite_position_delete_files`: merge the accumulated
    * position-delete parquets into ONE file — dropping tombstones of
    * data files no longer live — WITHOUT touching any data file. The
    * cheap cure for delete-file sprawl between full compactions: after
    * a run of MoR deletes every affected data file drags a list of
    * small delete files through each read; afterwards it consults one.
    * Commits a live-state "rewrite" snapshot (replay reset, byte move —
    * CDC/changelog/streaming skip it) whose deletePaths are the merged
    * file; per-file deleted-row counts carry over unchanged, so
    * metadata-only COUNT(*) stays exact. (file,pos) tuples are unique
    * across live delete files by construction — the delete write path
    * excludes already-deleted positions — so the merge is a plain
    * concatenation. None when there is nothing to merge.
    */
  def rewritePositionDeleteFiles(spark: SparkSession): Option[SnapshotMeta] = {
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val liveDel = LakeTable.liveDeletes(md.snapshots)
    // a v3 table uses this maintenance verb as its MIGRATION: every
    // live positional parquet tombstone converts to a deletion vector
    // (the representation v3 mandates), after which reads never open
    // a delete parquet again
    if (writesVectors) return convertPositionalToVectors(spark, liveDel)
    val delFiles = liveDel.values.flatMap(_.paths).toSeq.distinct
    if (delFiles.size <= 1) return None
    val newId = (md.snapshots ++ md.staged).map(_.id).foldLeft(0L)(math.max) + 1
    val dir = dataDir.resolve(
      s"posdel-$newId-${java.util.UUID.randomUUID().toString.take(8)}")
    // keep only tombstones of files still live (a CoW rewrite already
    // materialized the others); the live set is metadata-scale, shipped
    // as a broadcast semi-join, never a giant IN-list
    import spark.implicits._
    // vector-backed files need no tombstone carry — their DV is the
    // complete delete state and the squash carries it in `dvs`
    val livePaths = liveDel.collect {
      case (p, ds) if ds.dv.isEmpty => p }.toSeq.toDF("file_path")
    spark.read.parquet(delFiles: _*)
      .join(org.apache.spark.sql.functions.broadcast(livePaths),
        Seq("file_path"), "left_semi")
      .coalesce(1).write.parquet(dir.toString)
    val merged = listParquet(dir).map(_.toString)
    val snap = liveStateSnapshot(md.snapshots, newId, md.currentSchemaId,
      System.currentTimeMillis()).copy(deletePaths = merged)
    commit(md.copy(snapshots = md.snapshots :+ snap))
    Some(snap)
  }

  /** Convert every live positional-parquet delete to a deletion
    * vector in one squash commit: bitmaps build per file on the
    * executors (rows of dead data files pruned at the scan), the
    * exact per-file counts audit the conversion, and the committed
    * "rewrite" snapshot carries ONLY vectors — the already-vectored
    * files' DVs ride along unchanged. Delta blobs are empty (nothing
    * is newly deleted; this is a representation change, invisible to
    * the changelog like any rewrite).
    */
  private def convertPositionalToVectors(spark: SparkSession,
      liveDel: Map[String, DeleteSet]): Option[SnapshotMeta] = {
    import org.roaringbitmap.longlong.Roaring64Bitmap
    import spark.implicits._
    val positional = liveDel.filter(_._2.dv.isEmpty)
    if (positional.isEmpty) return None
    val delFiles = positional.values.flatMap(_.paths).toSeq.distinct
    val newId = (md.snapshots ++ md.staged).map(_.id).foldLeft(0L)(math.max) + 1
    val liveKeys = positional.keySet.toSeq
    val built: Array[(String, Array[Byte])] = spark.read
      .parquet(delFiles: _*)
      .filter(LakeTable.normalizeUdf(col("file_path")).isin(liveKeys: _*))
      .select(col("file_path").cast("string"), col("pos").cast("long"))
      .as[(String, Long)]
      .groupByKey(t => LakeTable.normalizePath(t._1))
      .mapGroups { (path, it) =>
        val bm = new Roaring64Bitmap()
        it.foreach(t => bm.addLong(t._2))
        (path, DeletionVectors.serialize(bm))
      }.collect()
    val blobs = built.toSeq.sortBy(_._1).map { case (p, bytes) =>
      val full = DeletionVectors.deserialize(bytes)
      // the exact per-file deleted-row count is tracked metadata — a
      // conversion that changes it would corrupt visible row counts
      require(full.getLongCardinality == positional(p).rows,
        s"positional→vector conversion for $p changed the deleted-row " +
          s"count: parquet holds ${full.getLongCardinality}, metadata " +
          s"says ${positional(p).rows}")
      p -> ((full, new Roaring64Bitmap()))
    }
    val dvPath = dataDir.resolve(s"deletes-$newId-" +
      java.util.UUID.randomUUID().toString.take(8) + ".gdv")
    Files.createDirectories(dataDir)
    val dvMetas = DeletionVectors.writeContainer(dvPath, blobs)
    val squash = liveStateSnapshot(md.snapshots, newId, md.currentSchemaId,
      System.currentTimeMillis())
    val snap = squash.copy(deletePaths = Seq.empty, deleteCounts = Map.empty,
      dvs = (squash.dvs ++ dvMetas).sortBy(_.dataPath))
    commit(md.copy(snapshots = md.snapshots :+ snap))
    Some(snap)
  }

  def expireSnapshots(keepAfter: Long): Int = {
    val (expired, kept) = md.snapshots.partition(_.id <= keepAfter)
    if (expired.isEmpty) return 0
    // the squash keeps the newest expired snapshot's id and commit
    // time: it represents that history point, not "now" — an
    // unstamped squash would look ancient to age-based retention
    val squashed = liveStateSnapshot(expired,
      id = expired.last.id,
      schemaId = expired.last.schemaId,
      timestampMs = expired.map(_.timestampMs).max)
    val liveIds = (squashed +: kept).map(_.id).toSet
    // refs into the squashed-away prefix would dangle (time travel to
    // those ids is gone — the point of expiry). Tags anchor at their
    // snapshotId; writable branches anchor at their fork BASE (their
    // head may be a staged snapshot, never in the main history), and a
    // dropped branch takes its unpublished staged commits with it so
    // nothing strands.
    val (keptRefs, droppedRefs) = md.refs.partition { case (_, r) =>
      liveIds(r.baseSnapshotId.getOrElse(r.snapshotId))
    }
    val deadMarkers = droppedRefs.collect {
      case (n, r) if r.kind == "branch" && r.baseSnapshotId.isDefined =>
        branchMarker(n)
    }.toSet
    commit(md.copy(snapshots = squashed +: kept, refs = keptRefs,
      staged = md.staged.filterNot(s =>
        s.wapId.exists(deadMarkers.contains))))
    expired.size
  }

  /** Age-based retention (Iceberg's expire_snapshots timestamp mode):
    * squash every snapshot committed before `olderThanMs`, always
    * retaining the latest snapshot regardless of age. Snapshots
    * without a recorded commit time (pre-upgrade metadata) count as
    * old — they predate the field.
    */
  def expireSnapshotsOlderThan(olderThanMs: Long,
      cap: Long = Long.MaxValue): Int = {
    if (md.snapshots.isEmpty) return 0
    val byId = md.snapshots.sortBy(_.id)
    val latest = byId.last.id
    // Squashing is prefix-by-id, so only the contiguous old PREFIX is
    // eligible: with non-monotonic commit timestamps (clock skew), an
    // id below a younger-than-cutoff snapshot must survive — expiring
    // by old.max alone would squash it regardless of its age.
    // `cap` bounds the prefix further (materialized-view pin
    // protection — the CALL procedure passes the oldest pin). STRICT:
    // the pinned snapshot itself survives with its original timestamp,
    // or the squash's max-of-expired stamp would fail the dependent
    // MV's watermark-ts lineage check under clock skew.
    val prefix = byId.takeWhile(s =>
      s.timestampMs < olderThanMs && s.id < latest && s.id < cap)
    // Fixpoint: re-squashing a single already-squashed (or lone
    // append) snapshot is a no-op that would otherwise commit a new
    // metadata version and report 1 forever — maintenance loops that
    // run "until 0 expired" must terminate.
    if (prefix.isEmpty ||
        (prefix.size == 1 && LakeTable.isReset(prefix.head.operation))) 0
    else expireSnapshots(keepAfter = prefix.last.id)
  }

  /** Delete data files under this table's data/ directory that no
    * snapshot references (write-attempt leftovers from losing
    * optimistic-concurrency races, files dropped by expireSnapshots)
    * AND are older than `olderThanMillis`. The age threshold is the
    * concurrent-writer guard (same as Iceberg's): an in-flight write's
    * files exist on disk before its commit, so without it a cleanup
    * racing a writer would delete data the winning commit is about to
    * reference. Returns the deleted paths.
    */
  def removeOrphanFiles(
      olderThanMillis: Long = 24L * 60 * 60 * 1000): Seq[String] = {
    import scala.util.Using
    // snapshot clones (gc.enabled=false) share files with their source
    // table — a sweep computed from the CLONE's references could never
    // be safe for anyone, so refuse outright (Iceberg's gc.enabled
    // contract for snapshot/registered tables)
    require(!md.properties.get("gc.enabled").contains("false"),
      s"table ${md.database}.${md.table} has gc.enabled=false (a " +
        "snapshot clone shares its files) — removeOrphanFiles is " +
        "disabled on it")
    // the referenced set MUST be computed from the latest committed
    // metadata: a handle loaded long ago would treat files referenced
    // only by commits it hasn't observed as unreferenced, and their
    // mtime can fall before the age cutoff — deleting live data (or a
    // live manifest, making the current version unreadable). Refuse on
    // staleness, like every commit path does.
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently (expected " +
          s"v$loadedVersion, found v${currentHintVersion()}); reload " +
          "before removeOrphanFiles")
    // staged (unpublished WAP) snapshots still reference their files —
    // they only become orphans after discardStaged
    val referenced = (md.snapshots ++ md.staged).flatMap(s =>
      s.files.map(_.path) ++ s.deletePaths ++
        s.eqDeletes.flatMap(_.paths) ++ s.dvs.map(_.dvPath) ++
        s.files.flatMap(_.blooms.map(_.path))).toSet
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val orphans = if (!Files.exists(dataDir)) Seq.empty[Path] else
      Using.resource(Files.walk(dataDir)) { st =>
        st.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          // data parquet AND sidecar containers (deletion vectors,
          // bloom filters) — a commit that died between container
          // write and metadata claim strands a .gdv/.gbf the same way
          // a torn append strands parquet
          .filter(p => p.toString.endsWith(".parquet") ||
            p.toString.endsWith(".gdv") || p.toString.endsWith(".gbf"))
          .filterNot(p => referenced(p.toString))
          .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
          .toSeq
      }
    orphans.foreach { p =>
      Files.delete(p)
      // Hadoop local-FS checksum sibling, if any
      val crc = p.getParent.resolve("." + p.getFileName.toString + ".crc")
      Files.deleteIfExists(crc)
    }
    // prune now-empty directories bottom-up (partition dirs, snap dirs)
    if (Files.exists(dataDir)) Using.resource(Files.walk(dataDir)) { st =>
      st.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .filter(p => p != dataDir && Files.isDirectory(p))
        .filter(p => Using.resource(Files.list(p))(
          s => !s.iterator().hasNext))
        .foreach(Files.delete)
    }
    // manifest JSONs the CURRENT metadata no longer references (crash
    // between manifest write and version claim, rollback, discarded
    // branch/WAP work, expire leftovers) are unreachable the same way
    // orphaned data files are — sweep them under the same age guard.
    // Old v*.json audit documents may still name them, but those
    // versions stop being readable once their data files are swept
    // anyway (the existing data-file policy).
    val liveManifests = (md.snapshots ++ md.staged)
      .flatMap(s => LakeTable.manifestParts(s.files))
      .map(_.manifestName).toSet
    val manifestOrphans = if (!Files.exists(metadataDir)) Seq.empty[Path]
      else Using.resource(Files.list(metadataDir)) { st =>
        st.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith("manifest-") && n.endsWith(".json") &&
              !liveManifests(n)
          }
          .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
          .toSeq
      }
    manifestOrphans.foreach(Files.delete)
    // bounded metadata history (Iceberg's
    // write.metadata.previous-versions-max): version documents older
    // than the newest K are audit-only — no read path resolves them
    // (loads go through the version hint; time travel replays the
    // CURRENT document's snapshot log) — yet they accumulate one per
    // commit forever. Sweep them here; K is property-tunable.
    // clamped to >= 1: "previous"-versions-max must never touch the
    // document the version hint points at
    val keepVersions = md.properties
      .get("metadata.previous-versions-max").map(_.toInt).getOrElse(100)
      .max(1)
    val cut = loadedVersion - keepVersions
    val versionOrphans = if (cut < 1 || !Files.exists(metadataDir))
      Seq.empty[Path]
      else Using.resource(Files.list(metadataDir)) { st =>
        st.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith("v") && n.endsWith(".json") &&
              scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toInt)
                .toOption.exists(_ <= cut)
          }
          // same age guard as the data/manifest sweeps: a loader that
          // read the hint just before a commit burst must not crash on
          // a freshly-deleted document
          .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
          .toSeq
      }
    versionOrphans.foreach(Files.delete)
    (orphans ++ manifestOrphans ++ versionOrphans).map(_.toString)
  }

  // ---- row-level ops (copy-on-write) -----------------------------------

  /** DELETE FROM t WHERE predicate — Iceberg copy-on-write semantics:
    * only files that actually contain matching rows are rewritten
    * (without those rows); all other files survive untouched. The
    * commit is an "overwrite" snapshot listing the replaced files.
    *
    * Scale: candidate selection is one pruned scan (optionally
    * pre-narrowed by `prune`/`statsFilters` so only files whose
    * partition values / min-max stats can match are opened); the
    * rewrite touches only affected files. Rows where the predicate is
    * NULL are kept (SQL DELETE semantics). Returns None when nothing
    * matched — no empty snapshot is committed.
    */
  def delete(spark: SparkSession, predicate: Column,
      prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty): Option[SnapshotMeta] = {
    requireNoLiveEqDeletes("delete")
    val affected = affectedFiles(spark, predicate, prune, statsFilters)
    if (affected.isEmpty) None
    else {
      val kept0 = readFiles(spark, affected, md.currentSchema,
          LakeTable.liveDeletes(md.snapshots), lineage = writesVectors)
        .filter(!coalesce(predicate, lit(false)))
      // surviving rows are untouched — their lineage carries verbatim
      val kept = if (writesVectors) matLineage(kept0) else kept0
      Some(writeSnapshot(kept, operation = "overwrite",
        removedPaths = affected.map(_.path), lineage = writesVectors))
    }
  }

  /** DELETE with merge-on-read semantics (Iceberg v2 position deletes):
    * instead of rewriting every affected data file, commit small
    * parquet delete files of (file_path, pos) rows; reads anti-join
    * them out. The write cost is proportional to the MATCHED rows, not
    * the touched files — at 100 TB, deleting 0.1% of rows spread over
    * thousands of large files writes kilobytes instead of terabytes.
    * Positions already deleted by earlier commits are excluded, so the
    * per-file deleted-row counts stay exact (metadata-only COUNT(*)
    * subtracts them). Compaction (`compact`) folds deletes back into
    * data files and clears them.
    */
  def deleteMoR(spark: SparkSession, predicate: Column,
      prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty): Option[SnapshotMeta] = {
    requireNoLiveEqDeletes("deleteMoR")
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val candidates = LakeTable.matchingFiles(
      LakeTable.liveFiles(md.snapshots, prune, md.currentSchema, statsFilters),
      md.currentSchema, prune, statsFilters, md.schemaOpt)
    if (candidates.isEmpty) return None
    val matched = liveRowsWithPos(spark, candidates)
      .filter(coalesce(predicate, lit(false)))
    commitMoR(spark, matched, appended = None)
  }

  /** UPDATE with merge-on-read semantics: matching rows become position
    * deletes and their updated copies are appended — one snapshot, no
    * data-file rewrite. Same assignment semantics as `update` (every
    * RHS sees the pre-update row).
    */
  def updateMoR(spark: SparkSession, assignments: Map[String, Column],
      predicate: Column,
      prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty): Option[SnapshotMeta] = {
    val bad = assignments.keySet.filterNot(md.currentSchema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: $bad")
    requireNoLiveEqDeletes("updateMoR")
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")
    val candidates = LakeTable.matchingFiles(
      LakeTable.liveFiles(md.snapshots, prune, md.currentSchema, statsFilters),
      md.currentSchema, prune, statsFilters, md.schemaOpt)
    if (candidates.isEmpty) return None
    // one materialization feeds both the delete positions and the
    // updated copies (localCheckpoint: reclaimed when the df drops)
    val matched = liveRowsWithPos(spark, candidates,
      lineage = writesVectors)
      .filter(coalesce(predicate, lit(false))).localCheckpoint()
    // a v3 updated copy is the SAME row: it materializes the matched
    // row's id and nulls its last-updated so inheritance re-stamps the
    // new file's sequence — identical semantics to the CoW update path
    val lineageSel: Seq[Column] =
      if (!writesVectors) Seq.empty
      else Seq(col("_row_id").as("_graft_row_id"),
        lit(null).cast(LongType).as("_graft_last_updated"))
    val updated = matched.select(md.currentSchema.fieldNames.toSeq.map { n =>
      assignments.get(n) match {
        case Some(value) => value.as(n)
        case None => col(s"`$n`")
      }
    } ++ lineageSel: _*)
    commitMoR(spark, matched,
      appended = Some(Align.keeping(updated, md.currentSchema,
        LakeTable.matLineageCols)),
      lineage = writesVectors)
  }

  /** MERGE with merge-on-read semantics: matched target rows become
    * position deletes plus (for onMatch="update") appended copies with
    * the source values; unmatched source rows append. Only the delete
    * files and the delta rows are written — no target file rewrite.
    */
  def mergeMoR(spark: SparkSession, source: DataFrame, keys: Seq[String],
      onMatch: String = "update",
      insertUnmatched: Boolean = true): Option[SnapshotMeta] = {
    requireNoLiveEqDeletes("mergeMoR")
    require(Seq("update", "delete", "keep").contains(onMatch),
      s"onMatch must be update|delete|keep, got '$onMatch'")
    require(keys.nonEmpty && keys.forall(source.columns.contains),
      s"source must contain every key column: $keys")
    val schema = md.currentSchema
    require(keys.forall(schema.fieldNames.contains),
      s"table must contain every key column: $keys")
    if (currentHintVersion() != loadedVersion)
      throw new java.util.ConcurrentModificationException(
        s"table $location was committed concurrently; reload and retry")

    val setCols = source.columns.filter(c =>
      schema.fieldNames.contains(c) && !keys.contains(c)).toSeq
    val srcKeyed = source.select(
      (keys.map(k => col(s"`$k`")) ++
        setCols.map(c => col(s"`$c`").as(s"_src_$c"))): _*)
    val dupKey = srcKeyed.groupBy(keys.map(k => col(s"`$k`")): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dupKey.isEmpty,
      s"merge source has multiple rows for key ${dupKey.headOption}")

    val candidates = LakeTable.liveFiles(md.snapshots)
    // v3 lineage carries only through UPDATE copies — they ARE the
    // matched rows; deletes retire ids and inserts take fresh ones
    val carryIds = writesVectors && onMatch == "update"
    val matched =
      if (candidates.isEmpty || onMatch == "keep") None
      else Some(liveRowsWithPos(spark, candidates, lineage = carryIds)
        .join(srcKeyed, keys, "inner").localCheckpoint())
    val updatedCopies = matched.filter(_ => onMatch == "update").map { m =>
      val lineageSel: Seq[Column] =
        if (!carryIds) Seq.empty
        else Seq(col("_row_id").as("_graft_row_id"),
          lit(null).cast(LongType).as("_graft_last_updated"))
      Align.keeping(m.select(schema.fieldNames.toSeq.map { n =>
        if (setCols.contains(n)) col(s"`_src_$n`").as(n) else col(s"`$n`")
      } ++ lineageSel: _*), schema, LakeTable.matLineageCols)
    }
    val inserts = if (!insertUnmatched) None else {
      val targetKeys = read(spark).select(keys.map(k => col(s"`$k`")): _*)
      Some(Align(source.join(targetKeys, keys, "left_anti"), schema))
    }
    // allowMissingColumns: inserted rows carry no materialized lineage
    // — their null cells inherit fresh ids from the file's stamped
    // range, v3's mixed-file inheritance rule
    val appended = (updatedCopies.toSeq ++ inserts.toSeq)
      .reduceOption(_.unionByName(_, allowMissingColumns = true))
    matched match {
      case Some(m) => commitMoR(spark, m, appended, lineage = carryIds)
      // insert-only merge: the frame is an anti-join against the
      // TARGET's keys — stale after a concurrent commit, so the
      // conflict must surface, never retry (a retry could re-insert a
      // key a racer just added, breaking insert-if-absent)
      case None => appended.map(df =>
        writeSnapshot(df, operation = "append", retryConflicts = false))
    }
  }

  /** Live rows of `candidates` under the current schema, tagged with
    * (file URI, row position), existing merge-on-read deletes already
    * excluded — the shared front half of every MoR row-level op.
    * With `lineage` (v3 update paths), each row additionally carries
    * its `_row_id` (materialized column when the file has one, else
    * `firstRowId + position` — the same inheritance rule as
    * [[readFiles]]) so an updated copy can preserve the row's
    * identity through the delete+insert.
    */
  private def liveRowsWithPos(spark: SparkSession,
      candidates: Seq[DataFileMeta], lineage: Boolean = false): DataFrame = {
    val existing = LakeTable.liveDeletes(md.snapshots)
    val tagged = candidates
      .groupBy(f => (f.schemaId, lineage && f.lineageCols))
      .map { case ((schemaId, withMat), group) =>
      val fileSchema = md.schemaById(schemaId)
      val cleanSchema = Reconcile.clean(fileSchema).asInstanceOf[StructType]
      val base = spark.read
        .schema(if (withMat) StructType(cleanSchema.fields ++ Seq(
            StructField("_graft_row_id", LongType),
            StructField("_graft_last_updated", LongType)))
          else cleanSchema)
        .parquet(group.map(_.path): _*)
        .withColumn("_graft_dfile",
          LakeTable.normalizeUdf(col("_metadata.file_path")))
        .withColumn("_graft_dpos", col("_metadata.row_index"))
      val lineageCols: Seq[Column] = if (!lineage) Seq.empty else {
        val firstRefs = group.collect {
          case f if f.firstRowId >= 0 =>
            LakeTable.normalizePath(f.path) -> f.firstRowId
        }.toMap
        val computedId = LakeTable.fileConstCol(spark,
          col("_metadata.file_path"), firstRefs) +
          col("_metadata.row_index")
        if (withMat)
          Seq(coalesce(col("_graft_row_id"), computedId).as("_row_id"))
        else Seq(computedId.as("_row_id"))
      }
      base.select(Reconcile.projection(fileSchema, md.currentSchema) ++
        Seq(col("_graft_dfile"), col("_graft_dpos")) ++ lineageCols: _*)
    }.reduce(_.unionByName(_))
    val existingSets = candidates
      .flatMap(f => existing.get(LakeTable.normalizePath(f.path)))
    // rows already deleted by a deletion vector must not re-match
    // (same reason the parquet anti-join below exists)
    val dvRefs = existingSets.flatMap(_.dv)
      .map(d => LakeTable.normalizePath(d.dataPath) ->
        ((d.dvPath, d.offset, d.length))).toMap
    val vecLive = if (dvRefs.isEmpty) tagged else
      tagged.filter(!LakeTable.dvDeletedCol(spark,
        col("_graft_dfile"), col("_graft_dpos"), dvRefs))
    val oldDeletePaths = existingSets.flatMap(_.paths).distinct
    if (oldDeletePaths.isEmpty) vecLive
    else vecLive.join(spark.read.parquet(oldDeletePaths: _*)
        .select(col("file_path").as("_graft_dfile"),
          col("pos").as("_graft_dpos")),
      Seq("_graft_dfile", "_graft_dpos"), "left_anti")
  }

  /** Commit one merge-on-read snapshot: `matched` rows (tagged with
    * file/pos) become position-delete files; `appended`, when present,
    * is written as new data files in the SAME snapshot (operation
    * "delete" — replay adds the files and accumulates the deletes).
    * Returns None and leaves nothing behind when no row matched.
    */
  /** True when the table writes v3 deletion vectors instead of
    * positional delete parquet — keyed off `format-version=3`,
    * mirroring Iceberg's rule that v3 tables MUST use deletion
    * vectors (the cow/mor choice stays on `write.*.mode`, its
    * Iceberg meaning).
    */
  private def writesVectors: Boolean =
    md.formatVersion >= 3 || md.properties.get("format-version")
      .exists(_.trim.toIntOption.exists(_ >= 3))

  private def commitMoR(spark: SparkSession, matched: DataFrame,
      appended: Option[DataFrame],
      lineage: Boolean = false): Option[SnapshotMeta] = {
    if (writesVectors)
      return commitMoRVector(spark, matched, appended, lineage)
    val snapshotId = md.snapshots.map(_.id).foldLeft(0L)(math.max) + 1
    val delDir = dataDir.resolve(
      s"deletes-$snapshotId-${java.util.UUID.randomUUID().toString.take(8)}")
    matched
      .select(col("_graft_dfile").as("file_path"), col("_graft_dpos").as("pos"))
      .write.mode("overwrite").parquet(delDir.toString)
    val written = listParquet(delDir)
    val counts = spark.read.parquet(delDir.toString)
      .groupBy("file_path").count().collect()
      .map(r => LakeTable.normalizePath(r.getString(0)) -> r.getLong(1))
      .toMap
    def cleanup(dir: Path): Unit =
      scala.util.Using.resource(Files.walk(dir)) { st =>
        st.sorted(java.util.Comparator.reverseOrder()).forEach(p =>
          Files.delete(p))
      }
    if (counts.isEmpty) { cleanup(delDir); return None }
    val newFiles = appended match {
      case None => Seq.empty
      case Some(df) =>
        val outDir = dataDir.resolve(s"snap-$snapshotId-" +
          java.util.UUID.randomUUID().toString.take(8))
        writeDataFiles(df.drop("_graft_dfile", "_graft_dpos"), outDir)
    }
    val snap = SnapshotMeta(snapshotId, newFiles, md.currentSchemaId,
      operation = "delete", deletePaths = written.map(_.toString),
      deleteCounts = counts, timestampMs = System.currentTimeMillis())
    commit(md.copy(snapshots = md.snapshots :+ snap))
    Some(snap)
  }

  /** Aggregate newly-deleted (file_path, pos) PAIRS — which must
    * exclude every already-deleted position — into one container of
    * full+delta vector blobs per affected file: the executors build
    * one Roaring bitmap per file (the shuffle carries pairs, the
    * driver collects only O(affected files) serialized bitmaps), the
    * driver merges each with the file's previous vector and any
    * legacy positional parquet state, and writes ONE container.
    * Returns the DvMeta entries plus the newly-deleted counts, or
    * None when no pair survived.
    */
  private def writeVectorContainer(spark: SparkSession, pairs: DataFrame,
      snapshotId: Long): Option[(Seq[DvMeta], Map[String, Long])] = {
    import org.roaringbitmap.longlong.Roaring64Bitmap
    import spark.implicits._
    def bitmapPerFile(df: DataFrame): Array[(String, Array[Byte])] = df
      .select(col("file_path").cast("string"), col("pos").cast("long"))
      .as[(String, Long)]
      .groupByKey(t => LakeTable.normalizePath(t._1))
      .mapGroups { (path, it) =>
        val bm = new Roaring64Bitmap()
        it.foreach(t => bm.addLong(t._2))
        (path, DeletionVectors.serialize(bm))
      }.collect()
    val newPos = bitmapPerFile(pairs)
    if (newPos.isEmpty) return None
    val live = LakeTable.liveDeletes(md.snapshots)
    val affected = newPos.map(_._1).toSet
    // transition case: an affected file still carries v2 positional
    // parquet state — fold those positions into the new vector so the
    // REPLACE semantics lose nothing (read once, per affected file)
    val legacyByFile: Map[String, Roaring64Bitmap] = {
      val legacyPaths = affected.toSeq
        .flatMap(p => live.get(p).toSeq.filter(_.dv.isEmpty).flatMap(_.paths))
        .distinct
      if (legacyPaths.isEmpty) Map.empty
      else bitmapPerFile(spark.read.parquet(legacyPaths: _*)
          .filter(col("file_path").isin(affected.toSeq: _*)))
        .map { case (p, b) => p -> DeletionVectors.deserialize(b) }
        .toMap
    }
    val blobs = newPos.toSeq.sortBy(_._1).map { case (p, deltaBytes) =>
      val delta = DeletionVectors.deserialize(deltaBytes)
      val prevRows = live.get(p).map(_.rows).getOrElse(0L)
      val full = new Roaring64Bitmap()
      full.or(delta)
      live.get(p).flatMap(_.dv).foreach(d =>
        full.or(DeletionVectors.cached(d.dvPath, d.offset, d.length)))
      legacyByFile.get(p).foreach(full.or)
      // the pairs contract above: every pair is NEWLY deleted, so the
      // union must be exactly additive, or a resurrect/double-delete
      // bug is in flight
      require(full.getLongCardinality ==
          prevRows + delta.getLongCardinality,
        s"deletion-vector merge for $p is not additive: previous " +
          s"$prevRows + new ${delta.getLongCardinality} != merged " +
          s"${full.getLongCardinality}")
      p -> ((full, delta))
    }
    val dvPath = dataDir.resolve(s"deletes-$snapshotId-" +
      java.util.UUID.randomUUID().toString.take(8) + ".gdv")
    Files.createDirectories(dataDir)
    val dvMetas = DeletionVectors.writeContainer(dvPath, blobs)
    // crash window under test (DvSpec torn-container recovery): a
    // death HERE strands the container unreferenced — readers never
    // see it, the orphan sweep collects it, a retry recommits
    LakeTable.faultPoint("post-dv-write-pre-commit")
    val counts = blobs.map { case (p, (_, delta)) =>
      p -> delta.getLongCardinality }.toMap
    Some((dvMetas, counts))
  }

  /** Vector flavor of [[commitMoR]] (`format-version=3` — Iceberg
    * v3's deletion-vector model): the matched positions become
    * full+delta vector blobs via [[writeVectorContainer]]. Each
    * file's new vector REPLACES its entire earlier delete state, so
    * the live structures per file stay O(1) across any number of
    * delete commits — v2's accumulating delete-file list is the read
    * amplification v3 removed.
    */
  private def commitMoRVector(spark: SparkSession, matched: DataFrame,
      appended: Option[DataFrame],
      lineage: Boolean = false): Option[SnapshotMeta] = {
    val snapshotId = md.snapshots.map(_.id).foldLeft(0L)(math.max) + 1
    val pairs = matched.select(col("_graft_dfile").as("file_path"),
      col("_graft_dpos").as("pos"))
    writeVectorContainer(spark, pairs, snapshotId) match {
      case None => None
      case Some((dvMetas, counts)) =>
        val newFiles = appended match {
          case None => Seq.empty
          case Some(df) =>
            val outDir = dataDir.resolve(s"snap-$snapshotId-" +
              java.util.UUID.randomUUID().toString.take(8))
            val fs = writeDataFiles(
              df.drop("_graft_dfile", "_graft_dpos"), outDir)
            // updated copies physically wrote _graft_row_id /
            // _graft_last_updated — flag them so lineage reads consume
            // the materialized ids instead of minting fresh ones
            if (lineage) fs.map(_.copy(lineageCols = true)) else fs
        }
        val snap = SnapshotMeta(snapshotId, newFiles, md.currentSchemaId,
          operation = "delete", deleteCounts = counts,
          timestampMs = System.currentTimeMillis(), dvs = dvMetas)
        commit(md.copy(snapshots = md.snapshots :+ snap))
        Some(snap)
    }
  }

  /** UPDATE t SET assignments WHERE predicate — copy-on-write: affected
    * files are rewritten with the assignments applied to matching rows,
    * every other row copied through unchanged. Assignment values may
    * reference any current-schema column.
    */
  def update(spark: SparkSession, assignments: Map[String, Column],
      predicate: Column,
      prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty): Option[SnapshotMeta] = {
    val bad = assignments.keySet.filterNot(md.currentSchema.fieldNames.contains)
    require(bad.isEmpty, s"unknown columns in SET: $bad")
    requireNoLiveEqDeletes("update")
    val affected = affectedFiles(spark, predicate, prune, statsFilters)
    if (affected.isEmpty) None
    else {
      val cond = coalesce(predicate, lit(false))
      val base = readFiles(spark, affected, md.currentSchema,
        LakeTable.liveDeletes(md.snapshots), lineage = writesVectors)
      // one projection, every RHS evaluated against the PRE-update row
      // (SQL UPDATE semantics: SET a=b, b=a swaps; sequential
      // withColumn would leak updated values into later assignments
      // in unordered-Map iteration order)
      // an updated row keeps its _row_id (it is the same row) and
      // nulls its last-updated so inheritance stamps the new sequence;
      // both computed in the SAME select so `cond` sees pre-update
      // values
      val lineageSel: Seq[Column] =
        if (!writesVectors) Seq.empty
        else Seq(col("_row_id").as("_graft_row_id"),
          when(cond, lit(null).cast(LongType))
            .otherwise(col("_last_updated_sequence_number"))
            .as("_graft_last_updated"))
      val updated = base.select(md.currentSchema.fieldNames.toSeq.map { n =>
        assignments.get(n) match {
          case Some(value) => when(cond, value).otherwise(col(s"`$n`")).as(n)
          case None => col(s"`$n`")
        }
      } ++ lineageSel: _*)
      Some(writeSnapshot(
        Align.keeping(updated, md.currentSchema, LakeTable.matLineageCols),
        operation = "overwrite", removedPaths = affected.map(_.path),
        lineage = writesVectors))
    }
  }

  /** MERGE INTO t USING source ON keys — the classic upsert, Iceberg
    * copy-on-write style:
    *   - matched + `onMatch="update"`: target row's columns that also
    *     exist in `source` (keys aside) take the source values
    *   - matched + `onMatch="delete"`: target row removed
    *   - matched + `onMatch="keep"`:   target row unchanged
    *   - `insertUnmatched`: source rows matching no target key are
    *     aligned to the table schema and appended
    *
    * Only files containing matched keys are rewritten. The join is left
    * unhinted: Catalyst auto-broadcasts a small source delta, AQE picks
    * a shuffle join (with skew handling) for a large one.
    */
  def merge(spark: SparkSession, source: DataFrame, keys: Seq[String],
      onMatch: String = "update",
      insertUnmatched: Boolean = true): Option[SnapshotMeta] = {
    requireNoLiveEqDeletes("merge")
    require(Seq("update", "delete", "keep").contains(onMatch),
      s"onMatch must be update|delete|keep, got '$onMatch'")
    require(keys.nonEmpty && keys.forall(source.columns.contains),
      s"source must contain every key column: $keys")
    val schema = md.currentSchema
    require(keys.forall(schema.fieldNames.contains),
      s"table must contain every key column: $keys")

    // columns the update copies from source: shared names minus keys
    val setCols = source.columns.filter(c =>
      schema.fieldNames.contains(c) && !keys.contains(c)).toSeq
    val srcKeyed = source.select(
      (keys.map(k => col(s"`$k`")) ++
        setCols.map(c => col(s"`$c`").as(s"_src_$c")) :+
        lit(true).as("_src_matched")): _*)

    // SQL MERGE cardinality rule: a target row may match at most one
    // source row — duplicate source keys would silently duplicate
    // target rows in the rewrite (and which values win would be
    // nondeterministic), so refuse them up front
    val dupKey = srcKeyed.groupBy(keys.map(k => col(s"`$k`")): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dupKey.isEmpty,
      s"merge source has multiple rows for key ${dupKey.headOption}")

    val keyPred = keys.map(k => col(s"`$k`").isNotNull).reduce(_ && _)
    val affected = affectedFiles(spark,
      predicate = keyPred, matchSource = Some(srcKeyed -> keys))

    val rewritten = if (affected.isEmpty) None else {
      val joined = readFiles(spark, affected, schema,
          LakeTable.liveDeletes(md.snapshots), lineage = writesVectors)
        .join(srcKeyed, keys, "left")
      val matchedCol = coalesce(col("_src_matched"), lit(false))
      val applied = onMatch match {
        case "delete" => joined.filter(!matchedCol)
        case "keep" => joined
        case "update" => setCols.foldLeft(joined) { (d, c) =>
          d.withColumn(c,
            when(matchedCol, col(s"`_src_$c`")).otherwise(col(s"`$c`")))
        }
      }
      // matched-updated rows keep their id, null their last-updated
      // (inherit the new sequence); kept rows carry both verbatim
      val lineageSel: Seq[Column] =
        if (!writesVectors) Seq.empty
        else Seq(col("_row_id").as("_graft_row_id"),
          (if (onMatch == "update")
            when(matchedCol, lit(null).cast(LongType))
              .otherwise(col("_last_updated_sequence_number"))
          else col("_last_updated_sequence_number"))
            .as("_graft_last_updated"))
      Some(applied.select(
        schema.fieldNames.toSeq.map(n => col(s"`$n`")) ++ lineageSel: _*))
    }

    val inserts = if (!insertUnmatched) None else {
      val targetKeys = read(spark).select(keys.map(k => col(s"`$k`")): _*)
      val ins = Align(source.join(targetKeys, keys, "left_anti"), schema)
      // inserted rows are NEW: null lineage cells inherit fresh ids
      // from the written file's assigned range (v3 inheritance)
      Some(if (!writesVectors) ins else ins
        .withColumn("_graft_row_id", lit(null).cast(LongType))
        .withColumn("_graft_last_updated", lit(null).cast(LongType)))
    }

    val newData = (rewritten.toSeq ++ inserts.toSeq)
      .reduceOption(_.unionByName(_))
    newData.map(df => writeSnapshot(df, operation = "overwrite",
      removedPaths = affected.map(_.path), lineage = writesVectors))
  }

  /** Files whose rows could be touched by a row-level op: metadata
    * pruning first (partition values + min/max stats), then one scan
    * that tags every row with its source file and keeps the distinct
    * file names of rows matching `predicate` (and, for merge, joining a
    * source key). Only those files get rewritten.
    */
  private def affectedFiles(spark: SparkSession, predicate: Column,
      prune: Map[String, Set[String]] = Map.empty,
      statsFilters: Seq[RangeFilter] = Seq.empty,
      matchSource: Option[(DataFrame, Seq[String])] = None,
      candidatesOverride: Option[Seq[DataFileMeta]] = None)
      : Seq[DataFileMeta] = {
    // branch CoW passes its own (branch-view) candidate set; the main
    // path derives it from the committed live files
    val candidates = candidatesOverride.getOrElse(LakeTable.matchingFiles(
      LakeTable.liveFiles(md.snapshots, prune, md.currentSchema, statsFilters),
      md.currentSchema, prune, statsFilters, md.schemaOpt))
    if (candidates.isEmpty) return Seq.empty
    val tagged = candidates.groupBy(_.schemaId).map { case (schemaId, group) =>
      val fileSchema = md.schemaById(schemaId)
      spark.read
        .schema(Reconcile.clean(fileSchema).asInstanceOf[StructType])
        .parquet(group.map(_.path): _*)
        .withColumn("_graft_file", input_file_name())
        .select(Reconcile.projection(fileSchema, md.currentSchema) :+
          col("_graft_file"): _*)
    }.reduce(_.unionByName(_)).filter(predicate)
    val matchedRows = matchSource match {
      case Some((src, keys)) => tagged.join(src, keys, "left_semi")
      case None => tagged
    }
    val hit = matchedRows.select("_graft_file").distinct()
      .collect().map(r => LakeTable.normalizePath(r.getString(0))).toSet
    candidates.filter(f => hit(LakeTable.normalizePath(f.path)))
  }
}

object LakeTable {

  /** A written-but-unflipped metadata claim: the output of commit
    * phase 1 ([[LakeTable!.writeClaim]]), the input of phase 2
    * ([[LakeTable!.flipClaim]]). The cross-table coordinator holds one
    * per participant between the claim round and the final record.
    */
  private[lake] final case class Claim(table: LakeTable, version: Int,
      target: Path, ext: TableMetadata, manifests: Seq[Path])

  /** Every leaf of the frame's plan is a LocalRelation — the rows are
    * already on the driver, so the frame is bounded by construction
    * (the incremental-MV publication shape). Such writes coalesce to
    * one task/file: LocalTableScan otherwise parallelizes its handful
    * of rows to leafNodeDefaultParallelism (= cores) slices.
    */
  /** Spark's own parquet WriteSupport driven on the DRIVER: bytes
    * identical to a one-task FileFormatWriter job (INT64-micros
    * timestamps, CORRECTED rebase, snappy), none of the
    * job/commit-protocol cost. The conf keys are the ones
    * ParquetWriteSupport.init / SparkToParquetSchemaConverter assert
    * on — the same values ParquetFileFormat.prepareWrite stamps.
    */
  private[lake] def writeLocalParquetFile(schema: StructType,
      rows: Seq[org.apache.spark.sql.catalyst.InternalRow],
      p: Path): Unit = {
    val conf = HadoopConfs.mutable()
    org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
      .setSchema(schema, conf)
    locally {
      import org.apache.spark.sql.internal.SQLConf
      conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
      conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
        "TIMESTAMP_MICROS")
      conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key, "true")
      conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
        SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.defaultValueString)
    }
    final class B(f: org.apache.parquet.io.OutputFile)
        extends org.apache.parquet.hadoop.ParquetWriter.Builder[
          org.apache.spark.sql.catalyst.InternalRow, B](f) {
      override def getWriteSupport(c: org.apache.hadoop.conf.Configuration) =
        new org.apache.spark.sql.execution.datasources.parquet
          .ParquetWriteSupport
      override def self(): B = this
    }
    val out = org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toString), conf)
    val w = new B(out).withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach(w.write) finally w.close()
  }

  /** Max distinct keys a marker batch INLINES into the snapshot
    * metadata (`EqDeleteMeta.inlineKeys`): covers the incremental-MV
    * key-limit (1000) publications while keeping per-version metadata
    * growth bounded; bigger batches stay parquet-only.
    */
  private[lake] val InlineKeyCap = 1024

  /** One inline key cell, rendered losslessly per the batch's WRITE
    * type (shortest-repr floats/doubles round-trip exactly; decimals
    * via plain string; date/timestamp as their integral catalyst
    * encodings). Only the eq-delete-eligible scalar types appear —
    * writeEqDeleteBatch enforces that set.
    */
  private[lake] def renderInlineKey(dt: DataType,
      row: org.apache.spark.sql.catalyst.InternalRow,
      i: Int): Option[String] =
    if (row.isNullAt(i)) None
    else Some(dt match {
      case IntegerType | DateType => row.getInt(i).toString
      case LongType | TimestampType | TimestampNTZType =>
        row.getLong(i).toString
      case BooleanType => row.getBoolean(i).toString
      case FloatType => row.getFloat(i).toString
      case DoubleType => row.getDouble(i).toString
      case StringType => row.getUTF8String(i).toString
      case d: DecimalType => row.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.toPlainString
      case other => throw new IllegalStateException(
        s"inline eq-delete key of unsupported type $other")
    })

  private[lake] def parseInlineKey(dt: DataType,
      s: Option[String]): Any = s match {
    case None => null
    case Some(v) => dt match {
      case IntegerType | DateType => v.toInt
      case LongType | TimestampType | TimestampNTZType => v.toLong
      case BooleanType => v.toBoolean
      case FloatType => v.toFloat
      case DoubleType => v.toDouble
      case StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(v)
      case d: DecimalType => org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(v), d.precision, d.scale)
      case other => throw new IllegalStateException(
        s"inline eq-delete key of unsupported type $other")
    }
  }

  /** The `k<id>`-columned frame of one equality batch: the INLINE keys
    * as a LocalRelation when the batch carries them (zero IO — and a
    * LocalRelation build side broadcasts without launching a job),
    * else the marker parquet files. Columns carry the batch's WRITE
    * types either way; callers cast to the resolved read types exactly
    * like the parquet path, so type promotions behave identically.
    */
  private[graft] def eqBatchFrame(spark: SparkSession,
      b: EqDeleteMeta): DataFrame =
    (b.inlineKeys, b.inlineTypes) match {
      case (Some(rows), Some(ts)) =>
        val types = ts.map(org.apache.spark.sql.types.DataType.fromDDL)
        val attrs = b.fieldIds.zip(types).map { case (id, dt) =>
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            s"k$id", dt, nullable = true)()
        }
        val irows = rows.map(r =>
          org.apache.spark.sql.catalyst.InternalRow.fromSeq(
            r.zip(types).map { case (v, dt) => parseInlineKey(dt, v) }))
        org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
            attrs, irows))
      case _ =>
        // a SMALL non-inline batch (pre-r12 tables, distributed-source
        // upserts of a few thousand keys) is re-read by every MoR read,
        // changelog, and recompute probe of its range — localize it
        // ONCE and serve a LocalRelation from a byte-bounded JVM cache.
        // Sound: marker files are immutable once committed (a lost
        // write attempt's files are never referenced). Bigger batches
        // keep the distributed scan.
        val total = b.paths.foldLeft(0L) { (acc, p) =>
          acc + (try Files.size(Paths.get(p))
          catch { case _: Exception => Long.MaxValue / 4 })
        }
        if (total > SmallBatchBytes) spark.read.parquet(b.paths: _*)
        else {
          val key = b.paths.sorted.mkString("\u0000")
          val (schema, rows) = smallBatchCache.getOrLoad(key, 0L) {
            val df = spark.read.parquet(b.paths: _*)
            val collected = df.queryExecution.executedPlan
              .executeCollect().map(_.copy()).toSeq
            (df.schema, collected)
          }
          org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
            org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
              schema.fields.toSeq.map(f =>
                org.apache.spark.sql.catalyst.expressions
                  .AttributeReference(f.name, f.dataType, f.nullable)()),
              rows))
        }
    }

  /** Marker batches at or below this total size localize through
    * [[smallBatchCache]]; ~1 MiB of key parquet is ~50-100k keys —
    * far past it the broadcast side deserves a distributed scan. */
  private val SmallBatchBytes = 1L << 20

  private val smallBatchCache = new BlobCache[
    (StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])](
    64L << 20,
    { case (_, rows) => rows.map {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getSizeInBytes.toLong
        case _ => 128L
      }.sum + 1024L })

  private[lake] def isLocalPlan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      LocalRelation, Repartition, RepartitionByExpression}
    if (sys.props.contains("graft.write.nolocal")) return false
    val plan = df.queryExecution.logical
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalRelation]) &&
      // a caller that explicitly re-partitioned its local rows asked
      // for that parallelism/file spread — respect it
      !plan.exists {
        case _: Repartition | _: RepartitionByExpression => true
        case _ => false
      }
  }

  /** Replay the snapshot log into the live file set: appends add files,
    * copy-on-write overwrites remove their `removedPaths` and add their
    * rewritten files, a rewrite (compaction) replaces everything;
    * merge-on-read "delete" snapshots carry no data files.
    * O(snapshots × files) driver-side metadata walk — no data IO.
    *
    * `prune` (partition-field name → allowed values) and
    * `statsFilters` (min/max ranges against `schema`, the same
    * arguments `matchingFiles` applies per file) additionally skip
    * LOADING any out-of-line manifest whose partition/stats summary
    * proves every file in it would be pruned — at 100 TB the planning
    * cost of a one-partition or one-key query is the manifests that
    * OVERLAP the predicate, not the table's history. Sound because
    * summary-pruned files are exactly files `matchingFiles` would
    * drop: removal replay doesn't need them (a removed pruned file is
    * equally absent either way) and seq stamping only matters for
    * files actually read.
    */
  def liveFiles(snapshots: Seq[SnapshotMeta],
      prune: Map[String, Set[String]] = Map.empty,
      schema: StructType = null,
      statsFilters: Seq[RangeFilter] = Seq.empty): Seq[DataFileMeta] = {
    // start at the last rewrite: everything before it is discarded by
    // the reset anyway, and walking it would MATERIALIZE pre-rewrite
    // manifests for nothing (the whole point of rewrite_manifests is
    // that forward reads stop touching them)
    replaySuffix(snapshots)._1
      .foldLeft(Vector.empty[DataFileMeta]) { (acc, s) =>
      // stamp each file's data sequence number (equality-delete
      // applicability: batch seq > file seq) unless it carries an
      // explicit one (expire-squash carried files keep their original)
      def stamp(fs: Seq[DataFileMeta]) = fs.toVector.map(f =>
        if (f.seq >= 0) f else f.copy(seq = s.id))
      def own = {
        val parts = manifestParts(s.files)
        if (parts.nonEmpty && (prune.nonEmpty || statsFilters.nonEmpty))
          // per-PART summary pruning: only overlapping parts load
          stamp(parts.filterNot(_.prunedOut(prune, schema, statsFilters))
            .flatten)
        else stamp(s.files)
      }
      s.operation match {
        case op if isReset(op) => own
        case op if removesByPath(op) =>
          val removed = s.removedPaths.toSet
          acc.filterNot(f => removed(f.path)) ++ own
        case _ => acc ++ own
      }
    }
  }

  /** Replay the snapshot log into the live equality-delete batches:
    * "delete"/"upsert" snapshots accumulate their batches; a rewrite
    * (compaction read applies every live batch, so its output
    * supersedes them) resets to the snapshot's own carried batches
    * (empty for compaction; the expire-squash carries the still-live
    * set explicitly).
    */
  def liveEqDeletes(snapshots: Seq[SnapshotMeta]): Seq[EqDeleteMeta] =
    snapshots.foldLeft(Vector.empty[EqDeleteMeta]) { (acc, s) =>
      s.operation match {
        case op if isReset(op) => s.eqDeletes.toVector
        case _ => acc ++ s.eqDeletes
      }
    }

  /** Replay the snapshot log into the live merge-on-read delete state:
    * data-file path (normalized) → its delete-file set + exact deleted
    * row count. "delete" snapshots accumulate; an overwrite drops the
    * entries of the files it replaces (the rewrite already materialized
    * the surviving rows); a rewrite resets to its own carried state
    * (compaction clears deletes, an expire-squash preserves them).
    */
  def liveDeletes(snapshots: Seq[SnapshotMeta]): Map[String, DeleteSet] =
    snapshots.foldLeft(Map.empty[String, DeleteSet]) { (acc, s) =>
      // a snapshot's vectors: each REPLACES the file's whole delete
      // state (v3 semantics — the writer merged all earlier positions
      // into the full blob, so cardinality is the live deleted count)
      def vectors: Map[String, DeleteSet] = s.dvs.map(d =>
        normalizePath(d.dataPath) ->
          DeleteSet(Seq.empty, d.cardinality, Some(d))).toMap
      def own: Map[String, DeleteSet] = s.deleteCounts.collect {
        case (p, n) if !vectors.contains(normalizePath(p)) =>
          normalizePath(p) -> DeleteSet(s.deletePaths, n)
      } ++ vectors
      s.operation match {
        case op if isReset(op) => own
        case op if removesByPath(op) =>
          val removed = s.removedPaths.map(normalizePath).toSet
          acc.filterNot { case (p, _) => removed(p) }
        case "delete" =>
          // parquet-positional entries ACCUMULATE; vector entries
          // REPLACE (and a vector supersedes any accumulated parquet
          // state for its file — `own` already excludes those keys)
          (own -- vectors.keySet).foldLeft(acc) { case (m, (p, ds)) =>
            m.updatedWith(p) {
              case Some(prev) => Some(DeleteSet(
                (prev.paths ++ ds.paths).distinct, prev.rows + ds.rows))
              case None => Some(ds)
            }
          } ++ vectors
        case _ => acc
      }
    }

  /** A branch overlay's files and equality batches re-sequenced above
    * the fork `base`, one step per branch commit in commit order — the
    * same relative stamping `fastForward` applies when publishing, so
    * branch views predict the published state exactly. Explicit file
    * sequences (never set by branch writes today) are preserved
    * defensively.
    */
  def resequenceOverlay(base: Long, branchSnaps: Seq[SnapshotMeta])
      : (Seq[DataFileMeta], Seq[EqDeleteMeta]) = {
    val reseq = branchSnaps.map(_.id).sorted.zipWithIndex
      .map { case (id, i) => id -> (base + i + 1) }.toMap
    // an explicit seq NAMING a staged snapshot (a branch CoW output
    // group deferring staged-origin lineage) re-sequences with it;
    // explicit MAIN seqs pass through verbatim (ids are globally
    // unique across main+staged, so the key spaces cannot collide)
    (branchSnaps.flatMap(s => s.files.map(f =>
      if (f.seq < 0) f.copy(seq = reseq(s.id))
      else reseq.get(f.seq).map(ps => f.copy(seq = ps)).getOrElse(f))),
      branchSnaps.flatMap(s => s.eqDeletes.map(_.copy(seq = reseq(s.id)))))
  }

  /** Test-only fault-injection seam: fired at named crash-window
    * points so recovery tests can kill the JVM mid-protocol (e.g.
    * between data-file write and metadata commit). A no-op in
    * production — nothing in the engine ever assigns it.
    */
  @volatile private[graft] var faultHook: String => Unit = _ => ()
  @inline private[lake] def faultPoint(name: String): Unit = faultHook(name)

  /** Manifest handles backing a snapshot's file list — one for a
    * single manifest, the parts for a clustered set, empty for inline
    * (pre-manifest) lists. EVERY site that enumerates manifest-backed
    * storage goes through here so a new representation cannot be
    * silently missed — the orphan sweep in particular must never
    * under-count live manifests (an under-count DELETES live
    * metadata).
    */
  def manifestParts(files: Seq[DataFileMeta]): Seq[ManifestFiles] =
    files match {
      case mf: ManifestFiles => Seq(mf)
      case ms: ManifestSet => ms.parts
      case _ => Seq.empty
    }

  /** Operations that RESET the replay (discard everything before
    * them): compaction/metadata rewrites ("rewrite" — byte moves, no
    * data change) and full-content overwrites ("replace" — data
    * change; branch fast-forward distinguishes the two). Every replay
    * fold and the suffix computation go through here.
    */
  def isReset(op: String): Boolean = op == "rewrite" || op == "replace"

  /** Operations that remove their `removedPaths` from the live set and
    * add their own files during replay: copy-on-write row-level ops
    * ("overwrite") and scoped compaction ("rewrite-data"). The replay
    * folds and the suffix computation go through here.
    */
  def removesByPath(op: String): Boolean =
    op == "overwrite" || op == "rewrite-data"

  /** Operations that move BYTES, not data — full compaction/manifest
    * rewrites ("rewrite") and scoped compaction ("rewrite-data"). CDC,
    * changelog and streaming readers skip them without consuming an
    * ordinal, and branch fast-forward does not count them as
    * divergence; an "overwrite" (a row-level CoW) is neither.
    */
  def isByteMove(op: String): Boolean =
    op == "rewrite" || op == "rewrite-data"

  /** Whether a map type occurs anywhere in `dt` — map columns cannot
    * participate in set operations directly; the CoW changelog diff
    * routes them through [[mapNormExpr]] (sorted-entries form) first.
    */
  def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
      case org.apache.spark.sql.types.ArrayType(e, _) => hasMapType(e)
      case _ => false
    }

  /** `dt` with every map replaced by key-sorted
    * `array<struct<key,value>>` — a canonical, ORDERABLE encoding (two
    * equal maps normalize to identical arrays regardless of entry
    * order, and no map type survives, so Spark's set operations
    * accept it). Inverse: [[mapDenormExpr]].
    */
  private[lake] def mapNormType(
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case org.apache.spark.sql.types.MapType(k, v, vn) =>
      org.apache.spark.sql.types.ArrayType(StructType(Seq(
        StructField("key", mapNormType(k), nullable = false),
        StructField("value", mapNormType(v), nullable = vn))),
        containsNull = false)
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = mapNormType(f.dataType))))
    case org.apache.spark.sql.types.ArrayType(e, n) =>
      org.apache.spark.sql.types.ArrayType(mapNormType(e), n)
    case other => other
  }

  /** `c` (of type `dt`) rewritten to the [[mapNormType]] encoding —
    * entries sorted by key (unique within one map, so the ordering is
    * total), recursively through structs, arrays, and map values.
    */
  private[lake] def mapNormExpr(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      array_sort(transform(map_entries(c), e =>
        struct(mapNormExpr(e.getField("key"), k).as("key"),
          mapNormExpr(e.getField("value"), v).as("value"))))
    case s: StructType if hasMapType(s) =>
      when(c.isNull,
        lit(null).cast(mapNormType(Reconcile.clean(s))))
        .otherwise(struct(s.fields.toSeq.map(f =>
          mapNormExpr(c.getField(f.name), f.dataType).as(f.name)): _*))
    case org.apache.spark.sql.types.ArrayType(e, _) if hasMapType(e) =>
      transform(c, x => mapNormExpr(x, e))
    case _ => c
  }

  /** Inverse of [[mapNormExpr]]: rebuild the original map shape from
    * the sorted-entries encoding (`dt` is the ORIGINAL type).
    */
  private[lake] def mapDenormExpr(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = dt match {
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      map_from_entries(transform(c, e =>
        struct(mapDenormExpr(e.getField("key"), k).as("key"),
          mapDenormExpr(e.getField("value"), v).as("value"))))
    case s: StructType if hasMapType(s) =>
      when(c.isNull, lit(null).cast(Reconcile.clean(s)))
        .otherwise(struct(s.fields.toSeq.map(f =>
          mapDenormExpr(c.getField(f.name), f.dataType).as(f.name)): _*))
    case org.apache.spark.sql.types.ArrayType(e, _) if hasMapType(e) =>
      transform(c, x => mapDenormExpr(x, e))
    case _ => c
  }

  /** Suffix of the snapshot log since the last rewrite, plus the set
    * of paths removed by overwrites within it — the distributable form
    * of `liveFiles`' replay: only suffix snapshots can contribute live
    * files (a rewrite discards everything before it), and dropping the
    * removed set is exact because data-file paths are write-unique (a
    * removed path never reappears under a later snapshot). Shared by
    * the `.files` and `.partitions` relations so the two can never
    * disagree about liveness.
    */
  def replaySuffix(snapshots: Seq[SnapshotMeta])
      : (Seq[SnapshotMeta], Set[String]) = {
    val idx = snapshots.lastIndexWhere(s => isReset(s.operation))
    val suffix = if (idx < 0) snapshots else snapshots.drop(idx)
    (suffix, suffix.filter(s => removesByPath(s.operation))
      .flatMap(_.removedPaths).toSet)
  }

  /** Resolve a dotted path through STRUCT nesting only (`a.b.c` where
    * every non-leaf segment is a struct field) to its leaf field.
    * Returns None when a segment is missing or the chain crosses an
    * array/map — an element/value field occurs 0..n times per row, so
    * it cannot serve as an equality-delete key.
    */
  def resolveStructPath(schema: StructType, path: String)
      : Option[StructField] = {
    path.split('.').toSeq.foldLeft(Option.empty[StructField] -> (schema: DataType)) {
      case ((_, st: StructType), seg) =>
        st.fields.find(_.name == seg) match {
          case Some(f) => (Some(f), f.dataType)
          case None => (None, NullType)
        }
      case _ => (None, NullType)
    }._1
  }

  /** Dotted struct path AND leaf field carrying `id` in `schema`,
    * traversing struct nesting only (the inverse of
    * `resolveStructPath` — equality-delete keys are struct-nested
    * scalars by construction). One walk serves both callers: the
    * anti-join needs the path, the DSv2 reader the leaf field (going
    * path → field via a re-parse would break on field names that
    * contain a literal dot).
    */
  def structPathOfId(schema: StructType, id: Int)
      : Option[(String, StructField)] = {
    def walk(st: StructType, prefix: String): Option[(String, StructField)] =
      st.fields.toSeq.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        if (FieldIds.hasId(f) && FieldIds.idOf(f) == id) Some((p, f))
        else f.dataType match {
          case s: StructType => walk(s, p)
          case _ => None
        }
      }.headOption
    walk(schema, "")
  }

  /** Partition-value + min/max-stats pruning of a file list.
    *
    * `schemaById` (file's write schema by schema id, when the caller
    * has table metadata at hand) enables the schema-absence prune: a
    * file written BEFORE a column was added reads as all-NULL for it,
    * so `IS NOT NULL` and every value predicate on that column skip
    * the file outright — on an evolved table that can be most of the
    * history. Returning None keeps the file (conservative default).
    */
  def matchingFiles(files: Seq[DataFileMeta], schema: StructType,
      prune: Map[String, Set[String]],
      statsFilters: Seq[RangeFilter],
      schemaById: Int => Option[StructType] = _ => None): Seq[DataFileMeta] = {
    // per-filter current-schema field id (top-level only — pushed
    // filters name top-level columns), resolved once per call
    val valueFilters = statsFilters.filter(f => f.notNull || f.hasBounds)
    val filterIds: Seq[Int] =
      if (valueFilters.isEmpty) Seq.empty
      else valueFilters.flatMap(f =>
        schema.fields.find(_.name == f.column)
          .filter(graft.schema.FieldIds.hasId)
          .map(graft.schema.FieldIds.idOf))
    // schemaId -> does the write schema contain every filtered field id
    val absenceCache = scala.collection.mutable.Map.empty[Int, Boolean]
    def writeSchemaHasAll(f: DataFileMeta): Boolean =
      filterIds.isEmpty || absenceCache.getOrElseUpdate(f.schemaId,
        schemaById(f.schemaId) match {
          case Some(ws) =>
            val present = ws.fields.iterator
              .filter(graft.schema.FieldIds.hasId)
              .map(graft.schema.FieldIds.idOf).toSet
            filterIds.forall(present)
          case None => true
        })
    // bloom probe hashing hoisted OUT of the per-file loop: each
    // filter's value set hashes once per plan, not once per
    // (file x value) — a 100-value IN over 100k candidate files is
    // 100 hash evals, not 10M
    val probes = bloomProbes(schema, statsFilters)
    files.filter { f =>
      prune.forall { case (name, allowed) =>
        f.partitionValues.get(name).forall(allowed.contains)
      } && FileStats.mightMatch(f.stats, schema, statsFilters) &&
        writeSchemaHasAll(f) && bloomMightMatchProbes(f, probes)
    }
  }

  /** Per-filter bloom probes resolved ONCE per plan: the field id and
    * the Spark-compatible hashes of the probe-able value set — an
    * explicit IN-list (`eqSet`) or a single-point range (lo == hi).
    * Integral renderings must match `cast(col AS STRING)`; a
    * fractional equality value never round-trips, so it skips the
    * probe (min/max handles it). Filters with no probe-able shape
    * contribute nothing (conservative).
    */
  private def bloomProbes(schema: StructType,
      filters: Seq[RangeFilter]): Seq[(Int, Seq[Long])] =
    filters.flatMap { flt =>
      val values: Seq[String] =
        if (flt.eqSet.nonEmpty) flt.eqSet
        else (flt.loNum, flt.hiNum) match {
          case (Some(a), Some(b)) if a == b =>
            scala.util.Try(a.toBigIntExact).toOption.flatten
              .map(_.toString).toSeq
          case _ => (flt.loStr, flt.hiStr) match {
            case (Some(a), Some(b)) if a == b => Seq(a)
            case _ => Seq.empty
          }
        }
      if (values.isEmpty) None
      else schema.fields.find(_.name == flt.column)
        .filter(graft.schema.FieldIds.hasId)
        .map(f => graft.schema.FieldIds.idOf(f) ->
          values.map(BloomFilters.hashOf))
    }

  private def bloomMightMatchProbes(f: DataFileMeta,
      probes: Seq[(Int, Seq[Long])]): Boolean =
    f.blooms.isEmpty || probes.forall { case (fieldId, hashes) =>
      f.blooms.find(_.fieldId == fieldId) match {
        case None => true
        case Some(ref) =>
          // IN semantics: the file survives if ANY listed value might
          // be present; an unreadable blob keeps the file
          try {
            val words = BloomFilters.cached(ref.path, ref.offset,
              ref.length)
            hashes.exists(h =>
              BloomFilters.mightContain(words, h, ref.k))
          } catch { case _: Exception => true }
      }
    }

  /** Bloom-filter probe for point-lookup equality filters — the
    * single-file convenience form ([[bloomProbes]] +
    * [[bloomMightMatchProbes]]); scan planning uses the split form so
    * hashing happens once per plan.
    */
  def bloomMightMatch(f: DataFileMeta, schema: StructType,
      filters: Seq[RangeFilter]): Boolean =
    bloomMightMatchProbes(f, bloomProbes(schema, filters))

  /** `input_file_name()` / `_metadata.file_path` yield URIs
    * (`file:/…`, %XX-escaped); metadata stores plain filesystem
    * paths — normalize for matching.
    */
  def normalizePath(p: String): String =
    if (p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  /** normalizePath as a column function, for joining scan-produced
    * file URIs against the plain paths stored in delete files.
    */
  val normalizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(normalizePath _)

  /** `(path, pos) is deleted by its file's deletion vector` as a
    * codegen-friendly Column ([[graft.functions.DvDeleted]]); `refs`
    * maps normalized data paths to (container, offset, length). Wide
    * maps ride as a broadcast, small ones inline
    * ([[graft.functions.RefCarrier]]) — either way the task closure
    * stays O(1) in affected-file count.
    */
  def dvDeletedCol(spark: SparkSession, path: Column, pos: Column,
      refs: Map[String, (String, Long, Long)]): Column = {
    val lookup = new graft.functions.DvLookup(
      graft.functions.RefCarrier(spark, refs.size, refs))
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.DvDeleted(
        org.apache.spark.sql.GraftPlanBridge.expression(path),
        org.apache.spark.sql.GraftPlanBridge.expression(pos), lookup))
  }

  /** The row-lineage projection appended by lineage reads. */
  val lineageFields: Seq[StructField] = Seq(
    StructField("_row_id", LongType, nullable = true),
    StructField("_last_updated_sequence_number", LongType, nullable = true))

  /** The materialized lineage column names rewrites store in parquet. */
  val matLineageCols: Seq[String] =
    Seq("_graft_row_id", "_graft_last_updated")

  /** A per-file long constant resolved from the row's file path
    * ([[graft.functions.FileConst]]): null for paths absent from
    * `refs`. Codegen-friendly — the per-row cost is one cached
    * last-path probe, no join; wide maps broadcast instead of riding
    * the expression tree ([[graft.functions.RefCarrier]]).
    */
  def fileConstCol(spark: SparkSession, path: Column,
      refs: Map[String, Long]): Column = {
    val lookup = new graft.functions.FileConstLookup(
      graft.functions.RefCarrier(spark, refs.size, refs))
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.FileConst(
        org.apache.spark.sql.GraftPlanBridge.expression(path), lookup))
  }

  def tableLocation(warehouse: String, db: String, table: String): Path =
    Paths.get(warehouse, db, table)

  def exists(warehouse: String, db: String, table: String): Boolean =
    Files.exists(tableLocation(warehouse, db, table)
      .resolve("metadata").resolve("version-hint.text"))

  def buildSpecFields(partitions: Seq[PartitionDef],
      schema: StructType): Seq[SpecField] = {
    val flat = FieldIds.flatten(schema)
    partitions.zipWithIndex.map { case (p, i) =>
      val srcId = flat.collectFirst {
        case (path, f) if path == p.column => FieldIds.idOf(f)
      }.getOrElse(throw new IllegalArgumentException(
        s"partition source column '${p.column}' not found"))
      // partition field IDs start at 1000 (iceberg_helper.py:398-425)
      SpecField(srcId, p.transform, p.name, 1000 + i)
    }
  }

  /** CREATE TABLE (A11): fresh schema version 0 with assigned field
    * IDs, spec version 0, empty snapshot list.
    */
  def create(warehouse: String, tableDef: TableDef): (LakeTable, Seq[String]) = {
    val loc = tableLocation(warehouse, tableDef.databaseName, tableDef.tableName)
    require(!Files.exists(loc.resolve("metadata").resolve("version-hint.text")),
      s"table already exists at $loc")
    val (schema, nextId) = FieldIds.assign(
      TypeMapper.toStructType(tableDef.columns), startId = 1)
    val spec = PartitionSpecMeta(0, buildSpecFields(tableDef.partitions, schema))
    val md = TableMetadata(
      formatVersion = 1,
      database = tableDef.databaseName,
      table = tableDef.tableName,
      schemas = Seq(SchemaVersion(0, schema)),
      currentSchemaId = 0,
      specs = Seq(spec),
      currentSpecId = 0,
      snapshots = Seq.empty,
      lastFieldId = nextId - 1,
      properties = tableDef.properties,
      identifierFieldIds = resolveIdentifierFields(
        tableDef.properties.get("identifier-fields"), schema))
    val t = new LakeTable(loc, md)
    val metaFile = t.commit(md)
    (t, Seq(
      s"Created table ${tableDef.databaseName}.${tableDef.tableName}",
      s"Latest Meta file: $metaFile"))
  }

  /** Resolve the `identifier-fields` table property (comma-separated
    * TOP-LEVEL column names — Iceberg v2 requires identifier fields be
    * required primitive fields, not nested under optional structs) to
    * field ids against `schema`. None/empty → no declared identity.
    *
    * Validated at RESOLVE time, mirroring the equality-delete key check
    * (`writeEqDeleteBatch`): each field must be a supported scalar type
    * (struct/map/array cannot identify a row) and non-nullable (Iceberg
    * v2 requires identifier fields be `required` — a nullable identifier
    * would let null key tuples match each other and produce null-keyed
    * last-write-wins semantics the spec forbids). Failing here gives the
    * user a named error at CREATE/ALTER instead of a confusing
    * equality-delete-key failure on the first keyed write.
    */
  private[lake] def resolveIdentifierFields(prop: Option[String],
      schema: StructType): Seq[Int] =
    prop.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
      .map { n =>
        val f = schema.fields.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(
            s"identifier-fields: no top-level column '$n' " +
              s"(have ${schema.fieldNames.mkString(", ")})"))
        require(Seq(IntegerType, LongType, StringType, BooleanType,
          FloatType, DoubleType, DateType, TimestampType, TimestampNTZType)
          .contains(f.dataType) || f.dataType.isInstanceOf[DecimalType],
          s"identifier-fields: '$n' must be a scalar of a supported type " +
            s"(got ${f.dataType.simpleString}) — struct/map/array fields " +
            "cannot identify a row (Iceberg v2 required-primitive rule)")
        require(!f.nullable,
          s"identifier-fields: '$n' must be a required (non-nullable) " +
            "column — Iceberg v2 forbids nullable identifier fields " +
            "(null keys would match each other on upsert)")
        FieldIds.idOf(f)
      }

  /** Iceberg's `snapshot` procedure: a ZERO-COPY clone — the new table
    * gets a full copy of the source's metadata (schemas, specs, the
    * whole snapshot log, refs, staged commits) and references the same
    * data/delete/key files by absolute path; only the O(manifests)
    * manifest documents are copied (names resolve relative to each
    * table's metadata dir). The clone then evolves independently: its
    * writes land under its own directory and never touch shared files.
    *
    * `gc.enabled=false` is stamped on the clone and `removeOrphanFiles`
    * refuses to run on it — a sweep from the clone's reference set
    * could delete nothing safely. The INVERSE hazard is the user's
    * contract, as in Iceberg: expiring + sweeping the SOURCE can delete
    * files the clone still references.
    */
  def snapshotTable(warehouse: String, srcDb: String, srcTable: String,
      toDb: String, toTable: String): (LakeTable, Seq[String]) = {
    val src = load(warehouse, srcDb, srcTable)
    val loc = tableLocation(warehouse, toDb, toTable)
    require(!Files.exists(loc.resolve("metadata").resolve("version-hint.text")),
      s"table already exists at $loc")
    val srcMeta = src.location.resolve("metadata")
    val dstMeta = loc.resolve("metadata")
    Files.createDirectories(dstMeta)
    // REPLACE_EXISTING: a clone that crashed between copying manifests
    // and committing the version hint must be retryable, not wedged on
    // FileAlreadyExists (manifests are immutable — re-copying is safe)
    (src.metadata.snapshots ++ src.metadata.staged)
      .flatMap(s => manifestParts(s.files).map(_.manifestName)).distinct
      .foreach(n => Files.copy(srcMeta.resolve(n), dstMeta.resolve(n),
        StandardCopyOption.REPLACE_EXISTING))
    val cloned = src.metadata.copy(database = toDb, table = toTable,
      properties = src.metadata.properties + ("gc.enabled" -> "false"))
    val t = new LakeTable(loc, cloned)
    val metaFile = t.commit(cloned)
    (t, Seq(
      s"Created snapshot table $toDb.$toTable from $srcDb.$srcTable " +
        s"(${cloned.snapshots.size} snapshots, zero data copied)",
      s"Latest Meta file: $metaFile"))
  }

  def load(warehouse: String, db: String, table: String): LakeTable = {
    // an open SQL transaction on this thread captures every load of
    // its warehouse's tables: statements inside BEGIN…COMMIT read
    // their own staged writes and stage onto the same buffered
    // handles (SqlTxn scaladoc)
    SqlTxn.active match {
      case Some(open) => return open.handleFor(warehouse, db, table)
      case None => ()
    }
    loadRaw(warehouse, db, table)
  }

  /** [[load]] without the SQL-transaction routing — the transaction
    * machinery itself (and anything that must see COMMITTED state
    * regardless of an open transaction) loads through this.
    */
  private[lake] def loadRaw(warehouse: String, db: String,
      table: String): LakeTable = {
    val loc = tableLocation(warehouse, db, table)
    val hint = loc.resolve("metadata").resolve("version-hint.text")
    require(Files.exists(hint), s"no table at $loc")
    val v = Files.readString(hint).trim
    // cross-table atomic visibility: a participant whose transaction's
    // final record says COMMIT is committed the instant that record
    // lands — even if the coordinator hasn't flipped this table's
    // pointer yet. A reader that ignored the committed claim here
    // could see table A new (flipped) and table B old (flip pending):
    // exactly the half-transaction the protocol forbids. One stat per
    // load when no claim exists; pending/aborted claims stay invisible.
    val rolled = LakeTxn.committedClaim(loc, v.toInt)
    rolled.foreach { case (md2, v2) => return new LakeTable(loc, md2, v2) }
    val md = MetadataIO.fromJson(Json.parse(
      Files.readString(loc.resolve("metadata").resolve(s"v$v.json"))),
      loc.resolve("metadata"))
    // pin the handle's version to the hint value the DOCUMENT was
    // resolved from (see the loadedVersion scaladoc: re-reading the
    // hint in the constructor races a concurrent commit)
    new LakeTable(loc, md, v.toInt)
  }

  /** Whole-body optimistic retry around [[LakeTable!.transaction]]:
    * on a concurrency abort, reload a FRESH handle and re-run the
    * entire body against the new state. This is the sound complement
    * of the in-transaction design (op-level retry is disabled there
    * because a single op rebuilt on another writer's commit would
    * smuggle foreign state into the transaction's one publish) — the
    * body is a closure over a handle, so re-running it from a fresh
    * load recomputes EVERY op against the winner's state, exactly the
    * "reload and retry the whole body" the abort message demands.
    * Jittered backoff between attempts keeps a herd of writers from
    * re-colliding in lockstep. Exhausted attempts rethrow the last
    * conflict; non-conflict failures propagate immediately (they
    * would fail identically on any state).
    */
  def transactionWithRetry[A](warehouse: String, db: String,
      table: String, attempts: Int = 5)(body: LakeTable => A): A = {
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var n = 0
    while (true) {
      n += 1
      try return load(warehouse, db, table).transaction(body)
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (n >= attempts) throw e
          Thread.sleep(
            scala.util.Random.nextInt(40 * n).toLong + 5)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
