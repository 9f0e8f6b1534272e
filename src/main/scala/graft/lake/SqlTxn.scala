package graft.lake

/** Session-scoped SQL transactions: `BEGIN TRANSACTION` / `COMMIT` /
  * `ROLLBACK` over any number of lake tables, with every statement in
  * between staging against buffered table handles and ONE atomic
  * publish at COMMIT (the single-table pointer flip, or the
  * [[LakeTxn]] cross-table protocol when several tables staged).
  *
  * Semantics:
  *   - **Read-your-writes**: while a transaction is open on this
  *     thread, every [[LakeTable.load]] of a table in the
  *     transaction's warehouse resolves to the transaction's buffered
  *     handle — scans see the staged snapshots, and later statements
  *     chain on earlier ones. Tables are enlisted lazily at first
  *     touch (read OR write), pinning their snapshot-isolation view.
  *   - **All-or-nothing**: no observer (another thread, another
  *     process) sees any staged change before COMMIT, and after a
  *     crash or conflict either every table's flip happens or none —
  *     the cross-table final record decides, exactly as for
  *     [[LakeTxn.transaction]].
  *   - **Optimistic**: a concurrent commit to an enlisted table
  *     surfaces at BEGIN-touch (staleness fail-fast) or at COMMIT
  *     (claim CAS / final-record race) as
  *     `ConcurrentModificationException`; the transaction is dead
  *     either way — re-run the whole block.
  *   - **One warehouse per transaction**: the first lake table touched
  *     binds the warehouse; touching a different warehouse refuses by
  *     name (a cross-warehouse final record would have no home that
  *     both sides trust).
  *   - **Thread-scoped**: the transaction belongs to the thread that
  *     ran BEGIN — the unit a SQL session serializes statements on.
  *     Other threads (including concurrent queries in the same JVM)
  *     keep reading committed state.
  *
  * Rollback discards the buffered metadata; data files already written
  * by staged operations become unreferenced orphans for
  * `removeOrphanFiles`, identical to any lost commit attempt.
  * Maintenance that opens its OWN single-table transaction on an
  * enlisted handle (e.g. REFRESH MATERIALIZED VIEW) refuses inside an
  * open SQL transaction rather than nesting.
  */
object SqlTxn {

  /** One open transaction: lazily-bound warehouse plus the buffered
    * handles, in first-touch order. */
  final class Open private[SqlTxn] () {
    private[SqlTxn] var warehouse: Option[String] = None
    private[SqlTxn] val handles =
      scala.collection.mutable.LinkedHashMap
        .empty[(String, String), (LakeTable, TableMetadata)]

    private[lake] def handleFor(wh: String, db: String,
        name: String): LakeTable = {
      warehouse.foreach(w => require(w == wh,
        s"the open transaction is bound to warehouse '$w'; a lake " +
          s"table in '$wh' cannot join it — COMMIT or ROLLBACK " +
          "first (cross-warehouse transactions have no commit " +
          "record both sides trust)"))
      val h = handles.getOrElseUpdate((db, name), {
        val t = LakeTable.loadRaw(wh, db, name)
        (t, t.txnBegin())
      })._1
      // bind only AFTER a successful enlist — a failed first touch
      // (missing table, enlist-time conflict) must not pin the open
      // transaction to a warehouse it holds nothing in
      warehouse = Some(wh)
      h
    }
  }

  private val openTL = new ThreadLocal[Option[Open]] {
    override def initialValue: Option[Open] = None
  }

  /** The transaction open on THIS thread, if any — consulted by
    * [[LakeTable.load]] to route loads to buffered handles. */
  def active: Option[Open] = openTL.get()

  def begin(): Unit = {
    require(openTL.get().isEmpty,
      "a transaction is already open on this session — COMMIT or " +
        "ROLLBACK it before BEGIN")
    openTL.set(Some(new Open()))
  }

  /** Publish every staged table atomically. Returns the number of
    * tables that actually staged changes. READ-ONLY enlisted tables
    * are validated UNDER CLAIM (first-committer-wins read validation
    * — without it, `INSERT INTO b SELECT … FROM a` could publish data
    * derived from a stale view of `a` with no error, classic write
    * skew): whenever the transaction publishes anything alongside
    * reads, every read-only table joins the cross-table protocol as a
    * participant with UNCHANGED metadata — its claim CAS (CREATE_NEW
    * of the next version) is the validation, and it is HELD through
    * the final record, so no concurrent commit can land on a read
    * table between validation and publish. The price is one
    * content-identical metadata version per read table per
    * transaction. A transaction that staged nothing publishes nothing
    * — its reads conflict with nothing, so it only fail-fast
    * validates ([[LakeTable.stillCurrent]], which also treats an
    * in-flight v+1 claim as a conflict). The transaction is closed
    * whether the publish succeeds or conflicts — optimistic
    * transactions are not resumable.
    */
  def commit(): Int = {
    val open = openTL.get().getOrElse(throw new IllegalStateException(
      "no open transaction — run BEGIN TRANSACTION first"))
    openTL.set(None)
    val parts = open.handles.values.toSeq.map {
      case (t, base) => (t, t.txnEnd(base), base)
    }
    val staged = parts.collect { case (t, Some(n), _) => (t, n) }
    val readOnly = parts.collect { case (t, None, base) => (t, base) }
    staged match {
      case Seq() =>
        readOnly.foreach { case (t, _) =>
          if (!t.stillCurrent)
            throw new java.util.ConcurrentModificationException(
              s"table ${t.location} was committed concurrently while " +
                "this transaction read it — reload and retry the " +
                "whole transaction")
        }
        0
      case Seq((t, next)) if readOnly.isEmpty => t.commitNext(next); 1
      case some =>
        LakeTxn.commitCross(open.warehouse.get,
          (some ++ readOnly).sortBy(_._1.location.toString))
        some.size
    }
  }

  /** Discard every staged change; staged data files are orphans. */
  def rollback(): Int = {
    val open = openTL.get().getOrElse(throw new IllegalStateException(
      "no open transaction — run BEGIN TRANSACTION first"))
    openTL.set(None)
    val n = open.handles.values.count { case (t, base) =>
      val changed = !(t.metadata eq base)
      t.txnRollback(base)
      changed
    }
    n
  }
}
