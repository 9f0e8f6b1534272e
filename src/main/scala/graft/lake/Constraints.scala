package graft.lake

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types.{DoubleType, FloatType, StringType,
  StructType}

/** CHECK constraints: named boolean expressions stored as table
  * properties (`constraint.<name>` → SQL text) and enforced on EVERY
  * commit that adds data files — appends, upserts, copy-on-write
  * rewrites, by-reference `add_files`, branch stages. SQL semantics:
  * a row violates only when the expression evaluates to FALSE (NULL
  * passes, like every warehouse's CHECK).
  *
  * Scale story — STATS-FIRST validation: the violation set of each
  * provable comparison atom becomes a [[RangeFilter]], and a new file
  * whose footer min/max/null-count stats prove it cannot contain a
  * violating row is accepted WITHOUT being read. Only unproven files
  * get the one-pass violation scan (`limit(1)` — first violation
  * aborts), and only the COMMIT DELTA is ever validated, so a
  * well-partitioned 100 TB append validates at O(footers), not
  * O(bytes). `ALTER TABLE … ADD CONSTRAINT` validates existing data
  * through the same stats-first pass inside one transaction (the
  * staleness CAS closes the validate→publish race).
  */
private[graft] object Constraints {

  val Prefix = "constraint."

  def of(props: Map[String, String]): Map[String, String] =
    props.collect {
      case (k, v) if k.startsWith(Prefix) =>
        k.stripPrefix(Prefix) -> v
    }

  /** Top-level column names the expression references (nested paths
    * count their root). */
  def referencedCols(sql: String): Seq[String] =
    CatalystSqlParser.parseExpression(sql).collect {
      case a: UnresolvedAttribute => a.nameParts.head
    }.distinct

  /** Stats filters describing each provable atom's VIOLATION set —
    * a file that might-match NONE of them cannot hold a violating
    * row. None when any conjunct is not a provable comparison shape
    * (the caller then scans every new file). NULL results PASS a
    * CHECK, so a `c > K` violation is `c <= K AND c IS NOT NULL` —
    * bounds only, no null disjunct; `c IS NOT NULL`'s violation is
    * the null-count filter.
    */
  def violationFilters(sql: String,
      schema: StructType): Option[Seq[RangeFilter]] = {
    val key = (sql, schema)
    val hit = filterCache.get(key)
    if (hit != null) return hit
    val computed = computeViolationFilters(sql, schema)
    if (filterCache.size > 4096) filterCache.clear() // unbounded-growth guard
    filterCache.put(key, computed)
    computed
  }

  /** Every commit of a constrained table re-derives the violation
    * filters of the SAME (sql, schema) pair — the expression parse
    * dominated a many-append lifecycle, so the derivation memoizes
    * (both keys are immutable values; the cache is pure).
    */
  private val filterCache = new java.util.concurrent.ConcurrentHashMap[
    (String, StructType), Option[Seq[RangeFilter]]]

  private def computeViolationFilters(sql: String,
      schema: StructType): Option[Seq[RangeFilter]] = {
    def num(l: Literal): Option[BigDecimal] = l.value match {
      case null => None
      case i: Int => Some(BigDecimal(i))
      case i: Long => Some(BigDecimal(i))
      case i: Short => Some(BigDecimal(i.toInt))
      case i: Byte => Some(BigDecimal(i.toInt))
      case d: Double => Some(BigDecimal(d))
      case f: Float => Some(BigDecimal(f.toDouble))
      case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
      case _ => None
    }
    def str(l: Literal): Option[String] = l.dataType match {
      case StringType => Option(l.value).map(_.toString)
      case _ => None
    }
    def colOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.size == 1 =>
        Some(a.nameParts.head).filter(n =>
          schema.fieldNames.contains(n))
      case _ => None
    }
    // violation bound for "column CMP literal": hi = rows at/below,
    // lo = rows at/above (inclusive — conservative at the boundary
    // for the non-strict comparisons).
    //
    // FLOAT/DOUBLE columns widen each bound by 2 ulps: the engine
    // evaluates the CHECK in BINARY float arithmetic (a decimal
    // literal casts, rounding by ≤ half an ulp), while footer stats
    // round-trip through the shortest decimal representation (another
    // ≤ half ulp) — comparing the exact-decimal bound against the
    // rendered stats could otherwise prove a boundary file 'clean'
    // whose rows violate under binary comparison (e.g. CHECK
    // (c < 0.30000000000000001) vs a file of doubles 0.3). A 2-ulp
    // widening strictly over-approximates both roundings; a literal
    // outside the type's finite range skips the filter (scan instead).
    def widened(c: String, v: BigDecimal): Option[BigDecimal] =
      schema.fields.find(_.name == c).map(_.dataType) match {
        case Some(DoubleType) =>
          val d = v.toDouble
          if (java.lang.Double.isFinite(d))
            Some(BigDecimal(2.0 * math.ulp(if (d == 0.0) 1e-300 else d)))
          else None
        case Some(FloatType) =>
          val f = v.toFloat
          if (java.lang.Float.isFinite(f))
            Some(BigDecimal(2.0 * math.ulp(
              if (f == 0.0f) java.lang.Float.MIN_NORMAL else f).toDouble))
          else None
        case _ => Some(BigDecimal(0))
      }
    def bound(c: String, l: Literal, hi: Boolean)
        : Option[RangeFilter] =
      num(l).flatMap(v => widened(c, v).map(w =>
        if (hi) RangeFilter(c, hiNum = Some(v + w))
        else RangeFilter(c, loNum = Some(v - w))))
        .orElse(str(l).map(v =>
          if (hi) RangeFilter(c, hiStr = Some(v))
          else RangeFilter(c, loStr = Some(v))))
    def atom(e: Expression): Option[Seq[RangeFilter]] = e match {
      case And(a, b) =>
        for { x <- atom(a); y <- atom(b) } yield x ++ y
      case GreaterThan(c, l: Literal) =>
        colOf(c).flatMap(bound(_, l, hi = true)).map(Seq(_))
      case GreaterThanOrEqual(c, l: Literal) =>
        colOf(c).flatMap(bound(_, l, hi = true)).map(Seq(_))
      case LessThan(c, l: Literal) =>
        colOf(c).flatMap(bound(_, l, hi = false)).map(Seq(_))
      case LessThanOrEqual(c, l: Literal) =>
        colOf(c).flatMap(bound(_, l, hi = false)).map(Seq(_))
      // mirrored literal: K cmp c  ≡  c cmp' K
      case GreaterThan(l: Literal, c) =>
        colOf(c).flatMap(bound(_, l, hi = false)).map(Seq(_))
      case GreaterThanOrEqual(l: Literal, c) =>
        colOf(c).flatMap(bound(_, l, hi = false)).map(Seq(_))
      case LessThan(l: Literal, c) =>
        colOf(c).flatMap(bound(_, l, hi = true)).map(Seq(_))
      case LessThanOrEqual(l: Literal, c) =>
        colOf(c).flatMap(bound(_, l, hi = true)).map(Seq(_))
      case IsNotNull(c) =>
        colOf(c).map(n => Seq(RangeFilter(n, isNull = true)))
      case _ => None
    }
    try atom(CatalystSqlParser.parseExpression(sql))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** (files scanned, files validated) of the last constraint
    * validation ON THIS THREAD — a test/tooling observable for the
    * stats-first proof. ThreadLocal (not JVM-global): under a
    * concurrent verify/test pool another session's commit would
    * otherwise interleave between a key's append and its read of the
    * observable (same fix as MatViewRewrite.lastRewriteTL).
    */
  private val lastValidationScanTL =
    new ThreadLocal[Option[(Int, Int)]] {
      override def initialValue(): Option[(Int, Int)] = None
    }
  private[graft] def lastValidationScan: Option[(Int, Int)] =
    lastValidationScanTL.get()
  private[graft] def lastValidationScan_=(v: Option[(Int, Int)]): Unit =
    lastValidationScanTL.set(v)
}
