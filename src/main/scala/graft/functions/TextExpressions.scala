package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row token statistics for the Gopher-rule curation
  * operators (q_quality_repetition, q_curriculum): token count,
  * distinct tokens, bigram count, distinct bigrams, and the top
  * token's occurrence count — in a single JVM pass over the array.
  *
  * The previous formulation chained interpreted higher-order
  * expressions (`aggregate` over `array_sort` for the top count,
  * `transform`+`concat` to materialize every bigram string, then
  * `array_distinct` over them) — Spark's HOFs have no codegen, and the
  * bigram path allocated one string per adjacent pair per row. This
  * kernel is the same r17 move as the shingle/dec-vector kernels
  * (guide §1.2 step 2: per-task work).
  *
  * Semantics are pinned EXACTLY to the HOF chain it replaces
  * (TokenStatsSpec cross-checks against the original expressions,
  * nulls and empties included):
  *   - n_tokens            = size(l)
  *   - n_distinct_tokens   = size(array_distinct(l))   (null is a value)
  *   - n_bigrams           = size(bg(l)) = max(n-1, 0)
  *   - n_distinct_bigrams  = size(array_distinct(bg(l))) where bg
  *     concatenates adjacent tokens with a single space and a null
  *     neighbor nulls the bigram (concat semantics) — array_distinct
  *     keeps one null
  *   - top_cnt             = the longest equal-element run of the
  *     SORTED array: max multiplicity over non-null tokens, and any
  *     null token contributes a run of exactly 1 (null === null is
  *     null in the aggregate's comparison, so null runs never extend)
  */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    TokenStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false)))

  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](
      math.max(16, n * 2))
    var top = 0
    var sawNullToken = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNullToken = true
      else {
        val t = arr.getUTF8String(i)
        val c = counts.merge(t, Integer.valueOf(1),
          (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
        if (c.intValue > top) top = c.intValue
      }
      i += 1
    }
    // a null token is its own run of 1 in the sorted-run formulation
    // (null === null is null, so runs never extend across nulls)
    if (sawNullToken && top < 1) top = 1
    val nDistinctTokens = counts.size + (if (sawNullToken) 1 else 0)
    // distinct bigram STRINGS, exactly as concat(a, ' ', b) builds them
    // (a null neighbor nulls the whole bigram; distinct keeps one null)
    var nDistinctBigrams = 0
    var sawNullBigram = false
    if (n >= 2) {
      val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
      i = 0
      while (i + 1 < n) {
        if (arr.isNullAt(i) || arr.isNullAt(i + 1)) sawNullBigram = true
        else if (seen.add(UTF8String.concat(
            arr.getUTF8String(i), Space, arr.getUTF8String(i + 1))))
          nDistinctBigrams += 1
        i += 1
      }
    }
    if (sawNullBigram) nDistinctBigrams += 1
    new GenericInternalRow(Array[Any](
      n, nDistinctTokens, math.max(n - 1, 0), nDistinctBigrams, top))
  }
}
