package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave for multi-dimensional write clustering.
  *
  * `graft_zorder(bin1, bin2, …)` takes PRE-SCALED non-negative integer
  * bins (each < 2^(63/n)) and interleaves their low bits MSB-first into
  * one Long. Raw column values must be binned against their batch
  * min/max first (LakeTable's writer does this) — interleaving raw
  * 64-bit values would put every row's entropy below the interleaved
  * window and collapse the curve to a constant.
  *
  * Files written sorted by this value cover a small hyper-rectangle of
  * the binned space, so min/max stats stay narrow on EVERY listed
  * column and a predicate on any dimension prunes files (a
  * single-column sort only helps its own column).
  */
object ZOrderUtil {

  /** Interleave the low `bitsPer` bits of each key, MSB-first. */
  def interleave(keys: Array[Long], bitsPer: Int): Long = {
    val n = keys.length
    var out = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        out = (out << 1) | ((keys(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }
}

case class ZOrderValue(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty && children.size <= 8, "zorder takes 1-8 columns")

  private val bitsPer: Int = 63 / children.size

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case LongType | IntegerType | ShortType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_zorder requires pre-binned integral arguments; bin raw " +
        "columns against min/max first")
  }

  private val mask = (1L << bitsPer) - 1

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val keys = new Array[Long](children.size)
    var i = 0
    while (i < keys.length) {
      val v = children(i).eval(input)
      keys(i) = if (v == null) 0L
        else (v.asInstanceOf[Number].longValue.max(0L)) & mask
      i += 1
    }
    ZOrderUtil.interleave(keys, bitsPer)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val util = "graft.functions.ZOrderUtil" // static forwarders
    val childCodes = children.map(_.genCode(ctx))
    val keys = ctx.freshName("zkeys")
    val evalAll = childCodes.map(_.code).reduce(_ + _)
    val assigns = childCodes.zipWithIndex.map { case (g, i) =>
      s"$keys[$i] = ${g.isNull} ? 0L : " +
        s"(java.lang.Math.max((long) ${g.value}, 0L) & ${mask}L);"
    }.mkString("\n")
    ev.copy(
      code = evalAll + code"""
        |long[] $keys = new long[${children.size.toString}];
        |$assigns
        |long ${ev.value} = $util.interleave($keys, ${bitsPer.toString});""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderValue =
    copy(children = newChildren)
}

object ZOrderFunction {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_zorder")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ZOrderValue].getName, "graft_zorder")
  val builder: Seq[Expression] => Expression = es => ZOrderValue(es)
}
