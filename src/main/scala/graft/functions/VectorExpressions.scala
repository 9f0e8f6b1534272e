package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for float-vector math — the hot path of
  * similarity search at scale. Unlike higher-order array functions
  * (interpreted, no codegen) these generate a tight Java loop inside
  * whole-stage codegen, and unlike the DECIMAL-accumulated variants in
  * graft.queries.Pipeline (pinned for cross-engine oracle parity) they
  * use plain IEEE double accumulation in array order.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += (double) $a.getFloat(i) * (double) $b.getFloat(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in a single pass (dot and both norms in one loop). */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_cosine"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xv = (double) $a.getFloat(i);
         |  double yv = (double) $b.getFloat(i);
         |  dot += xv * yv; na += xv * xv; nb += yv * yv;
         |}
         |${ev.value} = (na == 0.0 || nb == 0.0)
         |  ? 0.0 : dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** JVM kernels for the DECIMAL-exact vector math. Semantics replicate
  * the higher-order-function formulation pinned for oracle parity
  * (graft.queries.Pipeline.dotDec): each product is computed in IEEE
  * double, rounded to DECIMAL scale 12 HALF_UP (what Spark's
  * double→DECIMAL(28,12) cast does), and accumulated exactly — decimal
  * addition at a fixed scale is associative, so the result is
  * partition-order-independent. The HOF chain evaluates an interpreted
  * expression tree per element; this is one loop per row.
  */
object DecVector {
  private val twelve = 12
  // DECIMAL(28,12) holds 16 integer digits — the HOF spec raises an
  // ANSI cast error past that, so the kernel must error too, not
  // silently return a finite double
  private val maxProduct = 1e16

  private def term(p: Double): java.math.BigDecimal = {
    if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p) ||
        math.abs(p) >= maxProduct)
      throw new ArithmeticException(
        s"dec_dot/dec_normsq: product $p does not fit DECIMAL(28,12) " +
          "(the decimal-HOF spec raises an ANSI cast error here)")
    java.math.BigDecimal.valueOf(p)
      .setScale(twelve, java.math.RoundingMode.HALF_UP)
  }

  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    // zip_with pads the shorter array with null → null product → null
    // sum; replicate by returning null on length mismatch
    if (x.numElements() != y.numElements()) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc.add(term(x.getFloat(i).toDouble * y.getFloat(i).toDouble))
      i += 1
    }
    acc.doubleValue()
  }

  def normSq(x: ArrayData): java.lang.Double = {
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      acc = acc.add(term(v * v))
      i += 1
    }
    acc.doubleValue()
  }
}

/** Decimal-exact dot product (oracle-parity semantics, JVM loop). */
case class DecimalDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dec_dot"
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DecVector.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = graft.functions.DecVector.dot($a, $b);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Decimal-exact squared norm (oracle-parity semantics, JVM loop). */
case class DecimalNormSq(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dec_normsq"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    DecVector.normSq(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Double r = graft.functions.DecVector.normSq($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> (es => FloatDot(es(0), es(1))),
    "float_cosine" -> (es => FloatCosine(es(0), es(1))),
    "dec_dot" -> (es => DecimalDot(es(0), es(1))),
    "dec_normsq" -> (es => DecimalNormSq(es(0))),
    "token_stats" -> (es => TokenStats(es(0))),
    "graft_zorder" -> (es => ZOrderValue(es)))

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }

  def float_dot(a: Column, b: Column): Column = call_function("float_dot", a, b)
  def float_cosine(a: Column, b: Column): Column = call_function("float_cosine", a, b)
  def dec_dot(a: Column, b: Column): Column = call_function("dec_dot", a, b)
  def dec_normsq(a: Column): Column = call_function("dec_normsq", a)
  def token_stats(a: Column): Column = call_function("token_stats", a)
  def zorder(cols: Column*): Column = call_function("graft_zorder", cols: _*)
}

/** Session-extension registration (`spark.sql.extensions=graft.functions.
  * GraftExtensions` or `.withExtensions(new GraftExtensions)`): makes the
  * vector functions available in every session, incl. pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (es: Seq[Expression]) => FloatDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("float_cosine"),
      new ExpressionInfo(classOf[FloatCosine].getName, "float_cosine"),
      (es: Seq[Expression]) => FloatCosine(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dec_dot"),
      new ExpressionInfo(classOf[DecimalDot].getName, "dec_dot"),
      (es: Seq[Expression]) => DecimalDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("dec_normsq"),
      new ExpressionInfo(classOf[DecimalNormSq].getName, "dec_normsq"),
      (es: Seq[Expression]) => DecimalNormSq(es(0))))
    e.injectFunction((ZOrderFunction.identifier, ZOrderFunction.info,
      ZOrderFunction.builder))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // variant-extraction scope prep (r17): hoist agg(variant_get(...))
    // into a Project the upstream pushdown rule can see, and record the
    // referenced-column set so variant-accepted scans can prune the
    // non-variant columns pruneColumns never gets to. Pre-CBO slot:
    // Once, after the fixed-point operator batch (CollapseProject would
    // re-inline the hoisted Project), right before early scan pushdown.
    e.injectPreCBORule(_ => graft.sources.VariantScanPrep)
    // ALTER TABLE ... ADD/DROP PARTITION FIELD (Iceberg's
    // spec-evolution DDL; Spark's parser has no such statement) plus
    // the persistent-view DDL (stock Spark refuses view statements on
    // v2 catalogs)
    e.injectParser((_, delegate) =>
      new org.apache.spark.sql.GraftSqlParser(delegate))
    // SELECT over lake-catalog views: substitute the stored SQL as a
    // subquery during resolution (Iceberg's ResolveViews shape)
    e.injectResolutionRule(session =>
      org.apache.spark.sql.GraftViewSubstitution(session))
    // materialized-view aggregate rewrite: a matching, FRESH MV
    // answers the aggregate instead of the source scan (post-analysis
    // so the detection machinery sees resolved plans); off with
    // spark.graft.matview.rewrite=false
    e.injectPostHocResolutionRule(session =>
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(plan: org.apache.spark.sql.catalyst.plans
            .logical.LogicalPlan) =
          graft.sources.MatViewRewrite(session, plan)
      })
  }
}
