package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.Transforms

/** V2 partition-transform functions (`years`/`months`/`days`/`hours`)
  * served by the LakeCatalog's FunctionCatalog half. Spark resolves a
  * scan's reported `years(ts)` clustering through these, which is what
  * lets storage-partitioned joins engage on time-partitioned tables:
  * both sides bind the same canonical function, so `a.ts = b.ts` joins
  * line partition groups up without a shuffle.
  *
  * Result = the exact Hive dir-value string the writers produce
  * (Transforms.render*), so HasPartitionKey values and function output
  * agree. Wall-clock inputs only (timestamp_ntz / date) — tz-aware
  * rendering would depend on the session timezone.
  */
object LakeFunctions {
  val byName: Map[String, String] = Map(
    "years" -> "year", "months" -> "month",
    "days" -> "day", "hours" -> "hour")

  val names: Seq[String] = byName.keys.toSeq ++ Seq("bucket", "truncate")

  /** `truncate_W` width-in-name family: Spark's storage-partitioned-join
    * machinery only admits transforms whose expression has exactly ONE
    * reference child (`KeyGroupedPartitioning.supportsExpressions`;
    * bucket escapes via a special case hoisting numBuckets out of the
    * children). A literal-arg `truncate(W, col)` therefore can never
    * report key-grouped partitioning — so the scan reports the width
    * inside the function NAME (`truncate_16(col)`) and the catalog
    * serves the whole family by pattern.
    */
  private val widthRe = """truncate_(\d+)""".r

  def isKnown(v2name: String): Boolean =
    names.contains(v2name) || widthRe.matches(v2name)

  def unbound(v2name: String): UnboundFunction = v2name match {
    case "bucket" => new BucketUnbound
    case "truncate" => new TruncateUnbound
    case widthRe(w) => new TruncateWUnbound(w.toInt)
    case _ => new TimeTransformUnbound(v2name, byName(v2name))
  }
}

/** bucket(N, col): Spark murmur3 `hash(col)` mod N — the same value the
  * batch writer's `pmod(hash(col), N)` partition expression derives,
  * so reported bucket clustering, stored dir values, and this function
  * always agree. numBuckets arrives as the leading INT argument (the
  * V2 BucketTransform convention).
  */
private[sources] class BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft hidden-partition hash bucket"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      "bucket takes (numBuckets, col)")
    BucketFn(inputType.fields(1).dataType)
  }
}

private[sources] case class BucketFn(input: DataType)
    extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, input)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.lake.bucket"
  override def produceResult(row: InternalRow): Int = {
    val n = row.getInt(0)
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(row.get(1, input), input, 42L).toInt
    val m = h % n
    if (m < 0) m + n else m
  }
}

/** truncate(W, col): int/long floor to the nearest multiple of W,
  * string prefix of W characters — identical to the batch writer's
  * `col - pmod(col, W)` / `substring(col, 1, W)` partition expressions,
  * so reported truncate clustering, stored dir values, and this
  * function agree. Width arrives as the leading INT argument (the V2
  * transform convention, same as bucket).
  */
private[sources] class TruncateUnbound extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): graft hidden-partition truncate"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      "truncate takes (width, col)")
    inputType.fields(1).dataType match {
      case dt @ (IntegerType | LongType | StringType) => TruncateFn(dt)
      case dt => throw new UnsupportedOperationException(
        s"truncate: unsupported input ${dt.simpleString} (int, long, string)")
    }
  }
}

private[sources] case class TruncateFn(input: DataType)
    extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, input)
  override def resultType(): DataType = input
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.lake.truncate"
  override def isResultNullable: Boolean = true
  override def produceResult(row: InternalRow): Any = {
    val w = row.getInt(0)
    if (row.isNullAt(1)) return null
    TruncateFn.eval(input, w, row, 1)
  }
}

private[sources] object TruncateFn {
  def eval(input: DataType, w: Int, row: InternalRow, ord: Int): Any =
    input match {
      case IntegerType =>
        val v = row.getInt(ord); v - Math.floorMod(v, w)
      case LongType =>
        val v = row.getLong(ord); v - Math.floorMod(v, w.toLong)
      case _ => row.getUTF8String(ord).substringSQL(1, w)
    }
}

/** The single-argument width-in-name variant (`truncate_16(col)`) the
  * scan reports for key-grouped partitioning — see LakeFunctions.
  */
private[sources] class TruncateWUnbound(w: Int) extends UnboundFunction {
  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): graft hidden-partition truncate (width $w)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"truncate_$w takes exactly one argument")
    inputType.fields(0).dataType match {
      case dt @ (IntegerType | LongType | StringType) => TruncateWFn(w, dt)
      case dt => throw new UnsupportedOperationException(
        s"truncate_$w: unsupported input ${dt.simpleString} (int, long, string)")
    }
  }
}

private[sources] case class TruncateWFn(w: Int, input: DataType)
    extends ScalarFunction[Any] {
  override def inputTypes(): Array[DataType] = Array(input)
  override def resultType(): DataType = input
  override def name(): String = s"truncate_$w"
  override def canonicalName(): String = s"graft.lake.truncate_$w"
  override def isResultNullable: Boolean = true
  override def produceResult(row: InternalRow): Any =
    if (row.isNullAt(0)) null else TruncateFn.eval(input, w, row, 0)
}

private[sources] class TimeTransformUnbound(v2name: String,
    transform: String) extends UnboundFunction {
  override def name(): String = v2name
  override def description(): String =
    s"$v2name(col): graft hidden-partition $transform transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"$v2name takes exactly one argument")
    inputType.fields(0).dataType match {
      case dt @ (TimestampNTZType | DateType) =>
        TimeTransformFn(v2name, transform, dt)
      case dt => throw new UnsupportedOperationException(
        s"$v2name: unsupported input ${dt.simpleString} " +
          "(timestamp_ntz or date)")
    }
  }
}

private[sources] case class TimeTransformFn(v2name: String,
    transform: String, input: DataType) extends ScalarFunction[UTF8String] {
  override def inputTypes(): Array[DataType] = Array(input)
  override def resultType(): DataType = StringType
  override def name(): String = v2name
  override def canonicalName(): String = s"graft.lake.$v2name"
  override def isResultNullable: Boolean = true
  override def produceResult(row: InternalRow): UTF8String =
    if (row.isNullAt(0)) null
    else UTF8String.fromString(input match {
      case DateType => Transforms.renderEpochDay(transform, row.getInt(0))
      case _ => Transforms.renderNtzMicros(transform, row.getLong(0))
    })
}
