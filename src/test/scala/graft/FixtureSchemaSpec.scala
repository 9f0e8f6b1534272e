package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-fixture preflight (round-5 postmortem: the regenerated
  * events.parquet silently changed `ts` from TIMESTAMP(NANOS) to plain
  * timestamp[us] and 15 queries lost their correctness rows to an
  * analysis error deep inside a window function). This spec pins, per
  * table, the column NAMES exactly and each column's broad type family
  * — so the next fixture drift fails HERE with the table and column
  * named, a one-line diagnosis instead of an archaeology session.
  * Timestamp-ish columns accept every encoding `Tables.events` adapts
  * to (long nanos / timestamp / timestamp_ntz).
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  // N numeric (int/long/float/double/decimal), S string, T timestampish,
  // A array, B binary
  private val expected: Map[String, Seq[(String, Char)]] = Map(
    "region" -> Seq("r_regionkey" -> 'N', "r_name" -> 'S'),
    "nation" -> Seq("n_nationkey" -> 'N', "n_name" -> 'S',
      "n_regionkey" -> 'N'),
    "customer" -> Seq("c_custkey" -> 'N', "c_name" -> 'S',
      "c_nationkey" -> 'N', "c_acctbal" -> 'N', "c_mktsegment" -> 'S'),
    "supplier" -> Seq("s_suppkey" -> 'N', "s_name" -> 'S',
      "s_nationkey" -> 'N', "s_acctbal" -> 'N'),
    "part" -> Seq("p_partkey" -> 'N', "p_name" -> 'S', "p_brand" -> 'S',
      "p_type" -> 'S', "p_size" -> 'N', "p_retailprice" -> 'N'),
    "orders" -> Seq("o_orderkey" -> 'N', "o_custkey" -> 'N',
      "o_orderstatus" -> 'S', "o_totalprice" -> 'N', "o_orderdate" -> 'T',
      "o_orderpriority" -> 'S'),
    "lineitem" -> Seq("l_orderkey" -> 'N', "l_partkey" -> 'N',
      "l_suppkey" -> 'N', "l_linenumber" -> 'N', "l_quantity" -> 'N',
      "l_extendedprice" -> 'N', "l_discount" -> 'N', "l_tax" -> 'N',
      "l_returnflag" -> 'S', "l_linestatus" -> 'S', "l_shipdate" -> 'T'),
    "events" -> Seq("event_id" -> 'N', "ts" -> 'T', "user_id" -> 'N',
      "event_type" -> 'S', "value" -> 'N', "props" -> 'S'),
    "documents" -> Seq("doc_id" -> 'N', "text" -> 'S', "lang" -> 'S',
      "source" -> 'S', "n_chars" -> 'N'),
    "embeddings" -> Seq("vec_id" -> 'N', "embedding" -> 'A',
      "label" -> 'N'))

  private def family(dt: DataType): Char = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: FloatType |
         _: DoubleType | _: DecimalType => 'N'
    case _: StringType => 'S'
    case _: TimestampType | _: TimestampNTZType | _: DateType => 'T'
    case _: ArrayType => 'A'
    case _: BinaryType => 'B'
    case _ => '?'
  }

  // ts-family columns may also arrive as raw int64 nanos (the pre-r5
  // encoding under nanosAsLong) — Tables.events adapts; accept both
  private def matches(want: Char, dt: DataType): Boolean =
    family(dt) == want || (want == 'T' && dt.isInstanceOf[LongType])

  expected.toSeq.sortBy(_._1).foreach { case (table, cols) =>
    test(s"fixture schema: $table") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      assert(schema.fieldNames.toSeq == cols.map(_._1),
        s"$table: column drift — got ${schema.fieldNames.mkString(", ")}")
      cols.foreach { case (name, want) =>
        val dt = schema(name).dataType
        assert(matches(want, dt),
          s"$table.$name: type family drift — got ${dt.simpleString}, " +
            s"wanted family '$want'")
      }
    }
  }
}
