package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Expected shapes of the driver-generated test tables, used two ways:
  * FixtureSchemaSpec pins them under `sbt test`, and `graft.Verify`
  * preflights them at driver-run time — so a fixture regeneration that
  * drifts a schema (round-5 postmortem: events.ts changed physical
  * encoding and 15 queries died deep inside window functions) is
  * diagnosed in ONE stderr line naming the table and column, before
  * any query runs.
  *
  * Families: N numeric, S string, T timestampish (timestamp /
  * timestamp_ntz / date / raw int64-nanos under nanosAsLong), A array,
  * B binary.
  */
object FixtureSchemas {

  val expected: Map[String, Seq[(String, Char)]] = Map(
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

  def family(dt: DataType): Char = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: FloatType |
         _: DoubleType | _: DecimalType => 'N'
    case _: StringType => 'S'
    case _: TimestampType | _: TimestampNTZType | _: DateType => 'T'
    case _: ArrayType => 'A'
    case _: BinaryType => 'B'
    case _ => '?'
  }

  def matches(want: Char, dt: DataType): Boolean =
    family(dt) == want || (want == 'T' && dt.isInstanceOf[LongType])

  /** One problem line per drifted table — empty means all clear. Never
    * throws: a missing/corrupt file reports as a line too, and the
    * caller decides whether to continue.
    */
  /** The family expectations rendered as JSON for the ORACLE side:
    * `graft.Verify` dumps this next to oracle_sql.json so the python
    * compare (driver or tools/check.py) can preflight DUCKDB's view of
    * the same fixtures. Families are engine-agnostic, so one source of
    * truth serves both preflights — and a drift report can then name
    * WHICH engine's view moved (a new logical type that only DuckDB
    * maps differently would otherwise surface as opaque hash
    * mismatches).
    */
  def expectationsJson: String =
    expected.toSeq.sortBy(_._1).map { case (t, cols) =>
      "\"" + t + "\": {" + cols.map { case (c, f) =>
        s""""$c": "$f"""" }.mkString(", ") + "}"
    }.mkString("{", ", ", "}")

  def preflight(spark: SparkSession, sfDir: String): Seq[String] = {
    // nanos-era fixtures need the legacy flag just to LOAD; scope it to
    // a cloned session so the probe never mutates the caller's config
    val probe = spark.newSession()
    probe.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val schema = probe.read.parquet(s"$sfDir/$table.parquet").schema
        if (schema.fieldNames.toSeq != cols.map(_._1))
          Seq(s"$table: column drift — got " +
            s"${schema.fieldNames.mkString(", ")}; expected " +
            cols.map(_._1).mkString(", "))
        else cols.flatMap { case (name, want) =>
          val dt = schema(name).dataType
          if (matches(want, dt)) None
          else Some(s"$table.$name: type family drift — got " +
            s"${dt.simpleString}, wanted family '$want'")
        }
      } catch {
        case e: Exception => Seq(s"$table: unreadable — ${e.getMessage}")
      }
    }
  }
}
