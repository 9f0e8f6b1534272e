package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{Defaults, FieldIds}

/** Column-default plumbing invariants that don't need a table: the
  * advertised SQL text must round-trip through SPARK'S parser (its
  * lexer escapes with backslash — doubled quotes concatenate), and
  * bad literals must fail at annotation (DDL) time.
  */
class DefaultsSpec extends AnyFunSuite {

  private def strField(name: String) =
    FieldIds.withId(StructField(name, StringType), 1)

  test("sqlText escaping round-trips through Spark's own parser") {
    val nasty = Seq("O'Brien", "back\\slash", "it''s", "quote\"double",
      "trailing\\", "'", "\\'", "ünïcødé", "", "plain")
    nasty.foreach { s =>
      val f = Defaults.withDefault(strField("c"), s)
      val sql = Defaults.sqlText(f, s)
      val lit = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
      assert(lit.value.toString == s,
        s"advertised text $sql must parse back to <$s>")
    }
  }

  test("non-parsing literals fail at annotation time, not read time") {
    val long = FieldIds.withId(StructField("n", LongType), 2)
    val e = intercept[IllegalArgumentException](
      Defaults.withDefault(long, "abc"))
    assert(e.getMessage.contains("does not parse"))
    val dec = FieldIds.withId(StructField("d", DecimalType(10, 2)), 3)
    intercept[IllegalArgumentException](Defaults.withDefault(dec, "1.234"))
    // complex types refused outright
    val arr = FieldIds.withId(
      StructField("a", ArrayType(LongType)), 4)
    intercept[IllegalArgumentException](Defaults.withDefault(arr, "[1]"))
  }

  test("write-default fallback and tombstone semantics") {
    val base = Defaults.withDefault(strField("c"), "init")
    assert(Defaults.writeOf(base).contains("init"), "falls back to initial")
    val set = Defaults.withWriteDefault(base, Some("w"))
    assert(Defaults.writeOf(set).contains("w") && Defaults.of(set).contains("init"))
    val dropped = Defaults.withWriteDefault(set, None)
    assert(Defaults.writeOf(dropped).isEmpty, "tombstone beats the initial")
    assert(Defaults.of(dropped).contains("init"),
      "the initial fill is immutable")
  }
}
