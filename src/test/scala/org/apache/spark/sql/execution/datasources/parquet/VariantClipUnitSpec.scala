package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.schema.MessageTypeParser
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.datasources.VariantMetadata
import org.apache.spark.sql.types.{LongType, Metadata, StructField, StructType}

/** Unit pins for the shredded-variant clip's NAME PAIRING (ADVICE r16):
  * the reader conf runs case-INsensitive by default, so a catalyst
  * variant-struct column must pair with a parquet field whose physical
  * case drifted (externally-added files) — before r17 the pairing was
  * exact-match only and a case mismatch silently skipped the clip
  * (correct rows via the binary fallback, pruning benefit lost with no
  * signal).
  */
class VariantClipUnitSpec extends AnyFunSuite {

  /** Shredded layout with one small and one fat typed_value child,
    * physical column name lower-case `payload`. */
  private def parquetSchema(colName: String) =
    MessageTypeParser.parseMessageType(
      s"""message spark_schema {
         |  optional group $colName {
         |    required binary metadata;
         |    optional binary value;
         |    optional group typed_value {
         |      optional group small {
         |        optional binary value;
         |        optional int64 typed_value;
         |      }
         |      optional group fat {
         |        optional binary value;
         |        optional binary typed_value;
         |      }
         |    }
         |  }
         |}""".stripMargin)

  /** Catalyst variant-struct replacement requesting only `$$.small`. */
  private def catalyst(colName: String) = StructType(Seq(
    StructField(colName, StructType(Seq(
      StructField("0", LongType, nullable = true,
        metadata = VariantMetadata("$.small", failOnError = false,
          timeZoneId = "UTC").toMetadata))),
      nullable = true, metadata = Metadata.empty)))

  private def fatKept(m: org.apache.parquet.schema.MessageType,
      col: String): Boolean = {
    val g = m.getFields.get(m.getFieldIndex(col)).asGroupType()
    g.containsField("typed_value") &&
      g.getType("typed_value").asGroupType().containsField("fat")
  }

  test("exact-case pairing clips the untouched shredded child") {
    val clipped = GraftVariantReadSupport.clip(
      parquetSchema("payload"), catalyst("payload"), caseSensitive = true)
    assert(!fatKept(clipped, "payload"))
    assert(clipped.getFields.get(clipped.getFieldIndex("payload"))
      .asGroupType().getType("typed_value").asGroupType()
      .containsField("small"))
  }

  test("case-insensitive scan pairs a physical-case-drifted column " +
      "(catalyst PAYLOAD vs parquet payload) and still clips") {
    val clipped = GraftVariantReadSupport.clip(
      parquetSchema("payload"), catalyst("PAYLOAD"), caseSensitive = false)
    assert(!fatKept(clipped, "payload"),
      "the clip must engage through the case-insensitive resolver")
  }

  test("case-SENSITIVE scan refuses the drifted pairing (no clip — " +
      "conservative: results come from the binary fallback)") {
    val clipped = GraftVariantReadSupport.clip(
      parquetSchema("payload"), catalyst("PAYLOAD"), caseSensitive = true)
    assert(fatKept(clipped, "payload"))
  }
}
