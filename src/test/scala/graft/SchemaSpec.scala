package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema._

class SchemaSpec extends AnyFunSuite {

  test("TypeMapper: every primitive mapping from the reference enum") {
    def t(s: String) = TypeMapper.toSparkType(ColumnDef("x", s, required = false))
    assert(t("boolean") == BooleanType && t("bool") == BooleanType)
    assert(t("integer") == IntegerType && t("int") == IntegerType)
    assert(t("bigint") == LongType && t("long") == LongType)
    assert(t("float") == FloatType && t("double") == DoubleType)
    assert(t("date") == DateType)
    assert(t("timestamp") == TimestampNTZType)
    assert(t("timezone") == TimestampType)
    assert(t("string") == StringType && t("str") == StringType)
    assert(t("uuid") == StringType)
    assert(t("binary") == BinaryType && t("fixed") == BinaryType)
    assert(t("decimal") == DecimalType(5, 5)) // constants.py:23-29 quirk
    // `time` maps to LongType micros-since-midnight — FINAL: Spark
    // 4.1.2 has a TimeType SQL surface, but parquet WRITES refuse it
    // (UNSUPPORTED_TIME_TYPE), so it cannot round-trip table storage
    assert(t("time") == LongType)
    // UNKNOWN fallback (constants.py:82)
    assert(t("number") == StringType)
    assert(t("whatever") == StringType)
  }

  test("TypeMapper: prefix rules and recursion") {
    val arr = ColumnDef("xs", "array", required = true,
      arrayDef = Some(ColumnDef("element", "struct", required = false,
        structDef = Some(Seq(
          ColumnDef("a", "int", required = true),
          ColumnDef("b", "string", required = false))))))
    val dt = TypeMapper.toSparkType(arr)
    assert(dt == ArrayType(StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true))), containsNull = false))
    val m = ColumnDef("m", "map", required = false, mapDef = Some(MapDef(
      ColumnDef("k", "string", required = true),
      ColumnDef("v", "long", required = false))))
    assert(TypeMapper.toSparkType(m) ==
      MapType(StringType, LongType, valueContainsNull = true))
  }

  test("TypeMapper: duplicate root columns — last wins (dict semantics)") {
    val st = TypeMapper.toStructType(Seq(
      ColumnDef("a", "int", required = false),
      ColumnDef("b", "string", required = false),
      ColumnDef("a", "long", required = false)))
    assert(st.fieldNames.toSeq == Seq("b", "a"))
    assert(st("a").dataType == LongType)
  }

  test("FieldIds: DFS pre-order assignment incl. nested structs") {
    val schema = StructType(Seq(
      StructField("a", IntegerType),
      StructField("s", StructType(Seq(
        StructField("x", StringType), StructField("y", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(
        StructField("p", FloatType)))))))
    val (withIds, next) = FieldIds.assign(schema)
    val flat = FieldIds.flatten(withIds).map { case (p, f) => p -> FieldIds.idOf(f) }
    assert(flat == Seq("a" -> 1, "s" -> 2, "s.x" -> 3, "s.y" -> 4,
      "arr" -> 5, "arr.element.p" -> 6))
    assert(next == 7)
  }

  test("FieldIds.carryOver: kept paths keep IDs, new paths get fresh ones") {
    val (v1, n1) = FieldIds.assign(StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    val target = StructType(Seq(
      StructField("c", DoubleType), StructField("a", IntegerType)))
    val (v2, _) = FieldIds.carryOver(v1, target, n1)
    val ids = FieldIds.flatten(v2).map { case (p, f) => p -> FieldIds.idOf(f) }.toMap
    assert(ids("a") == 1) // kept
    assert(ids("c") == 3) // fresh
  }

  test("SchemaDiff: add/drop/update matrix incl. nested paths") {
    val (cur, _) = FieldIds.assign(StructType(Seq(
      StructField("a", IntegerType),
      StructField("gone", StringType),
      StructField("s", StructType(Seq(StructField("x", StringType)))),
      StructField("arr", ArrayType(StructType(Seq(StructField("p", FloatType))))))))
    val tgt = StructType(Seq(
      StructField("a", LongType), // promote
      StructField("s", StructType(Seq(
        StructField("x", StringType), StructField("y", StringType)))), // nested add
      StructField("arr", ArrayType(StructType(Seq(
        StructField("p", FloatType), StructField("q", IntegerType))))), // array-elem add
      StructField("brand_new", StructType(Seq(StructField("inner", IntegerType))))))
    val changes = SchemaDiff.diff(cur, tgt)
    assert(changes.contains(DropColumn("gone")))
    assert(changes.contains(AddColumn("s.y", StringType)))
    assert(changes.contains(AddColumn("arr.element.q", IntegerType)))
    assert(changes.contains(UpdateColumnType("a", IntegerType, LongType)))
    // whole-struct add carries its children — no separate child add
    assert(changes.exists { case AddColumn("brand_new", _) => true; case _ => false })
    assert(!changes.exists(_.path == "brand_new.inner"))
  }

  test("SchemaDiff: promotion rules") {
    assert(SchemaDiff.promotionAllowed(IntegerType, LongType).isRight)
    assert(SchemaDiff.promotionAllowed(FloatType, DoubleType).isRight)
    assert(SchemaDiff.promotionAllowed(DecimalType(5, 2), DecimalType(10, 2)).isRight)
    assert(SchemaDiff.promotionAllowed(LongType, IntegerType).isLeft)
    assert(SchemaDiff.promotionAllowed(DoubleType, FloatType).isLeft)
    assert(SchemaDiff.promotionAllowed(DecimalType(10, 2), DecimalType(10, 4)).isLeft)
    assert(SchemaDiff.promotionAllowed(StringType, IntegerType).isLeft)
    // primitive <-> nested disallowed (iceberg_helper.py:48-65)
    assert(SchemaDiff.promotionAllowed(IntegerType,
      StructType(Seq(StructField("x", IntegerType)))).isLeft)
  }

  test("diff is empty after applying a definition to itself (idempotence)") {
    TableDef.parse(graft.gen.OrdersFixtures.ordersV2Json) match {
      case Right(td) =>
        val st = TypeMapper.toStructType(td.columns)
        val (withIds, _) = FieldIds.assign(st)
        assert(SchemaDiff.diff(withIds, st).isEmpty)
      case Left(e) => fail(e.mkString("; "))
    }
  }

  test("TableDef.parse: validation catches structural errors") {
    assert(TableDef.parse("{not json").isLeft)
    assert(TableDef.parse("""{"table_name":"t","columns":[
      {"column_name":"a","data_type":"int"}]}""").isLeft) // no database_name
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"s","data_type":"struct"}]}""").isLeft) // struct w/o def
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"a","data_type":"int"}],
      "partitions":[{"column":"nope","transform":"year"}]}""").isLeft) // bad partition col
    assert(TableDef.parse(graft.gen.OrdersFixtures.ordersV1Json).isRight)
  }

  test("initial_default: parse validation, field annotation, and the " +
      "add-time-immutability guard (r16 contract extension)") {
    // non-atomic carrier refused at the contract boundary
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"s","data_type":"struct",
        "initial_default":"x",
        "struct_def":[{"column_name":"a","data_type":"int"}]}]}""").isLeft)
    // a value that does not parse as the declared type refused
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"a","data_type":"long",
        "initial_default":"not-a-long"}]}""").isLeft)
    // array/map-INTERIOR defaults refused at parse (r17 — silently
    // dropped before): no field annotation carries a per-element fill
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"xs","data_type":"array",
        "array_def":{"column_name":"element","data_type":"int",
          "initial_default":"0"}}]}""").isLeft)
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"mp","data_type":"map",
        "map_def":{"key":{"column_name":"key","data_type":"string"},
          "value":{"column_name":"value","data_type":"int",
            "initial_default":"0"}}}]}""").isLeft)
    // ...even nested through a struct INSIDE the array element — depth
    // does not make it a column fill
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"xs","data_type":"array",
        "array_def":{"column_name":"element","data_type":"struct",
          "struct_def":[{"column_name":"note","data_type":"string",
            "initial_default":"n/a"}]}}]}""").isLeft)
    // while the same shape WITHOUT the interior default stays accepted
    assert(TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[{"column_name":"xs","data_type":"array",
        "array_def":{"column_name":"element","data_type":"struct",
          "struct_def":[{"column_name":"note","data_type":"string"}]}}]}""")
      .isRight)
    // a valid default lands as the same annotation SQL DDL writes,
    // nested fields included
    val td = TableDef.parse("""{"database_name":"d","table_name":"t",
      "columns":[
        {"column_name":"k","data_type":"long"},
        {"column_name":"m","data_type":"struct","struct_def":[
          {"column_name":"note","data_type":"string",
           "initial_default":"n/a"}]}]}""").toOption.get
    val st = TypeMapper.toStructType(td.columns)
    val note = st.fields(1).dataType.asInstanceOf[StructType].fields(0)
    assert(Defaults.of(note).contains("n/a"))
    // retroactive default on an EXISTING column → disallowed; a
    // verbatim re-statement of an added default → clean diff
    val (cur, _) = FieldIds.assign(TypeMapper.toStructType(
      TableDef.parse("""{"database_name":"d","table_name":"t",
        "columns":[{"column_name":"k","data_type":"long"}]}""")
        .toOption.get.columns))
    val retro = TypeMapper.toStructType(
      TableDef.parse("""{"database_name":"d","table_name":"t",
        "columns":[{"column_name":"k","data_type":"long",
          "initial_default":"7"}]}""").toOption.get.columns)
    assert(SchemaDiff.diff(cur, retro).collect {
      case d: DisallowedChange => d }.nonEmpty)
    val (withDef, _) = FieldIds.assign(st)
    assert(SchemaDiff.diff(withDef, st).isEmpty,
      "re-stating the same initial_default must be idempotent")
  }

  test("Json round-trips table metadata") {
    val (schema, next) = FieldIds.assign(StructType(Seq(
      StructField("ts", TimestampNTZType),
      StructField("s", StructType(Seq(StructField("x", DecimalType(5, 5))))),
      StructField("xs", ArrayType(StructType(Seq(StructField("p", FloatType))), false)))))
    val md = graft.lake.TableMetadata(1, "db", "t",
      Seq(graft.lake.SchemaVersion(0, schema)), 0,
      Seq(graft.lake.PartitionSpecMeta(0,
        Seq(graft.lake.SpecField(1, "year", "ts_year", 1000)))), 0,
      Seq(graft.lake.SnapshotMeta(1, Seq(graft.lake.DataFileMeta(
        "/x/y.parquet", 0, 0, 10, Map("ts_year" -> "2024"))), 0)), next - 1)
    val round = graft.lake.MetadataIO.fromJson(
      Json.parse(Json.write(graft.lake.MetadataIO.toJson(md))))
    assert(round == md)
  }
}
