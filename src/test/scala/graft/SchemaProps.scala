package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.schema._

/** Property-based pins for the pure schema layer (SURVEY.md §5.2.3). */
object SchemaProps extends Properties("graft.schema") {

  private val primGen: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, FloatType, DoubleType, StringType,
    BooleanType, DateType, TimestampNTZType, DecimalType(5, 5))

  private val names = Seq("a", "b", "c", "d", "e", "f", "g", "h")

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) primGen
    else Gen.frequency(
      6 -> primGen,
      2 -> structGen(depth - 1),
      1 -> structGen(depth - 1).map(st => ArrayType(st, containsNull = true)),
      1 -> Gen.zip(primGen, typeGen(depth - 1)).map { case (k, v) =>
        MapType(k, v, valueContainsNull = true)
      })

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    fieldNames <- Gen.pick(n, names)
    types <- Gen.listOfN(n, typeGen(depth))
  } yield StructType(fieldNames.toSeq.sorted.zip(types).map {
    case (nm, t) => StructField(nm, t, nullable = true)
  })

  private val schemaGen: Gen[StructType] = structGen(2)

  property("diff(s, s) is empty — idempotence") = forAll(schemaGen) { s =>
    val (withIds, _) = FieldIds.assign(s)
    SchemaDiff.diff(withIds, s).isEmpty
  }

  property("assign: IDs are dense 1..N pre-order, maxId == count") =
    forAll(schemaGen) { s =>
      val (withIds, next) = FieldIds.assign(s)
      val ids = FieldIds.flatten(withIds).map { case (_, f) => FieldIds.idOf(f) }
      ids == (1 until next) && FieldIds.maxId(withIds) == ids.size
    }

  property("carryOver: common paths keep IDs, new paths get fresh IDs") =
    forAll(schemaGen, schemaGen) { (cur, tgt) =>
      val (curIds, next) = FieldIds.assign(cur)
      val (tgtIds, _) = FieldIds.carryOver(curIds, tgt, next)
      val curMap = FieldIds.flatten(curIds).map { case (p, f) => p -> FieldIds.idOf(f) }.toMap
      val tgtMap = FieldIds.flatten(tgtIds).map { case (p, f) => p -> FieldIds.idOf(f) }.toMap
      val keptOk = tgtMap.forall { case (p, id) =>
        curMap.get(p).forall(_ == id) // kept paths: same ID
      }
      val freshOk = tgtMap.collect {
        case (p, id) if !curMap.contains(p) => id
      }.forall(_ >= next) // new paths: IDs beyond the old range
      keptOk && freshOk
    }

  property("carryOver then diff against target is add/drop/update-consistent") =
    forAll(schemaGen, schemaGen) { (cur, tgt) =>
      val (curIds, next) = FieldIds.assign(cur)
      val (applied, _) = FieldIds.carryOver(curIds, tgt, next)
      // applying the target yields exactly the target's shape
      SchemaDiff.diff(applied, tgt).isEmpty
    }

  property("diff add/drop paths are disjoint and exist on one side only") =
    forAll(schemaGen, schemaGen) { (cur, tgt) =>
      val (curIds, _) = FieldIds.assign(cur)
      val changes = SchemaDiff.diff(curIds, tgt)
      val curPaths = FieldIds.flatten(curIds).map(_._1).toSet
      val adds = changes.collect { case AddColumn(p, _) => p }
      val drops = changes.collect { case DropColumn(p) => p }
      adds.forall(!curPaths.contains(_)) && drops.forall(curPaths.contains) &&
        adds.toSet.intersect(drops.toSet).isEmpty
    }

  property("promotion is antisymmetric for distinct primitive types") =
    forAll(primGen, primGen) { (a, b) =>
      a == b ||
        !(SchemaDiff.promotionAllowed(a, b).isRight &&
          SchemaDiff.promotionAllowed(b, a).isRight)
    }

  property("metadata JSON round-trips any schema") = forAll(schemaGen) { s =>
    val (withIds, next) = FieldIds.assign(s)
    val md = graft.lake.TableMetadata(1, "db", "t",
      Seq(graft.lake.SchemaVersion(0, withIds)), 0,
      Seq(graft.lake.PartitionSpecMeta(0, Seq.empty)), 0, Seq.empty, next - 1)
    graft.lake.MetadataIO.fromJson(
      Json.parse(Json.write(graft.lake.MetadataIO.toJson(md)))) == md
  }

  property("Json.parse(Json.write(v)) round-trips escaped strings") =
    forAll(Gen.asciiPrintableStr, Gen.choose(Long.MinValue, Long.MaxValue)) { (s, n) =>
      val v = JObject(Map("s" -> JString(s + "\"\\\n\t"), "n" -> JNumber(BigDecimal(n))))
      Json.parse(Json.write(v)) == v
    }
}
