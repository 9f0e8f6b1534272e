package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}

/** Seeded randomized round-trip for the DSv2 record reader: random
  * schemas (primitives, structs, arrays of structs, maps) with random
  * rows (including nulls at every level) must read back through
  * `format("graft-lake")` cell-identical to the engine's native
  * reconciling reader.
  */
class ConnectorRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val prims: Seq[(String, DataType)] = Seq(
    "boolean" -> BooleanType, "int" -> IntegerType, "long" -> LongType,
    "float" -> FloatType, "double" -> DoubleType, "string" -> StringType,
    "timestamp" -> TimestampNTZType, "date" -> DateType)

  private def randomColumns(rnd: scala.util.Random): Seq[(String, String)] = {
    // (name, defJson fragment) pairs; at least one scalar column
    val n = 3 + rnd.nextInt(4)
    (0 until n).map { i =>
      val name = s"c$i"
      rnd.nextInt(10) match {
        case 7 => // struct of two primitives
          val (t1, _) = prims(rnd.nextInt(prims.size))
          val (t2, _) = prims(rnd.nextInt(prims.size))
          name -> s"""{"column_name":"$name","data_type":"struct","struct_def":[
            {"column_name":"a","data_type":"$t1"},
            {"column_name":"b","data_type":"$t2"}]}"""
        case 8 => // array of struct
          val (t1, _) = prims(rnd.nextInt(prims.size))
          name -> s"""{"column_name":"$name","data_type":"array","array_def":
            {"column_name":"element","data_type":"struct","struct_def":[
              {"column_name":"x","data_type":"$t1"},
              {"column_name":"y","data_type":"long"}]}}"""
        case 9 => // map string -> primitive
          val (t1, _) = prims(rnd.nextInt(prims.size))
          name -> s"""{"column_name":"$name","data_type":"map","map_def":{
            "key":{"column_name":"key","data_type":"string","required":true},
            "value":{"column_name":"value","data_type":"$t1"}}}"""
        case _ =>
          val (t1, _) = prims(rnd.nextInt(prims.size))
          name -> s"""{"column_name":"$name","data_type":"$t1"}"""
      }
    }
  }

  private def randomValue(dt: DataType, rnd: scala.util.Random): Any = {
    if (rnd.nextInt(5) == 0) return null
    dt match {
      case BooleanType => rnd.nextBoolean()
      case IntegerType => rnd.nextInt()
      case LongType => rnd.nextLong()
      case FloatType => rnd.nextFloat()
      case DoubleType => rnd.nextDouble()
      case StringType => rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      case TimestampNTZType => java.time.LocalDateTime
        .ofEpochSecond(rnd.nextInt(1700000000).toLong, 1000 * rnd.nextInt(1000000),
          java.time.ZoneOffset.UTC)
      case DateType => java.time.LocalDate.ofEpochDay(rnd.nextInt(20000).toLong)
      case st: StructType =>
        Row.fromSeq(st.fields.toSeq.map(f => randomValue(f.dataType, rnd)))
      case ArrayType(et, _) =>
        Seq.fill(rnd.nextInt(4))(randomValue(et, rnd))
      case MapType(_, vt, _) =>
        (0 until rnd.nextInt(3)).map(i =>
          s"k$i" -> randomValue(vt, rnd)).toMap
      case other => throw new IllegalStateException(other.toString)
    }
  }

  test("random schemas and rows: connector read == native read (seeded)") {
    val rnd = new scala.util.Random(77770001L)
    for (iter <- 1 to 4) {
      val wh = Files.createTempDirectory(s"graft-connrand-$iter").toString
      val cols = randomColumns(rnd)
      Engine.processTableDefJson(wh,
        s"""{"database_name":"d","table_name":"t","columns":[
           |${cols.map(_._2).mkString(",")}],"partitions":[]}""".stripMargin)
      val t = LakeTable.load(wh, "d", "t")
      val schema = graft.lake.Reconcile.clean(t.currentSchema)
        .asInstanceOf[StructType]
      val rows = (0 until 40).map(_ =>
        Row.fromSeq(schema.fields.toSeq.map(f => randomValue(f.dataType, rnd))))
      t.append(spark.createDataFrame(
        new java.util.ArrayList[Row](rows.asJava), schema))
      // second append exercises multi-file planning
      val rows2 = (0 until 15).map(_ =>
        Row.fromSeq(schema.fields.toSeq.map(f => randomValue(f.dataType, rnd))))
      t.append(spark.createDataFrame(
        new java.util.ArrayList[Row](rows2.asJava), schema))

      val native = t.read(spark).collect().map(_.toString).sorted.toSeq
      val dsv2 = spark.read.format("graft-lake")
        .option("warehouse", wh).option("database", "d").option("table", "t")
        .load().collect().map(_.toString).sorted.toSeq
      assert(dsv2 == native, s"iter $iter schema=${schema.simpleString}")
    }
  }

  private implicit class SeqAsJava[A](s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.size)
      s.foreach(l.add)
      l
    }
  }
}
