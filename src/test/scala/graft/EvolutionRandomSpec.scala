package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{Engine, LakeTable}
import graft.schema.{ColumnDef, TableDef}

/** Randomized model check of the schema-evolution machinery — the
  * reference's core semantics: seeded interleavings of column adds
  * (with and without initial defaults), drops, renames, and appends
  * must always read back exactly what the model predicts, per row and
  * per column, by FIELD IDENTITY: a row shows a column's value if the
  * column existed (under any name) when the row was written, its
  * initial default if the column was added later with one, and NULL
  * otherwise — through the native reconciling reader and the DSv2
  * Group reader alike.
  */
class EvolutionRandomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // model column: permanent identity, current name, and the initial
  // default (if added with one)
  private case class MCol(cid: Int, name: String, default: Option[Long])

  private def runScenario(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory(s"graft-evrnd-$seed").toString
    Engine.processTableDefJson(wh,
      """{"database_name":"d","table_name":"e","columns":[
        |{"column_name":"id","data_type":"long"},
        |{"column_name":"c0","data_type":"long"}],
        |"partitions":[]}""".stripMargin)
    var t = LakeTable.load(wh, "d", "e")
    // the id column is permanent; value columns evolve (all LONG so
    // the model is about IDENTITY, not promotion — promotions have
    // their own golden tests)
    var cols = Vector(MCol(0, "c0", None))
    var nextCid = 1
    var nextRow = 0L
    // row id -> (cid -> written value) for columns present at write
    val rows = scala.collection.mutable.Map.empty[Long, Map[Int, Long]]

    def tableDef(cs: Seq[MCol]): TableDef = TableDef("d", "e",
      ColumnDef("id", "long", required = false) +:
        cs.map(c => ColumnDef(c.name, "long", required = false)),
      Seq.empty, Map.empty)

    (1 to ops).foreach { i =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append rows carrying every current column
          val batch = (1 to 1 + rnd.nextInt(2)).map { _ =>
            nextRow += 1
            nextRow -> cols.map(c => c.cid -> (nextRow * 100 + c.cid)).toMap
          }
          val schema = StructType(StructField("id", LongType) +:
            cols.map(c => StructField(c.name, LongType)))
          val data = batch.map { case (id, vs) =>
            Row.fromSeq(id +: cols.map(c => vs(c.cid)))
          }
          t.append(spark.createDataFrame(
            spark.sparkContext.parallelize(data, 1), schema))
          batch.foreach { case (id, vs) => rows(id) = vs }
        case 4 | 5 => // add a column, sometimes with an initial default
          val default = if (rnd.nextBoolean()) Some(7000L + nextCid) else None
          val c = MCol(nextCid, s"c$nextCid", default)
          nextCid += 1
          cols = cols :+ c
          val (msgs, err) = t.evolve(tableDef(cols),
            initialDefaults = default
              .map(d => Map(c.name -> d.toString)).getOrElse(Map.empty))
          assert(!err, s"add refused: $msgs (seed $seed op $i)")
        case 6 if cols.size > 1 => // drop a random value column
          val victim = cols(rnd.nextInt(cols.size))
          cols = cols.filterNot(_.cid == victim.cid)
          val (msgs, err) = t.evolve(tableDef(cols))
          assert(!err, s"drop refused: $msgs (seed $seed op $i)")
        case 7 => // rename a random value column — identity persists
          val ix = rnd.nextInt(cols.size)
          val renamed = cols(ix).copy(name = s"${cols(ix).name}r")
          t.renameColumn(cols(ix).name, renamed.name)
          cols = cols.updated(ix, renamed)
        case 8 => // reload (schema + default metadata round-trip)
          t = LakeTable.load(wh, "d", "e")
        case _ => ()
      }
      if (i % 5 == 0) check(t, wh, seed, cols, rows.toMap, s"op $i seed $seed")
    }
    check(t, wh, seed, cols, rows.toMap, s"final seed $seed")
  }

  private def check(t: LakeTable, wh: String, seed: Long, cols: Seq[MCol],
      rows: Map[Long, Map[Int, Long]], at: String): Unit = {
    def parse(r: Row): (Long, Seq[Option[Long]]) = r.getLong(0) ->
      cols.indices.map(i =>
        if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))).toSeq
    def assertEqual(got: Map[Long, Seq[Option[Long]]]): Unit = {
      assert(got.keySet == rows.keySet, s"row set diverged at $at")
      got.foreach { case (id, vals) =>
        // value if the column existed at write, else its initial
        // default, else NULL — the whole contract in one line
        val exp = cols.map(c => rows(id).get(c.cid).orElse(c.default)).toSeq
        assert(vals == exp, s"row $id diverged at $at: got $vals want $exp")
      }
    }
    val names = cols.map(c => s"`${c.name}`")
    assertEqual(t.read(spark).selectExpr(("id" +: names): _*).collect()
      .map(parse).toMap)
    // the DSv2 Group reader agrees (catalog name unique per seed —
    // the session caches catalog instances by name)
    spark.conf.set(s"spark.sql.catalog.gevr$seed",
      "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.gevr$seed.warehouse", wh)
    assertEqual(spark.sql(
      s"SELECT id, ${names.mkString(", ")} FROM gevr$seed.d.e").collect()
      .map(parse).toMap)
  }

  test("random evolution interleavings match the field-identity model") {
    runScenario(seed = 60901L, ops = 30)
  }

  test("a second seed exercises a different interleaving") {
    runScenario(seed = 31415L, ops = 30)
  }
}
