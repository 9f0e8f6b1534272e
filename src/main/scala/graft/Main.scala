package graft

import org.apache.spark.sql.SparkSession

import graft.gen.DataGen
import graft.lake.{Engine, LakeTable}

/** CLI entry point replacing the reference's Lambda handler
  * (`handler.py:15-64`): process a table-definition JSON against a
  * warehouse, then — like the reference does for its two known assets
  * (`handler.py:45-48`) — optionally generate and append seeded orders
  * rows, with the v1/v2 generator chosen by a "1" in the file name
  * (the reference's exact routing rule, quirk preserved).
  *
  * Usage:
  *   graft.Main <warehouse> <tableDefJson> [--append N] [--seed S]
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.Main <warehouse> <tableDefJson> [--append N] [--seed S]")
      sys.exit(2)
    }
    val warehouse = args(0)
    val defPath = args(1)
    def flag(name: String): Option[Long] =
      args.sliding(2).collectFirst {
        case Array(`name`, v) => v.toLong
      }
    val appendRows = flag("--append")
    val seed = flag("--seed").getOrElse(42L)

    val resp = Engine.processTableDefFile(warehouse, defPath)
    resp.messageList.foreach(m => println(s"[graft] $m"))
    println(s"[graft] change_type=${resp.changeType} has_error=${resp.hasError}")
    println(s"[graft] output: ${resp.outputLocation}")
    if (resp.hasError) sys.exit(1)

    appendRows.foreach { n =>
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val t = LakeTable.load(warehouse, resp.databaseName, resp.tableName)
      // version routing by file name, as in handler.py:45-48
      val fileName = new java.io.File(defPath).getName
      val rows =
        if (fileName.contains("1")) DataGen.ordersV1(n.toInt, seed)
        else DataGen.ordersV2(n.toInt, seed)
      val snap = t.append(DataGen.toDf(spark, rows, t.currentSchema))
      println(s"[graft] appended ${snap.files.map(_.rows).sum} rows " +
        s"in snapshot ${snap.id} (${snap.files.size} files)")
      spark.stop()
    }
  }
}
