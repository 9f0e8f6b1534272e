package graft

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable

/** Separate-JVM worker for the torn-write crash test: appends to the
  * table but HALTS the JVM (no shutdown hooks, no Spark cleanup — the
  * closest userland equivalent of kill -9) at the fault point between
  * data-file write and metadata commit. Exit code 137 by convention.
  */
object TornWriteWorker {
  def main(args: Array[String]): Unit = {
    // optional 4th arg picks the crash window (default: between data
    // write and commit; "post-claim-pre-flip" dies between the
    // metadata claim and the pointer flip)
    val Array(wh, db, table) = args.take(3)
    val fault = args.lift(3).getOrElse("post-write-pre-commit")
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-torn-writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    LakeTable.faultHook = name =>
      if (name == fault) {
        // stdout flush then die hard: halt() skips shutdown hooks, so
        // nothing between write and commit gets a chance to clean up
        println("TORN about to halt at " + name)
        System.out.flush()
        Runtime.getRuntime.halt(137)
      }
    val t = LakeTable.load(wh, db, table)
    if (fault == "post-dv-write-pre-commit")
      // the vector-delete crash window: the spec pre-appends rows to a
      // v3 table; this delete dies after writing the .gdv container
      // but before the metadata commit references it
      t.deleteMoR(spark, org.apache.spark.sql.functions.col("id") <= 1L)
    else
      t.append(Seq((999L, "torn-row")).toDF("id", "v"))
    // unreachable if the fault fired; exiting 0 fails the spec loudly
    println("TORN fault point never fired")
    sys.exit(0)
  }
}
