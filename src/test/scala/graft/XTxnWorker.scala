package graft

import org.apache.spark.sql.SparkSession

import graft.lake.{LakeTable, LakeTxn}

/** Separate-JVM worker for the cross-table transaction torture
  * (ConcurrencySpec): every transaction appends the SAME id to tables
  * `d.a` AND `d.b`, so atomicity is externally checkable — an id
  * present in one table but not the other is a half-transaction.
  *
  * Modes:
  *   - `clean`: `iters` transactions through LakeTxn.withRetry.
  *   - `crash:<fault>`: clean iterations, then on the LAST one halts
  *     the JVM (no shutdown hooks — kill -9 equivalent) at the named
  *     transaction fault point (`txn-mid-claims`,
  *     `txn-post-claims-pre-final`, `txn-post-final-pre-flips`,
  *     `txn-mid-flips`). Exit 137 by convention.
  *   - `observe`: loads a then b (alternating order per sample) until
  *     the stop file appears; any sample where the FIRST-read table
  *     shows an id the SECOND-read table lacks is a half-transaction
  *     (commits between the two loads can only ADD to the second).
  *
  * Prints `RESULT ok ...` / `RESULT fail ...`.
  */
object XTxnWorker {
  def main(args: Array[String]): Unit = {
    val Array(wh, widStr, itersStr, mode) = args.take(4)
    val wid = widStr.toInt
    val iters = itersStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-xtxn-w$wid")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ids >= 5,000,000 are the spec's per-table heal sentinels —
    // deliberate single-table appends, not transaction halves
    def ids(t: String): Set[Long] =
      LakeTable.load(wh, "d", t).read(spark)
        .select("id").collect().map(_.getLong(0)).toSet
        .filter(_ < 5000000L)

    if (mode == "observe") {
      val stop = java.nio.file.Paths.get(wh, "_observer_stop")
      var samples = 0
      var flip = false
      while (!java.nio.file.Files.exists(stop)) {
        val (first, second) = if (flip) ("b", "a") else ("a", "b")
        flip = !flip
        val f = ids(first)
        val s = ids(second)
        val torn = f.diff(s)
        if (torn.nonEmpty) {
          println(s"RESULT fail half-transaction: $first has " +
            s"${torn.take(5)} missing from $second (sample $samples)")
          sys.exit(1)
        }
        samples += 1
      }
      println(s"RESULT ok samples=$samples")
      sys.exit(0)
    }

    val fault = if (mode.startsWith("crash:")) mode.stripPrefix("crash:")
      else null
    var done = 0
    try {
      (0 until iters).foreach { i =>
        if (fault != null && i == iters - 1) {
          var armed = true
          LakeTable.faultHook = name =>
            if (name == fault && armed) {
              armed = false
              println(s"XTXN halting at $fault (iter $i)")
              System.out.flush()
              Runtime.getRuntime.halt(137)
            }
        }
        val id = 1000000L + wid * 100000L + i
        LakeTxn.withRetry(wh, attempts = 60) { ctx =>
          ctx.table("d", "a").append(Seq((id, s"w$wid-i$i")).toDF("id", "v"))
          ctx.table("d", "b").append(Seq((id, s"w$wid-i$i")).toDF("id", "v"))
        }
        done += 1
      }
      println(s"RESULT ok txns=$done")
      sys.exit(0)
    } catch {
      case e: Throwable =>
        println(s"RESULT fail after $done: ${e.getClass.getName} " +
          s"${e.getMessage}")
        sys.exit(1)
    }
  }
}
