package graft

import org.apache.spark.sql.SparkSession

import graft.lake.LakeTable

/** Separate-JVM worker for ConcurrencySpec: hammers one shared table
  * with appends, blind MoR upserts, and full compactions, retrying
  * commit conflicts with a FRESH handle per attempt (the documented
  * reload-and-retry contract). Each worker owns disjoint id ranges —
  * appended ids ≥ 1,000,000, upsert keys = wid*10+{0,1,2} — so the
  * final table content is exactly predictable regardless of the
  * cross-process interleaving, and any lost commit shows up as a
  * missing row or a stale upsert value.
  *
  * Prints `RESULT ok appends=A upserts=U compacts=C` and exits 0; any
  * unrecoverable error prints `RESULT fail ...` and exits 1.
  */
object ConcurrencyWorker {
  def main(args: Array[String]): Unit = {
    val Array(wh, db, table, widStr, itersStr) = args.take(5)
    val wid = widStr.toInt
    val iters = itersStr.toInt
    // "disjoint" (default): append+upsert+compact over worker-private
    // ranges. "shared": ONLY blind upserts, every worker hammering the
    // SAME five keys — the multi-writer CDC shape whose last-write-wins
    // outcome the spec then audits against raw storage.
    val mode = args.lift(5).getOrElse("disjoint")
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-conc-w$wid")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // outer retry on top of the engine's bounded internal retries: a
    // herd of 3+ processes can exhaust commit.retry.num-retries, and
    // the contract then is reload (fresh handle) and go again
    def retryOp[A](body: LakeTable => A): A = {
      var attempts = 0
      while (true) {
        val t = LakeTable.load(wh, db, table)
        try return body(t)
        catch {
          case e: java.util.ConcurrentModificationException =>
            attempts += 1
            if (attempts > 40) throw e
            Thread.sleep(scala.util.Random.nextInt(50).toLong + 5)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    var appends = 0; var upserts = 0; var compacts = 0
    try {
      if (mode == "v3") {
        // vector-delete torture: append private rows, then vector-
        // delete half of them — every commit is either a retriable
        // append or a conflict-surfacing vector delete the outer
        // retry recomputes from a fresh handle
        var deletes = 0
        val deleteSnaps = scala.collection.mutable.Buffer.empty[String]
        (0 until iters).foreach { i =>
          val base = 1000000L + wid * 100000L + i * 10L
          retryOp { t =>
            t.append((0L to 3L).map(k =>
              (base + k, s"v3-w$wid-i$i-k$k")).toDF("id", "v"))
          }
          appends += 1
          val snap = retryOp { t =>
            t.deleteMoR(spark,
              org.apache.spark.sql.functions.col("id")
                .isin(base + 2L, base + 3L))
          }
          // a zero-match delete commits nothing — that must never
          // happen here (the rows were just appended, worker-private)
          deleteSnaps += snap.map(_.id.toString).getOrElse("NONE")
          deletes += 1
          if (i % 2 == 1) {
            retryOp { t => t.compactScoped(spark) }
            compacts += 1
          }
        }
        println(s"RESULT ok appends=$appends upserts=$deletes " +
          s"compacts=$compacts deleteSnaps=${deleteSnaps.mkString("/")}")
        spark.stop()
        sys.exit(0)
      }
      if (mode == "txn") {
        // transaction torture: each iteration is ONE transaction of
        // append + CoW update over worker-private rows. A conflict
        // anywhere in the body aborts the whole transaction and the
        // outer retry re-runs it on a fresh handle — the documented
        // contract. The spec then audits that every published version
        // document carries the txn's snapshots TOGETHER (atomicity
        // across real process races, not just in-process).
        var txns = 0
        (0 until iters).foreach { i =>
          val base = 1000000L + wid * 100000L + i * 10L
          // the engine's own whole-body retry helper: reloads a fresh
          // handle per attempt and re-runs the closure on the winner's
          // state — the herd's conflicts exercise its backoff for real
          LakeTable.transactionWithRetry(wh, db, table,
              attempts = 40) { tx =>
            tx.append(Seq(
              (base, s"t-w$wid-i$i-a"),
              (base + 1L, s"t-w$wid-i$i-b")).toDF("id", "v"))
            tx.update(spark,
              Map("v" -> org.apache.spark.sql.functions
                .lit(s"t-w$wid-i$i-U")),
              org.apache.spark.sql.functions.col("id") === base)
          }
          txns += 1
        }
        println(s"RESULT ok appends=$txns upserts=0 compacts=0")
        spark.stop()
        sys.exit(0)
      }
      if (mode == "shared") {
        (0 until iters).foreach { i =>
          retryOp { t =>
            t.upsertMoR(spark, (0L to 4L).map(k =>
              (k, s"w$wid-i$i-k$k")).toDF("id", "v"), keys = Seq("id"))
          }
          upserts += 1
        }
        println(s"RESULT ok appends=0 upserts=$upserts compacts=0")
        spark.stop()
        sys.exit(0)
      }
      (0 until iters).foreach { i =>
        retryOp { t =>
          t.append(Seq(
            (1000000L + wid * 10000L + i * 10L, s"a-w$wid-i$i-0"),
            (1000000L + wid * 10000L + i * 10L + 1L, s"a-w$wid-i$i-1"))
            .toDF("id", "v"))
        }
        appends += 1
        retryOp { t =>
          t.upsertMoR(spark, Seq(
            (wid * 10L, s"u-w$wid-i$i-k0"),
            (wid * 10L + 1L, s"u-w$wid-i$i-k1"),
            (wid * 10L + 2L, s"u-w$wid-i$i-k2")).toDF("id", "v"),
            keys = Seq("id"))
        }
        upserts += 1
        if (i % 2 == 1) {
          retryOp { t => t.compact(spark) }
          compacts += 1
        }
      }
      println(s"RESULT ok appends=$appends upserts=$upserts compacts=$compacts")
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        println(s"RESULT fail ${e.getClass.getName}: ${e.getMessage}")
        sys.exit(1)
    }
  }
}
