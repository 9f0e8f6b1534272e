package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Custom as-of join operator: exact semantics on hand-computed data,
  * null handling, parity with the window-union emulation on real
  * events data, and the expected sort-merge physical shape (one
  * exchange per side, no range-join blowup).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("picks latest right row with time <= left time, per key") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
      ("B", 4L, 20.0)).toDF("qk", "qt", "px")
    val trades = Seq(
      ("A", 0L), ("A", 1L), ("A", 6L), ("A", 9L), ("A", 12L),
      ("B", 3L), ("B", 7L), ("C", 5L)).toDF("tk", "tt")
    val got = AsOf.join(trades, quotes, Seq("tk"), Seq("qk"), "tt", "qt")
      .select("tk", "tt", "qt", "px").orderBy("tk", "tt").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    assert(got == Seq(
      ("A", 0L, -1L, -1.0),   // before first quote
      ("A", 1L, 1L, 10.0),    // exact tie matches
      ("A", 6L, 5L, 11.0),
      ("A", 9L, 9L, 12.0),
      ("A", 12L, 9L, 12.0),
      ("B", 3L, -1L, -1.0),
      ("B", 7L, 4L, 20.0),
      ("C", 5L, -1L, -1.0)))  // key absent from right
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val l = Seq((Some("A"), Some(5L)), (None, Some(5L)), (Some("A"), None))
      .toDF("k", "t")
    val r = Seq((Some("A"), Some(1L), 1.0), (None, Some(0L), 9.0),
      (Some("A"), None, 8.0)).toDF("rk", "rt", "v")
    val got = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "v").collect()
      .map(x => (Option(x.get(0)), Option(x.get(1)), Option(x.get(2)))).toSet
    assert(got == Set(
      (Some("A"), Some(5L), Some(1.0)),
      (None, Some(5L), None),
      (Some("A"), None, None)))
  }

  test("matches the window-union emulation on events data") {
    val e = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val got = AsOf.join(views, clicks, Seq("user_id"), Seq("c_user"),
        "v_ts", "c_ts")
      .select(col("user_id"), col("v_id"), col("v_ts"),
        col("c_id").as("match_c_id"), col("c_ts").as("match_c_ts"))
      .orderBy("user_id", "v_ts", "v_id")
    val oracle = graft.SparkEntry.queries("q_join_asof")(spark,
      "/root/testdata/sf0.001")
    assert(got.collect().map(_.toString).toSeq ==
      oracle.collect().map(_.toString).toSeq)
  }

  test("join output is consumable without a projection on top") {
    import spark.implicits._
    val l = Seq(("A", 5L)).toDF("k", "t")
    val r = Seq(("A", 1L, 1.0)).toDF("rk", "rt", "v")
    val j = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
    // bare collect and bare orderBy both require UnsafeRow output
    assert(j.collect().length == 1)
    assert(j.orderBy("k").collect()(0).getDouble(4) == 1.0)
  }

  test("randomized parity with a reference computation (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    // small key/time domains force heavy collisions: duplicate times,
    // keys missing from either side, empty-ish partitions
    val left = Seq.fill(400)((rnd.nextInt(12).toString, rnd.nextInt(40).toLong,
      rnd.nextInt(1000)))
    val right = Seq.fill(300)((rnd.nextInt(15).toString, rnd.nextInt(40).toLong,
      rnd.nextInt(1000)))
    // reference: brute-force per left row (right times unique per key
    // are NOT guaranteed, so tie-break deterministically by payload max
    // — mirror that in the operator input by pre-reducing ties)
    val rightReduced = right.groupBy(r => (r._1, r._2))
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val expected = left.map { case (k, t, p) =>
      val m = rightReduced.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption
      (k, t, p, m.map(_._3))
    }.sortBy(x => (x._1, x._2, x._3)).toSeq

    val got = AsOf.join(
        left.toDF("k", "t", "p"),
        rightReduced.toDF("rk", "rt", "rp"),
        Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "p", "rp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    assert(got == expected)
  }

  test("physical plan is merge-shaped: one exchange per side, sorted inputs") {
    import spark.implicits._
    val l = Seq(("A", 1L)).toDF("k", "t")
    val r = Seq(("A", 1L, 1.0)).toDF("rk", "rt", "v")
    val plan = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin")) // SparkPlan nodeName strips "Exec"
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2)
    assert("Sort ".r.findAllIn(plan).size >= 2)
  }
}
