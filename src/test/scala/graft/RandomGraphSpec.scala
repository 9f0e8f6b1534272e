package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed connected-components loop
  * (TrainingOps.connectedComponents) against a driver-side union-find
  * reference on seeded random graphs — including shapes the dedup
  * query's window-blocked edges never produce: long paths (worst-case
  * pointer-jumping depth), stars, dense blobs, isolated vertices, and
  * self-loops.
  */
class RandomGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        parent(r) = parent.getOrElse(parent(r), parent(r)); r = parent(r)
      }
      r
    }
    for ((u, v) <- edges) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    (0L until n.toLong).map(v => v -> find(v)).toMap
  }

  private def check(n: Int, edges: Seq[(Long, Long)], tag: String): Unit = {
    import spark.implicits._
    val vertices = (0L until n.toLong).toDF("n")
    val edgeDf = edges.toDF("u", "v")
    val want = unionFind(n, edges)
    // both paths: the driver union-find fast path (default threshold)
    // and the distributed pointer-jumping loop (threshold 0 forces it)
    for ((maxEdges, path) <- Seq(Long.MaxValue -> "driver", 0L -> "distributed")) {
      val got = graft.queries.TrainingOps
        .connectedComponents(vertices, edgeDf, driverMaxEdges = maxEdges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"$tag/$path: components diverge from union-find")
    }
  }

  test("path graph (worst-case depth for pointer jumping)") {
    check(200, (0L until 199L).map(i => (i, i + 1)), "path-200")
  }

  test("star, blob, isolated vertices, self-loops") {
    check(50, (1L until 50L).map(i => (25L, i)), "star")
    check(30, (for (u <- 0L until 30L; v <- u + 1 until 30L) yield (u, v)), "blob")
    check(40, Seq((0L, 1L), (5L, 5L), (7L, 8L)), "sparse+selfloop")
  }

  test("negative vertex ids (label sums can hit any sentinel value)") {
    import spark.implicits._
    // path over {-4, 0, 1, 2, 3}: after round 1 the label sum is -1,
    // which a -1 'uninitialized' sentinel mistook for convergence
    val vertices = Seq(-4L, 0L, 1L, 2L, 3L).toDF("n")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("u", "v")
    for (maxEdges <- Seq(Long.MaxValue, 0L)) { // driver AND distributed
      val got = graft.queries.TrainingOps
        .connectedComponents(vertices, edges, driverMaxEdges = maxEdges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(-4L -> -4L, 0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L),
        s"maxEdges=$maxEdges")
    }
  }

  test("edge endpoints absent from vertices conduct connectivity (both paths)") {
    import spark.implicits._
    // 0 is an endpoint but not a vertex: 1 and 2 connect THROUGH it and
    // label by the min reachable id (0), reported only for input vertices
    val vertices = Seq(1L, 2L).toDF("n")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("u", "v")
    for (maxEdges <- Seq(Long.MaxValue, 0L)) {
      val got = graft.queries.TrainingOps
        .connectedComponents(vertices, edges, driverMaxEdges = maxEdges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 0L, 2L -> 0L), s"maxEdges=$maxEdges")
    }
  }

  test("seeded random graphs match union-find") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(80)
      val m = rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(n, edges, s"random-$seed")
    }
  }
}
