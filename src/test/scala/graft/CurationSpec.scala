package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationOps

/** Invariants for the corpus-curation operators (CurationOps) on the
  * sf0.001 fixture; exact values are pinned by the DuckDB oracle at
  * sf0.01 — these tests check the structural properties that must hold
  * at any scale.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(key: String) = CurationOps.queries(key)(spark, dir)

  private lazy val nDocs =
    spark.read.parquet(s"$dir/documents.parquet").count()

  test("q_quality_repetition emits one row per doc with sane bounds") {
    val rows = run("q_quality_repetition").collect()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens")
      val d = r.getAs[Int]("n_distinct_tokens")
      val nb = r.getAs[Int]("n_bigrams")
      val db = r.getAs[Int]("n_distinct_bigrams")
      val top = r.getAs[Int]("top_token_count")
      assert(d >= 1 && d <= n)
      assert(nb == math.max(n - 1, 0) && db <= nb)
      assert(top >= 1 && top <= n)
      assert(Set(0, 1).contains(r.getAs[Int]("keep")))
    }
    // the fixture text is repetitive enough that both classes appear
    assert(rows.map(_.getAs[Int]("keep")).distinct.length == 2)
  }

  test("q_decontaminate keeps only non-benchmark docs and drops overlaps") {
    val kept = run("q_decontaminate").collect().map(_.getLong(0))
    assert(kept.forall(_ % 50 != 0))
    // at least one doc shares a 4-gram with the benchmark slice in the
    // fixture, so the filter must actually remove something
    val nonBench = spark.read.parquet(s"$dir/documents.parquet")
      .filter("doc_id % 50 <> 0").count()
    assert(kept.length < nonBench)
    assert(kept.sorted.sameElements(kept))
  }

  test("q_pack_sequences partitions every doc into contiguous bins") {
    val bins = run("q_pack_sequences").collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // bins are contiguous from 0 within each language
    bins.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
    // budget check: a bin's STARTING offsets all precede the boundary,
    // so every bin except a group's last must reach >= budget cumulative
    assert(bins.forall(_.getAs[Long]("sum_tokens") > 0))
  }

  test("q_pack_greedy bins respect the budget and cover every doc") {
    val bins = run("q_pack_greedy").collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    bins.foreach { r =>
      val docs = r.getAs[Long]("n_docs")
      val toks = r.getAs[Long]("sum_tokens")
      // greedy invariant: a bin exceeds the budget only when a single
      // oversize document forced it
      assert(toks <= 512 || docs == 1L,
        s"bin ${r.getString(0)}/${r.getAs[Long]("bin")} " +
          s"has $docs docs and $toks tokens")
    }
    // bins are contiguous from 0 per language
    bins.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[Long]("bin")).sorted
      assert(ids.head == 0L && ids.sameElements(ids.head to ids.last))
    }
    // deterministic across reruns (repartition + sortWithinPartitions
    // must fully determine the scan order)
    assert(run("q_pack_greedy").collect().map(_.toString).toSeq ==
      bins.map(_.toString).toSeq)
  }

  test("q_curriculum tiers are contiguous and positions dense per tier") {
    val rows = run("q_curriculum").collect()
    assert(rows.length == nDocs)
    rows.groupBy(_.getAs[Int]("tier")).foreach { case (tier, rs) =>
      assert(Set(0, 1, 2).contains(tier))
      val pos = rs.map(_.getAs[Int]("tier_pos")).sorted
      assert(pos.head == 1 && pos.sameElements(1 to rs.length),
        s"tier $tier positions must be dense from 1")
      // within a tier, position follows doc_id order
      val byPos = rs.sortBy(_.getAs[Int]("tier_pos")).map(_.getLong(0))
      assert(byPos.sorted.sameElements(byPos))
    }
  }

  test("q_sample_mixture downsamples the dominant language") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("q_sample_mixture").collect()
      .groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
    // deterministic: same result on a re-run
    val again = run("q_sample_mixture").collect()
      .groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
    assert(kept == again)
    // en is downsampled hardest; every language keeps a subset
    kept.foreach { case (l, n) => assert(n <= base(l)) }
    assert(kept("en").toDouble / base("en") <
      kept.filterNot(_._1 == "en").map(_._2).sum.toDouble /
        base.filterNot(_._1 == "en").values.sum)
  }
}
