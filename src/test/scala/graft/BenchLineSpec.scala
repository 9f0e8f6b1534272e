package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{JNumber, JObject, Json}

/** Harness-contract pins for the bench JSON line: the driver captures
  * only the last ~2000 chars of stdout and json-parses the line, so it
  * must stay within budget and be locale-independent valid JSON —
  * BENCH_r01 was lost to exactly this (a ~2900-char line truncated
  * mid-JSON).
  */
class BenchLineSpec extends AnyFunSuite {

  private def results(n: Int): Map[String, Double] =
    (0 until n).map(i => f"q_some_rather_long_query_name_$i%03d" -> i * 0.137).toMap

  test("line stays within the tail-capture budget at any query count") {
    for (n <- Seq(0, 1, 50, 101, 400)) {
      val line = Bench.renderLine(results(n), "/root/testdata/sf0.1")
      assert(line.length <= Bench.MaxLineChars, s"n=$n: ${line.length} chars")
      val obj = Json.parse(line).asInstanceOf[JObject]
      assert(obj.fields("n_queries").asInstanceOf[JNumber].value == n)
    }
  }

  test("largest queries survive the budget cut") {
    val line = Bench.renderLine(results(400), "sf")
    val kept = Json.parse(line).asInstanceOf[JObject]
      .fields("queries").asInstanceOf[JObject].fields
    assert(kept.nonEmpty)
    // entries are admitted largest-first, so the overall largest value
    // must be present
    assert(kept.contains("q_some_rather_long_query_name_399"))
  }

  test("failed keys surface in the line (round-5 silent-breakage pin)") {
    val line = Bench.renderLine(results(3), "sf",
      failed = Seq("q_some_rather_long_query_name_001"))
    val obj = Json.parse(line).asInstanceOf[JObject]
    val failed = obj.fields("failed").asInstanceOf[graft.schema.JArray].items
      .map(_.asInstanceOf[graft.schema.JString].value)
    assert(failed == Seq("q_some_rather_long_query_name_001"))
    assert(obj.fields("n_failed").asInstanceOf[JNumber].value == 1)
    // the success path must not emit the field at all
    assert(!Bench.renderLine(results(3), "sf").contains("failed"))
  }

  test("a mass failure stays within the line budget (capped list, exact count)") {
    val names = (0 until 200).map(i => f"q_some_rather_long_query_name_$i%03d")
    val line = Bench.renderLine(results(200), "sf", failed = names)
    assert(line.length <= Bench.MaxLineChars, s"${line.length} chars")
    val obj = Json.parse(line).asInstanceOf[JObject]
    assert(obj.fields("n_failed").asInstanceOf[JNumber].value == 200)
    val shown = obj.fields("failed").asInstanceOf[graft.schema.JArray].items
    assert(shown.size <= 16)
  }

  test("load + retimed fields stay within budget and parse") {
    val rt = (0 until 5).map(i =>
      f"q_some_rather_long_query_name_$i%03d" -> i * 0.101).toMap
    val line = Bench.renderLine(results(400), "sf",
      retimed = rt, load = Some((12.345, 3.0)))
    assert(line.length <= Bench.MaxLineChars, s"${line.length} chars")
    val obj = Json.parse(line).asInstanceOf[JObject]
    val loads = obj.fields("load").asInstanceOf[graft.schema.JArray].items
      .map(_.asInstanceOf[JNumber].value)
    assert(loads == Seq(12.345, 3.0))
    val re = obj.fields("retimed").asInstanceOf[JObject].fields
    assert(re.size == 5)
    // an oversized retimed map is truncated, never overflows the line
    val big = (0 until 50).map(i => f"q_$i%03d" -> 1.0).toMap
    val line2 = Bench.renderLine(results(10), "sf", retimed = big)
    assert(Json.parse(line2).asInstanceOf[JObject]
      .fields("retimed").asInstanceOf[JObject].fields.size <= Bench.RetimeTopN)
    // a platform that can't report loadavg (-1) omits the field
    val line3 = Bench.renderLine(results(3), "sf", load = Some((-1.0, -1.0)))
    assert(!line3.contains("load"))
  }

  test("jobs field: total + top-by-time per-key counts, capped, " +
      "within budget (host-invariant plan evidence)") {
    val res = results(400)
    val jb = res.keys.map(k => k -> 3).toMap
    val line = Bench.renderLine(res, "sf", jobs = jb)
    assert(line.length <= Bench.MaxLineChars, s"${line.length} chars")
    val obj = Json.parse(line).asInstanceOf[JObject]
    assert(obj.fields("jobs_total").asInstanceOf[JNumber].value == 1200)
    val shown = obj.fields("jobs").asInstanceOf[JObject].fields
    assert(shown.size == Bench.JobsTopN)
    // per-key counts ride for the SLOWEST keys — the set a plan
    // regression would move
    assert(shown.contains("q_some_rather_long_query_name_399"))
    // no jobs measured → no field (renderLine stays backward-parseable)
    assert(!Bench.renderLine(res, "sf").contains("jobs_total"))
  }

  test("oracle field: external DuckDB baseline summary, constant-size, " +
      "q_*-only ratio, within budget") {
    val res = results(400)
    // duck times for half the keys (the oracle never times no-oracle
    // sketch keys) plus one extra key the bench didn't run
    val duck = res.keys.take(200).map(k => k -> 0.01).toMap +
      ("q_not_benched" -> 9.9)
    val line = Bench.renderLine(res, "sf", duck = duck)
    assert(line.length <= Bench.MaxLineChars, s"${line.length} chars")
    val obj = Json.parse(line).asInstanceOf[JObject]
    val o = obj.fields("oracle").asInstanceOf[JObject].fields
    assert(o("engine").asInstanceOf[graft.schema.JString].value == "duckdb")
    // only the intersection is summarized; totals cover q_* keys only
    assert(o("n").asInstanceOf[JNumber].value == 200)
    assert(o("q_n").asInstanceOf[JNumber].value == 200)
    assert(o("q_duck").asInstanceOf[JNumber].value == 2.0)
    assert(o.contains("q_spark") && o.contains("q_ratio_median"))
    // r16: the aggregate spark/duck ratio is the drift-proof headline
    val qSpark = o("q_spark").asInstanceOf[JNumber].value.toDouble
    val qRatio = o("q_ratio").asInstanceOf[JNumber].value.toDouble
    // both sides rendered at 3 decimals — allow the rounding quantum
    assert(math.abs(qRatio - qSpark / 2.0) < 1e-3)
    // no baseline file → no field
    assert(!Bench.renderLine(res, "sf").contains("oracle"))
    // a zero duck time never divides: ratio fields just skip it
    val line2 = Bench.renderLine(Map("q_a" -> 1.0), "sf",
      duck = Map("q_a" -> 0.0))
    assert(!line2.contains("q_ratio") && line2.contains("oracle"))
  }

  test("compact headline line: bounded, no per-key maps, carries the " +
      "ratio block and jobs_total (r17 — the full line's head fell out " +
      "of the driver's stdout tail once trailing output followed it)") {
    val res = results(400)
    val duck = res.keys.take(200).map(k => k -> 0.01).toMap
    val jb = res.keys.map(k => k -> 3).toMap
    val line = Bench.renderCompactLine(res, "/root/testdata/sf0.1",
      failed = (0 until 50).map(i => f"q_some_rather_long_query_name_$i%03d"),
      failedSec = 1.5, jobs = jb, duck = duck, load = Some((1.0, 2.0)))
    // small enough that a ~1.2KB trailing epilogue still leaves the
    // whole object inside a 2KB tail window
    assert(line.length <= 700, s"${line.length} chars")
    val obj = Json.parse(line).asInstanceOf[JObject]
    assert(obj.fields("metric").asInstanceOf[graft.schema.JString]
      .value == "total")
    assert(obj.fields("n_queries").asInstanceOf[JNumber].value == 400)
    assert(obj.fields("jobs_total").asInstanceOf[JNumber].value == 1200)
    assert(obj.fields("n_failed").asInstanceOf[JNumber].value == 50)
    val o = obj.fields("oracle").asInstanceOf[JObject].fields
    assert(o.contains("q_ratio") && o.contains("q_wall"))
    // NO per-key maps — they ride the sidecar and the full line
    assert(!obj.fields.contains("queries") && !obj.fields.contains("jobs")
      && !obj.fields.contains("retimed"))
  }

  test("lifecycle-building q_ keys stay out of the oracle ratio " +
      "(fixture-build wall vs DuckDB's bare SELECT measures scope, " +
      "not engine speed)") {
    val res = Map("q_a" -> 1.0, "q_star_join" -> 30.0)
    val duck = Map("q_a" -> 0.5, "q_star_join" -> 0.1)
    val o = Json.parse(Bench.renderCompactLine(res, "sf", duck = duck))
      .asInstanceOf[JObject].fields("oracle").asInstanceOf[JObject].fields
    assert(o("q_n").asInstanceOf[JNumber].value == 1)
    assert(math.abs(o("q_ratio").asInstanceOf[JNumber].value.toDouble
      - 2.0) < 1e-3)
    // every LifecycleQKeys member really is a declared query key
    assert(Bench.LifecycleQKeys.subsetOf(SparkEntry.queries.keySet))
    assert(Bench.FixtureBuildKeys.subsetOf(Bench.LifecycleQKeys))
  }

  test("valid JSON under a comma-decimal locale") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.renderLine(Map("q_a" -> 1.5, "q_b" -> 0.25), "sf")
      assert(!line.contains("1,5"), line)
      val obj = Json.parse(line).asInstanceOf[JObject]
      assert(obj.fields("value").asInstanceOf[JNumber].value == 1.75)
    } finally java.util.Locale.setDefault(prev)
  }
}
