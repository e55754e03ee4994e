package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.streaming.StreamPipelines

/** Property-style invariants (SURVEY.md §5.3): scalacheck generators
  * with a fixed seed produce the cases; each property is evaluated in
  * ONE Spark job over the generated rows (a job per forAll sample would
  * be prohibitively slow), comparing the engine's answer with a
  * directly-computed expectation per row.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, rng.Seed(42L + i)))
  }

  test("z-score classifier matches its algebraic definition on generated inputs") {
    val cases = sample(
      for {
        count <- Gen.chooseNum(0L, 1000L)
        hasHist <- Gen.oneOf(true, false)
        avg <- Gen.chooseNum(0.0, 200.0)
        stddev <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.01, 50.0))
      } yield (count, hasHist, avg, stddev), 300).zipWithIndex

    val counts = cases.map { case ((c, _, _, _), i) => (s"k$i", c) }
      .toDF("remote_addr", "request_count")
    val hist = cases.collect { case ((_, true, a, s), i) => (s"k$i", a, s) }
      .toDF("remote_addr", "avg_requests", "stddev_requests")

    val got = StreamPipelines.zscoreClassify(counts, hist, "remote_addr")
      .select("remote_addr", "z_score", "is_anomaly")
      .as[(String, Double, Boolean)].collect()
      .map { case (k, z, a) => k -> ((z, a)) }.toMap

    for (((c, hasHist, a, s), i) <- cases) {
      val expectedZ = if (hasHist && s > 0) (c - a) / s else 0.0
      val expectedAnomaly = math.abs(expectedZ) > 3 || (!hasHist && c > 100)
      val (z, anom) = got(s"k$i")
      assert(math.abs(z - expectedZ) < 1e-9, s"case $i z")
      assert(anom == expectedAnomaly, s"case $i flag (c=$c hist=$hasHist a=$a s=$s)")
    }
  }

  test("merge-intersect Jaccard equals set algebra on generated sorted arrays") {
    val pair = for {
      a <- Gen.listOf(Gen.chooseNum(0L, 40L))
      b <- Gen.listOf(Gen.chooseNum(0L, 40L))
    } yield (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
    for (((a, b), i) <- sample(pair, 500).zipWithIndex) {
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val expected = if (union == 0) 1.0 else inter.toDouble / union
      val got = graft.functions.GramHash.jaccardSorted(a, b)
      assert(math.abs(got - expected) < 1e-12, s"case $i: $got vs $expected")
    }
  }

  test("stratified sample filter equals the hash arithmetic, row by row") {
    // the engine-side filter and this direct recompute must agree on
    // every generated id (the reproducibility contract of the sampler)
    val ids = sample(Gen.chooseNum(0L, 3000000000L), 400).distinct
    val types = Seq("purchase", "click", "view", "error")
    val rows = ids.zipWithIndex.map { case (id, i) => (id, types(i % 4)) }
    val df = rows.toDF("event_id", "event_type")
      .withColumn("user_id", lit(0L)).withColumn("ts", current_timestamp())
    val kept = df.filter(GoldenHash.bucket(col("event_id"), 1000) <
        when(col("event_type") === "purchase", 1000)
          .when(col("event_type") === "click", 100)
          .when(col("event_type") === "view", 10).otherwise(50))
      .select("event_id").as[Long].collect().toSet
    rows.foreach { case (id, tpe) =>
      val rate = tpe match {
        case "purchase" => 1000; case "click" => 100; case "view" => 10; case _ => 50
      }
      assert(kept.contains(id) == ((id * GoldenHash.Gamma) % 1000 < rate), s"id $id")
    }
  }

  test("parse chain round-trips generated valid records and drops invalid ones") {
    val word = Gen.alphaNumStr.map(_.take(12))
    val recGen = for {
      addr <- word; uri <- Gen.oneOf("/api/users/7", "/healthz", "/v1/items/3")
      status <- Gen.oneOf("200", "404", "500", "garbage")
      rt <- Gen.oneOf("0.05", "1.5", "notnum")
      valid <- Gen.prob(0.7)
    } yield (addr, uri, status, rt, valid)
    val cases = sample(recGen, 200).zipWithIndex

    val lines = cases.map { case ((addr, uri, status, rt, valid), i) =>
      if (valid)
        s"""{"request": "GET $uri HTTP/1.1", "remote_addr": "$addr-$i",
           | "request_uri": "$uri", "status": "$status", "request_time": "$rt",
           | "http_user_agent": "t"}""".stripMargin.replace("\n", "")
      else s"""{"remote_addr": "$addr-$i", "status": "$status"}"""
    }
    val out = graft.parse.LogParse.ingestChain(lines.toDF("value"))
      .select("remote_addr", "status_code", "request_time_seconds", "endpoint")
      .collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getInt(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3))))
      .toMap

    for (((addr, uri, status, rt, valid), i) <- cases) {
      val key = s"$addr-$i"
      if (!valid) assert(!out.contains(key), s"invalid record $i leaked")
      else {
        val (st, rts, ep) = out(key)
        assert(st == status.toIntOption, s"case $i status")
        assert(rts == rt.toDoubleOption, s"case $i rt")
        val expectedEp = if (uri == "/api/users/7") "users"
          else if (uri == "/v1/items/3") "items" else ""
        assert(ep == expectedEp, s"case $i endpoint")
      }
    }
  }
}
