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

  test("space-saving sketch brackets exact counts under arbitrary splits and merges") {
    // generated zipf-ish streams, split into random parts, each part
    // sketched independently, parts merged in order — the exact shape
    // of partials crossing partitions (batch) or micro-batches+shards
    // (streaming). Pure JVM: no Spark job needed to pin the state class.
    val streams = sample(
      for {
        nHeavy <- Gen.chooseNum(1, 4)
        heavyReps <- Gen.chooseNum(20, 60)
        nTail <- Gen.chooseNum(10, 80)
        nParts <- Gen.chooseNum(1, 5)
        shuffleSeed <- Gen.chooseNum(0L, 1000L)
      } yield (nHeavy, heavyReps, nTail, nParts, shuffleSeed), 50)

    for (((nHeavy, heavyReps, nTail, nParts, shuffleSeed), tc) <- streams.zipWithIndex) {
      val items = (1 to nHeavy).flatMap(h => Seq.fill(heavyReps)(h.toLong)) ++
        (100L until (100L + nTail))
      val shuffled = new scala.util.Random(shuffleSeed).shuffle(items)
      val parts = shuffled.grouped(math.max(1, shuffled.size / nParts)).toSeq
      val global = new graft.functions.SpaceSavingState(8)
      parts.foreach { p =>
        val st = new graft.functions.SpaceSavingState(8)
        p.foreach(st.add)
        global.mergeWith(st)
      }
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      global.sorted.foreach { case (item, est, err) =>
        val t = exact.getOrElse(item, 0L)
        assert(est >= t && t >= est - err,
          s"case $tc item $item: est=$est err=$err true=$t")
      }
      // guaranteed recall: anything above N/capacity must be reported
      val n = items.size.toLong
      val reported = global.sorted.map(_._1).toSet
      exact.collect { case (item, c) if c > n / 8 =>
        assert(reported(item), s"case $tc heavy item $item (count $c, n $n) missing")
      }
    }
  }

  test("sequence packing partitions chunks into dense contiguous windows") {
    // invariants over the real fixture: (a) the window rollup is a
    // PARTITION of the chunk set (counts and chars both reconcile);
    // (b) window ids per source are dense from 0 (chunk lengths are
    // <= budget, so the running sum can never skip a window).
    val packed = graft.operators.TrainingPrep.seqPack(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val chunks = graft.operators.TrainingPrep.docChunks(spark, sf)
      .agg(count(lit(1)), sum(col("chunk_len")))
      .as[(Long, Long)].head()
    assert(packed.map(_._3).sum == chunks._1, "window n_chunks must sum to the chunk count")
    assert(packed.map(_._4).sum == chunks._2, "window n_chars must sum to total chunk chars")
    packed.groupBy(_._1).foreach { case (src, ws) =>
      val ids = ws.map(_._2).sorted
      assert(ids.head == 0L && ids.last == ids.size - 1L,
        s"source $src windows not dense from 0: ${ids.toSeq}")
    }
  }

  test("both CC propagation styles match driver-side union-find on generated graphs") {
    // sparse (forest-heavy), balanced, and dense (one giant component)
    // regimes; ground truth is an independent driver-side union-find,
    // not agreement between the two distributed implementations
    val regimes = Seq((80L, 40), (80L, 100), (60L, 200))
    regimes.zipWithIndex.foreach { case ((n, m), r) =>
      val edgeGen = for {
        a <- Gen.chooseNum(0L, n - 1)
        b <- Gen.chooseNum(0L, n - 1) if a != b
      } yield (a, b)
      val es = sample(edgeGen, m)

      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val root = find(p); parent(x) = root; root }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val expected = (0L until n).map(v => v -> find(v)).toMap

      val vertices = (0L until n).toDF("id")
      val edges = es.toDF("src", "dst")
      val prop = graft.operators.Graph.connectedComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val lss = graft.operators.Graph.largeSmallStarComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      assert(prop == expected, s"regime $r: propagation diverged from union-find")
      assert(lss == expected, s"regime $r: large/small-star diverged from union-find")
    }
  }

  test("linear attribution conserves money exactly and matches a direct recompute") {
    val ev = Tables.events(TestSession.spark, TestSession.Sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3), r.getDouble(4)))
    val purchases = ev.filter(_._3 == "purchase")
    val clicks = ev.filter(_._3 == "click")
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    val expected = purchases.groupBy(_._2).map { case (uid, ps) =>
      var attributedCents = 0L
      val attP = scala.collection.mutable.Set.empty[Long]
      val attC = scala.collection.mutable.Set.empty[Long]
      ps.foreach { case (pid, _, _, pts, v) =>
        val cents = math.round(v * 100)
        val cs = clicks.filter { case (_, cu, _, cts, _) =>
          cu == uid && !cts.after(pts) &&
            (pts.getTime * 1000L + (pts.getNanos / 1000 % 1000)) -
            (cts.getTime * 1000L + (cts.getNanos / 1000 % 1000)) <= sevenDaysUs
        }.sortBy(c => (c._4.getTime, c._1))
        if (cs.nonEmpty) {
          attP += pid; attC ++= cs.map(_._1)
          // largest-remainder shares always sum exactly to cents
          attributedCents += cents
        }
      }
      val total = ps.map(p => math.round(p._5 * 100)).sum
      (uid, ps.size.toLong, attP.size.toLong, attC.size.toLong,
        total, attributedCents, total - attributedCents)
    }.toSeq.sortBy(_._1)
    val got = graft.operators.Analytics.linearAttribution(TestSession.spark, TestSession.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }
}
