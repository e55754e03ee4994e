package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Ground-truth tests for the retrieval/classification/distributional
  * operators: each result is recomputed from the raw fixture with plain
  * Scala collections (no Spark, no SQL) and compared — an implementation
  * error shared by the DataFrame plan and the DuckDB oracle cannot slip
  * past a third independent formulation.
  */
class RetrievalSpec extends SparkSpec {

  private def docs: Seq[(Long, Array[String])] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toSeq

  test("bm25TopK matches a plain-Scala BM25 over the collected corpus") {
    val corpus = docs
    val n = corpus.size.toLong
    val avgdl = corpus.map(_._2.length.toLong).sum.toDouble / n
    val byQuery = Retrieval.BmQueries.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dfreq: Map[String, Long] = {
      val terms = Retrieval.BmQueries.map(_._2).distinct
      terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    }
    val expected = byQuery.toSeq.flatMap { case (qid, terms) =>
      val scored = corpus.flatMap { case (id, ws) =>
        val dl = ws.length
        val s = terms.map { t =>
          val tf = ws.count(_ == t)
          if (tf == 0) 0d
          else {
            val idf = math.log(1d + (n - dfreq(t) + 0.5) / (dfreq(t) + 0.5))
            idf * tf * (Retrieval.K1 + 1) /
              (tf + Retrieval.K1 * (1d - Retrieval.B + Retrieval.B * dl / avgdl))
          }
        }.sum
        if (s > 0) Some((id, s)) else None
      }
      scored.sortBy { case (id, s) => (-BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP), id) }
        .take(Retrieval.TopN).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
    }.sortBy(t => (t._1, t._2))
    val got = Retrieval.bm25TopK(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gq, gr, gid, gs), (eq, er, eid, es)) =>
      assert((gq, gr, gid) == (eq, er, eid), s"rank row: got ${(gq, gr, gid)} want ${(eq, er, eid)}")
      assert(math.abs(gs - es) < 1e-3, s"score drift: $gs vs $es")
    }
  }

  test("bm25Indexed reproduces the from-scratch ranking row-for-row") {
    val flat = Retrieval.bm25TopK(spark, sf).collect().map(_.toSeq)
    val indexed = Retrieval.bm25Indexed(spark, sf).collect().map(_.toSeq)
    assert(indexed.toSeq == flat.toSeq)
    // and the probe is served from the cached index (InMemoryTableScan),
    // not a fresh corpus tokenize — the cached relation's plan STRING
    // still prints its build lineage, so assert on the scan node type
    val plan = Retrieval.bm25Indexed(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"indexed probe did not read the cached postings:\n$plan")
  }

  test("bm25 append: counter-refreshed base+delta probe equals the full index") {
    // the fixture's base and delta splits partition the corpus, so the
    // probe-after-append must reproduce the full-index ranking exactly
    // — df/N/avgdl counter addition cannot drift from a from-scratch
    // build without breaking this
    val appended = Retrieval.bm25AppendProbe(spark, sf).collect().map(_.toSeq)
    val indexed = Retrieval.bm25Indexed(spark, sf).collect().map(_.toSeq)
    assert(appended.toSeq == indexed.toSeq)
    // the merged df sidecar equals df re-derived from the unioned
    // postings, term for term (the oracle's independent derivation)
    val (postings, termStats, stats) = Retrieval.bm25AppendedFrames(spark, sf)
    val fromUnion = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = termStats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == fromUnion)
    // refreshed N equals the corpus document count
    val n = stats.collect().head.getLong(0)
    assert(n == Tables.documents(spark, sf).count())
  }

  test("bm25 gen-2 append: two folded generations equal the full rebuild") {
    // base ∪ A ∪ B partitions the corpus, so folding A (gen 1) and then
    // B through the GROWN index (gen 2 — consuming gen 1's FOLDED
    // df/N/Σdl, never raw base stats) must reproduce the from-scratch
    // ranking row for row at both sf fixtures' scale
    val g2 = Retrieval.bm25Append2Probe(spark, sf).collect().map(_.toSeq)
    val indexed = Retrieval.bm25Indexed(spark, sf).collect().map(_.toSeq)
    assert(g2.toSeq == indexed.toSeq)
    // both ingest buckets are non-empty on the fixture, or the test
    // would vacuously pass with an empty generation
    val bucket = graft.GoldenHash.bucket(col("doc_id"), 20)
    assert(Tables.documents(spark, sf).filter(bucket === 7).count() > 0)
    assert(Tables.documents(spark, sf).filter(bucket === 11).count() > 0)
  }

  test("knnClassify matches a plain-Scala k-NN vote") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val (qs, corpus) = vecs.partition(_._1 < Retrieval.KnnQueries)
    val expected = qs.sortBy(_._1).map { case (qid, qv, qlabel) =>
      val top = corpus
        .map { case (id, v, l) => (id, l, BigDecimal(cos(qv, v)).setScale(9, BigDecimal.RoundingMode.HALF_UP)) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(Retrieval.KnnK)
      val votes = top.groupBy(_._2).view.mapValues(_.length).toSeq
      val (pred, nv) = votes.minBy { case (l, v) => (-v, l) }
      (qid, qlabel, pred, nv.toLong, pred == qlabel)
    }
    val got = Retrieval.knnClassify(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == expected.toSeq)
  }

  test("knnClassifyIvf agrees with the exact classifier on most queries") {
    val exact = Retrieval.knnClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ivf = Retrieval.knnClassifyIvf(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(ivf.keySet == exact.keySet, "IVF probe lost or invented queries")
    val agree = exact.count { case (q, p) => ivf(q) == p }
    // directional recall bar (the IVF-PQ convention): the nprobe=3/k=8
    // probe sees ~3/8 of the corpus, so some vote flips are expected,
    // but most predictions must survive the cell restriction
    assert(agree >= 6, s"only $agree/10 IVF predictions match exact kNN")
  }

  test("pmiPairs matches plain-Scala windowed co-occurrence counts") {
    val corpus = docs.map(_._2).filter(_.length >= 3)
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    corpus.foreach { ws =>
      for (i <- 0 until ws.length; d <- 1 to 2 if i + d < ws.length) {
        val (a, b) = (ws(i), ws(i + d))
        val k = if (a <= b) (a, b) else (b, a)
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1
      }
    }
    val uni = corpus.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tW = uni.values.sum.toDouble
    val tP = pairCounts.values.sum.toDouble
    val expected = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(Retrieval.PmiTopPairs)
      .map { case ((a, b), c) =>
        (a, b, c, math.log((c / tP) / ((uni(a) / tW) * (uni(b) / tW))))
      }
    val gotFixed = Retrieval.pmiPairs(spark, sf).select("w1", "w2", "c_ab", "pmi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(gotFixed.length == expected.length)
    gotFixed.zip(expected).foreach { case ((gw1, gw2, gc, gp), (ew1, ew2, ec, ep)) =>
      assert((gw1, gw2, gc) == (ew1, ew2, ec), s"pair: got ${(gw1, gw2, gc)} want ${(ew1, ew2, ec)}")
      assert(math.abs(gp - ep) < 1e-3, s"pmi drift: $gp vs $ep")
    }
  }

  test("weightedSample matches exact integer recompute and is deterministic") {
    val raw = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = raw.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rows) =>
      val pms = rows.map { case (_, _, nc) => math.min(1000L, math.max(100L, nc * 2)) }
      val kept = rows.zip(pms).count { case ((id, _, _), pm) =>
        (id * GoldenHash.Gamma) % 1000 < pm
      }
      (src, rows.length.toLong, kept.toLong, pms.sum)
    }
    val got = Retrieval.weightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gs, gn, gk, ge, gr), (es, en, ek, epmSum)) =>
      assert((gs, gn, gk) == (es, en, ek))
      assert(math.abs(ge - epmSum / 1000d) < 1e-6)
      assert(math.abs(gr - gk.toDouble / gn) < 1e-6)
    }
    // determinism: a second invocation is bit-identical
    val again = Retrieval.weightedSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == again.toSeq)
  }
}
