package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusAudit

/** Plain-Scala ground truth for the corpus-management operators
  * (mixture planning, vocabulary overlap, snapshot diff).
  */
class CorpusAuditSpec extends SparkSpec {

  private def docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def nTok(text: String): Long =
    text.count(_ == ' ') + 1 // len - len(minus spaces) + 1 = spaces + 1

  /** Engine-convention quantizer for the LLR replays: Spark `round()`
    * is BigDecimal HALF_UP (ties away from zero) while `math.round` is
    * floor(x + 0.5) (ties toward +inf) — they disagree on exact
    * NEGATIVE halves (ADVICE r17). An ln-ratio micro-nat landing on
    * exactly .5 is practically impossible, but if one ever does, the
    * replay must side with the engine and the DuckDB oracle (which
    * also rounds ties away from zero), not fail with a misleading diff.
    */
  private def halfUpQ(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("temperatureMix matches a plain-Scala alpha-sampling plan") {
    val perSource = docs.groupBy(_._2).view
      .mapValues(ds => (ds.size.toLong, ds.map(t => nTok(t._3)).sum)).toMap
    val tTok = perSource.values.map(_._2).sum
    val qs = perSource.view.mapValues { case (_, nt) =>
      math.round(math.pow(nt.toDouble / tTok, CorpusAudit.MixAlpha) * CorpusAudit.MixQ)
    }.toMap
    val qSum = qs.values.sum
    val expected = perSource.toSeq.sortBy(_._1).map { case (src, (nd, nt)) =>
      val w = qs(src).toDouble / qSum
      val target = (w * (tTok / 2d)).toLong
      (src, nd, nt, nt.toDouble / tTok, w, target, w * (tTok / 2d) / nt)
    }
    val got = CorpusAudit.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gs, gn, gt, gp, gw, gtg, ge), (es, en, et, ep, ew, etg, ee)) =>
      assert((gs, gn, gt, gtg) == (es, en, et, etg))
      assert(math.abs(gp - ep) < 1e-5 && math.abs(gw - ew) < 1e-5 && math.abs(ge - ee) < 1e-3)
    }
    // the plan upsamples the tail: no source's weight is under its raw share^1
    val flat = got.map(r => (r._1, r._4, r._5))
    val (smallest, largest) = (flat.minBy(_._2), flat.maxBy(_._2))
    assert(smallest._3 >= smallest._2, "alpha<1 must upsample the smallest source")
    assert(largest._3 <= largest._2, "alpha<1 must downsample the largest source")
  }

  test("sourceOverlap matches plain-Scala vocabulary Jaccard") {
    val vocab = docs.groupBy(_._2).view
      .mapValues(_.flatMap(_._3.split(" ").filter(_.nonEmpty)).toSet).toMap
    val sources = vocab.keys.toSeq.sorted
    val expected = for {
      a <- sources; b <- sources if a < b
      inter = (vocab(a) intersect vocab(b)).size.toLong
    } yield (a, b, vocab(a).size.toLong, vocab(b).size.toLong, inter)
    val got = CorpusAudit.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == expected.length)
    got.zip(expected.sortBy(t => (t._1, t._2))).foreach {
      case ((ga, gb, gva, gvb, gi, gj), (ea, eb, eva, evb, ei)) =>
        assert((ga, gb, gva, gvb, gi) == (ea, eb, eva, evb, ei))
        assert(math.abs(gj - ei.toDouble / (eva + evb - ei)) < 1e-3)
    }
  }

  test("snapshotDiff classifies every doc exactly once with all four statuses live") {
    def decile(id: Long): Long = (id * GoldenHash.Gamma) % 1000 / 100
    val expected = docs.flatMap { case (id, src, _) =>
      val inA = decile(id) != 9
      val inB = decile(id) != 0
      val status =
        if (!inA && inB) Some("added")
        else if (inA && !inB) Some("removed")
        else if (inA && inB && decile(id) == 5) Some("modified")
        else if (inA && inB) Some("unchanged")
        else None
      status.map(st => (src, st))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((src, st), n) => (src, st, n) }
      .sortBy(t => (t._1, t._2))
    val got = CorpusAudit.snapshotDiff(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    // non-degenerate: all four statuses appear (the bucket(id,10) form
    // collapsed to one status per source — the GoldenHash mod-trap)
    assert(got.map(_._2).distinct.sorted ==
      Seq("added", "modified", "removed", "unchanged"))
  }

  test("dsirSelect matches a plain-Scala DSIR replay and keeps ~top-20%") {
    val langDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def bigrams(text: String): Seq[String] = {
      val ws = "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
      ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(bg: String): Int =
      (bg.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 2147483648L) %
        CorpusAudit.DsirDim).toInt
    val all = langDocs.flatMap { case (id, lang, t) =>
      bigrams(t).map(bg => (id, lang, bucket(bg)))
    }
    val tB = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rB = all.filter(_._2 != "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tN, rN) = (tB.values.sum, rB.values.sum)
    val dim = CorpusAudit.DsirDim
    val llrQ = (tB.keySet ++ rB.keySet).map { b =>
      b -> halfUpQ((math.log((tB.getOrElse(b, 0L) + 1).toDouble / (tN + dim)) -
        math.log((rB.getOrElse(b, 0L) + 1).toDouble / (rN + dim))) *
        CorpusAudit.DsirQ)
    }.toMap
    val scored = all.filter(_._2 != "en").groupBy(t => (t._1, t._2)).view
      .mapValues(rows => (rows.size.toLong, rows.map(t => llrQ(t._3)).sum))
      .toSeq.map { case ((id, lang), (n, sc)) => (id, lang, n, sc) }
    // Spark's exact percentile: linear interpolation at rank p*(n-1)
    val sorted = scored.map(_._4).sorted
    val rank = 0.8 * (sorted.length - 1)
    val lo = rank.toInt
    val cut =
      if (lo + 1 < sorted.length)
        sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo)).toDouble
      else sorted(lo).toDouble
    val expected = scored.filter(_._4 > cut).sortBy(_._1)
    val got = CorpusAudit.dsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // structural: nothing from the target split leaks in, and the keep
    // rate is the quantile contract (≤ 20% strictly above the cut)
    assert(got.forall(_._2 != "en"))
    val candidates = scored.length
    assert(got.length <= math.ceil(candidates * 0.2).toInt + 1)
    assert(got.nonEmpty, "degenerate fixture: nothing selected")

    // Capped cutpoint path (VERDICT r13 finding #2): with the cut
    // sample forced BELOW the candidate count the percentile runs over
    // exactly the K docs with the smallest golden-hash rank — replay
    // that sample in plain Scala and assert the selection still matches.
    val k = 50
    assert(candidates > k, "fixture must exceed the forced cap")
    val sampleScores = scored
      .sortBy(t => ((t._1 * GoldenHash.Gamma) % CorpusAudit.DsirSampleMod, t._1))
      .take(k).map(_._4.toDouble).sorted
    val rankK = 0.8 * (k - 1)
    val loK = rankK.toInt
    val cutK = sampleScores(loK) + (rankK - loK) * (sampleScores(loK + 1) - sampleScores(loK))
    val expectedK = scored.filter(_._4 > cutK).sortBy(_._1)
    val gotK = CorpusAudit.dsirSelect(spark, sf, cutSample = k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotK == expectedK)

    // scale guard: the percentile's input is limit-bounded in the plan
    // (TakeOrderedAndProject = per-partition K-heaps), so no task ever
    // buffers corpus-cardinality score values
    val plan = CorpusAudit.dsirSelect(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "DSIR cutpoint must read a K-bounded ordered sample:\n" + plan)
    // the shared Moore-Lewis cutpoint body (mooreLewisCutpointOf) holds
    // the same bound in every consumer: the per-run budget cut and the
    // frozen-cutpoint batch twin
    for ((name, df) <- Seq(
        "q_moore_lewis_budget" -> CorpusAudit.mooreLewisBudget(spark, sf),
        "q_moore_lewis_budget_delta" -> CorpusAudit.mooreLewisBudgetDelta(spark, sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"),
        s"$name cutpoint must read a K-bounded ordered sample:\n" + p.take(3000))
    }
  }

  test("corpusDatacard: per-source rollup re-totals its oracle-checked constituents") {
    val rows = CorpusAudit.corpusDatacard(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    val sources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == sources, "one row per source")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // totals equal the constituents' own corpus-wide numbers (the
    // datacard adds only wiring, never new arithmetic)
    val nearTotal = graft.operators.Dedup.minhashDedup(spark, sf)
      .filter(col("is_duplicate")).count()
    assert(rows.map(_.getAs[Long]("n_near_dups")).sum == nearTotal)
    val contamTotal = graft.operators.Dedup.minhashDecontaminate(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_contaminated")).sum == contamTotal)
    val bpeTotal = graft.operators.BpeTrain.bpeApply(spark, sf)
      .agg(sum(col("n_bpe_tokens"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_bpe_tokens")).sum == bpeTotal)
    val pplTotal = graft.operators.UnigramLm.unigramPplFilter(spark, sf)
      .filter(col("keep")).count()
    assert(rows.map(_.getAs[Long]("n_ppl_pass")).sum == pplTotal)
    // the selection-family columns (VERDICT r18 item 4) re-total the
    // committed mooreLewisSelect replay: candidates = its whole output,
    // passes = its threshold-rule keeps
    val mlSel = CorpusAudit.mooreLewisSelect(spark, sf)
    assert(rows.map(_.getAs[Long]("n_ml_candidates")).sum == mlSel.count())
    assert(rows.map(_.getAs[Long]("n_ml_pass")).sum ==
      mlSel.filter(col("keep")).count())
    // the budget-rule share (VERDICT r19 item 5) re-totals the
    // committed mooreLewisBudget replay — its kept set is a subset of
    // the SAME candidate universe, so a corpus owner reads both
    // admission rules' shares against one denominator
    assert(rows.map(_.getAs[Long]("n_ml_budget_pass")).sum ==
      CorpusAudit.mooreLewisBudget(spark, sf).count())
    rows.foreach { r =>
      val (n, langs) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"))
      assert(n > 0 && langs >= 1 && r.getAs[Long]("top_lang_docs") <= n)
      // the micro shares are the exact integer rule over the emitted counts
      assert(r.getAs[Long]("heuristic_pass_micro") ==
        1000000L * r.getAs[Long]("n_heuristic_pass") / n, r.toString)
      assert(r.getAs[Long]("near_dup_micro") ==
        1000000L * r.getAs[Long]("n_near_dups") / n, r.toString)
      // the ML keep share is over CANDIDATES, not docs (en docs carry
      // no verdict), with the zero-candidate guard
      val mc = r.getAs[Long]("n_ml_candidates")
      assert(r.getAs[Long]("ml_keep_micro") ==
        (if (mc == 0L) 0L else 1000000L * r.getAs[Long]("n_ml_pass") / mc),
        r.toString)
      assert(r.getAs[Long]("ml_budget_keep_micro") ==
        (if (mc == 0L) 0L else 1000000L * r.getAs[Long]("n_ml_budget_pass") / mc),
        r.toString)
      assert(r.getAs[Long]("n_ml_budget_pass") <= mc)
      assert(r.getAs[Long]("n_ml_candidates") <= n)
    }
    // the fixture has candidates and a non-trivial keep share in at
    // least one source, or the new columns are untested wiring
    assert(rows.map(_.getAs[Long]("n_ml_candidates")).sum > 0)
    assert(rows.exists(r => r.getAs[Long]("n_ml_pass") > 0 &&
      r.getAs[Long]("n_ml_pass") < r.getAs[Long]("n_ml_candidates")))
    // and the two rules genuinely differ somewhere on the fixture, or
    // the budget column is indistinguishable from the threshold one
    assert(rows.map(_.getAs[Long]("n_ml_budget_pass")).sum > 0)
    assert(rows.map(r => r.getAs[Long]("n_ml_budget_pass")).sum !=
      rows.map(r => r.getAs[Long]("n_ml_pass")).sum)
  }

  test("mooreLewisBudgetDelta matches a plain-Scala frozen-cutpoint replay") {
    // the budget-rule batch twin end-to-end in plain Scala: fit both
    // LMs on the at-rest slice, score the at-rest candidates (no OOV —
    // their words ARE the vocabulary), take the interpolated 0.8
    // percentile as the frozen cut, then score the delta slice with the
    // unk floor and keep = score > cut AND the majority-known guard
    val langDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def words(text: String): Seq[String] =
      "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
    val (delta, atRest) =
      langDocs.partition(d => (d._1 * GoldenHash.Gamma) % 20 == 7)
    val at = atRest.flatMap { case (id, lang, t) => words(t).map(w => (id, lang, w)) }
    val tW = at.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rW = at.filter(_._2 != "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val vocab = tW.keySet ++ rW.keySet
    val (tN, rN, v) = (tW.values.sum, rW.values.sum, vocab.size.toLong)
    val llrQ = vocab.map { w =>
      w -> halfUpQ((math.log((tW.getOrElse(w, 0L) + 1).toDouble / (tN + v)) -
        math.log((rW.getOrElse(w, 0L) + 1).toDouble / (rN + v))) *
        CorpusAudit.MlewQ)
    }.toMap
    val unkQ = halfUpQ(
      (math.log((rN + v).toDouble) - math.log((tN + v).toDouble)) * CorpusAudit.MlewQ)
    val atScores = at.filter(_._2 != "en").groupBy(_._1).view
      .mapValues(_.map(t => llrQ(t._3)).sum).toMap
    // the cut sample is the whole candidate population at this SF, so
    // the plain replay needs no golden-hash ranking — guard that
    assert(atScores.size <= GoldenHash.CutSampleK,
      "fixture outgrew the cut sample; the plain replay must hash-rank")
    val s = atScores.values.toSeq.map(_.toDouble).sorted
    val h = 0.8 * (s.length - 1)
    val lo = h.toInt
    val c = if (lo + 1 < s.length) s(lo) + (h - lo) * (s(lo + 1) - s(lo)) else s(lo)
    val expected = delta.flatMap { case (id, lang, t) =>
      val ws = words(t)
      if (lang == "en" || ws.isEmpty) None
      else {
        val nOov = ws.count(w => !llrQ.contains(w)).toLong
        val score = ws.map(w => llrQ.getOrElse(w, unkQ)).sum
        Some((id, lang, ws.size.toLong, nOov, score,
          score > c && nOov * 2 <= ws.size))
      }
    }.sortBy(_._1)
    val got = CorpusAudit.mooreLewisBudgetDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // the keep column agrees with q_moore_lewis_delta on everything but
    // the rule: identical (id, lang, n_tokens, n_oov, score_q) rows
    val thr = CorpusAudit.mooreLewisDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == thr)
    // non-degenerate: the frozen cut must keep SOME and reject SOME
    assert(got.exists(_._6) && got.exists(!_._6),
      s"degenerate fixture: all ${got.length} delta candidates on one side of the cut")
  }

  test("mooreLewisSelect matches a plain-Scala cross-entropy-difference replay") {
    val langDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    def words(text: String): Seq[String] =
      "[a-z]+".r.findAllIn(text.toLowerCase).toSeq
    val all = langDocs.flatMap { case (id, lang, t) =>
      words(t).map(w => (id, lang, w))
    }
    val tW = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val rW = all.filter(_._2 != "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val vocab = tW.keySet ++ rW.keySet
    val (tN, rN, v) = (tW.values.sum, rW.values.sum, vocab.size.toLong)
    val llrQ = vocab.map { w =>
      w -> halfUpQ((math.log((tW.getOrElse(w, 0L) + 1).toDouble / (tN + v)) -
        math.log((rW.getOrElse(w, 0L) + 1).toDouble / (rN + v))) *
        CorpusAudit.MlewQ)
    }.toMap
    val expected = all.filter(_._2 != "en").groupBy(t => (t._1, t._2)).view
      .mapValues(rows => (rows.size.toLong, rows.map(t => llrQ(t._3)).sum))
      .toSeq.map { case ((id, lang), (n, sc)) => (id, lang, n, sc, sc > 0L) }
      .sortBy(_._1)
    val got = CorpusAudit.mooreLewisSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    // structural: candidates only, every worded candidate doc scored
    // exactly once, and the gate is the sign of the integer sum
    assert(got.forall(_._2 != "en"))
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.length == langDocs.count(d => d._2 != "en" && words(d._3).nonEmpty))
    assert(got.forall(t => t._5 == (t._4 > 0L)))
    // the fixture must exercise BOTH sides of the gate, or the sign
    // rule is untested
    assert(got.exists(_._5) && got.exists(!_._5),
      s"degenerate fixture: all ${got.length} candidates on one side of the gate")
  }

  test("mooreLewisBudget applies the DSIR cutpoint to the Moore-Lewis scores") {
    val scored = CorpusAudit.mooreLewisSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // the fixture candidate count sits below CutSampleK, so the hash
    // sample IS the full set (the dsirSelect fixture regime); replay
    // Spark's exact percentile: linear interpolation at rank p*(n-1)
    assert(scored.length <= GoldenHash.CutSampleK)
    val sorted = scored.map(_._4.toDouble).sorted
    val rank = 0.8 * (sorted.length - 1)
    val lo = rank.toInt
    val cut =
      if (lo + 1 < sorted.length)
        sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
      else sorted(lo)
    val expected = scored.filter(_._4 > cut).sortBy(_._1)
    val got = CorpusAudit.mooreLewisBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // budget contract: ≤ 20% strictly above the cut, and nonempty
    assert(got.length <= math.ceil(scored.length * 0.2).toInt + 1)
    assert(got.nonEmpty, "degenerate fixture: nothing selected")
    // scale guard: the cutpoint reads a K-bounded ordered sample
    // (per-partition heaps), the dsirSelect convention
    val plan = CorpusAudit.mooreLewisBudget(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "budget cutpoint must read a K-bounded ordered sample:\n" + plan)
  }

  test("selectionCompare re-totals its oracle-checked constituents under both rules") {
    val ml = CorpusAudit.mooreLewisSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(4))).toSeq
    val budgetKept = CorpusAudit.mooreLewisBudget(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val dsirKept = CorpusAudit.dsirSelect(spark, sf).collect()
      .map(_.getLong(0)).toSet
    def ruleRows(rule: String, keep: ((Long, String, Boolean)) => Boolean) =
      ml.groupBy(_._2).toSeq.map { case (lang, rows) =>
        val both = rows.count(t => keep(t) && dsirKept(t._1)).toLong
        val dOnly = rows.count(t => !keep(t) && dsirKept(t._1)).toLong
        val mOnly = rows.count(t => keep(t) && !dsirKept(t._1)).toLong
        val neither = rows.count(t => !keep(t) && !dsirKept(t._1)).toLong
        val denom = both + dOnly + mOnly
        (rule, lang, rows.length.toLong, both, dOnly, mOnly, neither,
          if (denom == 0L) 0L else 1000000L * both / denom,
          1000000L * (both + neither) / rows.length)
      }
    val expected =
      (ruleRows("budget", t => budgetKept(t._1)) ++
        ruleRows("threshold", _._3)).sortBy(t => (t._1, t._2))
    val got = CorpusAudit.selectionCompare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(got == expected)
    // structural: the universes agree — per-lang candidates under each
    // rule re-sum to Moore-Lewis's output, and both kept sets are
    // subsets of the universe
    assert(got.filter(_._1 == "threshold").map(_._3).sum == ml.length)
    assert(got.filter(_._1 == "budget").map(_._3).sum == ml.length)
    assert(dsirKept.subsetOf(ml.map(_._1).toSet))
    assert(budgetKept.subsetOf(ml.map(_._1).toSet))
    // the audit is only informative if the methods actually disagree
    // somewhere on this fixture (they gate differently by design)
    assert(got.map(t => t._5 + t._6).sum > 0,
      "degenerate fixture: DSIR and Moore-Lewis fully agree")
    // and the equal-budget rows must exist for every threshold lang
    assert(got.count(_._1 == "budget") == got.count(_._1 == "threshold"))
  }

  /** Plain-Scala replay of [[CorpusAudit.mooreLewisDelta]] over an
    * explicit doc list: frozen at-rest fit, per-word LLR, totals-row
    * OOV constant, two-part keep rule.
    */
  private def mlDeltaReplay(docs: Seq[(Long, String, String)])
      : Seq[(Long, String, Long, Long, Long, Boolean)] = {
    def words(t: String) = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    // the SAME golden-hash expression the engine evaluates — NOT the
    // bare `id % 20 == 7`, which matches only because Gamma ≡ 1
    // (mod 20) (ADVICE r17: the hard-coded-rule-copy drift class
    // GoldenHash centralizes against)
    val (delta, atRest) =
      docs.partition(d => (d._1 * GoldenHash.Gamma) % 20 == 7)
    val all = atRest.flatMap { case (_, lang, t) => words(t).map(w => (lang, w)) }
    val tW = all.filter(_._1 == "en").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rW = all.filter(_._1 != "en").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = tW.keySet ++ rW.keySet
    val (tN, rN, v) = (tW.values.sum, rW.values.sum, vocab.size.toLong)
    def llr(w: String) = halfUpQ(
      (math.log((tW.getOrElse(w, 0L) + 1).toDouble / (tN + v)) -
        math.log((rW.getOrElse(w, 0L) + 1).toDouble / (rN + v))) * CorpusAudit.MlewQ)
    val unk = halfUpQ(
      (math.log((rN + v).toDouble) - math.log((tN + v).toDouble)) * CorpusAudit.MlewQ)
    delta.filter(_._2 != "en").map { case (id, lang, t) =>
      val ws = words(t)
      val oov = ws.count(w => !vocab(w)).toLong
      val sc = ws.map(w => if (vocab(w)) llr(w) else unk).sum
      (id, lang, ws.size.toLong, oov, sc, sc > 0L && oov * 2 <= ws.size)
    }.sortBy(_._1)
  }

  private def collectMlDelta(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq

  test("mooreLewisDelta matches a plain-Scala replay on the fixture") {
    val langDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val got = collectMlDelta(CorpusAudit.mooreLewisDelta(spark, sf))
    assert(got == mlDeltaReplay(langDocs))
    assert(got.nonEmpty, "degenerate fixture: empty delta batch")
  }

  test("mooreLewisDelta: OOV floor + majority-known guard on a planted delta") {
    import spark.implicits._
    val docs = Seq(
      // at-rest (ids not ≡ 7 mod 20): small in-domain, larger general —
      // the add-one size artifact makes the OOV constant POSITIVE here,
      // so the majority-known guard (not the sign) must stop gibberish
      (1L, "en", "alpha beta alpha beta gamma"),
      (2L, "en", "alpha gamma beta"),
      (3L, "de", "delta epsilon zeta delta epsilon zeta delta epsilon"),
      (4L, "de", "zeta delta epsilon zeta delta epsilon zeta delta"),
      // delta batch (ids ≡ 7 mod 20)
      (7L, "de", "alpha beta alpha"),              // in-domain-looking, in-vocab
      (27L, "de", "zzgib zzber zzwock zzfoo"),     // pure gibberish: all OOV
      (47L, "de", "delta epsilon delta epsilon"),  // general-looking, in-vocab
      (67L, "de", "alpha alpha alpha zzx"))        // minority OOV: sign decides
      .toDF("doc_id", "lang", "text")
    val expected = mlDeltaReplay(Seq(
      (1L, "en", "alpha beta alpha beta gamma"), (2L, "en", "alpha gamma beta"),
      (3L, "de", "delta epsilon zeta delta epsilon zeta delta epsilon"),
      (4L, "de", "zeta delta epsilon zeta delta epsilon zeta delta"),
      (7L, "de", "alpha beta alpha"), (27L, "de", "zzgib zzber zzwock zzfoo"),
      (47L, "de", "delta epsilon delta epsilon"), (67L, "de", "alpha alpha alpha zzx")))
    val got = collectMlDelta(CorpusAudit.mooreLewisDeltaOf(docs))
    assert(got == expected)
    val byId = got.map(t => t._1 -> t).toMap
    // gibberish: fully OOV, POSITIVE score (the documented artifact:
    // 4 × unk with unk > 0 here), and REJECTED by the majority guard —
    // the exact failure shape VERDICT r16 finding 2 caught elsewhere
    val gib = byId(27L)
    assert(gib._4 == 4L && gib._4 == gib._3)
    assert(gib._5 > 0L, "planted sizes must make the OOV constant positive")
    assert(!gib._6, "an all-OOV document must not be admitted")
    // in-domain-looking delta doc: admitted on the sign rule
    assert(byId(7L)._6 && byId(7L)._4 == 0L)
    // general-looking delta doc: rejected on the sign rule
    assert(!byId(47L)._6 && byId(47L)._4 == 0L)
    // minority-OOV doc: the guard passes (2·1 ≤ 4) and the sign decides
    assert(byId(67L)._4 == 1L && byId(67L)._6 == (byId(67L)._5 > 0L))
  }
}
