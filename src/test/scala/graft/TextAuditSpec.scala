package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Ground-truth tests for the corpus-audit operators (lang confusion
  * matrix, n-gram diversity) — recomputed with plain Scala collections,
  * independent of both the DataFrame plan and the DuckDB oracle.
  */
class TextAuditSpec extends SparkSpec {

  test("langConfusion is the exact contingency table of langId's output") {
    val pred = TextAnalysis.langId(spark, sf)
      .select(col("lang"), col("predicted_lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val totals = pred.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = pred.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((l, p), n) => (l, p, n, n.toDouble / totals(l)) }
      .sortBy(t => (t._1, t._2))
    val got = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gl, gp, gn, gs), (el, ep, en, es)) =>
      assert((gl, gp, gn) == (el, ep, en))
      assert(math.abs(gs - es) < 1e-3)
    }
    // the matrix accounts for every document exactly once
    assert(got.map(_._3).sum ==
      Tables.documents(spark, sf).count())
  }

  test("charEntropy matches a plain-Scala quantized-entropy recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    val expected = docs.map { case (id, text) =>
      val len = text.length
      val counts = text.groupBy(identity).view.mapValues(_.length).toMap
      val acc = counts.values.map { cnt =>
        val p = cnt.toDouble / len
        BigDecimal(p * math.log(p) * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.sum
      (id, len, counts.size,
        BigDecimal(-(acc / 1e9)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = TextAnalysis.charEntropy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got == expected.toSeq)
    // sanity band: fixture text is lowercase words + spaces (~27 symbols),
    // so entropy sits between a degenerate and a uniform-27 distribution
    got.foreach { case (id, _, k, e) =>
      assert(e > 0 && e <= math.log(k.toDouble) + 1e-9, s"doc $id entropy $e outside (0, ln($k)]")
    }
  }

  test("qualityCalibration: balanced deciles, monotone mean logit, exact label totals") {
    val rows = TextAnalysis.qualityCalibration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1 to 10), s"missing deciles: ${rows.map(_._1).toSeq}")
    // cutpoint bucketing balances within one tie-cluster of N/10
    val n = rows.map(_._2).sum
    rows.foreach { case (d, nd, _, _, _) =>
      assert(math.abs(nd - n / 10.0) <= math.max(2, n / 20.0), s"decile $d unbalanced: $nd of $n")
    }
    // mean logit strictly increases by construction of the cutpoints
    rows.map(_._3).toSeq.sliding(2).foreach { w => assert(w(0) < w(1)) }
    // label mass is conserved against a direct count
    val en = Tables.documents(spark, sf)
      .filter(col("lang") === "en" && size(split(col("text"), " ")) >= 1).count()
    assert(rows.map(_._4).sum == en)
  }

  test("ngramDiversity matches plain-Scala trigram type-token ratios") {
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
      .filter(_._2.length >= 3)
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val grams = ds.flatMap { case (_, ws) =>
        (0 until ws.length - 2).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
      }
      (src, grams.length.toLong, grams.distinct.length.toLong)
    }
    val got = TextAnalysis.ngramDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gs, gn, gd, gr), (es, en, ed)) =>
      assert((gs, gn, gd) == (es, en, ed))
      assert(math.abs(gr - ed.toDouble / en) < 1e-3)
    }
  }
}
