package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrain

/** BPE induction vs an independent in-memory reference implementing the
  * same documented conventions (all-adjacent freq-weighted counting,
  * (cnt DESC, pair ASC) argmax, single-pass leftmost merge application).
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: no DataFrames, no shared code with the
    * operator — a learning bug cannot self-verify.
    */
  private def naiveBpe(
      docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    val words = docs.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase))
    val freq = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    var states = freq.keys.map(w => w -> (" " + w.map(c => s"$c ").mkString)).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, seq) <- states) {
        val syms = seq.trim.split(" ")
        for (i <- 0 until syms.length - 1)
          counts(syms(i) + " " + syms(i + 1)) += freq(w)
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.toSeq.sortBy { case (p, c) => (-c, p) }.head
        val Array(a, b) = pair.split(" ", 2)
        out += ((r, a, b, cnt))
        states = states.map { case (w, s0) => w -> s0.replace(s" $a $b ", s" $a$b ") }
      }
      r += 1
    }
    out.toSeq
  }

  private def writeDocs(docs: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("learned merges match the naive reference, incl. repeated-pair and tie cases") {
    val docs = Seq(
      "the cat sat on the mat with the hat",
      "thin then there they them the the",
      "xyxy xyxy zaza zaza zaza", // adjacent repeated pairs: single-pass convention
      "aa ab aa ab ba ba",        // tie-break on pair string
      "banana bandana ban")
    val dir = writeDocs(docs)
    val got = BpeTrain.bpeTrain(spark, dir)
      .select(col("merge_round"), col("lft"), col("rgt"), col("cnt"))
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val expected = naiveBpe(docs, BpeTrain.Rounds)
    assert(got == expected,
      s"merge drift:\n got=${got.mkString("\n     ")}\n exp=${expected.mkString("\n     ")}")
    // the merged column is lft||rgt by construction
    val merged = BpeTrain.bpeTrain(spark, dir)
      .select(col("lft"), col("rgt"), col("merged")).as[(String, String, String)]
      .collect()
    merged.foreach { case (a, b, m) => assert(m == a + b) }
  }

  test("apply tokenizes docs to the naive reference's counts") {
    val docs = Seq(
      "the cat sat on the mat with the hat",
      "thin then there they them the the",
      "banana bandana ban bans")
    val dir = writeDocs(docs)
    // naive: learn merges, apply to each word, sum per doc
    val merges = naiveBpe(docs, BpeTrain.Rounds)
    def tokens(word: String): Int = {
      var seq = " " + word.map(c => s"$c ").mkString
      merges.foreach { case (_, a, b, _) => seq = seq.replace(s" $a $b ", s" $a$b ") }
      seq.trim.split(" ").length
    }
    val expected = docs.zipWithIndex.map { case (t, i) =>
      val ws = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
      (i.toLong, ws.size.toLong, ws.map(tokens(_).toLong).sum, ws.map(_.length.toLong).sum)
    }.toSet
    val got = BpeTrain.bpeApply(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected, s"\n got=$got\n exp=$expected")
    // merges strictly compress: tokens within [n_words, n_letter_chars]
    got.foreach { case (_, nw, nt, nc) => assert(nw <= nt && nt <= nc) }
  }

  test("driver-side deep induction matches the naive reference and the distributed path") {
    val docs = Seq(
      "the cat sat on the mat with the hat",
      "thin then there they them the the",
      "xyxy xyxy zaza zaza zaza",
      "aa ab aa ab ba ba",
      "banana bandana ban bans and bananas abound")
    val dir = writeDocs(docs)
    // past DistributedRoundsMax → the driver-side incremental trainer;
    // the naive reference recounts every pair from scratch each round,
    // so agreement verifies the incremental bookkeeping round-by-round
    val deep = BpeTrain.learnMerges(spark, dir, rounds = 40)
      .map(m => (m.round, m.lft, m.rgt, m.cnt))
    val expected = naiveBpe(docs, 40)
    assert(deep == expected,
      s"deep drift:\n got=${deep.mkString("\n     ")}\n exp=${expected.mkString("\n     ")}")
    // the two engine paths agree exactly on their shared prefix: the
    // first DistributedRoundsMax merges of the deep run ARE the
    // distributed run (argmax is history-determined, so prefix
    // equality is exact path equivalence at equal rounds)
    val dist = BpeTrain.learnMerges(spark, dir, BpeTrain.DistributedRoundsMax)
      .map(m => (m.round, m.lft, m.rgt, m.cnt))
    assert(deep.take(dist.length) == dist,
      s"path divergence:\n deep=${deep.take(dist.length)}\n dist=$dist")
    // exhaustion: a corpus whose pairs run out stops early, same as
    // the distributed loop's empty-argmax exit
    val tiny = writeDocs(Seq("ab ab ab"))
    val ex = BpeTrain.learnMerges(spark, tiny, rounds = 50)
    assert(ex.nonEmpty && ex.size < 50, s"expected early exhaustion, got ${ex.size}")
  }

  test("over-cap vocab min-frequency-prunes; merges match learning on the surviving vocab") {
    // (seq, freq) frame in vocab()'s shape: 4 repeated words + a
    // 30-word hapax tail pushes past a cap of 10
    def seqOf(w: String) = " " + w.map(c => s"$c ").mkString
    val main = Seq("banana" -> 9L, "bandana" -> 7L, "cabana" -> 6L, "anab" -> 4L)
    val tail = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"z$a$b")
      .take(30).map(_ -> 1L)
    val v = (main ++ tail).map { case (w, f) => (seqOf(w), f) }.toDF("seq", "freq")

    // under the cap: plain collect, nothing dropped
    assert(BpeTrain.collectVocabCapped(v, 100).length == 34)

    // over the cap: the freq-1 band cannot fit (4 + 30 > 10), so the
    // threshold lands at freq >= 4 and the tie band drops WHOLE —
    // exactly the 4 repeated words survive
    val pruned = BpeTrain.collectVocabCapped(v, 10)
    assert(pruned.map(_._1).toSet == main.map(m => seqOf(m._1)).toSet,
      pruned.map(_._1).mkString(","))

    // the convention's contract: learning after the prune == learning
    // on the surviving vocab directly (no cap involved)
    val direct = BpeTrain.collectVocabCapped(
      main.map { case (w, f) => (seqOf(w), f) }.toDF("seq", "freq"), 100)
    assert(BpeTrain.induceMerges(pruned, 8) == BpeTrain.induceMerges(direct, 8))

    // a cap that cannot fit even the top band fails loud
    intercept[IllegalArgumentException] { BpeTrain.collectVocabCapped(v, 0) }

    // a cap that would prune REPEATED words fails loud instead of
    // silently changing learnable merges (ADVICE r13): cap 2 fits the
    // freq-9 and freq-7 bands but would drop freq 6 and 4
    val e = intercept[IllegalArgumentException] { BpeTrain.collectVocabCapped(v, 2) }
    assert(e.getMessage.contains("REPEATED"), e.getMessage)
  }

  test("fixture corpus learns the full round budget deterministically") {
    val m1 = BpeTrain.bpeTrain(spark, sf)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m1.size == BpeTrain.Rounds, s"only ${m1.size} merges learned")
    // counts are non-increasing is NOT guaranteed by BPE in general, but
    // rounds must be dense and 1-based, symbols single-space-free
    assert(m1.map(_._1) == (1 to BpeTrain.Rounds))
    m1.foreach { case (_, a, b, m, cnt) =>
      assert(!a.contains(" ") && !b.contains(" ") && m == a + b && cnt > 0)
    }
    // session cache: second build returns identical rows
    val m2 = BpeTrain.bpeTrain(spark, sf)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m1 == m2)
  }

  test("bpeFertility is the per-lang rollup of bpeApply's per-doc accounting") {
    val perDoc = BpeTrain.bpeApply(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("w"), sum(col("n_bpe_tokens")).as("t"),
        sum(col("n_letter_chars")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val got = BpeTrain.bpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == perDoc.toSeq)
    got.foreach { case (_, w, t, c, fert, cpt) =>
      assert(t >= w, "BPE can never emit fewer tokens than words")
      assert(math.abs(fert - t.toDouble / w) < 1e-3)
      assert(math.abs(cpt - c.toDouble / t) < 1e-3)
    }
  }

  test("vocabDrift slices partition the fertility totals; flag matches the exact rule") {
    val fert = BpeTrain.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val drift = BpeTrain.vocabDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(8)))
    assert(drift.nonEmpty)
    drift.foreach { case (lang, rw, rt, dw, dt, nw, retrain) =>
      // at-rest + delta partition the corpus, so the counters must sum
      // to the full-corpus fertility rollup
      assert((rw + dw, rt + dt) == fert(lang), s"$lang counters don't partition")
      assert(nw <= dw, "new-word occurrences bounded by batch occurrences")
      // the flag re-derived from the exact counters (BigInt — the same
      // cross-multiplication rule, no rounding anywhere)
      val expected = BigInt(dt) * rw * 10 > BigInt(rt) * dw * 11 || nw * 5 > dw
      assert(retrain == expected, s"$lang flag $retrain != recomputed $expected")
    }
  }
}
