package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm

class UnigramLmSpec extends SparkSpec {

  test("viterbi reaches the brute-force-optimal score and is total") {
    // tiny score table: chars cheap-ish, 'ab' and 'abc' attractive
    val logq = Map("a" -> -10L, "b" -> -12L, "c" -> -11L,
      "ab" -> -15L, "bc" -> -14L, "abc" -> -16L, "cab" -> -18L)
    def brute(w: String): Long = {
      def go(i: Int): Long =
        if (i == w.length) 0L
        else (1 to math.min(UnigramLm.MaxPieceLen, w.length - i)).flatMap { k =>
          logq.get(w.substring(i, i + k)).flatMap { q =>
            val rest = go(i + k)
            if (rest == Long.MinValue) None else Some(q + rest)
          }
        }.foldLeft(Long.MinValue)(math.max)
      go(0)
    }
    Seq("abc", "abcabc", "cabcab", "aabbcc", "a", "bcbcbc").foreach { w =>
      val seg = UnigramLm.viterbi(w, logq)
      assert(seg.mkString("") == w, s"not a segmentation of $w: $seg")
      val score = seg.map(logq).sum
      assert(score == brute(w), s"$w: viterbi $score != brute ${brute(w)}")
    }
  }

  test("tie-break takes the smallest piece at each cell") {
    // 'ab' costs exactly a+b: the two segmentations of "ab" tie, and the
    // ascending-k scan must keep the char-by-char path
    val logq = Map("a" -> -10L, "b" -> -10L, "ab" -> -20L)
    assert(UnigramLm.viterbi("ab", logq) == Seq("a", "b"))
  }

  test("EM keeps a planted frequent piece and drops unused candidates") {
    // 'xyzw' dominates the corpus: after EM it must survive as one piece
    // and its words must segment to ~len/4 tokens, not chars
    val words = Array(("xyzw", 500L), ("xyzwxyzw", 300L), ("q", 5L), ("qr", 3L))
    val pieces = UnigramLm.induceUnigram(words)
    val byPiece = pieces.map(p => p.piece -> p).toMap
    assert(byPiece.contains("xyzw") && byPiece("xyzw").cnt >= 800L,
      pieces.toSeq.toString)
    // every single char present (totality), zero-usage multi-char pruned
    Seq("x", "y", "z", "w", "q", "r").foreach(c => assert(byPiece.contains(c)))
    assert(pieces.filter(p => p.piece.length > 1 && p.cnt == 0L).isEmpty)
    // the trained scores segment the dominant word as one piece
    val logq = pieces.map(p => p.piece -> p.logqZ).toMap
    assert(UnigramLm.viterbi("xyzwxyzw", logq) == Seq("xyzw", "xyzw"))
  }

  test("tokenizer compare: per-lang slices partition both tokenizers' totals") {
    import graft.operators.BpeTrain
    val cmp = UnigramLm.tokenizerCompare(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens")), sum(col("n_unigram_tokens")))
      .collect().head
    // the per-lang rollup must partition exactly the per-doc accountings
    // both constituent queries already oracle-check
    val uniTotal = UnigramLm.unigramApply(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_unigram_tokens"))).collect().head
    val bpeTotal = BpeTrain.bpeApply(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_bpe_tokens"))).collect().head
    assert(cmp.getLong(0) == uniTotal.getLong(0) && cmp.getLong(0) == bpeTotal.getLong(0))
    assert(cmp.getLong(1) == bpeTotal.getLong(1))
    assert(cmp.getLong(2) == uniTotal.getLong(1))
  }

  test("apply accounting: totals close over the corpus word stream") {
    val out = UnigramLm.unigramApply(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_unigram_tokens")),
        sum(col("n_letter_chars")))
      .collect().head
    val (nw, nt, nc) = (out.getLong(0), out.getLong(1), out.getLong(2))
    // token count bounded by chars (every piece >= 1 char) and by words
    // (every word >= 1 piece); strict compression must show up
    assert(nw > 0 && nt >= nw && nt <= nc, s"nw=$nw nt=$nt nc=$nc")
    assert(nt < nc, "no compression at all — EM learned nothing")
    // letter accounting exact: sum over the word stream
    val directChars = Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .agg(sum(length(col("w")))).collect().head.getLong(0)
    assert(nc == directChars)
  }

  test("perplexity filter: integer keep rule, positive nll, totals equal apply's accounting") {
    val rows = UnigramLm.unigramPplFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, tl) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_logq"))
      val nll = r.getAs[Long]("nll_micro_per_tok")
      assert(tl < 0 && nll > 0 && nll == (-tl) / nt, r.toString)
      assert(r.getAs[Boolean]("keep") ==
        (tl + UnigramLm.KeepNllMicroPerTok * nt >= 0), r.toString)
    }
    assert(rows.exists(_.getAs[Boolean]("keep")), "filter dropped the whole corpus")
    // per-doc word/token accounting must equal unigramApply's (same
    // word stream, same tokenizer, one shared Viterbi pass)
    val apply = UnigramLm.unigramApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (nw, nt) = apply(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw && r.getAs[Long]("n_tokens") == nt,
        r.toString)
    }
  }

  test("perplexity filter on a delta batch: planted OOV doc pays the UNK floor and is NOT kept") {
    import spark.implicits._
    // a delta batch the trained vocab has never seen: pure gibberish
    // (chars exist in the corpus, the WORDS do not) plus one normal doc
    // built from corpus words — the production shape VERDICT r16
    // finding 2 names: a ppl gate applied to incoming documents
    val corpusWord = graft.Tables.documents(spark, sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).count().orderBy(col("count").desc, col("w"))
      .limit(8).collect().map(_.getString(0))
    val gibberish = "zzxqj qjzzx xqjzz jzzxq zxqjz"
    val normal = (corpusWord ++ corpusWord).mkString(" ")
    val batch = Seq((900001L, gibberish), (900002L, normal))
      .toDF("doc_id", "text")
    val rows = graft.operators.UnigramLm
      .unigramPplFilterOf(spark, sf, batch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 2, "a delta doc was silently dropped")
    val g = rows(900001L)
    // every gibberish word is OOV: n_tok = total chars, sum_logq = chars × floor
    val gibChars = gibberish.split(" ").map(_.length.toLong).sum
    val unk = graft.operators.UnigramLm.unkCharLogqMicro(spark, sf)
    assert(g.getAs[Long]("n_words") == 5L)
    assert(g.getAs[Long]("n_tokens") == gibChars)
    assert(g.getAs[Long]("total_logq") == gibChars * unk)
    assert(!g.getAs[Boolean]("keep"),
      "a document of unseen words must score as surprising, not empty")
    // the in-vocab doc scores exactly as the trained table says and is kept
    val n = rows(900002L)
    assert(n.getAs[Boolean]("keep"), "frequent corpus words must pass the gate")
    assert(n.getAs[Long]("n_words") == 16L)
  }

  test("unigram drift: counters partition apply's totals and retrain matches the exact rule") {
    val rows = UnigramLm.unigramDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rw, rt) = (r.getAs[Long]("rest_words"), r.getAs[Long]("rest_tokens"))
      val (dw, dt) = (r.getAs[Long]("delta_words"), r.getAs[Long]("delta_tokens"))
      val nw = r.getAs[Long]("new_words")
      assert(rw > 0 && dw > 0 && rt >= rw && dt >= dw && nw <= dw, r.toString)
      // the flag IS the integer rule — recompute it from the emitted
      // counters (BigInt: the engine uses decimal(38,0), also exact)
      val expect = (BigInt(dt) * rw * 10 > BigInt(rt) * dw * 11) || nw * 5 > dw
      assert(r.getAs[Boolean]("retrain") == expect, r.toString)
    }
    // rest + delta words partition the corpus word stream that
    // unigramApply accounts (same tokenizer, same word definition)
    val total = UnigramLm.unigramApply(spark, sf)
      .agg(sum(col("n_words")), sum(col("n_unigram_tokens"))).collect().head
    assert(rows.map(r => r.getAs[Long]("rest_words") + r.getAs[Long]("delta_words")).sum
      == total.getLong(0))
    assert(rows.map(r => r.getAs[Long]("rest_tokens") + r.getAs[Long]("delta_tokens")).sum
      == total.getLong(1))
  }
}
