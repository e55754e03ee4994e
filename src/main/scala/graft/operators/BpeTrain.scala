package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Distributed BPE merge induction over the `documents` corpus — the
  * tokenizer-training stage of an LLM data pipeline (the HuggingFace /
  * SentencePiece `train()` step, re-expressed as Spark aggregations).
  *
  * Scale shape (the standard frequency-table formulation): the corpus
  * is scanned ONCE to build the distinct-word frequency table — the
  * only corpus-scale shuffle — and every merge round after that is a
  * small aggregation over the vocab table (pairs explode → sum(freq) →
  * argmax), whose size is the distinct-word count, orders of magnitude
  * below corpus rows at 100 TB. Each round's merge application is a
  * narrow per-row string rewrite chained onto the persisted vocab scan
  * (no shuffle, no fixpoint-width hazards — every round's aggregation
  * is an independent job over the same persisted base).
  *
  * Deterministic conventions, identical in both engines:
  *   - words = `regexp_extract_all(lower(text), '[a-z]+')`;
  *   - initial state = chars space-joined with a leading AND trailing
  *     space (`' a b c '`) so merge patterns carry both boundaries;
  *   - pair counts enumerate ALL adjacent positions (freq-weighted;
  *     overlapping runs count each position, classic BPE counting);
  *   - argmax tie-break: count DESC, then pair string ASC;
  *   - merge application is ONE `replace(seq, ' a b ', ' ab ')` pass —
  *     leftmost non-overlapping, the identical scan semantics of Java
  *     `String.replace` and DuckDB `replace`. For immediately repeated
  *     pairs (`a b a b`) the consumed trailing boundary defers the
  *     second merge to a later round — a documented, deterministic
  *     variant of classic BPE (which re-scans within the round).
  *
  * The learned merges pin to [[MergesPath]]; the oracle replays the
  * ENTIRE induction from that artifact with a recursive CTE (state r =
  * state r-1 with merge r applied) and recomputes each round's argmax
  * independently — a non-argmax merge at any round fails the compare,
  * so the pin steers the replay but cannot hide a learning bug.
  */
object BpeTrain {

  /** Merge rounds learned (vocab size = alphabet + Rounds). */
  val Rounds = 16

  val MergesPath: String = graft.Artifacts.path("bpe_merges")

  /** Distinct lowercase words with corpus frequency and initial
    * char-split state. The single corpus-scale shuffle.
    */
  private def vocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seq",
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))

  final case class Merge(round: Int, lft: String, rgt: String, cnt: Long)

  private val mergeCache = new graft.SessionCache[String, Seq[Merge]]()

  /** Freq-weighted all-adjacent pair counts of the current states. */
  private def pairCounts(states: DataFrame): DataFrame =
    states
      .select(col("freq"), split(trim(col("seq")), " ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("freq"), explode(
        expr("transform(sequence(0, size(l)-2), i -> l[i] || ' ' || l[i+1])")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

  private def learnMerges(s: SparkSession, d: String): Seq[Merge] =
    mergeCache.getOrBuild(s, d) {
      val base = vocab(s, d).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      base.count()
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var states = base
      var r = 1
      var exhausted = false
      while (r <= Rounds && !exhausted) {
        val top = pairCounts(states)
          .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          val cnt = top(0).getLong(1)
          val Array(a, b) = pair.split(" ", 2)
          merges += Merge(r, a, b, cnt)
          // functions.replace = the exact leftmost non-overlapping scan
          // DuckDB's replace performs — NOT a regex
          states = states.withColumn("seq",
            replace(col("seq"), lit(s" $a $b "), lit(s" $a$b ")))
          r += 1
        }
      }
      base.unpersist()
      merges.toSeq
    }

  /** The learned merge table: one row per round with the merged symbol
    * and its count at learn time. Driver-small by construction (the
    * merge list IS the model — vocab-size rows); the learning behind it
    * ran as [[Rounds]] distributed aggregations.
    */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    val ms = learnMerges(s, d)
    import s.implicits._
    val out = ms.toDF("merge_round", "lft", "rgt", "cnt")
      .select(col("merge_round"), col("lft"), col("rgt"),
        concat(col("lft"), col("rgt")).as("merged"), col("cnt"))
      .orderBy(col("merge_round"))
    graft.Artifacts.writeOnce(s, d, "bpe_merges") {
      out.coalesce(1).write.mode("overwrite").parquet(MergesPath)
    }
    out
  }

  /** Tokenize the corpus under the learned merges — the apply step
    * that completes the tokenizer story (train → encode): per doc, the
    * word-instance count, the BPE token count after all [[Rounds]]
    * merges, and the letter-character count (chars/token is the
    * compression the merges bought).
    *
    * Scale shape: the merge application runs on the VOCAB table (each
    * distinct word tokenized once — the same frequency-table stance as
    * the training loop), and the corpus pays one scan joined to that
    * per-word token count. At fixture scale the vocab side broadcasts;
    * at 100 TB a 10–100M-row vocab makes this the standard shuffle
    * join on the word key — either way corpus text is never
    * re-tokenized per row.
    */
  def bpeApply(s: SparkSession, d: String): DataFrame = {
    val ms = learnMerges(s, d)
    val tokenized = ms.foldLeft(vocab(s, d)) { (df, mg) =>
      df.withColumn("seq",
        replace(col("seq"), lit(s" ${mg.lft} ${mg.rgt} "), lit(s" ${mg.lft}${mg.rgt} ")))
    }
      .select(col("word"), size(split(trim(col("seq")), " ")).as("n_tok"),
        length(col("word")).as("wchars"))
    val docWords = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
    docWords.join(tokenized, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
        sum(col("wchars")).as("n_letter_chars"))
      .orderBy(col("doc_id"))
  }

  lazy val defs: Map[String, QueryDef] = Map(
    "q_bpe_train" -> QueryDef(bpeTrain, Some(BpeOracles.bpeTrain)),
    "q_bpe_apply" -> QueryDef(bpeApply, Some(BpeOracles.bpeApply)))
}

/** DuckDB oracle: full independent replay of the BPE induction. The
  * pinned merges STEER the state recursion; every round's argmax is
  * recomputed from that round's states, so the emitted rows only match
  * if each pinned merge really was the (cnt DESC, pair ASC) argmax of
  * the state it was learned from.
  */
object BpeOracles {

  val bpeTrain: String =
    s"""WITH RECURSIVE m AS (
       |  SELECT merge_round, lft, rgt
       |  FROM read_parquet('${BpeTrain.MergesPath}/*.parquet')),
       |base AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents)
       |  GROUP BY word),
       |states AS (
       |  SELECT word, freq, seq, 0 AS r FROM base
       |  UNION ALL
       |  SELECT s.word, s.freq,
       |    replace(s.seq, ' ' || m.lft || ' ' || m.rgt || ' ',
       |            ' ' || m.lft || m.rgt || ' '),
       |    s.r + 1
       |  FROM states s JOIN m ON m.merge_round = s.r + 1),
       |exploded AS (
       |  SELECT r, freq, l,
       |    unnest(generate_series(1, len(l) - 1)) AS i
       |  FROM (SELECT r, freq, str_split(trim(seq), ' ') AS l
       |        FROM states WHERE len(trim(seq)) > 0) ),
       |counts AS (
       |  SELECT r, l[i] || ' ' || l[i + 1] AS pair,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM exploded
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT r, pair, cnt,
       |    row_number() OVER (PARTITION BY r ORDER BY cnt DESC, pair) AS rn
       |  FROM counts)
       |SELECT CAST(r + 1 AS INT) AS merge_round,
       |  str_split(pair, ' ')[1] AS lft,
       |  str_split(pair, ' ')[2] AS rgt,
       |  str_split(pair, ' ')[1] || str_split(pair, ' ')[2] AS merged,
       |  cnt
       |FROM ranked
       |WHERE rn = 1 AND r < ${BpeTrain.Rounds}
       |ORDER BY merge_round""".stripMargin

  /** [[BpeTrain.bpeApply]] replayed from the pinned merges: the same
    * recursive state CTE to the FINAL round, per-word token counts,
    * then the corpus join and per-doc rollup.
    */
  val bpeApply: String =
    s"""WITH RECURSIVE m AS (
       |  SELECT merge_round, lft, rgt
       |  FROM read_parquet('${BpeTrain.MergesPath}/*.parquet')),
       |base AS (
       |  SELECT word,
       |    ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
       |  FROM (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents)),
       |states AS (
       |  SELECT word, seq, 0 AS r FROM base
       |  UNION ALL
       |  SELECT s.word,
       |    replace(s.seq, ' ' || m.lft || ' ' || m.rgt || ' ',
       |            ' ' || m.lft || m.rgt || ' '),
       |    s.r + 1
       |  FROM states s JOIN m ON m.merge_round = s.r + 1),
       |final AS (
       |  SELECT word, CAST(len(str_split(trim(seq), ' ')) AS BIGINT) AS n_tok,
       |    CAST(length(word) AS BIGINT) AS wchars
       |  FROM states
       |  WHERE r = (SELECT max(merge_round) FROM m)),
       |docwords AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |  FROM documents)
       |SELECT d.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(f.n_tok) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(f.wchars) AS BIGINT) AS n_letter_chars
       |FROM docwords d JOIN final f USING (word)
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
