package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GoldenHash, QueryDef, Tables}

/** Corpus-management operators: the planning and versioning surface a
  * training-data platform runs BETWEEN pipeline runs — temperature-
  * based mixture planning (the α-sampling weight computation feeding a
  * mixing stage like [[ScaleOps.dataMixture]]), cross-source vocabulary
  * overlap (which slices duplicate each other's language), and snapshot
  * diffing (what changed between two corpus versions).
  *
  * Scale shapes: every operator reduces the corpus to a
  * vocabulary-bound or source-bound table in its FIRST aggregate; all
  * downstream joins are over those small tables (broadcast), so nothing
  * after the first shuffle scales with the corpus.
  */
object CorpusAudit {

  // -------------------------------------------------- temperature mix

  /** α for the p^α temperature reweighting (the XLM-R/mT5 value class:
    * strong upsampling of small sources).
    */
  val MixAlpha = 0.3

  /** Quantization scale for the per-source p^α terms: pow() is libm-
    * vs-DuckDB ulp-divergent AND the normalizing sum over sources would
    * accumulate in engine-dependent order, so each term is quantized to
    * an INTEGER q_s = round(p_s^α · 1e9) first — integer sums are exact
    * and order-free (the PcaQ convention).
    */
  val MixQ = 1000000000L

  /** Temperature-based sampling plan: per-source token shares p_s, the
    * α-tempered weights w_s = p_s^α / Σ p^α, and the per-source token
    * targets for a budget of half the corpus — the standard
    * multilingual/multi-source rebalancing computation (upsample the
    * tail, downsample the head) emitted as a PLAN table that a mixing
    * stage executes. All inputs to every emitted number are integers or
    * quantized integers; doubles appear only in the final round-6/4
    * emissions.
    */
  def temperatureMix(s: SparkSession, d: String): DataFrame = {
    val nTok = expr("length(text) - length(replace(text, ' ', '')) + 1")
    val perSource = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTok).as("n_tokens"))
    val totals = perSource.agg(sum(col("n_tokens")).as("t_tokens"))
    val q = round(pow(col("n_tokens") / col("t_tokens").cast("double"), MixAlpha) * MixQ)
      .cast("long")
    val withQ = perSource.crossJoin(broadcast(totals)).withColumn("q", q)
    val qsum = withQ.agg(sum(col("q")).as("q_sum"))
    withQ.crossJoin(broadcast(qsum))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("t_tokens").cast("double"), 6).as("p_raw"),
        round(col("q") / col("q_sum").cast("double"), 6).as("weight"),
        (col("q") / col("q_sum").cast("double") * (col("t_tokens") / lit(2d)))
          .cast("long").as("target_tokens"),
        round(col("q") / col("q_sum").cast("double") * (col("t_tokens") / lit(2d))
          / col("n_tokens"), 4).as("epochs"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------- vocabulary overlap

  /** Pairwise vocabulary Jaccard between sources: |V_a ∩ V_b| /
    * |V_a ∪ V_b| for every source pair (a < b) — the audit that shows
    * which corpus slices are drawing from the same language (near-1
    * overlap between two crawl slices means their mixture weights
    * double-count). The corpus collapses to the distinct (source, word)
    * table in one aggregate; the pair join runs on that vocabulary-
    * bound table, |sources|² pairs in the output.
    */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.words).as("w"))
      .distinct()
    val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val inter = vocab.toDF("src_a", "w")
      .join(vocab.toDF("src_b", "w"), "w")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.toDF("src_a", "v_a")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "v_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"), col("n_common"),
        round(col("n_common") /
          (col("v_a") + col("v_b") - col("n_common")).cast("double"), 4)
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  // ---------------------------------------------------- snapshot diff

  /** The two simulated corpus versions, sliced by DECILES of the
    * 1000-bucket golden hash (`bucket(id,1000) div 100`) — NOT
    * `bucket(id,10)`, which degenerates to `id mod 10` (Gamma ≡ 1
    * mod 10, the recorded GoldenHash arithmetic trap) and would
    * correlate perfectly with the fixture's cyclic source assignment,
    * collapsing the diff to one status per source. Snapshot A drops
    * decile 9, snapshot B drops decile 0 and rewrites decile 5's text,
    * so every source sees removed / added / modified / unchanged rows.
    */
  // floor-division (Spark `/` is double division); non-negative ids, so
  // floor == DuckDB's `//`
  private def hashDecile: Column =
    floor(GoldenHash.bucket(col("doc_id"), 1000) / 100).cast("int")

  private[operators] def snapshotA(docs: DataFrame): DataFrame =
    docs.filter(hashDecile =!= 9)
      .select(col("doc_id"), col("source"), col("text"))

  private[operators] def snapshotB(docs: DataFrame): DataFrame =
    docs.filter(hashDecile =!= 0)
      .select(col("doc_id"), col("source"),
        when(hashDecile === 5,
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"))

  /** Corpus snapshot diff: full-outer join of two versions on doc_id,
    * each doc classified added / removed / modified / unchanged (exact
    * text equality — at 100 TB the comparison runs on a content hash
    * column the snapshots already carry), rolled up per source. The
    * dataset-versioning audit between pipeline runs: growth, churn, and
    * silent-rewrite rates per slice.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val a = snapshotA(docs).toDF("doc_id", "src_a", "text_a")
    val b = snapshotB(docs).toDF("doc_id", "src_b", "text_b")
    val status: Column =
      when(col("src_a").isNull, "added")
        .when(col("src_b").isNull, "removed")
        .when(col("text_a") =!= col("text_b"), "modified")
        .otherwise("unchanged")
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_a"), col("src_b")).as("source"), status.as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("status"))
  }

  // ------------------------------------------------------------- registry

  lazy val defs: Map[String, QueryDef] = Map(
    "q_temperature_mix" -> QueryDef(temperatureMix, Some(CorpusAuditOracles.temperatureMix)),
    "q_source_overlap"  -> QueryDef(sourceOverlap, Some(CorpusAuditOracles.sourceOverlap)),
    "q_snapshot_diff"   -> QueryDef(snapshotDiff, Some(CorpusAuditOracles.snapshotDiff)))
}

/** DuckDB oracle twins for [[CorpusAudit]]. */
object CorpusAuditOracles {

  private val nTokSql = "length(text) - length(replace(text, ' ', '')) + 1"

  val temperatureMix: String =
    s"""WITH per_source AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum($nTokSql) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM per_source),
       |wq AS (
       |  SELECT source, n_docs, n_tokens, t_tokens,
       |    CAST(round(pow(n_tokens / (t_tokens * 1e0), ${CorpusAudit.MixAlpha}e0)
       |               * ${CorpusAudit.MixQ}) AS BIGINT) AS q
       |  FROM per_source, tot),
       |qs AS (SELECT CAST(sum(q) AS BIGINT) AS q_sum FROM wq)
       |SELECT source, n_docs, n_tokens,
       |  round(n_tokens / (t_tokens * 1e0), 6) AS p_raw,
       |  round(q / (q_sum * 1e0), 6) AS weight,
       |  CAST(TRUNC(q / (q_sum * 1e0) * (t_tokens / 2e0)) AS BIGINT) AS target_tokens,
       |  round(q / (q_sum * 1e0) * (t_tokens / 2e0) / n_tokens, 4) AS epochs
       |FROM wq, qs
       |ORDER BY source""".stripMargin

  val sourceOverlap: String =
    s"""WITH vocab AS (
       |  SELECT DISTINCT source, w
       |  FROM (SELECT source, unnest(${TextOracles.wordsSql}) AS w FROM documents)),
       |sizes AS (SELECT source, count(*) AS v FROM vocab GROUP BY source),
       |inter AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
       |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, sa.v AS v_a, sb.v AS v_b, n_common,
       |  round(n_common / ((sa.v + sb.v - n_common) * 1e0), 4) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.source = src_a
       |JOIN sizes sb ON sb.source = src_b
       |ORDER BY src_a, src_b""".stripMargin

  private val decileSql = s"((${GoldenHash.bucketSql("doc_id", 1000)}) // 100)"

  val snapshotDiff: String =
    s"""WITH a AS (
       |  SELECT doc_id, source AS src_a, text AS text_a FROM documents
       |  WHERE $decileSql <> 9),
       |b AS (
       |  SELECT doc_id, source AS src_b,
       |    CASE WHEN $decileSql = 5
       |         THEN text || ' v2' ELSE text END AS text_b
       |  FROM documents
       |  WHERE $decileSql <> 0),
       |joined AS (
       |  SELECT coalesce(src_a, src_b) AS source,
       |    CASE WHEN src_a IS NULL THEN 'added'
       |         WHEN src_b IS NULL THEN 'removed'
       |         WHEN text_a <> text_b THEN 'modified'
       |         ELSE 'unchanged' END AS status
       |  FROM a FULL OUTER JOIN b USING (doc_id))
       |SELECT source, status, count(*) AS n
       |FROM joined
       |GROUP BY source, status
       |ORDER BY source, status""".stripMargin
}
