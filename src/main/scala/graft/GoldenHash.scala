package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** The ONE definition of the deterministic pseudo-random row slices the
  * engine uses for benchmark membership, sampling, and mixture buckets.
  *
  * Through round 6 the `2654435761` multiplier and the
  * benchmark-membership rule were hard-coded in four places (operators,
  * their DuckDB oracle strings, and the specs) — edits could drift them
  * apart silently, and an equality-style test would keep passing as
  * long as both sides drifted together (ADVICE r6). Operators build
  * their Column form and oracles interpolate their SQL form from here,
  * so a rule change is one edit visible to every consumer.
  *
  * The multiplier is Knuth's floor(2^64/phi) mod 2^32 golden-ratio
  * mixer: consecutive ids land in unrelated residue classes, so a
  * threshold on `(id * Gamma) mod m` behaves like a uniform sample yet
  * is a pure per-row arithmetic expression both engines evaluate
  * identically (no RNG state, stable under corpus growth). Int64
  * headroom: id * Gamma stays in-range for the fixture id spans.
  */
object GoldenHash {

  /** Knuth's multiplicative-hash constant, 2654435761 = 2^32 / phi. */
  val Gamma = 2654435761L

  /** `(key * Gamma) mod m` — the Column form. */
  def bucket(key: Column, m: Int): Column = (key * lit(Gamma)) % m

  /** Identical arithmetic as ANSI SQL for the DuckDB oracles. */
  def bucketSql(keyCol: String, m: Int): String = s"($keyCol * $Gamma) % $m"

  /** Benchmark-set membership: a deterministic tenth of the corpus
    * plays the held-out suite (shared by decontamination operators).
    */
  def isTestDoc(docId: Column): Column = bucket(docId, 10) === 0

  val isTestDocSql: String = bucketSql("doc_id", 10) + " = 0"
  val isTrainDocSql: String = bucketSql("doc_id", 10) + " <> 0"

  /** THE deterministic cut-sample rule (one definition, engine + SQL
    * forms, like the bucket rule above): the [[CutSampleK]] rows with
    * the smallest golden-hash rank of the id column. Exact-percentile
    * cutpoints over per-document scores buffer the whole corpus in one
    * task (VERDICT r13 finding #2 — Spark's `percentile` is an
    * all-values ImperativeAggregate); computing the cutpoint over this
    * sample instead caps that buffer at K forever, plans as
    * TakeOrderedAndProject (per-partition K-heaps), and stays
    * bit-replayable in DuckDB — no RNG state. K = 20,000 puts the
    * worst-case quantile-rank standard error at sqrt(p(1-p)/K) ≤ 0.35%.
    * At the sf0.01/0.1 oracle-gate scales the corpus is under K, so the
    * sample IS the full set and results are unchanged; the sf1
    * rehearsal (50k docs) exercises the capped path. The modulus is a
    * prime ≠ the bucket-1000 modulus so the sample is uncorrelated with
    * every other golden-hash slice (test membership, snapshot deciles).
    */
  val CutSampleK = 20000
  val CutSampleMod = 999983

  def cutSample(df: org.apache.spark.sql.DataFrame, idCol: String,
      k: Int = CutSampleK): org.apache.spark.sql.DataFrame =
    df.orderBy(bucket(org.apache.spark.sql.functions.col(idCol), CutSampleMod),
      org.apache.spark.sql.functions.col(idCol)).limit(k)

  /** The identical sample as a SQL derived table over CTE `from`. */
  def cutSampleSql(from: String, idCol: String, k: Int = CutSampleK): String =
    s"SELECT * FROM $from ORDER BY ${bucketSql(idCol, CutSampleMod)}, $idCol LIMIT $k"
}
