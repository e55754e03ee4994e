package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.Tables.BarrierOps
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, dim 64).
  *
  * Cosine runs as a native fused Catalyst expression
  * ([[graft.functions.CosineSimilarity]], whole-stage codegen) in DOUBLE
  * precision — float accumulation drifts ~1e-7, enough to flip a
  * round(4) hash compare, so both engine and oracle compute in double.
  *
  * Scale story:
  *   - [[bruteTopK]] is query-set × corpus (k·N comparisons, broadcast
  *     query side, no shuffle of the corpus) — the exact baseline;
  *   - [[nearDupPairs]] is all-pairs and exists as the oracle-checkable
  *     exact reference at fixture scale — at 100 TB you run
  *     [[lshNearDup]] instead, whose join is equality on LSH bucket keys;
  *   - [[lshNearDup]] buckets by random-hyperplane signs (deterministic
  *     weight matrix, seed fixed) → candidates from a bucket equality
  *     join → exact cosine verification on candidates only.
  */
object Similarity {

  /** embeddings with the vector cast to array<double> once; registers
    * the native vector expressions on the session. */
  private[operators] def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.Registry.ensure(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
  }

  // Native codegen'd expressions (graft.functions) — the HOF
  // (zip_with/aggregate) formulation is CodegenFallback and was ~25x
  // slower on the all-pairs join.
  private def cosine(a: Column, b: Column): Column = VectorFunctions.cosine(a, b)

  /** Brute-force cosine top-k: fixed query set (vec_id < 5) against the
    * whole corpus. The query side is broadcast (k rows), so the corpus
    * is scanned exactly once with no shuffle; ranking is a per-query
    * window (partition count = |queries|).
    */
  def bruteTopK(s: SparkSession, d: String): DataFrame = {
    val v = vecs(s, d)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // rank on the round-9 cosine with vec_id tiebreak: Spark and the
    // DuckDB oracle compute the cosine independently, and a last-ulp
    // divergence at the rank-3 boundary would flip the emitted row set
    // nondeterministically (ADVICE r8) — the quantized key absorbs it
    // (the q_user_deciles rounded-then-ranked convention)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("vec_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact all-pairs near-duplicate detection (cosine ≥ 0.3). All-pairs
    * is intentional here: it is the exact, oracle-checkable reference
    * that [[lshNearDup]] approximates at scale.
    */
  def nearDupPairs(s: SparkSession, d: String): DataFrame = {
    val a = vecs(s, d).select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = vecs(s, d).select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** LSH-bucketed near-dup: 8 independent 8-bit random-hyperplane band
    * signatures → per-bucket STAR edges (bucket-min vector → each other
    * member) → exact cosine verification of the edges only.
    *
    * Round 1 used a single 12-bit signature and a pair-materializing
    * self-join within buckets — quadratic in bucket size once the corpus
    * outgrows the ≤4096 possible buckets (VERDICT r1 "scale-killer").
    * This formulation mirrors [[Dedup.minhashDedup]]'s star-edge design:
    * candidate count is ≤ vectors × bands (linear, whatever the bucket
    * size), the only shuffles are the band-key groupBy/join, and the
    * cross product never materializes. Banding also strictly improves
    * recall at equal work: a pair at angle θ co-buckets in ≥1 of 8
    * 8-bit bands with prob 1-(1-(1-θ/π)^8)^8, vs (1-θ/π)^12 for the
    * monolithic signature. Star edges pair each member with its bucket
    * minimum (the cluster representative) rather than every co-member —
    * the dedup-shaped artifact; connectivity through the representative
    * matches clique connectivity for true near-dup clusters.
    *
    * Operating envelope (measured, sf0.01): for genuine near-dups
    * (cosine ≥ 0.9, θ ≤ 26°) a pair co-buckets in ≥1 band with
    * p ≈ 1-(1-0.856^8)^16 ≈ 0.996 — the regime this operator targets.
    * At the fixture query's permissive 0.3 threshold (θ ≈ 72°) ANY
    * sign-LSH has low per-band collision (0.597^8 ≈ 1.6%), so output
    * there is a high-precision sample (every emitted pair is exact-
    * verified), not an exhaustive listing — [[nearDupPairs]] is the
    * exact method when the threshold is that low. Rows-only check; the
    * spec asserts output ⊆ exact pairs (precision 1.0) and that a
    * planted high-cosine cluster comes out fully connected to its
    * representative.
    */
  def lshNearDup(s: SparkSession, d: String): DataFrame =
    lshNearDup(s, d, bands = 16, bitsPerBand = 8)

  /** Artifact path shared by the default [[lshNearDup]] and its DuckDB
    * oracle: the per-vector positional band-key array (the
    * [[graft.operators.Dedup.MinhashIndexPath]] technique) — the sign
    * projections are engine-specific hash mixes, so they are pinned as
    * data; DuckDB independently re-derives banding, star edges, and the
    * exact DOUBLE-cosine verification against the RAW embeddings table.
    */
  val LshBandsPath: String = graft.Artifacts.path("lsh_bands_16_8")

  /** Per-vector sign-LSH band keys, cached per (session, sfDir, params)
    * — the [[graft.operators.Dedup.minhashIndex]] stance: a bucketed
    * ANN index is built once per corpus version and probed by every
    * consumer; at 100 TB this cache IS the at-rest banded index.
    */
  private val lshKeyCache = new graft.SessionCache[(String, Int, Int), DataFrame]()

  def lshNearDup(s: SparkSession, d: String, bands: Int, bitsPerBand: Int): DataFrame = {
    // All bands×bitsPerBand sign projections come from ONE fused native
    // expression ([[graft.functions.LshBandKeys]]): the vector is read
    // once per row and the hyperplane weights are generated in-loop from
    // the deterministic integer mix — bit-identical band keys to the
    // (much slower) per-hyperplane expression-tree formulation it
    // replaced (VERDICT r2 "What's wrong" #1). posexplode position =
    // band id, value = that band's packed sign signature.
    val keyed = lshKeyCache.getOrBuild(s, (d, bands, bitsPerBand))(
      vecs(s, d).select(col("vec_id"),
        VectorFunctions.lshBandKeys(col("v"), bands, bitsPerBand).as("bands"))
        .barrier("one packed-long band array per vector"))
    // only the default (16, 8) parameterization — the query surface —
    // pins its keys for the oracle
    if (bands == 16 && bitsPerBand == 8)
      graft.Artifacts.writeOnce(s, d, "lsh_bands_16_8") {
        keyed.write.mode("overwrite").parquet(LshBandsPath)
      }
    val banded = keyed.select(col("vec_id"),
      posexplode(col("bands")).as(Seq("band", "key")))

    // star edges: bucket-min -> member, deduped across bands; linear in
    // vectors x bands regardless of bucket sizes
    val mins = banded.groupBy(col("band"), col("key"))
      .agg(min(col("vec_id")).as("vec_a"))
    val edges = banded.join(mins, Seq("band", "key"))
      .filter(col("vec_id") =!= col("vec_a"))
      .select(col("vec_a"), col("vec_id").as("vec_b"))
      .distinct()

    // exact-cosine verification on the edges only
    val va = vecs(s, d).select(col("vec_id").as("vec_a"), col("v").as("va"))
    val vb = vecs(s, d).select(col("vec_id").as("vec_b"), col("v").as("vb"))
    edges.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= 0.3)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Hard-negative mining — the contrastive-training sampler: for each
    * query vector, the top-3 most similar vectors with a DIFFERENT
    * label (similar-but-wrong examples are what contrastive and
    * reranker training needs; easy random negatives teach nothing).
    * Same broadcast-query/one-corpus-scan shape as [[bruteTopK]] with
    * the label-mismatch predicate fused into the scan filter — at
    * 100 TB the query side is the training batch (always small), the
    * corpus is scanned once, and the ranking window partitions by query.
    */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val v = vecs(s, d)
    val q = v.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label").as("qlabel"))
    // round-9 rank key — see [[bruteTopK]]'s engine-stability note
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("vec_id"))
    v.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") && col("label") =!= col("qlabel"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("vec_id"), col("label"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF index artifact: KMeans coarse quantizer (fixed seed) +
    * per-vector cell assignments. An IVF index is built once and probed
    * many times — round 1 re-fit the KMeans inside every query
    * invocation (9.9 s of the 48 s bench; VERDICT r1 item 3). At 100 TB
    * the index is a cell-bucketed parquet table plus a k-row centroid
    * sidecar, built by one batch job and amortized over every query;
    * the local stand-in is a persisted (MEMORY_AND_DISK) assignment
    * DataFrame cached per (session, sfDir, k), materialized at build
    * time so probe queries never pay the fit.
    */
  private[operators] final case class IvfIndex(
      centroids: Seq[(Int, Array[Double])], assigned: DataFrame)

  private val ivfCache = new graft.SessionCache[(String, Int), IvfIndex]()

  private[operators] def ivfIndex(s: SparkSession, d: String, k: Int): IvfIndex =
    ivfCache.getOrBuild(s, (d, k)) {
      import org.apache.spark.ml.functions.array_to_vector
      import org.apache.spark.ml.clustering.KMeans
      val v = vecs(s, d).withColumn("fv", array_to_vector(col("v")))
      // maxIter 10: the coarse quantizer only needs rough cells — recall
      // is governed by nprobe, and the spec's recall bound holds at 10
      // iterations for a third of the default's training cost.
      val km = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("fv").setPredictionCol("cell")
      val model = km.fit(v)
      val assigned = model.transform(v).select(col("vec_id"), col("v"), col("cell"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assigned.count() // materialize: the build pays the fit+assign, probes don't
      IvfIndex(
        model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq,
        assigned)
    }

  /** Artifact paths shared by [[ivfTopK]] and its DuckDB oracle: the
    * per-vector cell assignments and the k-row centroid sidecar — the
    * KMeans fit is engine-specific (seeded Lloyd iterations), so the
    * INDEX is pinned as data, and DuckDB independently replays the
    * whole PROBE: nprobe cell ranking by centroid cosine, the
    * cell-restricted candidate join, and the exact DOUBLE-cosine top-k
    * against the raw embeddings table. This is exactly the at-rest
    * form the scaladoc above describes for 100 TB (cell-bucketed
    * assignment table + centroid sidecar) — the oracle consumes the
    * operational artifact, not a bespoke test dump.
    */
  val IvfAssignPath: String = graft.Artifacts.path("ivf_assign")
  val IvfCentroidsPath: String = graft.Artifacts.path("ivf_centroids")

  /** Pin the default (k=8) index for the oracles — shared by every query
    * that consumes the IVF index ([[ivfTopK]], [[semanticDedup]],
    * [[prototypePrune]]), so whichever runs first in a session pays the
    * one write job and the rest reuse it ([[graft.Artifacts.writeOnce]]).
    */
  private[operators] def pinIvfIndex(s: SparkSession, d: String, idx: IvfIndex): Unit =
    graft.Artifacts.writeOnce(s, d, "ivf_index") {
      idx.assigned.select(col("vec_id"), col("cell"))
        .write.mode("overwrite").parquet(IvfAssignPath)
      s.createDataFrame(idx.centroids).toDF("cell", "centroid")
        .write.mode("overwrite").parquet(IvfCentroidsPath)
    }

  /** IVF (inverted-file) top-k probe: queries search only their
    * `nprobe` nearest cells of the prebuilt [[ivfIndex]]. The join is
    * query × cell-subset instead of query × corpus: each query touches
    * ~nprobe/k of the data, and the only corpus-wide work (fit +
    * assignment shuffle) lives in the index build. Oracle: DuckDB
    * replays the probe over the pinned index ([[IvfAssignPath]]); the
    * spec additionally asserts recall against [[bruteTopK]].
    */
  def ivfTopK(s: SparkSession, d: String, k: Int = 8, nprobe: Int = 3): DataFrame = {
    val idx = ivfIndex(s, d, k)
    val assigned = idx.assigned

    // centroids as a small DataFrame (k rows) — broadcast everywhere
    val cdf = s.createDataFrame(idx.centroids).toDF("cell", "centroid")

    // pin the index for the oracle (default parameterization only —
    // the query surface); one write job per (session, sfDir)
    if (k == 8) pinIvfIndex(s, d, idx)

    val q = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // nprobe nearest cells per query (k × |q| tiny cross join)
    // both rankings run on the round-9 key — see [[bruteTopK]]'s
    // engine-stability note (ADVICE r8)
    val probes = q.crossJoin(broadcast(cdf))
      .withColumn("cdist", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(round(col("cdist"), 9).desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("vec_id"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication: coarse-cluster the corpus
    * with the prebuilt [[ivfIndex]] (the same k-means cells the ANN probe
    * uses), then compare embeddings PAIRWISE ONLY WITHIN EACH CELL and
    * flag any vector with a lower-id cell-mate above the cosine
    * threshold as a semantic duplicate of the minimum such mate. This is
    * the embedding-space near-dup gate an LLM corpus runs after the
    * lexical passes ([[Dedup.minhashDedup]]): paraphrases and
    * re-renderings share no n-grams but land on near-identical vectors.
    *
    * Scale shape: the clustering bounds the pair space — pairs are
    * |cell|² per cell, never corpus², and at 100 TB k grows with the
    * corpus (k ≈ N/target_cell_size) so cell sizes stay bounded and the
    * within-cell join both stays quadratic-in-a-constant and hash-
    * partitions across executors by cell id. The fit is paid once in the
    * cached/pinned index build, exactly like the ANN probe. The fixture
    * runs k=8 at τ=0.4 (the fixture embeddings are well-spread — see
    * [[nearDupPairs]]'s 0.3 operating note).
    */
  def semanticDedup(s: SparkSession, d: String, k: Int = 8, tau: Double = 0.4): DataFrame = {
    val idx = ivfIndex(s, d, k)
    if (k == 8) pinIvfIndex(s, d, idx)
    semanticDedupOf(idx.assigned, tau)
  }

  /** Frame-parametric core of [[semanticDedup]] (specs plant controlled
    * clusters): `assigned` is (vec_id, v array<double>, cell).
    */
  private[graft] def semanticDedupOf(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.select(col("cell"), col("vec_id"), col("v"))
    val b = assigned.select(col("cell"), col("vec_id").as("prev_id"), col("v").as("pv"))
    // lower-id mates only: each vector's canonical representative is the
    // MINIMUM cell-mate above threshold, so kept/duplicate is stable
    // under any execution order
    val dups = a.join(b, Seq("cell"))
      .filter(col("prev_id") < col("vec_id"))
      .withColumn("cos", cosine(col("v"), col("pv")))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(col("prev_id")).as("dup_of0"),
        round(max(col("cos")), 4).as("max_cos0"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dup_of0").isNotNull.as("is_duplicate"),
        coalesce(col("dup_of0"), col("vec_id")).as("dup_of"),
        coalesce(col("max_cos0"), lit(0.0)).as("max_cos"))
      .orderBy(col("vec_id"))
  }

  /** SSL-prototypes / D4-style prototype pruning: within each [[ivfIndex]]
    * cell, rank vectors by cosine to their own centroid and prune the
    * most prototypical 20% (`rank ≤ cell_n DIV 5` — integer arithmetic,
    * so the cut is bit-identical across engines). Near-centroid examples
    * are the cluster's redundant "easy core"; dropping them (after
    * [[semanticDedup]] removes outright duplicates) is the
    * diversity-preserving data-pruning step of the D4 recipe.
    *
    * One broadcast of the k-row centroid sidecar, one scan of the
    * assignment table, a per-cell window — no corpus-wide shuffle beyond
    * the window's hash partition by cell (bounded cells at scale, as
    * [[semanticDedup]] documents).
    */
  def prototypePrune(s: SparkSession, d: String, k: Int = 8, dropDenom: Int = 5): DataFrame = {
    val idx = ivfIndex(s, d, k)
    if (k == 8) pinIvfIndex(s, d, idx)
    val cdf = s.createDataFrame(idx.centroids).toDF("cell", "centroid")
    val w = Window.partitionBy(col("cell")).orderBy(col("ccos").desc, col("vec_id"))
    idx.assigned.join(broadcast(cdf), Seq("cell"))
      .withColumn("ccos", cosine(col("v"), col("centroid")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .select(col("vec_id"), col("cell"), round(col("ccos"), 4).as("centroid_cos"),
        col("rank"), col("cell_n"),
        (col("rank") <= expr(s"cell_n DIV $dropDenom")).as("pruned"))
      .orderBy(col("vec_id"))
  }

  // ── Product quantization (the PQ half of IVF-PQ) ────────────────────

  /** PQ geometry over the 64-dim embeddings: [[PqM]] subspaces of
    * [[PqSubDim]] dims, [[PqK]] centroids per subspace — 64 floats
    * (256 B) compress to an 8-byte code per vector.
    */
  val PqM = 8
  val PqK = 16
  val PqSubDim = 8

  private final case class PqIndex(
      codebooks: Seq[(Int, Int, Seq[Double])], // (m, c, centroid[PqSubDim])
      codes: DataFrame)                        // (vec_id, codes array<int>[PqM])

  private val pqCache = new graft.SessionCache[String, PqIndex]()

  /** Product-quantization index: per subspace m, a seeded KMeans
    * (K=[[PqK]]) over the 8-dim subvector slices; each vector's code is
    * its per-subspace nearest-centroid ids. Built once per (session,
    * sfDir) and cached/pinned — the [[ivfIndex]] at-rest stance. At
    * 100 TB the codebooks train on a bounded SAMPLE (canonical PQ
    * practice — the fit is a constant) and the encode is one corpus
    * scan; the stored code table is ~32× smaller than the raw vectors,
    * which is the entire point: the ADC probe below scans codes, not
    * floats.
    */
  private def pqIndex(s: SparkSession, d: String): PqIndex =
    pqCache.getOrBuild(s, d) {
      import org.apache.spark.ml.functions.array_to_vector
      import org.apache.spark.ml.clustering.KMeans
      val v = vecs(s, d)
      val withSubs = (0 until PqM).foldLeft(v) { (df, m) =>
        df.withColumn(s"fs_$m",
          array_to_vector(slice(col("v"), m * PqSubDim + 1, PqSubDim)))
      }
      val models = (0 until PqM).map { m =>
        new KMeans().setK(PqK).setSeed(42L + m).setMaxIter(10)
          .setFeaturesCol(s"fs_$m").setPredictionCol(s"code_$m")
          .fit(withSubs)
      }
      val encoded = models.foldLeft(withSubs)((df, mod) => mod.transform(df))
      val codes = encoded.select(col("vec_id"),
        array((0 until PqM).map(m => col(s"code_$m").cast("int")): _*).as("codes"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count() // materialize: the build pays all M fits + encode once
      val books = for {
        (mod, m) <- models.zipWithIndex
        (ctr, c) <- mod.clusterCenters.zipWithIndex
      } yield (m, c, ctr.toArray.toSeq)
      PqIndex(books, codes)
    }

  /** PQ artifacts for the oracle — code table + codebook sidecar, the
    * operational at-rest form (exactly what a 100 TB deployment stores
    * beside the IVF assignments). The seeded KMeans fits are
    * engine-specific, so the INDEX is pinned and DuckDB independently
    * replays the whole ADC probe from it.
    */
  val PqCodesPath: String = graft.Artifacts.path("pq_codes")
  val PqCodebooksPath: String = graft.Artifacts.path("pq_codebooks")

  private def pinPqIndex(s: SparkSession, d: String, idx: PqIndex): Unit =
    graft.Artifacts.writeOnce(s, d, "pq_index") {
      idx.codes.write.mode("overwrite").parquet(PqCodesPath)
      s.createDataFrame(idx.codebooks).toDF("m", "c", "centroid")
        .write.mode("overwrite").parquet(PqCodebooksPath)
    }

  /** ADC shortlist width for the exact re-rank stage — the recall knob.
    * On the fixture (near-isotropic noise vectors, PQ's hardest case —
    * real embedding corpora cluster and quantize far better) raw ADC
    * top-3 recalls only 3/15 of the exact-L2 top-3, a shortlist of 64
    * contains 12/15; the re-rank stage makes those 12 exact.
    */
  val PqShortlist = 64

  /** Driver-side ADC distance tables: per query, an M×K table of
    * squared-L2 distances from its subvectors to every codebook
    * centroid, computed from the collected query rows (bounded:
    * |queries|·M·K doubles — the training-batch side, the
    * [[hardNegatives]] stance) and broadcast as (query_id, dtab).
    */
  private def adcQueryFrame(s: SparkSession, q: DataFrame,
      codebooks: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val books = codebooks.map { case (m, c, ctr) => (m, c) -> ctr }.toMap
    val qTabs = q.collect().toSeq.map { r =>
      val qv = r.getSeq[Double](1)
      val tab = (0 until PqM).map { m =>
        val sub = qv.slice(m * PqSubDim, (m + 1) * PqSubDim)
        (0 until PqK).map { c =>
          sub.zip(books((m, c))).map { case (x, y) => (x - y) * (x - y) }.sum
        }.toSeq
      }
      (r.getLong(0), tab)
    }
    s.createDataFrame(qTabs).toDF("query_id", "dtab")
  }

  /** ADC score of one coded vector: M array-index lookups summed — a
    * pure scan-stage projection (static GetArrayItem chains,
    * whole-stage codegen; no explode, no per-subspace join, no touch
    * of the raw floats).
    */
  private def adcLookupSum: Column = (0 until PqM)
    .map(m => col("dtab").getItem(m).getItem(col("codes").getItem(m)))
    .reduce(_ + _)

  /** Stage 2 of every PQ probe: the |queries|·L shortlist is broadcast
    * against the raw vectors (one corpus-side broadcast-join fetch),
    * true squared L2 rescored, top-3 emitted. This stage is what makes
    * PQ's compression loss recoverable — the shortlist bounds the exact
    * work to L·|queries| vector reads regardless of corpus size.
    */
  private def exactReRankL2(s: SparkSession, d: String,
      shortlist: DataFrame, q: DataFrame): DataFrame = {
    val wEx = Window.partitionBy(col("query_id"))
      .orderBy(round(col("d2"), 9).asc, col("vec_id"))
    vecs(s, d).select(col("vec_id"), col("v"))
      .join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("d2", expr(
        "aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"))
      .withColumn("rank", row_number().over(wEx))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("vec_id"), round(col("adist"), 4).as("approx_dist"),
        round(col("d2"), 4).as("l2_dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Two-stage PQ probe — ADC shortlist over the WHOLE code table, then
    * exact re-rank ([[adcQueryFrame]]/[[adcLookupSum]]/[[exactReRankL2]]).
    * This is the flat-PQ baseline; [[ivfPqTopK]] composes the same
    * stages with [[ivfIndex]] cell restriction. Top-[[PqShortlist]]
    * ADC candidates per query survive to the re-rank. Both rankings
    * use the round-9 quantized key ([[bruteTopK]]'s engine-stability
    * note).
    */
  def pqTopK(s: SparkSession, d: String): DataFrame = {
    val idx = pqIndex(s, d)
    pinPqIndex(s, d, idx)
    val q = vecs(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val qdf = adcQueryFrame(s, q, idx.codebooks)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(round(col("adist"), 9).asc, col("vec_id"))
    val shortlist = idx.codes.crossJoin(broadcast(qdf))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adist", adcLookupSum)
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= PqShortlist)
      .select(col("query_id"), col("vec_id"), col("adist"))
    exactReRankL2(s, d, shortlist, q)
  }

  private val invListCache = new graft.SessionCache[(String, Int), DataFrame]()

  /** Inverted-list table for IVF-PQ: the PQ codes stored beside the
    * coarse cell id — (vec_id, cell, codes). At 100 TB this is ONE
    * cell-bucketed parquet table written by the index build (probes
    * never pay a join); the local stand-in fuses the two cached index
    * frames once per (session, sfDir, k) and persists the result.
    */
  private def invLists(s: SparkSession, d: String, k: Int): DataFrame =
    invListCache.getOrBuild(s, (d, k)) {
      val fused = ivfIndex(s, d, k).assigned.select(col("vec_id"), col("cell"))
        .join(pqIndex(s, d).codes, Seq("vec_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      fused.count() // materialize: probes read the fused lists, not the join
      fused
    }

  /** Composed IVF-PQ top-k — the full ANN query shape at 100 TB: the
    * coarse cells bound WHICH vectors are scored, the PQ codes bound
    * what scoring each one COSTS, and the exact re-rank bounds the
    * approximation error.
    *
    *   1. nprobe-cell ranking by squared L2 to the k broadcast
    *      centroids (metric-consistent with the ADC stage end-to-end;
    *      [[ivfTopK]] is the cosine variant);
    *   2. ADC lookup-sum over ONLY the probed cells' inverted lists —
    *      ~nprobe/k of the code table, which is itself ~32× smaller
    *      than the raw floats;
    *   3. exact-L2 re-rank of the bounded shortlist.
    *
    * Oracle: DuckDB replays all three stages from the four pinned
    * artifacts ([[IvfAssignPath]] + [[IvfCentroidsPath]] +
    * [[PqCodesPath]] + [[PqCodebooksPath]]).
    */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 8, nprobe: Int = 3): DataFrame = {
    val ivf = ivfIndex(s, d, k)
    if (k == 8) pinIvfIndex(s, d, ivf)
    val pq = pqIndex(s, d)
    pinPqIndex(s, d, pq)
    val cdf = s.createDataFrame(ivf.centroids).toDF("cell", "centroid")
    val q = vecs(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val probes = q.crossJoin(broadcast(cdf))
      .withColumn("cdist", expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(round(col("cdist"), 9).asc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("cell"))
    val qdf = adcQueryFrame(s, q, pq.codebooks)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(round(col("adist"), 9).asc, col("vec_id"))
    val shortlist = invLists(s, d, k).join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .withColumn("adist", adcLookupSum)
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= PqShortlist)
      .select(col("query_id"), col("vec_id"), col("adist"))
    exactReRankL2(s, d, shortlist, q)
  }

  /** PCA projection of the embedding column — the dimensionality
    * reduction a vector pipeline runs before indexing (smaller vectors
    * → cheaper ANN probes and quantization at identical recall for the
    * variance captured). spark.ml PCA: one distributed Gramian
    * (d×d, tiny — cost scales with rows once, not with pairs), SVD on
    * the driver, then projection as a scan-stage matrix multiply.
    * Internal form: (vec_id, projected array<double>) — the SPEC's
    * surface for the distance invariants; the query surface is the
    * scalarized [[embeddingPca]] below.
    */
  private[graft] def embeddingPcaProjected(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.feature.PCA
    val v = vecs(s, d).withColumn("fv", array_to_vector(col("v")))
    val model = new PCA().setInputCol("fv").setOutputCol("pv").setK(k).fit(v)
    model.transform(v)
      .withColumn("pv_arr", vector_to_array(col("pv")))
      // 6dp: two fits in one session must agree bit-for-bit for the
      // determinism contract; rounding absorbs any reduce-order ulp
      .select(col("vec_id"),
        expr("transform(pv_arr, x -> round(x, 6))").as("projected"))
      .orderBy(col("vec_id"))
  }

  /** Artifact path shared by [[embeddingPca]] and its DuckDB oracle:
    * the per-vector projected coordinates, pinned once per (session,
    * sfDir) — DuckDB has no SVD, so the projection itself is data; what
    * DuckDB independently recomputes is everything DOWNSTREAM of it
    * (the integer checksums) plus the algebraic invariant that makes
    * the check meaningful: an orthonormal projection is NON-EXPANSIVE,
    * so each vector's projected norm must not exceed its original norm
    * (computed by DuckDB from the RAW embeddings table, not the
    * artifact). A wrong projection — scaled, sheared, or mismatched to
    * its vector id — fails `norm_ok` or the checksums.
    */
  val PcaProjPath: String = graft.Artifacts.path("pca_proj")

  /** Quantization scale for the PCA checksums (1e-6 resolution — one
    * output-rounding step finer than the artifact's 6dp, so the
    * round-trip is exact) and the integer slack the norm invariant
    * allows for quantization error: per component the squared-norm
    * error is ≤ 2·|x|·q/2 + q²/4 in q-units; at 64 original dims and
    * |x| ≲ 10 that bounds well under 1e9.
    */
  private[operators] val PcaQ = 1000000L
  private[operators] val PcaNormSlack = 1000000000L

  /** Scalarized PCA query (VERDICT r7 item 1: the array<double> output
    * crashed the driver's pandas verify sort). Output is the
    * [[embeddingQuantize]] integer-checksum convention over the
    * projected coordinates — n_components, sum/min/max of the 1e-6
    * quantized components, the quantized squared norm — plus `norm_ok`,
    * the SQL-checkable non-expansiveness invariant against the raw
    * embedding's quantized squared norm. Exact integer algebra end to
    * end, so the oracle compare is bit-stable across engines.
    */
  /** The projected frame is cached per (session, sfDir, k) — a PCA
    * model, like the IVF index, is trained once and projected many
    * times; repeat query invocations must not re-pay the Gramian+SVD
    * (the [[ivfCache]] stance).
    */
  private val pcaCache = new graft.SessionCache[(String, Int), DataFrame]()

  def embeddingPca(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val proj = pcaCache.getOrBuild(s, (d, k))(
      embeddingPcaProjected(s, d, k).barrier("k floats per vector — the PCA projection"))
    graft.Artifacts.writeOnce(s, d, "pca_proj") {
      proj.write.mode("overwrite").parquet(PcaProjPath)
    }
    val p = proj
      .withColumn("q", expr(s"transform(projected, x -> CAST(round(x * $PcaQ) AS BIGINT))"))
      .select(col("vec_id"),
        expr("size(q)").as("n_components"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("pq_sum"),
        expr("array_min(q)").as("pq_min"),
        expr("array_max(q)").as("pq_max"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x * x)").as("pnorm2_q"))
    val o = Tables.embeddings(s, d)
      .withColumn("oq",
        expr(s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * $PcaQ) AS BIGINT))"))
      .select(col("vec_id"),
        expr("aggregate(oq, CAST(0 AS BIGINT), (a, x) -> a + x * x)").as("onorm2_q"))
    p.join(o, Seq("vec_id"))
      .select(col("vec_id"), col("n_components"), col("pq_sum"),
        col("pq_min"), col("pq_max"), col("pnorm2_q"),
        (col("pnorm2_q") <= col("onorm2_q") + lit(PcaNormSlack)).as("norm_ok"))
      .orderBy(col("vec_id"))
  }

  /** Per-label centroid of the embedding column — the distributed
    * vector aggregation under KMeans/IVF training and class prototypes,
    * exposed as a query: posexplode to (label, dim, component), one
    * hash aggregate. Map-side partial aggregation collapses the ×dim
    * row expansion before the shuffle, so exchange volume is
    * |labels|·dim regardless of corpus size. Components are quantized
    * to 1e-4 and summed as exact integers (the fixed-decimal cent
    * convention), making the mean order-independent and bit-identical
    * across engines — a quantized centroid, which is also what an
    * embedding pipeline ships (fp32 centroids don't survive engine
    * reorderings bit-exactly).
    */
  def embeddingCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), (col("pos") + lit(1)).as("dim"))
      .agg(
        (sum(expr("CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)")) /
          (count(lit(1)) * lit(10000e0))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))

  /** Cluster count for [[kmeansRefine]] — also the per-vector argmin
    * encoding radix: code = dist_q · 16 + cid needs cid < 16, so K ≤ 16.
    */
  val KmK = 8

  /** Component quantization for [[kmeansRefine]] — the
    * [[embeddingCentroids]] 1e-4 fixed-decimal convention. Worst-case
    * encoded argmin: dim · (2·10⁴)² · 16 ≈ 2·10¹¹ per 32 dims, far
    * inside BIGINT.
    */
  val KmQ = 10000L

  /** Two unrolled Lloyd iterations over the embedding table, fully
    * declarative and integer-exact — the oracle-CHECKED complement to
    * the ML-exempt seeded-KMeans quantizer trainings ([[ivfTopK]],
    * [[pqTopK]]): same assign/update algebra, but every step replays
    * bit-identically in DuckDB. Seeds are the [[KmK]] smallest vec_ids
    * (cid = rank in that order); components quantize to BIGINT at
    * [[KmQ]] so distances are exact integer sums; centroid updates are
    * integer division, which truncates toward zero in BOTH dialects for
    * BIGINT operands (Spark `DIV` and DuckDB `//` — the round-4
    * "DuckDB // floors" gotcha is about non-integer operands; measured
    * -7 // 2 = -3, and embedding sums do go negative).
    *
    * Scale shape — the part worth having on a cluster: assignment is
    * SCAN-STAGE, not a join. The K×dim centroid table collapses to a
    * single array-of-structs row (`collect_list` over ≤ K·dim rows),
    * broadcast-crossJoined onto the scan, and the argmin evaluates as
    * array algebra per row (`array_min(transform(...))` — one encoded
    * BIGINT per vector, ties to the smaller cid for free). Per Lloyd
    * iteration the only corpus-sized exchange is the centroid update,
    * and map-side partial aggregation collapses it to K·dim rows
    * before the shuffle (the [[embeddingCentroids]] stance). Per-vector
    * output: final cluster + exact quantized squared distance.
    */
  def kmeansRefine(s: SparkSession, d: String): DataFrame = {
    val embQ = Tables.embeddings(s, d).select(col("vec_id"),
      expr(s"transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * $KmQ) AS BIGINT))")
        .as("xq"))
    // one-row frame: cents = array<struct<cid, cq>> ordered by seed rank
    val seeds = embQ.orderBy(col("vec_id")).limit(KmK)
      .agg(sort_array(collect_list(struct(col("vec_id"), col("xq")))).as("sa"))
      .select(expr("transform(sa, (e, i) -> struct(CAST(i AS BIGINT) AS cid, e.xq AS cq))")
        .as("cents"))
    val codeExpr = expr(
      """array_min(transform(cents, c ->
        |  aggregate(zip_with(xq, c.cq, (a, b) -> (a - b) * (a - b)),
        |            CAST(0 AS BIGINT), (acc, v) -> acc + v) * 16 + c.cid))""".stripMargin)
    def assign(cents: DataFrame): DataFrame =
      embQ.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("xq"), codeExpr.as("code"))
    // floor-div centroid update, regrouped to the one-row cents shape
    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(expr("pmod(code, 16)").as("cid"), posexplode(col("xq")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
        .select(col("cid"), col("pos"), expr("sx DIV cnt").as("cx"))
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("cx")))).as("pcs"))
        .select(col("cid"), expr("transform(pcs, p -> p.cx)").as("cq"))
        .agg(sort_array(collect_list(struct(col("cid"), col("cq")))).as("sa"))
        .select(expr("transform(sa, e -> struct(e.cid AS cid, e.cq AS cq))").as("cents"))
    assign(update(assign(seeds)))
      .select(col("vec_id"),
        expr("CAST(pmod(code, 16) AS INT)").as("cluster"),
        expr("code DIV 16").as("dist_q"))
      .orderBy(col("vec_id"))
  }

  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× compression step before shipping vectors to an ANN
    * serving tier. Per vector: scale = max|v|/127, q_i = round(v_i /
    * scale) ∈ [-127, 127]. Pure scalar array algebra in one projection
    * — scan-speed, zero shuffle, codegen'd higher-order functions, no
    * UDF; at 100 TB this runs at whatever the parquet scan sustains.
    *
    * Output is integer checksums of the quantized vector (sum/min/max
    * are exact BIGINT/INT algebra) plus the rounded scale, so the
    * oracle compare is integer-exact: float→double widening is lossless
    * and IEEE division/round give bit-identical q in both engines —
    * fp32 payloads themselves don't survive engine reorderings, their
    * integer images do (same stance as [[embeddingCentroids]]).
    * All-zero vectors have no scale and are excluded (both dialects).
    */
  def embeddingQuantize(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("maxabs") > 0)
      .withColumn("q",
        expr("transform(v, x -> CAST(round(x / (maxabs / 127.0e0)) AS INT))"))
      .select(col("vec_id"),
        expr("size(q)").as("n_dims"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"),
        round(col("maxabs") / lit(127.0), 6).as("scale"))
      .orderBy(col("vec_id"))

  // lazy: oracle objects reference operator constants (e.g. DedupOracles
  // .spanCtes -> Dedup.SpanLen), so an eager defs -- which reads the oracle
  // object back -- would deadlock-null mid-initialization when a composed
  // oracle (TrainingOracles.corpusPrep4) initializes the oracle object first
  /** Similarity threshold for [[semanticDecontaminate]]. 0.35 is tuned
    * to the synthetic fixture (isotropic vectors: cross-split max-sim
    * spans ~0.15–0.49, so the gate drops a real minority and keeps a
    * real majority — both branches exercised); production text-embedding
    * pipelines run the same gate at ~0.95+.
    */
  val SemDecontamThreshold: Double = 0.35

  /** Hard cap on the collected benchmark side of
    * [[semanticDecontaminate]]. Real benchmark suites are thousands of
    * vectors; 200k × 32 dims × 8 B ≈ 50 MB is already generous for a
    * driver-held broadcast matrix. The gate FAILS LOUD past the cap
    * rather than silently degrading into a driver-memory / scan-cost
    * bottleneck — an unbounded benchmark side must switch to the
    * ANN-prefiltered escalation documented on the operator (VERDICT
    * r11 #1).
    */
  val SemDecontamMaxBenchRows: Int = 200000

  /** Probe width and benchmark-side multi-assignment for
    * [[semanticDecontaminateIvf]]. A contamination is found iff the
    * trainer's nprobe cells intersect the benchmark vector's nrep
    * cells; replicating the indexed side into its top-nrep cells is
    * the classic IVF recall lever (multi-assignment) and beats simply
    * widening nprobe — even under WORST-CASE independent cell
    * geometry, P(miss) = C(k-nrep, nprobe)/C(k, nprobe), and the
    * fixture's τ=0.35 gate (far looser than a production 0.95+, so
    * cells coincide less often) measured 26/38 at nprobe=3/nrep=1 vs
    * ≥0.8 recall at 3/2. Candidate cost is (nprobe·nrep)/k of exact —
    * 0.75 at the fixture's toy k=8, and → 6/k as k grows with the
    * corpus.
    */
  val SemDecontamNprobe: Int = 3
  val SemDecontamBenchRep: Int = 2

  /** Embedding-space benchmark decontamination — the semantic analogue
    * of the exact/Bloom/n-gram `q_*_decontaminate` family (the GPT-3 /
    * Llama contamination-audit stage): drop every training vector whose
    * max cosine against the held-out benchmark set reaches the
    * threshold. Same [[graft.GoldenHash]] 10% membership rule as the
    * text-side family, applied to `vec_id`.
    *
    * Scale shape: the benchmark side must be driver-small — real
    * benchmark suites are thousands of vectors; the 10% hash split is
    * the fixture stand-in — and that contract is now ENFORCED, not
    * assumed: the collect fails loud past [[SemDecontamMaxBenchRows]],
    * and the collected matrix ships via `sc.broadcast` (once per
    * executor, torrent) inside ONE fused native expression
    * ([[graft.functions.MaxCosineSimBc]]) rather than riding every
    * task closure as an expression field — the r11 bench tail showed
    * 1.2 MiB tasks from the un-broadcast form. The corpus is scanned
    * once inside whole-stage codegen with ZERO joins and ZERO shuffle
    * (contrast: a broadcast-crossJoin + groupBy(vec_id) max formulation
    * shuffles one row per corpus vector for the final agg). For a
    * benchmark side too large for the cap, the correct escalation is
    * NOT raising it: IVF-prefilter both sides ([[semanticDedup]]'s
    * cell blocking) so each corpus row probes only its cell's
    * benchmark vectors, turning the k·N scan into (k/cells)·N. Each
    * per-benchmark cosine is quantized to 6 decimals before the max in
    * BOTH engines, so the threshold compare and the emitted value
    * cannot flip on summation-order ulp drift. For corpora where even
    * the scan-stage k·N probe is too hot, the IVF-restricted variant
    * ([[semanticDedup]]'s cell blocking) bounds candidates per cell.
    *
    * The emitted similarity is the round-6 max ITSELF — never re-round
    * a quantized value: the sf1 rehearsal caught Spark (BigDecimal
    * HALF_UP on the shortest decimal repr) and DuckDB (scale, C-round,
    * descale) disagreeing on `round(m, 4)` exactly when the first
    * rounding had manufactured a decimal midpoint like 0.32785 (3 of
    * 6418 rows). One rounding per value; midpoints then only arise
    * from raw-cosine doubles straddling a repr boundary, the same
    * measure-zero class every other oracle already accepts.
    */
  def semanticDecontaminate(
      s: SparkSession, d: String,
      maxBenchRows: Int = SemDecontamMaxBenchRows): DataFrame = {
    val v = vecs(s, d)
    val isTestVec = graft.GoldenHash.bucket(col("vec_id"), 10) === 0
    val testMat = v.filter(isTestVec).select(col("vec_id"), col("v"))
      .limit(maxBenchRows + 1)
      .collect()
    require(testMat.length <= maxBenchRows,
      s"semanticDecontaminate benchmark side exceeds the driver-collect cap " +
        s"($maxBenchRows rows) — use the IVF-prefiltered escalation " +
        s"(see scaladoc) instead of collecting an unbounded split")
    val bcMat = s.sparkContext.broadcast(
      testMat.sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray))
    v.filter(!isTestVec)
      .withColumn("max_test_sim",
        graft.functions.VectorFunctions.maxCosineBc(col("v"), bcMat))
      .filter(col("max_test_sim") < SemDecontamThreshold)
      .select(col("vec_id"), col("label"), col("max_test_sim"))
      .orderBy(col("vec_id"))
  }

  /** Auto-selecting semantic decontamination — the plan choice the
    * OPERATOR owns instead of its callers (the [[Graph]] CC
    * auto-select precedent, VERDICT r12 item 6): a limit-bounded count
    * of the benchmark split picks the exact broadcast gate when it
    * fits the [[SemDecontamMaxBenchRows]] driver-collect cap, and the
    * IVF-prefiltered escalation past it. The probe count scans at most
    * cap+1 rows of the benchmark SPLIT (never the corpus) — at 100 TB
    * that is one partition-local limit. Both underlying variants stay
    * independently oracle-checked; the spec pins the escalation
    * trigger on both sides of the cap.
    */
  def semanticDecontaminateAuto(
      s: SparkSession, d: String,
      maxBenchRows: Int = SemDecontamMaxBenchRows): DataFrame = {
    val isTestVec = graft.GoldenHash.bucket(col("vec_id"), 10) === 0
    val benchRows = vecs(s, d).filter(isTestVec).limit(maxBenchRows + 1).count()
    if (benchRows <= maxBenchRows) semanticDecontaminate(s, d, maxBenchRows)
    else semanticDecontaminateIvf(s, d)
  }

  /** The IVF-prefiltered escalation of [[semanticDecontaminate]] — the
    * plan for a benchmark side too large for the driver-collect cap.
    * NEITHER split is collected: both ride the shared [[ivfIndex]]
    * cells, the benchmark side is packed into one per-cell matrix row
    * (k rows total), and each training vector probes only the
    * benchmark vectors of its `nprobe` nearest cells — cost
    * |train| · (nprobe/k) · |bench| instead of |train| · |bench|.
    *
    * Scale shape: the probe-cell ranking is a broadcast k-row cross
    * join ranked per vec_id (the [[ivfTopK]] pattern); the candidate
    * join is broadcast on the k-row per-cell benchmark matrix; the
    * only shuffle is the per-vec max, which partial-aggregates to one
    * row per train vector before moving. At 100 TB, k grows with the
    * benchmark side (k ≈ |bench|/target_cell_rows) so each per-cell
    * matrix stays bounded and the candidate work per training row is
    * constant — and if the per-cell matrices outgrow a broadcast, the
    * same plan degrades gracefully to a cell-keyed shuffle join.
    *
    * Trade vs the exact gate: per-pair round-6 cosines and the max are
    * identical arithmetic, so PRECISION is exact (anything flagged
    * truly exceeds the threshold — the probed max is a lower bound of
    * the true max); RECALL is governed by nprobe, spec-bounded against
    * the exact form. Training vectors whose probed cells hold no
    * benchmark vectors emit a NULL max and are kept.
    */
  def semanticDecontaminateIvf(
      s: SparkSession, d: String, nprobe: Int = SemDecontamNprobe): DataFrame = {
    val idx = ivfIndex(s, d, 8)
    pinIvfIndex(s, d, idx)
    val cdf = s.createDataFrame(idx.centroids).toDF("cell", "centroid")
    val isTestVec = graft.GoldenHash.bucket(col("vec_id"), 10) === 0
    // benchmark side multi-assigned to its top-nrep cells by the SAME
    // round-9 cosine ranking the probe uses (not the index's hard
    // euclidean assignment — probe and placement must rank identically
    // or the worst-case miss bound doesn't hold)
    val bench = idx.assigned.filter(isTestVec)
      .select(col("vec_id"), col("v"))
      .crossJoin(broadcast(cdf))
      .withColumn("cdist", cosine(col("v"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(round(col("cdist"), 9).desc, col("cell"))))
      .filter(col("crank") <= SemDecontamBenchRep)
      .groupBy(col("cell")).agg(collect_list(col("v")).as("bvs"))
    val train = idx.assigned.filter(!isTestVec).select(col("vec_id"), col("v"))
    val probes = train.crossJoin(broadcast(cdf))
      .withColumn("cdist", cosine(col("v"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(round(col("cdist"), 9).desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("vec_id"), col("v"), col("cell"))
    val sims = probes.join(broadcast(bench), Seq("cell"), "left")
      .withColumn("cell_max", expr(
        "array_max(transform(bvs, b -> round(graft_cosine(v, b), 6)))"))
      .groupBy(col("vec_id"))
      .agg(max(col("cell_max")).as("max_test_sim"))
    sims.filter(col("max_test_sim").isNull ||
        col("max_test_sim") < SemDecontamThreshold)
      .join(vecs(s, d).select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("label"), col("max_test_sim"))
      .orderBy(col("vec_id"))
  }

  lazy val defs: Map[String, QueryDef] = Map(
    // verified-not-benched since r14: the brute-force exact top-k
    // baseline of the four benched ANN paths (lsh / ivfpq families)
    "q_embedding_topk"    -> QueryDef(bruteTopK, Some(SimilarityOracles.bruteTopK),
      headline = false),
    "q_hard_negatives"    -> QueryDef(hardNegatives, Some(SimilarityOracles.hardNegatives)),
    // verified-not-benched (the corpusPrep-prefix convention, VERDICT
    // r12 item 2): the exact all-pairs baseline is quadratic BY
    // DEFINITION — it exists so the oracle and the LSH/SemDeDup recall
    // specs have exact truth to check against, and it burned ~15% of
    // the sf1 rehearsal wall as a headline entry. The scale-path
    // sibling q_embedding_lsh keeps its bench slot.
    "q_embedding_neardup" -> QueryDef(nearDupPairs, Some(SimilarityOracles.nearDupPairs),
      headline = false),
    "q_embedding_lsh"     -> QueryDef(lshNearDup, Some(SimilarityOracles.lshNearDup)),
    // q_embedding_ivf / q_embedding_pq: verified-not-benched since r14
    // — constituent stages of the benched composition q_embedding_ivfpq
    // (the corpus_prep→prep5 precedent); q_embedding_lsh stays benched
    // as the other ANN family
    "q_embedding_ivf"     -> QueryDef((s, d) => ivfTopK(s, d), Some(SimilarityOracles.ivfTopK),
      headline = false),
    "q_embedding_centroids" -> QueryDef(embeddingCentroids, Some(SimilarityOracles.embeddingCentroids)),
    "q_kmeans_refine"     -> QueryDef(kmeansRefine, Some(SimilarityOracles.kmeansRefine)),
    "q_embedding_quantize" -> QueryDef(embeddingQuantize, Some(SimilarityOracles.embeddingQuantize)),
    "q_embedding_pca"     -> QueryDef((s, d) => embeddingPca(s, d), Some(SimilarityOracles.embeddingPca)),
    "q_embedding_pq"      -> QueryDef(pqTopK, Some(SimilarityOracles.pqTopK),
      headline = false),
    "q_embedding_ivfpq"   -> QueryDef((s, d) => ivfPqTopK(s, d), Some(SimilarityOracles.ivfPqTopK)),
    "q_semantic_dedup"    -> QueryDef((s, d) => semanticDedup(s, d), Some(SimilarityOracles.semanticDedup)),
    // verified-not-benched since r14: exact brute-force baseline of the
    // benched q_semantic_decontaminate_ivf (+ the auto-selecting spec)
    "q_semantic_decontaminate" -> QueryDef((s, d) => semanticDecontaminate(s, d),
      Some(SimilarityOracles.semanticDecontaminate), headline = false),
    "q_semantic_decontaminate_ivf" -> QueryDef((s, d) => semanticDecontaminateIvf(s, d),
      Some(SimilarityOracles.semanticDecontaminateIvf)),
    "q_embedding_prune"   -> QueryDef((s, d) => prototypePrune(s, d), Some(SimilarityOracles.prototypePrune)))
}

/** DuckDB oracles — cosine via explicit DOUBLE list arithmetic
  * (list_cosine_similarity accumulates in float32 → ~1e-7 drift →
  * round(4) hash flips; see Similarity scaladoc).
  */
object SimilarityOracles {

  private val cosSql =
    """list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), x -> x[1] * x[2]))
      | / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
      |     * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))))""".stripMargin

  /** Replays [[Similarity.embeddingPca]] downstream of the SVD: reads
    * the pinned projection artifact, re-derives the 1e-6 integer
    * checksums, and independently checks the non-expansiveness
    * invariant (projected squared norm ≤ original squared norm + slack)
    * against the RAW embeddings table — only the projection matrix
    * itself, being driver-side SVD output, is pinned as data.
    */
  val embeddingPca: String =
    s"""WITH proj AS (
       |  SELECT vec_id,
       |    list_transform(projected,
       |      x -> CAST(round(x * ${Similarity.PcaQ}) AS BIGINT)) AS q
       |  FROM read_parquet('${Similarity.PcaProjPath}/*.parquet')),
       |p AS (
       |  SELECT vec_id,
       |    CAST(len(q) AS INT) AS n_components,
       |    CAST(list_sum(q) AS BIGINT) AS pq_sum,
       |    CAST(list_min(q) AS BIGINT) AS pq_min,
       |    CAST(list_max(q) AS BIGINT) AS pq_max,
       |    CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS pnorm2_q
       |  FROM proj),
       |o AS (
       |  SELECT vec_id,
       |    CAST(list_sum(list_transform(
       |      CAST(embedding AS DOUBLE[]),
       |      x -> CAST(round(x * ${Similarity.PcaQ}) AS BIGINT)
       |           * CAST(round(x * ${Similarity.PcaQ}) AS BIGINT))) AS BIGINT) AS onorm2_q
       |  FROM embeddings)
       |SELECT p.vec_id, p.n_components, p.pq_sum, p.pq_min, p.pq_max, p.pnorm2_q,
       |  p.pnorm2_q <= o.onorm2_q + ${Similarity.PcaNormSlack} AS norm_ok
       |FROM p JOIN o USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  /** Replays [[Similarity.lshNearDup]] downstream of the sign
    * projections: reads the pinned positional band-key arrays,
    * re-derives the banding, the per-bucket star edges, and the exact
    * DOUBLE-cosine ≥ 0.3 verification against the raw embeddings table
    * — only the hash mix itself is pinned as data (the minhash-oracle
    * technique applied to vectors).
    */
  val lshNearDup: String =
    s"""WITH art AS (
       |  SELECT vec_id, bands
       |  FROM read_parquet('${Similarity.LshBandsPath}/*.parquet')),
       |banded AS (
       |  SELECT vec_id, i AS band, bands[i + 1] AS key
       |  FROM art, (SELECT unnest(generate_series(0, 15)) AS i)),
       |mins AS (
       |  SELECT band, key, min(vec_id) AS vec_a FROM banded GROUP BY 1, 2),
       |edges AS (
       |  SELECT DISTINCT m.vec_a, bd.vec_id AS vec_b
       |  FROM banded bd JOIN mins m USING (band, key)
       |  WHERE bd.vec_id <> m.vec_a)
       |SELECT e.vec_a, e.vec_b, round($cosSql, 4) AS cosine
       |FROM edges e
       |JOIN embeddings a ON e.vec_a = a.vec_id
       |JOIN embeddings b ON e.vec_b = b.vec_id
       |WHERE $cosSql >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Replays [[Similarity.ivfTopK]]'s entire PROBE over the pinned
    * index (assignments + centroid sidecar): nprobe=3 cell ranking by
    * query-centroid cosine, the cell-restricted candidate join, and the
    * exact top-3 cosine ranking — the KMeans FIT is the only pinned
    * step (seeded Lloyd iterations are engine-specific).
    */
  val ivfTopK: String = {
    val qcCos =
      """list_sum(list_transform(list_zip(CAST(q.embedding AS DOUBLE[]), c.centroid), x -> x[1] * x[2]))
        | / (sqrt(list_sum(list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)))
        |     * sqrt(list_sum(list_transform(c.centroid, x -> x * x))))""".stripMargin
    s"""WITH assign AS (
       |  SELECT vec_id, cell FROM read_parquet('${Similarity.IvfAssignPath}/*.parquet')),
       |cent AS (
       |  SELECT cell, centroid FROM read_parquet('${Similarity.IvfCentroidsPath}/*.parquet')),
       |q AS (
       |  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(($qcCos), 9) DESC, c.cell) AS crank
       |    FROM q CROSS JOIN cent c)
       |  WHERE crank <= 3),
       |scored AS (
       |  SELECT p.query_id, s.vec_id, $cosSql AS cos
       |  FROM probes p
       |  JOIN assign s ON p.cell = s.cell
       |  JOIN embeddings a ON p.query_id = a.vec_id
       |  JOIN embeddings b ON s.vec_id = b.vec_id
       |  WHERE s.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(cos, 9) DESC, vec_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, round(cos, 4) AS cosine
       |FROM ranked
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** [[Similarity.hardNegatives]]'s exact twin: the [[bruteTopK]]
    * ranking restricted to label-mismatched candidates.
    */
  val hardNegatives: String =
    s"""WITH scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, b.label AS label,
       |    $cosSql AS cos
       |  FROM embeddings a JOIN embeddings b
       |    ON b.vec_id <> a.vec_id AND b.label <> a.label
       |  WHERE a.vec_id < 5),
       |ranked AS (
       |  SELECT query_id, vec_id, label, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(cos, 9) DESC, vec_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, label, round(cos, 4) AS cosine
       |FROM ranked
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  val bruteTopK: String =
    s"""WITH scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
       |    $cosSql AS cos
       |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 5),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(cos, 9) DESC, vec_id) AS INT) AS rank
       |  FROM scored)
       |SELECT query_id, rank, vec_id, round(cos, 4) AS cosine
       |FROM ranked
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  /** Shared CTE scaffolding for the two PQ probes — [[Similarity.pqTopK]]
    * and [[Similarity.ivfPqTopK]] differ only in the CTEs that produce
    * `scored` (flat ADC over every code vs ADC over the probed cells'
    * inverted lists), so the builder takes those and the shortlist /
    * exact-re-rank / round-9-ranked tail embeds verbatim in both — the
    * composed oracle can't drift from the flat one it extends.
    */
  private def pqProbeSql(scoredCtes: String): String = {
    val sd = Similarity.PqSubDim
    s"""WITH codes AS (
       |  SELECT vec_id, codes FROM read_parquet('${Similarity.PqCodesPath}/*.parquet')),
       |books AS (
       |  SELECT m, c, centroid FROM read_parquet('${Similarity.PqCodebooksPath}/*.parquet')),
       |q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < 5),
       |dtab AS (
       |  SELECT q.query_id, b.m, b.c,
       |    list_sum(list_transform(
       |      list_zip(list_slice(q.qv, b.m * $sd + 1, b.m * $sd + $sd), b.centroid),
       |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
       |  FROM q CROSS JOIN books b),
       |vcodes AS (
       |  SELECT vec_id, unnest(codes) AS c,
       |    unnest(range(0, ${Similarity.PqM})) AS m
       |  FROM codes),
       |$scoredCtes,
       |shortlist AS (
       |  SELECT query_id, vec_id, adist FROM (
       |    SELECT query_id, vec_id, adist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY round(adist, 9) ASC, vec_id) AS arank
       |    FROM scored)
       |  WHERE arank <= ${Similarity.PqShortlist}),
       |rer AS (
       |  SELECT sl.query_id, sl.vec_id, sl.adist,
       |    list_sum(list_transform(
       |      list_zip(CAST(b.embedding AS DOUBLE[]), q.qv),
       |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
       |  FROM shortlist sl
       |  JOIN embeddings b ON sl.vec_id = b.vec_id
       |  JOIN q ON sl.query_id = q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, adist, d2,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(d2, 9) ASC, vec_id) AS INT) AS rank
       |  FROM rer)
       |SELECT query_id, rank, vec_id, round(adist, 4) AS approx_dist,
       |  round(d2, 4) AS l2_dist
       |FROM ranked
       |WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Replays [[Similarity.pqTopK]]'s whole two-stage probe over the
    * pinned code table + codebook sidecar: the same M×K squared-L2
    * distance tables (list arithmetic over the raw query embeddings),
    * the same lookup-sum ADC shortlist, the same exact-L2 re-rank with
    * round-9-ranked top-3. The seeded per-subspace KMeans FITS are the
    * only pinned step.
    */
  val pqTopK: String = pqProbeSql(
    """scored AS (
      |  SELECT d.query_id, v.vec_id, sum(d.dist) AS adist
      |  FROM vcodes v JOIN dtab d ON v.m = d.m AND v.c = d.c
      |  WHERE v.vec_id <> d.query_id
      |  GROUP BY d.query_id, v.vec_id)""".stripMargin)

  /** Replays [[Similarity.ivfPqTopK]]'s full three-stage composition:
    * squared-L2 nprobe-cell ranking over the pinned IVF centroids, the
    * ADC lookup-sum restricted to the probed cells' pinned assignments,
    * and the identical shortlist/re-rank tail via [[pqProbeSql]]. Both
    * seeded KMeans fits (coarse cells + PQ codebooks) are the only
    * pinned steps.
    */
  val ivfPqTopK: String = pqProbeSql(
    s"""cents AS (
       |  SELECT cell, centroid AS ccent
       |  FROM read_parquet('${Similarity.IvfCentroidsPath}/*.parquet')),
       |assign AS (
       |  SELECT vec_id, cell FROM read_parquet('${Similarity.IvfAssignPath}/*.parquet')),
       |cdists AS (
       |  SELECT q.query_id, c.cell,
       |    list_sum(list_transform(list_zip(q.qv, c.ccent),
       |      x -> (x[1] - x[2]) * (x[1] - x[2]))) AS cdist
       |  FROM q CROSS JOIN cents c),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT query_id, cell,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY round(cdist, 9) ASC, cell) AS crank
       |    FROM cdists)
       |  WHERE crank <= 3),
       |scored AS (
       |  SELECT d.query_id, v.vec_id, sum(d.dist) AS adist
       |  FROM vcodes v
       |  JOIN assign a ON v.vec_id = a.vec_id
       |  JOIN probes p ON a.cell = p.cell
       |  JOIN dtab d ON v.m = d.m AND v.c = d.c AND d.query_id = p.query_id
       |  WHERE v.vec_id <> p.query_id
       |  GROUP BY d.query_id, v.vec_id)""".stripMargin)

  val nearDupPairs: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round($cosSql, 4) AS cosine
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE $cosSql >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin

  // parallel unnests zip in DuckDB, giving (dim, component) rows; the
  // quantize-to-integer sum mirrors the Spark builder exactly
  val embeddingCentroids: String =
    """WITH vals AS (
      |  SELECT label,
      |    unnest(generate_series(1, len(embedding))) AS dim,
      |    unnest(embedding) AS x
      |  FROM embeddings)
      |SELECT label, CAST(dim AS INT) AS dim,
      |  sum(CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) / (count(*) * 10000e0) AS centroid,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM vals
      |GROUP BY label, dim
      |ORDER BY label, dim""".stripMargin

  /** [[Similarity.kmeansRefine]] replayed end-to-end: quantized
    * components, rank-of-smallest-vec_id seeds, per-(vector, centroid)
    * exact integer distances (relational form — DuckDB has no zip_with,
    * so the inner sum is `list_reduce` over 1-based positional
    * `range`), the same `dist·16 + cid` encoded argmin, the
    * truncating-integer-division centroid update (BIGINT `//` truncates
    * toward zero exactly like Spark `DIV`), and the second assignment.
    * BIGINT casts guard HUGEINT sum widening; `list(cx ORDER BY pos)`
    * rebuilds the dim-ordered centroid arrays.
    */
  val kmeansRefine: String = {
    val k = Similarity.KmK
    val q = Similarity.KmQ
    def distCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT e.vec_id,
         |    min(list_reduce(
         |          list_transform(range(1, len(e.xq) + 1),
         |            i -> (e.xq[i] - c.cq[i]) * (e.xq[i] - c.cq[i])),
         |          (a, b) -> a + b) * 16 + c.cid) AS code
         |  FROM embq e, $cents c
         |  GROUP BY e.vec_id)"""
    s"""WITH embq AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $q) AS BIGINT)) AS xq
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, xq AS cq
       |  FROM (SELECT vec_id, xq FROM embq ORDER BY vec_id LIMIT $k)),
       |${distCte("a1", "seeds")},
       |v1 AS (
       |  SELECT a1.code % 16 AS cid,
       |    unnest(generate_series(1, len(xq))) AS pos, unnest(xq) AS x
       |  FROM a1 JOIN embq USING (vec_id)),
       |u1 AS (
       |  SELECT cid, pos, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS cx
       |  FROM v1 GROUP BY cid, pos),
       |c1 AS (SELECT cid, list(cx ORDER BY pos) AS cq FROM u1 GROUP BY cid),
       |${distCte("a2", "c1")}
       |SELECT vec_id, CAST(code % 16 AS INT) AS cluster,
       |  CAST(code // 16 AS BIGINT) AS dist_q
       |FROM a2
       |ORDER BY vec_id""".stripMargin
  }

  /** Replays [[Similarity.semanticDedup]] downstream of the k-means fit:
    * reads the pinned cell assignments, re-derives the within-cell pairs,
    * the exact DOUBLE-cosine threshold, and the min-mate aggregation
    * against the RAW embeddings table — only the clustering (seeded Lloyd
    * iterations) is pinned as data, the dedup decision itself is
    * independently recomputed.
    */
  /** [[Similarity.semanticDecontaminate]] as the quadratic definition:
    * train × test cross join, per-pair DOUBLE cosine rounded to 6
    * decimals BEFORE the per-train max (the engine's in-loop
    * quantization), threshold on the quantized max, which is emitted
    * AS-IS (single-rounding convention — see the builder's scaladoc).
    */
  val semanticDecontaminate: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |test AS (
       |  SELECT v FROM e WHERE ${graft.GoldenHash.bucketSql("vec_id", 10)} = 0),
       |sims AS (
       |  SELECT t.vec_id, t.label,
       |    max(round(
       |      list_sum(list_transform(list_zip(t.v, s.v), x -> x[1] * x[2]))
       |        / (sqrt(list_sum(list_transform(t.v, x -> x * x)))
       |           * sqrt(list_sum(list_transform(s.v, x -> x * x)))), 6)) AS m
       |  FROM (SELECT * FROM e
       |        WHERE ${graft.GoldenHash.bucketSql("vec_id", 10)} <> 0) t
       |  CROSS JOIN test s
       |  GROUP BY 1, 2)
       |SELECT vec_id, label, m AS max_test_sim
       |FROM sims
       |WHERE m < ${Similarity.SemDecontamThreshold}
       |ORDER BY vec_id""".stripMargin

  /** Replays [[Similarity.semanticDecontaminateIvf]] over the pinned
    * IVF index: per-train nprobe cell ranking (round-9 centroid
    * cosine), cell-restricted candidate max of round-6 cosines, the
    * NULL-candidate keep rule, and the threshold gate.
    */
  val semanticDecontaminateIvf: String = {
    val tcCos =
      """list_sum(list_transform(list_zip(t.v, c.centroid), x -> x[1] * x[2]))
        | / (sqrt(list_sum(list_transform(t.v, x -> x * x)))
        |     * sqrt(list_sum(list_transform(c.centroid, x -> x * x))))""".stripMargin
    val tbCos =
      """list_sum(list_transform(list_zip(t.v, b.v), x -> x[1] * x[2]))
        | / (sqrt(list_sum(list_transform(t.v, x -> x * x)))
        |     * sqrt(list_sum(list_transform(b.v, x -> x * x))))""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |assign AS (
       |  SELECT vec_id, cell FROM read_parquet('${Similarity.IvfAssignPath}/*.parquet')),
       |cent AS (
       |  SELECT cell, centroid FROM read_parquet('${Similarity.IvfCentroidsPath}/*.parquet')),
       |train AS (
       |  SELECT vec_id, label, v FROM e
       |  WHERE ${graft.GoldenHash.bucketSql("vec_id", 10)} <> 0),
       |bench AS (
       |  SELECT cell, v FROM (
       |    SELECT t.vec_id, c.cell, t.v,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY round(($tcCos), 9) DESC, c.cell) AS crank
       |    FROM (SELECT vec_id, v FROM e
       |          WHERE ${graft.GoldenHash.bucketSql("vec_id", 10)} = 0) t
       |    CROSS JOIN cent c)
       |  WHERE crank <= ${Similarity.SemDecontamBenchRep}),
       |probes AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT t.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY round(($tcCos), 9) DESC, c.cell) AS crank
       |    FROM train t CROSS JOIN cent c)
       |  WHERE crank <= ${Similarity.SemDecontamNprobe}),
       |sims AS (
       |  SELECT p.vec_id, max(round(($tbCos), 6)) AS m
       |  FROM probes p
       |  JOIN bench b ON p.cell = b.cell
       |  JOIN train t ON t.vec_id = p.vec_id
       |  GROUP BY 1)
       |SELECT t.vec_id, t.label, s.m AS max_test_sim
       |FROM train t LEFT JOIN sims s USING (vec_id)
       |WHERE s.m IS NULL OR s.m < ${Similarity.SemDecontamThreshold}
       |ORDER BY t.vec_id""".stripMargin
  }

  val semanticDedup: String =
    s"""WITH assign AS (
       |  SELECT vec_id, cell FROM read_parquet('${Similarity.IvfAssignPath}/*.parquet')),
       |pairs AS (
       |  SELECT sa.vec_id, sb.vec_id AS prev_id, $cosSql AS cos
       |  FROM assign sa JOIN assign sb
       |    ON sa.cell = sb.cell AND sb.vec_id < sa.vec_id
       |  JOIN embeddings a ON sa.vec_id = a.vec_id
       |  JOIN embeddings b ON sb.vec_id = b.vec_id),
       |dups AS (
       |  SELECT vec_id, min(prev_id) AS dup_of0, round(max(cos), 4) AS max_cos0
       |  FROM pairs WHERE cos >= 0.4 GROUP BY 1)
       |SELECT s.vec_id, s.cell,
       |  d.dup_of0 IS NOT NULL AS is_duplicate,
       |  COALESCE(d.dup_of0, s.vec_id) AS dup_of,
       |  COALESCE(d.max_cos0, 0.0) AS max_cos
       |FROM assign s LEFT JOIN dups d USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  /** Replays [[Similarity.prototypePrune]] over the pinned index
    * (assignments + centroid sidecar): per-cell centroid-cosine ranking
    * and the integer 20% cut — `//` floors like Spark's DIV on the
    * non-negative counts involved.
    */
  val prototypePrune: String = {
    val vcCos =
      """list_sum(list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), c.centroid), x -> x[1] * x[2]))
        | / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
        |     * sqrt(list_sum(list_transform(c.centroid, x -> x * x))))""".stripMargin
    s"""WITH assign AS (
       |  SELECT vec_id, cell FROM read_parquet('${Similarity.IvfAssignPath}/*.parquet')),
       |cent AS (
       |  SELECT cell, centroid FROM read_parquet('${Similarity.IvfCentroidsPath}/*.parquet')),
       |scored AS (
       |  SELECT s.vec_id, s.cell, $vcCos AS ccos
       |  FROM assign s
       |  JOIN cent c ON s.cell = c.cell
       |  JOIN embeddings a ON s.vec_id = a.vec_id),
       |ranked AS (
       |  SELECT vec_id, cell, ccos,
       |    CAST(row_number() OVER (PARTITION BY cell
       |      ORDER BY ccos DESC, vec_id) AS INT) AS rank,
       |    count(*) OVER (PARTITION BY cell) AS cell_n
       |  FROM scored)
       |SELECT vec_id, cell, round(ccos, 4) AS centroid_cos, rank,
       |  CAST(cell_n AS BIGINT) AS cell_n,
       |  rank <= cell_n // 5 AS pruned
       |FROM ranked
       |ORDER BY vec_id""".stripMargin
  }

  // same double-widened algebra as the Spark builder: float→double is
  // lossless, so scale/round/quantize are bit-identical; checksums are
  // exact integer algebra (DuckDB list_sum widens → CAST BIGINT)
  val embeddingQuantize: String =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |m AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS maxabs
      |  FROM v),
      |q AS (
      |  SELECT vec_id, maxabs,
      |    list_transform(v, x -> CAST(round(x / (maxabs / 127.0e0)) AS INT)) AS q
      |  FROM m WHERE maxabs > 0)
      |SELECT vec_id,
      |  CAST(len(q) AS INT) AS n_dims,
      |  CAST(list_sum(q) AS BIGINT) AS q_sum,
      |  CAST(list_min(q) AS INT) AS q_min,
      |  CAST(list_max(q) AS INT) AS q_max,
      |  round(maxabs / 127.0e0, 6) AS scale
      |FROM q
      |ORDER BY vec_id""".stripMargin
}
