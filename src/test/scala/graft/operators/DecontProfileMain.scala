package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GoldenHash, Tables}

/** Dev-only breakdown of q_minhash_decontaminate's sf1 cost (round-21
  * triage; test scope, never shipped). Mirrors the operator's stages.
  */
object DecontProfileMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/sf1-rehearsal")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val index = t("index build")(
      Dedup.minhashIndexOf(Tables.documents(spark, d)))
    val isTest = GoldenHash.isTestDoc(col("doc_id"))
    val banded = Dedup.minhashBanded(index).withColumn("is_t", isTest)
    t("banded count")(println("banded = " + banded.count()))
    val bucket = Window.partitionBy(col("band"), col("key"))
    val byId = bucket.orderBy(col("doc_id"))
    val testId = when(col("is_t"), col("doc_id"))
    val cand0 = banded
      .withColumn("prev_t", last(testId, ignoreNulls = true)
        .over(byId.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_t", first(testId, ignoreNulls = true)
        .over(byId.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("min_t", min(testId).over(bucket))
      .filter(!col("is_t"))
      .select(col("doc_id"), col("ng"),
        explode(array_distinct(array(col("prev_t"), col("next_t"), col("min_t"))))
          .as("test_id"))
      .filter(col("test_id").isNotNull)
      .distinct()
    t("cand windows+distinct")(println("cand0 = " + cand0.count()))
    val cand = cand0
      .join(broadcast(index.filter(GoldenHash.isTestDoc(col("doc_id")))
        .select(col("doc_id").as("test_id"), size(col("grams")).as("tn"))),
        Seq("test_id"))
      .filter(Dedup.sizeRatioOk(col("ng"), col("tn")))
      .select(col("doc_id"), col("test_id"))
    t("cand sized")(println("cand = " + cand.count()))
    val grams = index.select(col("doc_id"), col("grams"))
    val gramsTest = broadcast(index.filter(GoldenHash.isTestDoc(col("doc_id")))
      .select(col("doc_id").as("test_id"), col("grams").as("gt")))
    val attached = cand.join(grams, Seq("doc_id")).join(gramsTest, Seq("test_id"))
    t("attach only")(println("pairs = " +
      attached.agg(count(lit(1)), sum(size(col("grams")))).collect()(0)))
    t("verify (gate)")(println("hits = " + attached
      .withColumn("j", graft.functions.NgramJaccardFunctions.jaccardGate(col("grams"), col("gt"), 0.5))
      .filter(col("j") >= 0.5).count()))
    t("verify again")(println("hits = " + attached
      .withColumn("j", graft.functions.NgramJaccardFunctions.jaccardGate(col("grams"), col("gt"), 0.5))
      .filter(col("j") >= 0.5).count()))
    spark.stop()
  }
}
