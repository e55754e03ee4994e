package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native dot/cosine match the higher-order-function formulation") {
    VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.0, 2.5), Array(-2.0, 0.0, 1.0)))
      .toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)").as("dot_hof"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12)
    }
    val first = got.head
    assert(math.abs(first.getDouble(0) - 32.0) < 1e-12)
  }

  test("LSH near-dup finds a planted near-duplicate pair") {
    // plant two nearly-parallel vectors among noise written as an
    // embeddings table; sign-LSH must co-bucket them.
    val dim = 64
    def vec(seed: Long, jitter: Double): Array[Float] =
      Array.tabulate(dim) { j =>
        val base = math.sin(seed * 7919.0 + j * 13.37)
        (base + jitter * math.cos(j * 3.1)).toFloat
      }
    val rows =
      Seq((0L, vec(1, 0.0), 0), (1L, vec(1, 0.02), 0)) ++ // near-parallel pair
        (2L to 40L).map(i => (i, vec(i * 100 + 7, 0.0), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val pairs = Similarity.lshNearDup(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"planted pair not found; got $pairs")
  }

  test("IVF topk achieves high recall vs brute force on the fixture") {
    val exact = graft.operators.Similarity.bruteTopK(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = graft.operators.Similarity.ivfTopK(spark, sf)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall exact=$exact ivf=$ivf")
  }

  test("brute-force topk ranks the planted duplicate first") {
    val dim = 64
    def vec(seed: Long, jitter: Double): Array[Float] =
      Array.tabulate(dim) { j =>
        (math.sin(seed * 7919.0 + j * 13.37) + jitter * math.cos(j)).toFloat
      }
    val rows =
      Seq((0L, vec(1, 0.0), 0), (99L, vec(1, 0.01), 0)) ++
        (2L to 30L).map(i => (i, vec(i * 31 + 5, 0.0), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft-topk").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = Similarity.bruteTopK(spark, dir)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .select("vec_id").as[Long].collect()
    assert(top.sameElements(Array(99L)))
  }
}
