package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.AnnMaintain

/** Dev tool (not a test): sweeps drift-offset magnitudes and prints the
  * frozen-vs-rebuilt cell spread and nprobe=1 recall for the drifted
  * batch — the empirical basis for the offset pinned in
  * [[AnnMaintainSpec]]'s drift→rebuild test.
  *
  * Run: `sbt "Test/runMain graft.DriftProbeMain 0.2 0.35 0.5 0.8"`.
  */
object DriftProbeMain {
  def main(args: Array[String]): Unit = {
    val offsets = if (args.isEmpty) Seq(0.2, 0.35, 0.5, 0.8) else args.toSeq.map(_.toDouble)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val isDelta = GoldenHash.bucket(col("vec_id"), 20) === 7
    val atRest = e.filter(!isDelta).persist()
    val fz = AnnMaintain.fitQuantizers(atRest)
    val cdfFrozen = spark.createDataFrame(fz.centroids).toDF("cell", "centroid")

    def cosCol: org.apache.spark.sql.Column = expr(
      "aggregate(zip_with(qv, v, (x,y) -> x*y), 0D, (a,x) -> a+x) / " +
        "(sqrt(aggregate(qv, 0D, (a,x)->a+x*x)) * sqrt(aggregate(v, 0D, (a,x)->a+x*x)))")

    offsets.foreach { off =>
      val drifted = e.filter(isDelta)
        .select(col("vec_id"), expr(s"transform(v, x -> x + ${off}d)").as("v"))
      val driftA = drifted.filter(floor(col("vec_id") / 20) % 2 === 0)
      val driftB = drifted.filter(floor(col("vec_id") / 20) % 2 === 1)
      val union = atRest.union(driftA)
      val spreadF = AnnMaintain.assignCells(driftA, cdfFrozen)
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val fz2 = AnnMaintain.fitQuantizers(union)
      val cdfNew = spark.createDataFrame(fz2.centroids).toDF("cell", "centroid")
      val spreadN = AnnMaintain.assignCells(driftA, cdfNew)
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val q = driftB.orderBy(col("vec_id")).limit(5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val exact = union.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(round(col("cos"), 9).desc, col("vec_id"))))
        .filter(col("rank") <= 3).select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def recall1(cdf: DataFrame): Int = {
        val assigned = AnnMaintain.assignCells(union, cdf)
          .select(col("vec_id"), col("v"), col("cell"))
        val probes = q.crossJoin(broadcast(cdf))
          .withColumn("d2", expr(
            "aggregate(zip_with(qv, centroid, (x,y) -> (x-y)*(x-y)), 0D, (a,x) -> a+x)"))
          .withColumn("crank", row_number().over(
            Window.partitionBy(col("query_id")).orderBy(round(col("d2"), 9).asc, col("cell"))))
          .filter(col("crank") === 1).select(col("query_id"), col("qv"), col("cell"))
        assigned.join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos", cosCol)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("query_id")).orderBy(round(col("cos"), 9).desc, col("vec_id"))))
          .filter(col("rank") <= 3).select(col("query_id"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .count { case (qid, vid) => exact(qid)(vid) }
      }
      println(s"DBG off=$off spreadFrozen=$spreadF spreadNew=$spreadN " +
        s"recallFrozen=${recall1(cdfFrozen)} recallNew=${recall1(cdfNew)}")
    }
    spark.stop()
  }
}
