package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Response-time regression — the reference's spark.ml pipeline (M1-M7,
  * predictions/response_time_prediction.py:99-147) in Scala, with a fixed
  * seed for deterministic tests.
  *
  * Stages: 3× StringIndexer(handleInvalid=keep) → 3× OneHotEncoder →
  * VectorAssembler([categorical vecs, request_length, hour_of_day,
  * status_code]) → RandomForestRegressor(20 trees, depth 5), label
  * request_time_seconds.
  */
object ResponseTimePipeline {

  val CategoricalCols: Seq[String] = Seq("endpoint", "request_method", "country")
  val NumericCols: Seq[String] = Seq("request_length", "hour_of_day", "status_code")
  val LabelCol = "request_time_seconds"
  val Seed = 42L
  val NumTrees = 20

  /** Feature projection from the parsed+derived log frame — the
    * reference's training SQL (A4,
    * predictions/response_time_prediction.py:71-87): casts, hour of day,
    * NULL/empty country → 'UNKNOWN', non-null positive label, non-empty
    * endpoint. The reference's Python-precedence filter bug (:171,
    * SURVEY.md §0.1(4)) is fixed to the intended conjunction.
    */
  def features(parsed: DataFrame, keep: Seq[String] = Nil): DataFrame =
    parsed
      .filter(col("endpoint") =!= "" &&
        col("request_time_seconds").isNotNull && col("request_time_seconds") > 0)
      .select(keep.map(col) ++ Seq(
        col("endpoint"),
        col("request_method"),
        when(col("geoip2_country_code").isNull || col("geoip2_country_code") === "",
          lit("UNKNOWN")).otherwise(col("geoip2_country_code")).as("country"),
        expr("try_cast(request_length AS FLOAT)").as("request_length"),
        hour(col("timestamp")).as("hour_of_day"),
        col("status_code"),
        col(LabelCol)): _*)

  /** M1-M4 assembled into a Pipeline (M5). */
  def build(numTrees: Int = NumTrees, maxDepth: Int = 5): Pipeline = {
    val indexers = CategoricalCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_index")
        .setHandleInvalid("keep")
    }
    val encoders = CategoricalCols.map { c =>
      new OneHotEncoder().setInputCol(s"${c}_index").setOutputCol(s"${c}_vec")
    }
    val assembler = new VectorAssembler()
      .setInputCols((CategoricalCols.map(c => s"${c}_vec") ++ NumericCols).toArray)
      .setOutputCol("features")
      .setHandleInvalid("skip")
    val rf = new RandomForestRegressor()
      .setLabelCol(LabelCol)
      .setFeaturesCol("features")
      .setPredictionCol("predicted_time")
      .setNumTrees(numTrees)
      .setMaxDepth(maxDepth)
      .setSeed(Seed)
    new Pipeline().setStages((indexers ++ encoders ++ Seq(assembler, rf)).toArray)
  }

  /** M5 train with the reference's minimum-rows guard
    * (predictions/response_time_prediction.py:94: < 100 rows → no model).
    */
  def train(features: DataFrame, minRows: Long = 100): Option[PipelineModel] = {
    if (features.limit(minRows.toInt).count() < minRows) None
    else Some(build().fit(features))
  }

  /** M5 load-or-train (reference: load with train-on-miss fallback,
    * :181-191) and persistence (model.write.overwrite.save, :143-146).
    */
  def loadOrTrain(path: String, features: => DataFrame): Option[PipelineModel] =
    try Some(PipelineModel.load(path))
    catch {
      case _: Exception =>
        val m = train(features)
        m.foreach(_.write.overwrite().save(path))
        m
    }

  /** M6: prediction output projection + RMSE
    * (reference: :197-223 — predicted vs actual per batch).
    */
  def predict(model: PipelineModel, feats: DataFrame): DataFrame =
    model.transform(feats)
      .select(col("endpoint"), col("request_method"),
        col("predicted_time"), col(LabelCol).as("actual_time"),
        current_timestamp().as("prediction_timestamp"))

  /** M7: periodic retrain daemon (reference: background thread with
    * sleep(3600) overwriting the saved model,
    * predictions/response_time_prediction.py:265-274). Returns the
    * thread so callers (and tests) can manage its lifecycle; `periodMs`
    * is injectable for testing. Each cycle re-reads features, retrains,
    * and overwrites the persisted model.
    */
  def retrainLoop(path: String, features: () => DataFrame,
      periodMs: Long = 3600000L, cycles: Long = Long.MaxValue): Thread = {
    val t = new Thread(() => {
      var i = 0L
      while (i < cycles && !Thread.currentThread().isInterrupted) {
        try {
          train(features()).foreach(_.write.overwrite().save(path))
        } catch { case _: InterruptedException => Thread.currentThread().interrupt() }
        i += 1
        if (i < cycles) try Thread.sleep(periodMs)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      }
    }, "graft-retrain")
    t.setDaemon(true)
    t.start()
    t
  }

  def rmse(predictions: DataFrame): Double =
    new RegressionEvaluator()
      .setLabelCol("actual_time")
      .setPredictionCol("predicted_time")
      .setMetricName("rmse")
      .evaluate(predictions)
}
