package graft

import org.apache.spark.sql.functions._
import graft.ml.ResponseTimePipeline

class MlSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic features with a learnable signal:
    * response time ≈ base(endpoint) + 0.001*hour, tiny deterministic
    * noise.
    */
  private lazy val feats = {
    val endpoints = Seq("users", "orders", "search")
    val rows = for {
      i <- 0 until 600
    } yield {
      val ep = endpoints(i % 3)
      val base = (i % 3 + 1) * 0.1
      val hour = i % 24
      val rt = base + hour * 0.001 + (i % 7) * 1e-4
      (ep, "GET", "IN", 512.0f, hour, 200, rt)
    }
    rows.toDF("endpoint", "request_method", "country",
      "request_length", "hour_of_day", "status_code", "request_time_seconds")
  }

  test("pipeline trains, predicts with low RMSE, and save/load round-trips") {
    val model = ResponseTimePipeline.train(feats).get
    val preds = ResponseTimePipeline.predict(model, feats)
    val err = ResponseTimePipeline.rmse(preds)
    assert(err < 0.05, s"rmse=$err")

    val path = java.nio.file.Files.createTempDirectory("graft-model").toString + "/m"
    model.write.overwrite().save(path)
    val reloaded = org.apache.spark.ml.PipelineModel.load(path)
    val again = ResponseTimePipeline.rmse(ResponseTimePipeline.predict(reloaded, feats))
    assert(math.abs(again - err) < 1e-12)
  }

  test("fixed-seed golden predictions pin exact doubles (drift tripwire)") {
    // A seeded RandomForest on a deterministic frame is bit-reproducible
    // on a fixed Spark version; these exact doubles catch SILENT drift
    // (Spark upgrade, default-param change, indexer-order change) that
    // the RMSE bound above would absorb. Regenerate deliberately via
    // `Test/runMain graft.GoldenPinMain` when the pipeline, the fixture
    // frame, or the Spark version changes on purpose.
    val golden = Seq(
      ("users", 0, 0.13564837570051450),
      ("orders", 1, 0.21275315620149388),
      ("search", 2, 0.28018372845829637),
      ("users", 3, 0.13626827038915917),
      ("orders", 4, 0.21290611916445684))
    val model = ResponseTimePipeline.train(feats).get
    val got = model.transform(feats.limit(5))
      .select(col("endpoint"), col("hour_of_day"), col("predicted_time"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    assert(got == golden, s"golden prediction drift:\n got=$got\n exp=$golden")
  }

  test("training guard: under 100 rows yields no model") {
    assert(ResponseTimePipeline.train(feats.limit(50)).isEmpty)
  }

  test("loadOrTrain trains on miss then loads on hit") {
    val path = java.nio.file.Files.createTempDirectory("graft-model2").toString + "/m"
    val m1 = ResponseTimePipeline.loadOrTrain(path, feats)
    assert(m1.nonEmpty)
    val m2 = ResponseTimePipeline.loadOrTrain(path,
      sys.error("should not retrain on hit"))
    assert(m2.nonEmpty)
  }

  test("retrain loop overwrites the persisted model each cycle") {
    val path = java.nio.file.Files.createTempDirectory("graft-model3").toString + "/m"
    val t = ResponseTimePipeline.retrainLoop(path, () => feats, periodMs = 10, cycles = 1)
    t.join(120000)
    assert(!t.isAlive)
    val m = org.apache.spark.ml.PipelineModel.load(path)
    assert(ResponseTimePipeline.rmse(ResponseTimePipeline.predict(m, feats)) < 0.05)
  }

  test("feature projection applies UNKNOWN-country default and filters") {
    val parsed = Seq(
      ("users", "GET", null.asInstanceOf[String], "512", 200, 0.1, "2025-07-25T10:00:00+00:00"),
      ("", "GET", "US", "100", 200, 0.2, "2025-07-25T10:00:00+00:00"),      // empty endpoint → dropped
      ("orders", "POST", "", "256", 500, -1.0, "2025-07-25T10:00:00+00:00") // non-positive label → dropped
    ).toDF("endpoint", "request_method", "geoip2_country_code",
      "request_length", "status_code", "request_time_seconds", "time_iso8601")
      .withColumn("timestamp", to_timestamp(col("time_iso8601")))
    val out = ResponseTimePipeline.features(parsed).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("country") == "UNKNOWN")
    assert(out.head.getAs[Int]("hour_of_day") == 10)
  }
}
