package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every headline query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is warmed once at sf0.001 before timing — that absorbs
  * JVM/codegen/parquet-footer warmup into the warmup pass so the timed
  * numbers measure steady-state query execution, not first-touch
  * class-loading (which was ~6 s on whichever query happened to run
  * first).
  *
  * The JSON goes to stdout AND to `bench_out.json` in the working
  * directory. The file carries the FULL per-query map; the stdout line
  * is a COMPACT record (total + the slowest 25 queries at 3 decimals)
  * because the driver captures only the last ~2000 chars of stdout and
  * sbt's trailing `[success]` line eats ~75 of them: rounds 6-7 grew
  * the full map past the window and the driver recorded `parsed: null`
  * (r4/r5, with fewer queries, parsed fine — VERDICT r7 item 3). The
  * compact line stays parseable at any future query count; per-query
  * history lives in the committed bench_out.json.
  *
  * Optional args are query names: `runMain graft.Bench q_log_ingest`
  * times only those (dev loop); no args = full suite (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.util.control.NonFatal
    val qs =
      if (args.isEmpty) SparkEntry.benchQueries
      else SparkEntry.benchQueries.filter { case (n, _) => args.contains(n) }
    qs.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case NonFatal(_) => () }
    }

    // min of two timed runs per query: the machine is shared and single
    // runs vary ±30%; the minimum is the stable estimate of what the
    // query actually costs. Errors are RECORDED, not swallowed silently
    // — an erroring query reports time null and contributes nothing to
    // the total, so the headline can't silently understate. Fatal JVM
    // errors (OOM etc.) propagate: NonFatal only.
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = qs.map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case NonFatal(_) => errors += name; None }
      }
      name -> (if (times.nonEmpty) Some(times.min) else None)
    }
    def fmt(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def qJson(m: Seq[(String, Option[Double])]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v.fold("null")(fmt) }
        .mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.flatten.sum
    def line(qs: String, extra: String): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,$extra"errors":$errJson,"sf":"$sfDir"}"""

    val full = line(qJson(results.toSeq), s""""n_queries":${results.size},""")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val slowest = results.toSeq.sortBy(-_._2.getOrElse(0.0)).take(25)
    println(line(qJson(slowest),
      s""""n_queries":${results.size},"queries_shown":${slowest.size},"full_record":"bench_out.json","""))
    spark.stop()
  }
}
