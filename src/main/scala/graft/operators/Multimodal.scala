package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. At rest this
  * is a parquet BINARY column beside its metadata — the idiomatic Spark
  * shape for images/audio/video at 100 TB (payloads stay columnar and
  * compressed; metadata predicates prune without touching bytes).
  */
case class MediaRecord(
    media_id: Long,
    kind: String,          // "image" | "audio" | "video"
    uri: String,
    bytes: Array[Byte],
    width: Int,            // metadata as produced upstream; 0 = unknown
    height: Int,
    duration_ms: Long)

/** Extracted features per media item. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    content_hash: Long,
    decoded_width: Int,
    decoded_height: Int,
    n_frames_sampled: Int,
    feature: Array[Float])

/** Multimodal-column operators: decode / feature-extract / resize /
  * frame-sample over opaque BINARY columns.
  *
  * The Spark-side plumbing — schema, partition-parallel batch iteration,
  * typed output — is real and tested. The codec itself is STUBBED with a
  * deterministic fake (`StubCodec`): image/audio decoding libraries are
  * not available in this environment, and a real deployment would swap
  * `StubCodec` for JNI/javacpp bindings without touching the pipeline.
  * `mapPartitions` is the Scala analogue of PySpark's `mapInPandas`
  * batch-UDF shape: one iterator per partition, so per-partition codec
  * init (the expensive part of real decoders) is paid once, not per row.
  */
object Multimodal {

  /** STUB: deterministic fake decoder. A real implementation decodes
    * `bytes` with an image/audio codec; this derives plausible,
    * deterministic values from the payload so the pipeline around it is
    * fully exercisable.
    */
  object StubCodec {
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
    /** "Decode" → (width, height) pretend-parsed from the payload. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = contentHash(bytes)
      (64 + (math.abs(h) % 512).toInt, 64 + (math.abs(h >> 9) % 512).toInt)
    }
    /** "Feature-extract" → fixed-width embedding from payload bytes. */
    def embed(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table (distributed generation via
    * spark.range — no driver-side data).
    */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      // payload: small deterministic byte pattern per id
      val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 17) % 251).toByte)
      MediaRecord(i, kind, s"synthetic://$kind/$i", bytes, 0, 0, if (kind == "image") 0L else 1000L + i)
    }
  }

  /** decode + feature-extract + frame-sample in one partition-parallel
    * pass. Frame sampling: every `frameStride`-th frame of the payload's
    * pretend frame sequence (videos only; images sample 1).
    */
  def extractFeatures(media: Dataset[MediaRecord], frameStride: Int = 10): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (paid once per partition)
      it.map { m =>
        val (w, h) = StubCodec.decodeDims(m.bytes)
        val nFrames = if (m.kind == "video") (m.duration_ms / 1000L).toInt.max(1) else 1
        MediaFeatures(
          media_id = m.media_id,
          kind = m.kind,
          n_bytes = m.bytes.length.toLong,
          content_hash = StubCodec.contentHash(m.bytes),
          decoded_width = w,
          decoded_height = h,
          n_frames_sampled = 1 + (nFrames - 1) / frameStride,
          feature = StubCodec.embed(m.bytes))
      }
    }
  }

  /** "Resize" projection: recompute target dims preserving aspect ratio —
    * metadata-only here (a real codec writes new payloads); shows the
    * binary column flowing through a projection untouched.
    */
  def resizePlan(features: DataFrame, maxSide: Int = 256): DataFrame =
    features.withColumn("scale",
        least(lit(maxSide) / col("decoded_width"), lit(maxSide) / col("decoded_height"), lit(1.0)))
      .withColumn("target_width", ceil(col("decoded_width") * col("scale")).cast("int"))
      .withColumn("target_height", ceil(col("decoded_height") * col("scale")).cast("int"))
      .drop("scale")

  /** Rows-only query entry: synthetic corpus → features → resize plan →
    * per-kind rollup. Exercises the full multimodal plumbing
    * (binary payloads, mapPartitions batch shape, typed Encoders,
    * metadata rollup) with deterministic output.
    */
  def mediaPipeline(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(syntheticMedia(s, 300)).toDF()
    resizePlan(feats)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("decoded_width")), 4).as("avg_width"),
        round(avg(col("target_width")), 4).as("avg_target_width"),
        sum(col("n_frames_sampled")).as("total_frames"))
      .orderBy(col("kind"))
  }

  val defs: Map[String, graft.QueryDef] = Map(
    "q_media_pipeline" -> graft.QueryDef(mediaPipeline, None))
}
