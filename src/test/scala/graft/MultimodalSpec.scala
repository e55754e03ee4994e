package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media pipeline: binary payloads -> features -> resize -> rollup") {
    val out = Multimodal.mediaPipeline(spark, sf).collect()
    assert(out.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(out.map(_.getAs[Long]("n_items")).sum == 300)
    // every image AND audio row decoded through its REAL codec
    // (ImageIO / AudioSystem); video has no JDK codec — none decode
    val byKind = out.map(r => r.getAs[String]("kind") ->
      (r.getAs[Long]("n_items"), r.getAs[Long]("n_real_decoded"))).toMap
    assert(byKind("image")._1 == byKind("image")._2, s"stub fallback hit for images: $byKind")
    assert(byKind("audio")._1 == byKind("audio")._2, s"stub fallback hit for audio: $byKind")
    assert(byKind("video")._2 == 0)
  }

  test("ImageIO decodes a real PNG's true width/height and pixel histogram") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val images = Multimodal.extractFeatures(media).collect().filter(_.kind == "image")
    assert(images.nonEmpty)
    // metadata carries the generator's true dims; decode must agree exactly
    val meta = media.collect().map(m => m.media_id -> (m.width, m.height)).toMap
    images.foreach { f =>
      assert(f.decoded_real, s"image ${f.media_id} fell back to the stub codec")
      assert((f.decoded_width, f.decoded_height) == meta(f.media_id),
        s"decoded dims ${(f.decoded_width, f.decoded_height)} != generated ${meta(f.media_id)}")
      // luminance histogram: non-negative bins summing to 1 over real pixels
      assert(f.feature.forall(_ >= 0f))
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, s"histogram sum ${f.feature.sum}")
    }
  }

  test("AudioSystem decodes a real WAV's true sample rate, duration and amplitude histogram") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val audios = Multimodal.extractFeatures(media).collect().filter(_.kind == "audio")
    assert(audios.nonEmpty)
    // metadata carries the generator's TRUE duration (n_samples/8 ms);
    // the decoded frame-count duration must agree exactly
    val meta = media.collect().map(m => m.media_id -> m.duration_ms).toMap
    audios.foreach { f =>
      assert(f.decoded_real, s"audio ${f.media_id} fell back to the stub codec")
      assert(f.decoded_width == 8000, s"sample rate ${f.decoded_width}")
      assert(f.decoded_height == 1, s"channels ${f.decoded_height}")
      assert(f.decoded_duration_ms == meta(f.media_id),
        s"decoded duration ${f.decoded_duration_ms} != true ${meta(f.media_id)}")
      // amplitude histogram: non-negative bins summing to 1 over real samples
      assert(f.feature.forall(_ >= 0f))
      assert(math.abs(f.feature.sum - 1.0f) < 1e-3, s"histogram sum ${f.feature.sum}")
    }
    // the seeded waveform spans the amplitude range — a decode that
    // misparsed sample bytes (endianness, offset) would pile into few bins
    assert(audios.head.feature.count(_ > 0f) >= 6, audios.head.feature.mkString(","))
  }

  test("undecodable audio bytes fall back to the stub codec, loudly flagged") {
    import spark.implicits._
    val garbage = Seq(
      graft.operators.MediaRecord(0L, "audio", "synthetic://audio/bad",
        Array.tabulate[Byte](32)(_.toByte), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(garbage).collect().head
    assert(!f.decoded_real)
    assert(f.decoded_duration_ms == 0L)
  }

  test("undecodable image bytes fall back to the stub codec, loudly flagged") {
    import spark.implicits._
    val garbage = Seq(
      graft.operators.MediaRecord(0L, "image", "synthetic://image/bad",
        Array.tabulate[Byte](32)(_.toByte), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(garbage).collect().head
    assert(!f.decoded_real)
    assert(f.decoded_width >= 64) // stub's deterministic fake dims
  }

  test("feature extraction is deterministic and correctly shaped") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.content_hash).sameElements(f2.map(_.content_hash)))
    assert(f1.forall(_.feature.length == 8))
    // videos sample multiple frames with stride; images exactly one
    assert(f1.filter(_.kind == "image").forall(_.n_frames_sampled == 1))
  }

  test("resize plan never upscales and preserves cap") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50)).toDF()
    val resized = Multimodal.resizePlan(feats, maxSide = 128)
    val bad = resized.filter(
      col("target_width") > greatest(lit(128), col("decoded_width")) ||
        col("target_height") > greatest(lit(128), col("decoded_height")))
    assert(bad.isEmpty)
  }

  test("perceptual-hash near-dup catches every planted visual duplicate") {
    import spark.implicits._
    val pairs = Multimodal.imageNearDup(spark, sf)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    // every planted copy (id base+10000, one-pixel nudge) must pair
    // with its base — a one-pixel change moves at most a couple of
    // aHash cells, well inside the hamming<=3 verification
    val planted = (0L until 120L by 3).map(i => (i, i + 10000L)).toSet
    // star edges route through the bucket min: accept TRANSITIVE
    // connectivity over verified edges as evidence (union-find), the
    // same standard the LSH cluster spec uses
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val missed = planted.filterNot { case (a, b) => find(a) == find(b) }
    assert(missed.isEmpty, s"planted dups not caught: $missed")
    // precision: every emitted pair really is within hamming 3 (the
    // verification is part of the plan; assert it held)
    val bad = Multimodal.imageNearDup(spark, sf)
      .filter(col("hamming") > 3).count()
    assert(bad == 0)
  }

  test("energy-fingerprint near-dup catches every planted audio duplicate") {
    import spark.implicits._
    val pairs = Multimodal.audioNearDup(spark, sf)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    // every planted copy (id base+10000, one-sample nudge) must connect
    // to its base through verified edges — same union-find standard as
    // the image spec
    val planted = (0L until 120L by 3).map(i => (i, i + 10000L)).toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val missed = planted.filterNot { case (a, b) => find(a) == find(b) }
    assert(missed.isEmpty, s"planted audio dups not caught: $missed")
    val bad = Multimodal.audioNearDup(spark, sf)
      .filter(col("hamming") > 3).count()
    assert(bad == 0)
    // the fingerprint really comes from decoded samples: distinct
    // seeded tracks have distinct hashes (no degenerate all-equal hash
    // making "near-dup" vacuous)
    val hashed = Multimodal.syntheticAudioWithDups(spark, 120)
      .mapPartitions(it => it.flatMap(m =>
        graft.operators.Multimodal.AudioCodec.aHash(m.bytes).map(h => (m.media_id, h))))
      .collect().toMap
    assert(hashed.values.toSet.size > 30, s"degenerate hashes: ${hashed.values.toSet.size}")
  }

  test("multimodal assembly: ordered segments, dup-flagged media excluded") {
    val segs = Multimodal.multimodalAssemble(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val byDoc = segs.groupBy(_._1)

    // seq is the dense 1-based per-doc position, in emitted order
    byDoc.foreach { case (doc, ss) =>
      assert(ss.map(_._2).sorted.toSeq == (1 to ss.length),
        s"doc $doc seq not dense: ${ss.map(_._2).sorted.take(5).toSeq}…")
    }

    // text segments replay the doc's chunk windows IN OFFSET ORDER
    val docsText = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    byDoc.foreach { case (doc, ss) =>
      val gotChunks = ss.sortBy(_._2).filter(_._3 == "text").map(_._4).toSeq
      val t = docsText(doc)
      val expected = (0 to (t.length - 1) / 100).map(i => t.slice(i * 100, i * 100 + 150))
      assert(gotChunks == expected, s"doc $doc text chunks out of order")
    }

    // media interleave: per doc, media segments are (kind, media_id)-
    // ascending, and media rank r sits directly after text chunk r when
    // that chunk exists (the slot contract)
    byDoc.foreach { case (doc, ss) =>
      val ordered = ss.sortBy(_._2)
      val media = ordered.filter(_._3 != "text")
      val keys = media.map(m => (m._3, m._5.get))
      assert(keys.sortBy(identity).toSeq == keys.toSeq, s"doc $doc media order drifted")
      val nChunks = ordered.count(_._3 == "text")
      media.zipWithIndex.foreach { case (m, i) =>
        val rank = i + 1
        if (rank < nChunks) {
          // the segment right before media rank r must be text chunk r
          val pos = ordered.indexWhere(_._2 == m._2)
          assert(ordered(pos - 1)._3 == "text" || ordered(pos - 1)._3 < m._3,
            s"doc $doc media rank $rank not interleaved after its text chunk")
        }
      }
    }

    // every dup-flagged media id (the media_b side of a verified pair)
    // is absent, and the fixture genuinely flags some
    val imgDropped = Multimodal.imageNearDup(spark, sf)
      .select("media_b").collect().map(_.getLong(0)).toSet
    val audDropped = Multimodal.audioNearDup(spark, sf)
      .select("media_b").collect().map(_.getLong(0)).toSet
    assert(imgDropped.nonEmpty && audDropped.nonEmpty, "planted dups missing")
    val assembledImg = segs.filter(_._3 == "image").flatMap(_._5).toSet
    val assembledAud = segs.filter(_._3 == "audio").flatMap(_._5).toSet
    assert(assembledImg.intersect(imgDropped).isEmpty, "dup image assembled")
    assert(assembledAud.intersect(audDropped).isEmpty, "dup audio assembled")
    assert(assembledImg.nonEmpty && assembledAud.nonEmpty)
  }
}
