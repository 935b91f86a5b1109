package graft.operators

import graft.SparkSpec

class VideoSpec extends SparkSpec {

  test("GVID container round-trips every frame through the real codec") {
    for (id <- Seq(0L, 7L, 12L)) {
      val (nf, seed) = Video.paramsFor(id)
      val (gotN, frames) = Video.sampleFrames(Video.encodeVideo(id), 1)
      assert(gotN === nf && frames.length === nf)
      for ((f, w, h, px) <- frames) {
        assert(w === Video.FrameW && h === Video.FrameH)
        for (y <- 0 until h; x <- 0 until w)
          assert(px(y * w + x) === Video.framePixel(seed, f, x, y),
                 s"id=$id frame=$f pixel ($x,$y)")
      }
    }
  }

  test("sampleFrames decodes only every stride-th frame") {
    val id = 5L // group 1: 12 frames
    val (nf, frames) = Video.sampleFrames(Video.encodeVideo(id), 4)
    assert(nf === 12)
    assert(frames.map(_._1) === Seq(0, 4, 8))
  }

  test("sampleFrames fails fast on a bad container") {
    val e = intercept[IllegalArgumentException] {
      Video.sampleFrames("NOPE".getBytes ++ new Array[Byte](8), 1)
    }
    assert(e.getMessage.contains("bad magic"))
  }

  test("frameFeatures matches the card arithmetic end-to-end") {
    import spark.implicits._
    val docs = Seq(0L, 5L).toDF("doc_id")
    val rows = Video.frameFeatures(spark, Video.withPayload(spark, docs),
                                   stride = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
                (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    for (id <- Seq(0L, 5L)) {
      val (nf, seed) = Video.paramsFor(id)
      val sampled = (0 until nf).filter(_ % 4 == 0)
      for (f <- sampled) {
        val (gotNf, w, h, sum) = rows((id, f.toLong))
        assert(gotNf === nf.toLong && w === 16L && h === 16L)
        val expected = (for (y <- 0 until 16; x <- 0 until 16)
          yield Video.framePixel(seed, f, x, y).toLong).sum
        assert(sum === expected, s"id=$id frame=$f")
      }
      assert(rows.keys.count(_._1 == id) === sampled.length)
    }
  }

  test("videoNearDupPairs: exact dups at 0, close re-encode kept, " +
       "degraded copy surfaced but cut, foreign bases never bucket") {
    import spark.implicits._
    // groups g = id/5: ids 0,5 are groups 0,1 (base 0, DEGRADED seed
    // +25); ids 10,15 are groups 2,3 (base 1, close seed +1); id 20 is
    // group 4 (base 2, foreign); ids 0-4 one byte-identical group
    val docs = Seq(0L, 1L, 5L, 10L, 15L, 20L).toDF("doc_id")
    val all = Video.videoNearDupPairs(
        spark, Video.withDupPayload(spark, docs),
        stride = 4, vadE6Max = Long.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(all((0L, 1L)) === 0L)                       // exact duplicate
    assert(all.contains((10L, 15L)) && all((10L, 15L)) > 0L)
    assert(all((10L, 15L)) <= 8000000L)                // close re-encode
    assert(all.contains((0L, 5L)) && all((0L, 5L)) > 8000000L) // degraded
    assert(!all.keys.exists { case (a, b) => a == 20L || b == 20L })
    val kept = Video.videoNearDupPairs(
        spark, Video.withDupPayload(spark, docs),
        stride = 4, vadE6Max = 8000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((0L, 1L), (10L, 15L)))
  }

  test("sceneChanges matches a direct hash-pair re-derivation and " +
       "lands the boundary on the cut frame") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 7L, 11L)
    val docs = ids.toDF("doc_id")
    val got = Video.sceneChanges(
        spark, Video.withScenePayload(spark, docs),
        stride = 2, hammingMin = 16)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                 r.getLong(4)))
      .toMap
    for (id <- ids) {
      val (nf, cut) = Video.sceneParamsFor(id)
      val (_, frames) = Video.sampleFrames(Video.encodeSceneVideo(id), 2)
      val hashes = frames.map { case (f, w, h, px) =>
        (f, Multimodal.aHash64(w, h, px))
      }
      val bounds = hashes.sliding(2).collect {
        case Seq((_, h0), (f1, h1))
            if java.lang.Long.bitCount(h0 ^ h1) > 16 => f1
      }.toSeq
      val (gnf, gsm, gnb, gfb) = got(id)
      assert(gnf === nf.toLong && gsm === hashes.length.toLong, s"id=$id")
      assert(gnb === bounds.size.toLong, s"id=$id boundaries")
      assert(gfb === (if (bounds.isEmpty) -1L else bounds.min.toLong))
      // the fixture's pattern switch must be detected, exactly at the
      // (sampled, even) cut index — independent md5 patterns sit ~32
      // bits apart, far above the threshold
      assert(bounds.contains(cut), s"id=$id missed the cut at $cut")
    }
  }

  test("sceneChanges: an impossible threshold reports no boundaries " +
       "with first_boundary = -1") {
    import spark.implicits._
    val rows = Video.sceneChanges(
        spark, Video.withScenePayload(spark, Seq(3L, 4L).toDF("doc_id")),
        stride = 2, hammingMin = 64)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(3) === 0L)
      assert(r.getLong(4) === -1L)
    }
  }

  test("extract-once feature-table consumers match the direct decode " +
       "paths row for row") {
    import spark.implicits._
    val docs = (0L to 24L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet

    val gradF = Video.featureTable(spark, "spec-grad",
      Video.withPayload(spark, docs), stride = 4)
    assert(rows(Video.frameFeaturesFrom(gradF)) ===
           rows(Video.frameFeatures(spark, Video.withPayload(spark, docs),
                                    stride = 4)))

    val dupF = Video.featureTable(spark, "spec-dup",
      Video.withDupPayload(spark, docs), stride = 4)
    assert(rows(Video.videoNearDupPairsFrom(dupF, vadE6Max = 8000000L)) ===
           rows(Video.videoNearDupPairs(
             spark, Video.withDupPayload(spark, docs),
             stride = 4, vadE6Max = 8000000L)))

    val sceneF = Video.featureTable(spark, "spec-scene",
      Video.withScenePayload(spark, docs), stride = 2)
    assert(rows(Video.sceneChangesFrom(sceneF, hammingMin = 16)) ===
           rows(Video.sceneChanges(
             spark, Video.withScenePayload(spark, docs),
             stride = 2, hammingMin = 16)))
  }

  test("feature table builds ONCE per key per process (extract-once)") {
    import spark.implicits._
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def media = {
      builds.incrementAndGet()
      Video.withPayload(spark, (0L to 3L).toDF("doc_id"))
    }
    val n1 = Video.featureTable(spark, "spec-once", media, 4).count()
    val n2 = Video.featureTable(spark, "spec-once", media, 4).count()
    assert(n1 === n2 && n1 === 4L)
    assert(builds.get() === 1, "second call must read the store, not decode")
  }
}
