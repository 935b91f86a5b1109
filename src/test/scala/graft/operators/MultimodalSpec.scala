package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("PNG test card round-trips exactly through the real codec") {
    for (id <- Seq(0L, 1L, 6L, 41L, 996L, 1000L)) {
      val (w, h, seed) = Multimodal.dimsFor(id)
      val (dw, dh, sum) = Multimodal.decodeImage(Multimodal.encodePng(id))
      assert(dw === w && dh === h)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (seed + 7L * x + 13L * y) % 251).sum
      assert(sum === expected, s"pixel sum for id=$id")
    }
  }

  test("decodeImage fails fast on undecodable bytes") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array[Byte](1, 2, 3))
    }
    assert(e.getMessage.contains("undecodable"))
  }

  test("binaryFile ingestion decodes real PNG files") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("img_003.png"), Multimodal.encodePng(3L))
    Files.write(dir.resolve("img_010.png"), Multimodal.encodePng(10L))

    val feats = Multimodal.fromBinaryFiles(spark, dir.toString)
      .collect().sortBy(_.getString(0))

    assert(feats.length === 2)
    val f3 = feats(0)
    val (w3, h3, _) = Multimodal.dimsFor(3L)
    assert(f3.getString(0) === "img_003.png")
    assert(f3.getLong(2) === w3.toLong && f3.getLong(3) === h3.toLong)
    assert(f3.getLong(4) === w3.toLong * h3)
    // n_bytes is the real encoded size: present and positive
    assert(f3.getLong(1) > 0)
  }

  test("decodePixels returns the exact raster, row-major") {
    val id = 17L
    val (w, h, seed) = Multimodal.dimsFor(id)
    val (dw, dh, px) = Multimodal.decodePixels(Multimodal.encodePng(id))
    assert(dw === w && dh === h && px.length === w * h)
    for (y <- 0 until h; x <- 0 until w)
      assert(px(y * w + x) === (seed + 7L * x + 13L * y) % 251,
             s"pixel ($x,$y)")
  }

  test("aHash4 sets exactly the brighter-than-mean quadrant bits") {
    // 2x2 image, one pixel per quadrant: brightness order is the hash
    assert(Multimodal.aHash4(2, 2, Array(9L, 0L, 0L, 0L)) === 1L)   // TL
    assert(Multimodal.aHash4(2, 2, Array(0L, 9L, 0L, 9L)) === 10L)  // TR+BR
    // uniform image: no strict winner, hash 0
    assert(Multimodal.aHash4(2, 2, Array(5L, 5L, 5L, 5L)) === 0L)
    // brightness shift leaves the hash unchanged (no wraparound here)
    val base = Array(10L, 40L, 20L, 30L, 50L, 60L)
    assert(Multimodal.aHash4(3, 2, base) ===
           Multimodal.aHash4(3, 2, base.map(_ + 7L)))
  }

  test("imageNearDupPairs: identical cards pair at mad 0; verify is exact") {
    import spark.implicits._
    // ids 0 and 34895 (= lcm(7,5,997)) share (w, h, seed): identical
    // images; id 1 differs in every dimension
    val docs = Seq(0L, 34895L, 1L).toDF("doc_id")
    val got = Multimodal.imageNearDupPairs(spark, docs, madE6Max = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 34895L, 0L)))
  }

  test("extractFeatures runs the decode as one narrow pass (no shuffle)") {
    import spark.implicits._
    val docs = spark.range(0, 12).select($"id".as("doc_id"))
    val ds = Multimodal.extractFeatures(spark, docs.toDF())
    val plan = ds.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    val rows = ds.collect()
    assert(rows.length === 12)
    val r5 = rows.find(_.doc_id == 5L).get
    val (w, h, _) = Multimodal.dimsFor(5L)
    assert(r5.width === w.toLong && r5.height === h.toLong &&
           r5.n_pixels === w.toLong * h)
  }
}
