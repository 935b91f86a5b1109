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
