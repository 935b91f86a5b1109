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
    val got = Multimodal.imageNearDupPairs(
        spark, Multimodal.withPayload(spark, docs), madE6Max = 0L,
        hashBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 34895L, 0L)))
  }

  test("aHash64: 8x8 grid bits follow block mean vs image mean exactly") {
    // 16x16 card, exact 2x2 blocks: make block (bx, by) = (0, 0) hot
    val w = 16; val h = 16
    val hot = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      if (x < 2 && y < 2) 255L else 0L
    }
    assert(Multimodal.aHash64(w, h, hot) === 1L) // only bit 0 set
    // uniform: no strict winner anywhere
    assert(Multimodal.aHash64(w, h, Array.fill(w * h)(7L)) === 0L)
    // brightest block = bottom-right -> bit 63 (the sign bit, still a
    // valid opaque bucket key)
    val br = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      if (x >= 14 && y >= 14) 255L else 0L
    }
    assert(Multimodal.aHash64(w, h, br) === Long.MinValue)
    // brightness shift leaves the hash unchanged (no wraparound)
    val base = Array.tabulate(w * h)(i => (i % 97).toLong)
    assert(Multimodal.aHash64(w, h, base) ===
           Multimodal.aHash64(w, h, base.map(_ + 11L)))
    // degenerate grid fails fast
    intercept[IllegalArgumentException] {
      Multimodal.aHash64(4, 4, Array.fill(16)(0L))
    }
  }

  test("aHash64 separates same-dimension cards the 4-bit hash lumps together") {
    import spark.implicits._
    // 40 same-size cards with distinct gradients: (w, h) is useless as
    // a key, and the 4-bit hash collapses them into <= 16 buckets; the
    // 64-bit grid hash must give (near-)distinct keys so candidates
    // stay bucket-bound. madE6Max huge => output = candidate pairs.
    val cards = spark.range(40L).as[Long].map { id =>
      Multimodal.MediaRow(id, Multimodal.encodeCard(32, 32, (x, y) =>
        (((id % 251) + (1 + id % 15) * x + (1 + id % 13) * y)
          % 251).toInt))
    }
    val c4 = Multimodal.imageNearDupPairs(spark, cards,
               madE6Max = 1000000000L, hashBits = 4).count()
    val c64 = Multimodal.imageNearDupPairs(spark, cards,
                madE6Max = 1000000000L, hashBits = 64).count()
    assert(c4 >= 40L, s"expected heavy 4-bit collision load, got $c4")
    assert(c64 < c4 / 10,
      s"64-bit hash should be ~collision-free here: c64=$c64 c4=$c4")
  }

  test("grid cards: ids 18k+j / 18k+j+9 (j<9) are exact duplicates") {
    // the q144 fixture's duplicate structure, asserted at the byte level
    assert(Multimodal.dimsGridFor(3L) === Multimodal.dimsGridFor(12L))
    assert(Multimodal.encodePngGrid(3L).toSeq ===
           Multimodal.encodePngGrid(12L).toSeq)
    // 18 apart: same dims, seed differs by 1 -> near but NOT identical
    assert(Multimodal.dimsGridFor(3L)._1 === Multimodal.dimsGridFor(21L)._1)
    assert(Multimodal.dimsGridFor(3L)._2 === Multimodal.dimsGridFor(21L)._2)
    assert(Multimodal.encodePngGrid(3L).toSeq !==
           Multimodal.encodePngGrid(21L).toSeq)
    // every grid card is >= 16x16 (aHash64 non-degenerate)
    (0L until 60L).foreach { id =>
      val (w, h, _) = Multimodal.dimsGridFor(id)
      assert(w >= 16 && h >= 16)
    }
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

  test("extract-once image pairs match the direct decode path (both " +
       "hash widths, matching families)") {
    import spark.implicits._
    val docs = (0L to 24L).toDF("doc_id")
    // 4-bit parity on the basic family (has sub-8x8 cards, like q145)
    val feats4 = Multimodal.featureTable(spark, "spec-png",
      Multimodal.withPayload(spark, docs))
    val direct4 = Multimodal.imageNearDupPairs(
        spark, Multimodal.withPayload(spark, docs),
        madE6Max = 15000000L, hashBits = 4)
      .collect().map(_.toString).toSet
    val stored4 = Multimodal.imageNearDupPairsFrom(
        feats4, madE6Max = 15000000L, hashBits = 4)
      .collect().map(_.toString).toSet
    assert(stored4 === direct4)
    // 64-bit parity on the grid family (all >= 8x8, like q144)
    val feats64 = Multimodal.featureTable(spark, "spec-png-grid",
      Multimodal.withGridPayload(spark, docs))
    val direct64 = Multimodal.imageNearDupPairs(
        spark, Multimodal.withGridPayload(spark, docs),
        madE6Max = 15000000L, hashBits = 64)
      .collect().map(_.toString).toSet
    val stored64 = Multimodal.imageNearDupPairsFrom(
        feats64, madE6Max = 15000000L, hashBits = 64)
      .collect().map(_.toString).toSet
    assert(stored64 === direct64)
    // a 64-bit consumer over the small-image family fails fast, like
    // the direct path's aHash64 require
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairsFrom(feats4, madE6Max = 1L,
                                       hashBits = 64)
    }
  }
}
