package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binaryFile ingestion feeds the feature extractor") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.bin"), Array.tabulate[Byte](64)(_.toByte))
    Files.write(dir.resolve("b.bin"), Array[Byte](1, 2, 3))

    val feats = Multimodal.fromBinaryFiles(spark, dir.toString,
        width = 32, height = 16)
      .collect().sortBy(_.n_bytes)

    assert(feats.length === 2)
    val small = feats(0)
    assert(small.n_bytes === 3)
    assert(small.checksum16 === 1 + 2 + 3) // whole payload shorter than 16
    val big = feats(1)
    assert(big.n_bytes === 64)
    assert(big.checksum16 === (0 until 16).sum) // first 16 bytes only
    assert(big.n_pixels === 32L * 16 * 3)
    assert(feats.map(_.doc_id).distinct.length === 2, "path-derived ids unique")
  }

  test("payload bytes round-trip the stub decode deterministically") {
    val r = Multimodal.MediaRow(7L, "hello".getBytes("UTF-8"), 8, 4, 3)
    val f1 = Multimodal.decodeStub(r)
    val f2 = Multimodal.decodeStub(r)
    assert(f1 === f2)
    assert(f1.n_bytes === 5 && f1.doc_id === 7L)
  }
}
