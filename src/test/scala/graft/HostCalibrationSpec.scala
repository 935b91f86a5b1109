package graft

import org.scalatest.funsuite.AnyFunSuite

/** The calibration anchor's contracts: kernels deterministic (fixed
  * work, data-independent), factor algebra (1.0 at the reference,
  * geomean scaling), and JSON shape. No Spark session needed.
  */
class HostCalibrationSpec extends AnyFunSuite {

  test("mix kernel is deterministic and iteration-sensitive") {
    assert(HostCalibration.mix(42L, 10000L) ===
           HostCalibration.mix(42L, 10000L))
    assert(HostCalibration.mix(42L, 10000L) !==
           HostCalibration.mix(42L, 10001L))
    assert(HostCalibration.mix(42L, 10000L) !==
           HostCalibration.mix(43L, 10000L))
  }

  test("memSum is an exact stripe sum, pass-multiplied") {
    val a = Array.tabulate(100)(_.toLong)
    assert(HostCalibration.memSum(a, 10, 20, 1) === (10L until 20L).sum)
    assert(HostCalibration.memSum(a, 0, 100, 3) === 3L * (0L until 100L).sum)
  }

  test("factor is 1.0 at the committed reference and geomean-scales") {
    val ref = HostCalibration.Point(
      HostCalibration.RefStArithMops, HostCalibration.RefMtArithMops,
      HostCalibration.RefMemGBps)
    assert(math.abs(ref.factor - 1.0) < 1e-12)
    val half = HostCalibration.Point(
      HostCalibration.RefStArithMops / 2,
      HostCalibration.RefMtArithMops / 2, HostCalibration.RefMemGBps / 2)
    assert(math.abs(half.factor - 0.5) < 1e-12)
    // one axis at half, two at ref: geomean = (1/2)^(1/3)
    val oneAxis = ref.copy(memGBps = HostCalibration.RefMemGBps / 2)
    assert(math.abs(oneAxis.factor - math.cbrt(0.5)) < 1e-12)
  }

  test("point JSON carries the four fields") {
    val j = HostCalibration.Point(100.0, 1000.0, 10.0).json
    for (k <- Seq("st_arith_mops", "mt_arith_mops", "mem_gbps", "factor"))
      assert(j.contains(s""""$k":"""), j)
  }

  test("probe thread count is pinned to the 32-thread reference shape") {
    assert(HostCalibration.RefThreads === 32)
    assert(HostCalibration.defaultThreads <= 32)
  }
}
