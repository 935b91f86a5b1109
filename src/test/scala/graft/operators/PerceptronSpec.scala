package graft.operators

import graft.SparkSpec

/** Contracts of [[Classification.batchPerceptron]]: the exact epoch-1
  * all-misclassified start, convergence to zero mistakes on separable
  * data, partitioning-independence of the trajectory, and the loud
  * overflow guard.
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed trajectory on separable data; converged epoch " +
       "keeps weights") {
    val df = Seq((1L, 1L, 2L), (-1L, 1L, -3L)).toDF("y", "x0", "x1")
    val got = Classification.batchPerceptron(df, "y", Seq("x0", "x1"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
                           r.getLong(2), r.getLong(3)))
    // epoch 1: w=0 -> both mis; g = (1*1 + -1*1, 1*2 + -1*(-3)) = (0,5)
    assert(got(0) == (1L, 2L, 0L, 5L))
    // epoch 2: margins 10 and -15 -> both correct; weights unchanged
    assert(got(1) == (2L, 0L, 0L, 5L))
    assert(got(2) == (3L, 0L, 0L, 5L))
  }

  test("trajectory is partitioning-independent (sum-form updates)") {
    val rows = (1L to 97L).map(i =>
      (if (i % 3 == 0) 1L else -1L, 1L, i % 7, (i * i) % 11))
    val a = Classification.batchPerceptron(
      rows.toDF("y", "x0", "x1", "x2").repartition(1),
      "y", Seq("x0", "x1", "x2"), 4).collect().map(_.toSeq)
    val b = Classification.batchPerceptron(
      rows.toDF("y", "x0", "x1", "x2").repartition(13),
      "y", Seq("x0", "x1", "x2"), 4).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("weights past 1e15 fail loudly, not silently") {
    val df = Seq((1L, 2000000000000000L)).toDF("y", "x0")
    val e = intercept[IllegalArgumentException] {
      Classification.batchPerceptron(df, "y", Seq("x0"), 1)
    }
    assert(e.getMessage.contains("rescale"))
  }
}
