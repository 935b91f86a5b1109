package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * The kernel is [[DotFloat]], a codegen'd Catalyst expression (a tight
  * primitive loop inside whole-stage codegen — the interpreted
  * `aggregate`/`zip_with` HOF form it replaced was the bench bottleneck on
  * pairwise similarity).
  *
  * Arithmetic discipline: every element is cast to double FIRST and
  * accumulation is strictly left-to-right — the exact order an external SQL
  * oracle (`list_sum(list_transform(...))`) uses, so cosine values are
  * bit-identical across engines and can be compared exactly after
  * floor-scaling.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    GraftColumns.column(DotFloat(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Squared L2 norm = dot(a, a): identical fold order to the oracle's
    * `list_sum(list_transform(range(n), i -> a[i+1]::DOUBLE * a[i+1]::DOUBLE))`.
    */
  def norm2(a: Column): Column = dot(a, a)

  /** cosine(a,b) = dot/(sqrt(|a|²)·sqrt(|b|²)) — formula shape matters:
    * keep it identical to the oracle's.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Floor-scale a similarity to an exact integer (×10^6). */
  def e6(c: Column): Column = floor(c * 1000000L).cast("long")

  /** Signed projection of `vec` onto deterministic integer hyperplane `p`
    * (weights w(p,d) = ((k ⊻ (k ≫ 5)) mod 7) − 3 with k = p·7919 +
    * d·104729): the random-hyperplane LSH bit. Integer weights keep the
    * oracle replicable without a shared RNG; the xor-shift mix is what
    * makes planes DISTINCT in p — any pure polynomial in (p, d) is
    * periodic in p modulo 7 (the mod distributes over it), which
    * silently caps the whole family at 7 distinct hyperplanes and makes
    * extra LSH tables no-ops (measured: recall saturated at 0.617 no
    * matter how many tables — the round-6 sweep caught it). The weight
    * vector is materialized as a float literal (ints in [−3,3] are exact
    * in float) so the projection is a single [[DotFloat]] with the same
    * cast-then-multiply, left-to-right double arithmetic as the oracle's
    * `list_sum(list_transform(...))`.
    */
  def planeDot(vec: Column, p: Int, dims: Int): Column = {
    val w = Array.tabulate(dims) { d =>
      val k = p.toLong * 7919L + d.toLong * 104729L
      val m = k ^ (k >>> 5)
      ((m % 7) - 3).toFloat
    }
    dot(vec, typedlit(w))
  }
}
