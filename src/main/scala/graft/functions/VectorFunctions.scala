package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * Catalyst expressions (codegen'd; no UDF, no UDT, no shuffle).
  *
  * Arithmetic discipline: every element is cast to double FIRST and the
  * accumulation is the sequential left-to-right fold of `aggregate` — the
  * exact order an external SQL oracle (`list_sum(list_transform(...))`)
  * uses, so cosine values are bit-identical across engines and can be
  * compared exactly after floor-scaling.
  */
object VectorFunctions {

  /** Sequential sum of a double array (order-deterministic fold). */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0d), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    fsum(transform(a, x => x.cast("double") * x.cast("double")))

  /** cosine(a,b) = dot/(sqrt(|a|²)·sqrt(|b|²)) — formula shape matters:
    * keep it identical to the oracle's.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Floor-scale a similarity to an exact integer (×10^6). */
  def e6(c: Column): Column = floor(c * 1000000L).cast("long")

  /** Signed projection of `vec` onto deterministic integer hyperplane `p`
    * (weights w(p,d) = ((p*131 + d*37) mod 7) − 3): the random-hyperplane
    * LSH bit. Integer weights keep the oracle replicable without a shared
    * RNG; `p` may be a lambda variable.
    */
  def planeDot(vec: Column, p: Column, dims: Int): Column =
    aggregate(
      sequence(lit(0), lit(dims - 1)),
      lit(0.0d),
      (acc, d) =>
        acc + element_at(vec, d + 1).cast("double") *
          (pmod(p * 131 + d * 37, lit(7)) - 3).cast("double"))
}
