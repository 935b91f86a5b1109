package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * A hash-shuffled join sends every row of a hot key to ONE reducer; at
  * 100 TB a single celebrity key can hold a stage hostage (or OOM the
  * task). Salting splits each hot key's rows across `salts` reducers by
  * appending a fan-out column: the skewed side gets a deterministic salt
  * in [0, salts), the other side is replicated once per salt value, and
  * the join runs on (key, salt). Result set is IDENTICAL to the plain
  * join — the salt only changes the partitioning — at the cost of
  * replicating the non-skewed side ×salts.
  *
  * AQE's skew-join handles moderate skew transparently (enabled in
  * GraftSession); explicit salting remains the tool when a single key
  * exceeds what splitting sort-merge buffers can absorb, or when the
  * skewed side feeds an aggregation that AQE cannot split.
  *
  * The salt is a hash of the skewed side's whole row (not `rand()`), so
  * task retries recompute identical salts — required for deterministic
  * speculative execution and exactly-once sinks.
  */
object SkewOps {

  /** Join types where replicating `other` cannot duplicate output rows:
    * unmatched `other` rows are never emitted. A right/full outer join
    * would surface each unmatched replicated row ×salts — rejected.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti")

  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin cannot preserve plain-join semantics for '$joinType': " +
        "unmatched rows of the replicated side would be emitted once per " +
        "salt. Use inner/left/semi/anti, or salt the other side.")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
