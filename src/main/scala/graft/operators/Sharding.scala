package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consistent-hash sharding (Karger et al. 1997) with virtual nodes —
  * the shard-management discipline that makes 100 TB reshards cheap:
  * adding one shard to an S-shard ring moves ~1/(S+1) of the keys,
  * where mod-sharding moves ~S/(S+1) (almost everything). Every
  * position is the portable md5-derived 32-bit hash
  * ([[graft.functions.PortableHash.h32]] semantics), so an external
  * SQL engine replays the ring bit-for-bit.
  *
  * Plan shape: the ring (shards × vnodes entries) is control-plane —
  * built driver-side, embedded as a LITERAL sorted array — so
  * assignment is a pure per-row codegen'd expression: hash the key,
  * take the first ring entry at-or-after it (wrap to the ring's first
  * entry). ZERO shuffle, no join; the 100 TB key stream never moves.
  */
object Sharding {

  /** First 4 md5 bytes as an unsigned 32-bit value — must stay
    * value-identical to `PortableHash.h32` / the DuckDB
    * `('0x' || substr(md5(x), 1, 8))::BIGINT` form.
    */
  private def h32(s: String): Long =
    BigInt(1, java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4)).toLong

  /** The ring: one (position, shard) entry per (shard, vnode), vnode
    * keys "s:v", sorted by (position, shard) — the tie order an oracle
    * can replay (32-bit collisions between entries are ~R²/2³³ but the
    * tie-break makes even that case deterministic).
    */
  def ring(shards: Int, vnodes: Int): Seq[(Long, Long)] = {
    require(shards >= 1 && vnodes >= 1,
            s"need shards/vnodes >= 1, got $shards/$vnodes")
    (for (s <- 0 until shards; v <- 0 until vnodes)
      yield (h32(s"$s:$v"), s.toLong)).sorted
  }

  /** Column: the consistent-hash shard of `key` on the
    * (shards × vnodes) ring. Pure codegen'd expression
    * ([[graft.functions.RingSearch]] — one binary search per row, the
    * ring shipped as a reference object); `key` is hashed via its
    * string form.
    */
  def shardOf(key: Column, shards: Int, vnodes: Int): Column = {
    val r = ring(shards, vnodes)
    val h = graft.functions.PortableHash.h32(key.cast("string"))
    org.apache.spark.sql.GraftColumns.column(
      graft.functions.RingSearch(
        org.apache.spark.sql.GraftColumns.expression(h),
        r.map(_._1).toArray, r.map(_._2).toArray))
  }

  /** Per-key assignment frame: (keyCol..., shardCol). */
  def ringAssign(keys: DataFrame, keyCol: String, shards: Int,
                 vnodes: Int, shardCol: String = "shard"): DataFrame =
    keys.withColumn(shardCol, shardOf(col(keyCol), shards, vnodes))
}
