package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) SHARD ASSIGNMENT — the
  * minimal-movement alternative to `key mod n` that a 100 TB corpus
  * needs when its shard count changes: under HRW, growing n → n+1 moves
  * ONLY the keys the new shard wins (≈ 1/(n+1) of them), where mod-hash
  * reshuffles nearly everything (≈ (n−1)/n).
  *
  * The per-(key, shard) weight is an engine-portable double pass of the
  * Knuth multiplicative hash (same constant as
  * [[Sampling.knuthHash]]), with an xor shard-mix between the passes so
  * weights are decorrelated across shards (a single multiplicative pass
  * of key+s would be LINEAR in s — consecutive shards' weights would
  * share order statistics and loads would follow the three-distance
  * gaps instead of being near-uniform):
  *
  *   h1 = ((key & 0x7fffffff) · 2654435761) mod 2³²
  *   w  = (((h1 xor s·2654435761) & 0x7fffffff) · 2654435761) mod 2³²
  *
  * Every intermediate stays under 2⁶³ (max operand 2³¹−1 times the
  * constant ≈ 5.7·10¹⁸), so plain BIGINT arithmetic replays bit-for-bit
  * in any engine. Ties break to the smallest shard id (the fold keeps
  * the first maximum).
  *
  * Scale design: the argmax folds over `sequence(0, n−1)` INSIDE the
  * row via `aggregate` — whole-stage-codegen arithmetic, no explode, no
  * join, no shuffle; cost is O(n) multiply-mods per key.
  */
object Sharding {

  private val M = 2654435761L
  private val Mask = 2147483647L
  private val W32 = 4294967296L

  /** The HRW weight of `key` for shard `s` (both as columns). */
  def weight(key: Column, s: Column): Column = {
    val h1 = (key.cast("long").bitwiseAND(lit(Mask)) * lit(M)) % lit(W32)
    val mixed = h1.bitwiseXOR(s.cast("long") * lit(M)).bitwiseAND(lit(Mask))
    (mixed * lit(M)) % lit(W32)
  }

  /** Shard of `key` among `nShards` shards: argmax of [[weight]], ties
    * to the smallest shard id. Returns an INT column. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 4096, s"nShards out of range: $nShards")
    aggregate(
      sequence(lit(0), lit(nShards - 1)),
      struct(lit(-1L).as("w"), lit(-1).as("s")),
      (acc, sh) => {
        val ws = weight(key, sh)
        when(ws > acc.getField("w"),
          struct(ws.as("w"), sh.as("s"))).otherwise(acc)
      }).getField("s")
  }
}
