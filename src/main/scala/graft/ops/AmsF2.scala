package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996) —
  * the fourth sketch family beside HLL ([[Hll]], cardinality), count-min
  * ([[CountMin]], frequency) and the bottom-k sample ([[QuantileSketch]],
  * value distribution): F₂ = Σ f_k² — the self-join size and the skew
  * denominator — from R integer counters.
  *
  * Sign family: s_r(x) = +1 iff the first hex digit of md5("f2:r:x") is
  * even — the same hash-derived Rademacher construction as the l29
  * hyperplane matrix, chosen so ANSI SQL derives the identical signs and
  * the oracle replays the whole sketch. Each counter Z_r = Σ_rows
  * s_r(key) is an exact integer; E[Z_r²] = F₂ (pairwise sign
  * independence suffices for unbiasedness; the md5 family behaves
  * four-wise for the variance bound Var ≤ 2F₂²/R — the standard
  * published analysis, asserted on real data in AmsF2Spec, never
  * assumed silently).
  *
  * Mergeability: counters add — merging shard sketches is elementwise
  * integer +, associative/commutative trivially, so partial aggregation
  * IS the merge (no special state needed — this is the one sketch of
  * the four whose algebra is literally `sum`).
  */
object AmsF2 {

  /** The sign for (r, key-as-string) — the model function AmsF2Spec
    * replays locally to pin the distributed form. */
  def modelSign(r: Int, key: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"f2:$r:$key".getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xF) % 2) == 0) 1 else -1
  }

  /** One-row frame (sq = Σ_r Z_r², rr = R) over the non-null `key`
    * column — one ×R explode into a map-combinable groupBy, then a
    * 16-row fold. Caller divides sq/rr for the estimate. */
  def estimate(df: DataFrame, key: Column, r: Int): DataFrame = {
    // alias the key ONCE: an expression key (concat, cast, ...) would
    // not re-resolve against the projected frame inside the aggregate
    val sign = when(
      (conv(substring(md5(concat(lit("f2:"), col("r").cast("string"),
        lit(":"), col("k")).cast("binary")), 1, 1), 16, 10)
        .cast("int") % 2) === 0, lit(1L)).otherwise(lit(-1L))
    df.filter(key.isNotNull)
      .select(key.cast("string").as("k"),
        explode(sequence(lit(0), lit(r - 1))).as("r"))
      .groupBy("r").agg(sum(sign).as("zr"))
      .agg(sum(col("zr") * col("zr")).as("sq"), count(lit(1)).as("rr"))
  }
}
