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
  * the four whose algebra is literally `sum`). The same law grouped:
  * [[countersBy]] keys the counters by a caller-supplied BUCKET column
  * (VERDICT r17 #4 — per-join-key-range self-join size is the number a
  * join planner wants BEFORE shuffling, where f8's AQE skew pin only
  * reacts after the map stage), and because a key lives in exactly one
  * bucket while signs depend only on the key, summing bucket counters
  * reproduces the global counters exactly (AmsF2Props: grouped merge
  * law + bucket-partition law over [[modelCountersBy]]; AmsF2Spec pins
  * the distributed form ≡ the model under any partitioning).
  *
  * Degenerate-input contract (ADVICE r17): empty or all-null input
  * reads (sq = 0, rr = 0) from [[estimate]] — sq is coalesced, never
  * NULL — with rr = 0 the declared "no data was sketched" signal a
  * caller must guard before dividing sq/rr; [[estimateBy]] emits NO
  * rows for buckets that do not exist, so a per-bucket consumer joins
  * against nothing instead of dividing by zero (AmsF2Spec pins both).
  */
object AmsF2 {

  /** The sign for (r, key-as-string) — the model function AmsF2Spec
    * replays locally to pin the distributed form. */
  def modelSign(r: Int, key: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"f2:$r:$key".getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xF) % 2) == 0) 1 else -1
  }

  /** Local model of the GROUPED counters: bucket → (Z_0 … Z_{r−1}).
    * AmsF2Props proves the grouped merge + bucket-partition laws on
    * this; AmsF2Spec pins [[countersBy]] ≡ this model, so the laws
    * carry to the cluster form. */
  def modelCountersBy(rows: Seq[(String, String)],
      r: Int): Map[String, Seq[Long]] =
    rows.groupBy(_._1).map { case (b, ks) =>
      b -> (0 until r).map(i =>
        ks.map { case (_, k) => modelSign(i, k).toLong }.sum)
    }

  // the distributed sign expression over projected columns k (key
  // string) and r (counter index) — kept identical between the global
  // and grouped forms so the oracle replay is one formula
  private def signExpr: Column = when(
    (conv(substring(md5(concat(lit("f2:"), col("r").cast("string"),
      lit(":"), col("k")).cast("binary")), 1, 1), 16, 10)
      .cast("int") % 2) === 0, lit(1L)).otherwise(lit(-1L))

  /** One-row frame (sq = Σ_r Z_r², rr = R) over the non-null `key`
    * column — one ×R explode into a map-combinable groupBy, then a
    * 16-row fold. Caller divides sq/rr for the estimate, guarding
    * rr = 0 (empty input — see the degenerate-input contract above). */
  def estimate(df: DataFrame, key: Column, r: Int): DataFrame = {
    // alias the key ONCE: an expression key (concat, cast, ...) would
    // not re-resolve against the projected frame inside the aggregate.
    // spread BEFORE the ×R explode (r18): the ×16 md5 work is the cost,
    // and a test-SF parquet is one input split — without it the whole
    // sign pipeline ran on ≤2 cores (measured: d26 wall ≈ cpu ≈ 7.8 s
    // at sf0.1). Counters are integer SUMS, so the round-robin shuffle
    // cannot change a single bit of the result; at 100 TB the scan has
    // ≥ cores splits and spread is a guarded no-op.
    graft.Tables.spread(
        df.filter(key.isNotNull).select(key.cast("string").as("k")))
      .select(col("k"), explode(sequence(lit(0), lit(r - 1))).as("r"))
      .groupBy("r").agg(sum(signExpr).as("zr"))
      .agg(coalesce(sum(col("zr") * col("zr")), lit(0L)).as("sq"),
        count(lit(1)).as("rr"))
  }

  /** Grouped counters (b, r, zr) — ONE map-combinable groupBy over the
    * ×R explode; the bucket column is evaluated against the original
    * frame alongside the key, so expression buckets (pmod, hash ranges)
    * work. Counters add per bucket, so shard merge stays plain +. */
  def countersBy(df: DataFrame, key: Column, bucket: Column,
      r: Int): DataFrame =
    // same spread-before-explode stance as estimate(), same exactness
    // argument (per-bucket integer sums commute with any partitioning)
    graft.Tables.spread(
        df.filter(key.isNotNull)
          .select(bucket.as("b"), key.cast("string").as("k")))
      .select(col("b"), col("k"),
        explode(sequence(lit(0), lit(r - 1))).as("r"))
      .groupBy("b", "r").agg(sum(signExpr).as("zr"))

  /** Per-bucket (b, sq, rr) fold of [[countersBy]] — B·R rows in, B
    * rows out. Buckets with no (non-null-key) rows are ABSENT, per the
    * degenerate-input contract. */
  def estimateBy(df: DataFrame, key: Column, bucket: Column,
      r: Int): DataFrame =
    countersBy(df, key, bucket, r)
      .groupBy("b")
      .agg(sum(col("zr") * col("zr")).as("sq"), count(lit(1)).as("rr"))
}
