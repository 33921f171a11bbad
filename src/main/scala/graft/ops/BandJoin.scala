package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value band join — every left row matched to every right row of the
  * same key whose numeric value lies within ±delta: the VALUE-space
  * sibling of [[RangeJoin]] (point-in-interval on time) and the third
  * member of the inequality-join family with [[AsOf]]. Real uses: price
  * matching, sensor alignment, reconciliation of measurements that agree
  * "to within tolerance".
  *
  * Spark-first plan: Spark executes `abs(l.v − r.v) <= δ` as a per-key
  * nested loop (or worse, a broadcast nested loop) — the same blowup the
  * range join avoids. Instead both sides bucket at width δ: a pair
  * within δ differs by AT MOST ONE bucket ordinal (|l/δ − r/δ| ≤ 1 ⇒
  * floor difference ∈ {−1, 0, 1}), so replicating ONE side into its
  * {b−1, b, b+1} neighbor buckets (bounded ×3 fan-out — replicate the
  * smaller side at deployment) turns the match into an equi-join on
  * (key, bucket) + the exact tolerance filter. No dedup needed: the
  * probing side keeps its single home bucket, so a pair meets exactly
  * once. Hot (key, bucket) pairs are ordinary equi-join skew — AQE
  * skew-join or f4-style salting applies.
  *
  * Exactness: bucketing is candidate-generation only (lossless by the
  * ordinal argument above — float division cannot move a within-δ pair
  * further than one ordinal apart, and ties at bucket boundaries fall in
  * the covered {−1, 0, +1} window); the final `abs(diff) <= δ` compare
  * runs on the raw input doubles, identical on any engine.
  *
  * Ulp-level boundary caveat (ADVICE r15): the ordinal argument treats
  * `floor(v/δ)` as exact arithmetic, but the division itself rounds — a
  * pair sitting EXACTLY at |l−r| = δ whose two quotients both land on
  * round-to-nearest tie points can, in principle, straddle two ordinals
  * and be missed. The exactness claim is therefore "lossless up to one
  * ulp of the l/δ division at the closed boundary |l−r| = δ"; interior
  * pairs (|l−r| < δ by ≥ 1 ulp·δ) are unconditionally covered. A caller
  * that must include the degenerate boundary bit-exactly widens δ by one
  * ulp in candidate generation (compare still runs at the caller's δ) —
  * not the default, because the declared e10 semantics are over measured
  * doubles where the exact-δ tie is measure-zero noise, not data.
  */
object BandJoin {
  def join(left: DataFrame, right: DataFrame, key: String,
      lv: String, rv: String, delta: Double): DataFrame =
    candidates(left, right, key, lv, rv, delta)
      .filter(abs(col(lv) - col(rv)) <= delta)
      .drop("__b")

  /** The (key, bucket) equi-join match rows BEFORE the exact tolerance
    * filter — the operator's work-row frame (the RangeJoin.candidates
    * convention, for the candidate scaling audit). */
  private[graft] def candidates(left: DataFrame, right: DataFrame,
      key: String, lv: String, rv: String, delta: Double): DataFrame = {
    require(!(left.columns ++ right.columns).contains("__b"),
      "frames may not contain the reserved column __b")
    val lb = floor(col(lv) / delta).cast("long")
    val rb = floor(col(rv) / delta).cast("long")
    val probe = left.withColumn("__b", lb)
    val build = right.withColumn("__b", explode(array(rb - 1, rb, rb + 1)))
    probe.join(build, Seq(key, "__b"))
  }
}
