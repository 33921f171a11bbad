package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog approximate distinct count — the mergeable cardinality
  * sketch a 100 TB pipeline uses where `count(DISTINCT x)` is too
  * expensive: vocabulary size per corpus slice, unique users per window,
  * join-key cardinality estimates feeding broadcast decisions.
  *
  * Why not Spark's `approx_count_distinct`? Same algorithm family, but
  * its register layout and bias tables are engine-private — the result is
  * not reproducible by any other system, so it can't be contract-checked
  * (and a checkpoint restored on a different engine version can shift).
  * This implementation pins every step to public arithmetic on md5, so
  * the estimate is bit-reproducible across engines (the DuckDB oracle of
  * `d13_hll_distinct` replays it from the hex digits) and across runs,
  * partitionings and cluster sizes.
  *
  * Scale posture: the sketch IS the two-level aggregate —
  * `groupBy(keys, register).agg(max(rho))` then `groupBy(keys)` over at
  * most m=64 register rows per group. Both aggregates are map-side
  * combinable (max and sum partials), so each executor ships 64 longs
  * per group per task, never the value set — the merge is `max` on
  * register vectors, associative and commutative by construction, which
  * is exactly the property that makes HLL sketches unionable across
  * shards/days without re-reading data. No TypedImperativeAggregate is
  * needed: the relational form already gives whole-stage codegen on the
  * hash/register projection and partial aggregation.
  *
  * Register math (m = 64, b = 6): with h = md5-derived 64-bit hash,
  *  - register j = h & 63            (bits 0-5 = hex chars 15-16 mod 64)
  *  - rank field w = h >>> 12        (bits 12-63 = hex chars 1-13)
  *  - rho = 1 + trailing-zeros(w), w = 0 → 53
  * Bits 6-11 are deliberately skipped so the two fields decode from
  * disjoint, whole hex digits (register from the low byte, rank from the
  * leading 13 chars) — the oracle never reassembles the full 64-bit value
  * (which would overflow DuckDB's signed BIGINT arithmetic). Trailing
  * zeros of the rank field, not sklearn-style leading zeros, because
  * `bit_count((w & -w) - 1)` is exact integer arithmetic in both engines;
  * the distribution P[rho ≥ k] = 2^-(k-1) is identical.
  *
  * Estimator: standard HLL with the small-range linear-counting
  * correction — raw = alpha_64 · m² / Σ_j 2^-M_j (absent registers
  * contribute 2^0); if raw ≤ 2.5·m and V = #empty registers > 0, the
  * estimate is m·ln(m/V). Expected relative error 1.04/√64 ≈ 13%.
  * The float expression tree is written identically here and in the
  * oracle SQL, so both engines run the same IEEE operation sequence.
  */
object Hll {
  val M = 64
  private val Alpha: Column = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))

  /** Per-group HLL distinct estimate of `value` (nulls ignored, as in
    * COUNT(DISTINCT)). Returns one row per group: groupCols :+ hll_est.
    * Groups with no non-null value emit no row. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val h = TextOps.md5Hash64(value.cast("string"))
    val w = shiftrightunsigned(h, 12)
    val regs = df.filter(value.isNotNull)
      .select(groupCols.map(col) :+
        h.bitwiseAND(lit(63L)).as("__j") :+
        when(w === 0L, lit(53))
          .otherwise(bit_count(w.bitwiseAND(-w) - lit(1L)) + lit(1)).as("__rho"): _*)
      .groupBy((groupCols :+ "__j").map(col): _*)
      .agg(max(col("__rho")).as("__mj"))
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__seen"),
        sum(pow(lit(2.0), -col("__mj"))).as("__zp"))
      .withColumn("__raw",
        Alpha * lit(4096.0) / (col("__zp") + (lit(M) - col("__seen"))))
      .withColumn("__v", lit(M) - col("__seen"))
      .withColumn("hll_est",
        when(col("__raw") <= lit(160.0) && col("__v") > 0,
          lit(64.0) * log(lit(64.0) / col("__v")))
          .otherwise(col("__raw")))
      .select(groupCols.map(col) :+ col("hll_est"): _*)
  }
}
