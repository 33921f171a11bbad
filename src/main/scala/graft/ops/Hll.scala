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

  private def registerIndex(h: Column): Column = h.bitwiseAND(lit(63L))

  private def rank(h: Column): Column = {
    val w = shiftrightunsigned(h, 12)
    when(w === 0L, lit(53))
      .otherwise(bit_count(w.bitwiseAND(-w) - lit(1L)) + lit(1))
  }

  /** raw-HLL / linear-counting estimator from (Σ 2^-M_j incl. empties, V). */
  private def estimate(z: Column, v: Column): Column = {
    val raw = Alpha * lit(4096.0) / z
    when(raw <= lit(160.0) && v > 0, lit(64.0) * log(lit(64.0) / v))
      .otherwise(raw)
  }

  /** The per-group REGISTER frame — (groupCols..., __j, __mj), ≤ 64 rows
    * per group. Public because this is the sketch's merge currency: any
    * union of groups is `groupBy(newKeys, __j).agg(max(__mj))` over
    * these rows (associative/commutative max — the property that makes
    * HLL unionable across shards without re-reading data), and
    * [[estimateFromRegisters]] turns any such merged frame back into
    * estimates. d18 exercises the algebra pairwise. */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val h = TextOps.md5Hash64(value.cast("string"))
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+
        registerIndex(h).as("__j") :+ rank(h).as("__rho"): _*)
      .groupBy((groupCols :+ "__j").map(col): _*)
      .agg(max(col("__rho")).as("__mj"))
  }

  /** Estimates from a register frame keyed by `keys` (each group ≤ 64
    * (__j, __mj) rows): groups to one `hll_est` row per key. */
  def estimateFromRegisters(regs: DataFrame, keys: Seq[String]): DataFrame =
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__seen"),
        sum(pow(lit(2.0), -col("__mj"))).as("__zp"))
      .withColumn("hll_est", estimate(
        col("__zp") + (lit(M) - col("__seen")), lit(M) - col("__seen")))
      .select(keys.map(col) :+ col("hll_est"): _*)

  /** Per-group HLL distinct estimate of `value` (nulls ignored, as in
    * COUNT(DISTINCT)). Returns one row per group: groupCols :+ hll_est.
    * Groups with no non-null value emit no row. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    estimateFromRegisters(registers(df, groupCols, value), groupCols)

  /** ONE-aggregation form: the 64 registers pivot into 64 conditional
    * `max` columns (the simhashes bit-sum pattern), so the whole sketch is
    * a single groupBy — one shuffle instead of two, each task emitting one
    * 64-column row per group — and, because Structured Streaming allows
    * one stateful aggregation per query, THE form a streaming
    * distinct-count uses (StreamingOps.weeklyApproxDistinct). The register
    * values are identical to [[approxDistinct]]'s; only the Σ 2^-M_j
    * accumulation order differs (fixed left-to-right here vs partition
    * order there), so estimates agree to float-ulp (HllSpec pins ≤ 1e-12
    * relative). Group exprs are Columns so time windows can group. */
  def approxDistinctWide(df: DataFrame, groupExprs: Seq[Column], value: Column,
      outCol: String = "hll_est"): DataFrame = {
    val h = TextOps.md5Hash64(value.cast("string"))
    val pre = df.filter(value.isNotNull)
      .select(groupExprs :+ registerIndex(h).as("__j") :+ rank(h).as("__rho"): _*)
    val names = pre.columns.dropRight(2)
    // the group columns are recovered BY NAME below, so a group expr
    // aliased into the internal namespace (__j/__rho/__m*/outCol) or a
    // duplicate name would silently group or overwrite the wrong column
    // (ADVICE r07) — refuse loudly instead
    require(names.length == names.distinct.length &&
      !names.exists(n => n == "__j" || n == "__rho" || n == outCol || n.startsWith("__m")),
      s"approxDistinctWide group columns collide with internal names: ${names.mkString(", ")}")
    val regAggs = (0 until M).map(r =>
      max(when(col("__j") === r, col("__rho"))).as(s"__m$r"))
    val agged = pre.groupBy(names.map(col): _*)
      .agg(regAggs.head, regAggs.tail: _*)
    // absent register → M_j = 0 → 2^0; count the absences for V
    val z = (0 until M).map(r =>
      coalesce(pow(lit(2.0), -col(s"__m$r")), lit(1.0))).reduce(_ + _)
    val v = (0 until M).map(r =>
      when(col(s"__m$r").isNull, 1).otherwise(0)).reduce(_ + _)
    agged.withColumn(outCol, estimate(z, v))
      .select(names.map(col) :+ col(outCol): _*)
  }
}
