package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * mergeable frequency sketch a 100 TB pipeline pairs with [[Hll]]'s
  * cardinality sketch: heavy-hitter detection over unbounded key sets
  * (hot join keys feeding salting decisions, hot n-grams, hot users)
  * where an exact groupBy's state is the key set itself.
  *
  * Same design stance as Hll: Spark-relational, not a
  * TypedImperativeAggregate — the sketch IS a (row, column, count)
  * aggregate, so partials combine map-side and two sketches merge by
  * adding counters (associative/commutative by construction, the
  * property that lets shards/days union without re-reading data). And
  * md5-pinned, not engine-private hashing: row r's column is an 8-hex-
  * digit span of md5(value) mod W, so the DuckDB oracle of
  * `d14_heavy_hitters` rebuilds every counter and every estimate
  * digit-for-digit, making the sketch contract-checkable cross-engine.
  *
  * Layout: D = 4 hash rows × W = 512 columns. md5's 32 hex digits split
  * into four disjoint 8-digit spans — one 32-bit value per row, mod W.
  * Disjoint spans of one digest instead of four salted digests: one md5
  * per value, and pairwise row independence is what the CM error bound
  * actually uses. Estimate(x) = min over rows of counter[r][h_r(x)] —
  * an overestimate; by Markov, P[excess > εN] ≤ (1/(εW))^D per key,
  * e.g. 2⁻²⁴ at ε = 64/W (the paper's tighter form uses ε = e/W,
  * δ = e⁻ᴰ).
  *
  * Scale: the sketch frame is ≤ D·W = 2048 rows regardless of input
  * size — it broadcasts; point estimates are a broadcast join, never a
  * shuffle of the probed keys.
  */
object CountMin {
  val D = 4
  val W = 512

  /** Row r's column index: hex digits (8r+1)..(8r+8) of md5(x), mod W. */
  private def rowCol(hx: Column, r: Int): Column =
    conv(substring(hx, 8 * r + 1, 8), 16, 10).cast("long") % W

  private def rcPairs(hx: Column): Column =
    explode(array((0 until D).map(r =>
      struct(lit(r).as("r"), rowCol(hx, r).as("c"))): _*))

  /** The exploded (r, c) counter coordinates of one value — D rows per
    * input row, the cell stream both the batch [[sketch]] and the
    * streaming weekly sketch (StreamingOps.weeklyCmSketch) aggregate.
    * Public so stateful consumers can group the SAME cells under their
    * own keys (e.g. a time window) without re-deriving the hash layout. */
  def cells(value: Column): Column =
    rcPairs(md5(value.cast("string").cast("binary")))

  /** The sketch of `value`'s frequency distribution (nulls ignored):
    * (r, c, cnt) with ≤ D·W rows. One map-side-combinable aggregate over
    * D rows emitted per input row. Two sketches over disjoint data merge
    * by `union → groupBy(r, c).sum(cnt)` (CountMinProps pins ≡ the
    * sketch of the union). */
  def sketch(df: DataFrame, value: Column): DataFrame =
    df.filter(value.isNotNull)
      .select(md5(value.cast("string").cast("binary")).as("__hx"))
      .select(rcPairs(col("__hx")).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for every distinct value of `keyCol` in `keys`:
    * (key, outCol) with est = min over rows of the key's counter, 0-filled
    * for never-seen keys (their counters may not exist). The sketch side
    * is ≤ D·W rows and broadcast — probing N keys costs N·D joined rows
    * and no shuffle of the sketch. Estimates are exact-or-over, never
    * under (CountMinProps). */
  def estimate(sk: DataFrame, keys: DataFrame, keyCol: Column,
      outCol: String = "cm_est"): DataFrame = {
    val probes = keys.select(keyCol.as("key")).distinct()
      .select(col("key"), md5(col("key").cast("string").cast("binary")).as("__hx"))
      .select(col("key"), rcPairs(col("__hx")).as("rc"))
      .select(col("key"), col("rc.r").as("r"), col("rc.c").as("c"))
    probes.join(broadcast(sk), Seq("r", "c"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as(outCol))
  }
}
