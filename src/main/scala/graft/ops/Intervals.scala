package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing — merge overlapping or touching [st, en) windows
  * per key into maximal spans (the "merge intervals" / range-compaction
  * operator; e13's engine). Distinct from point sessionization
  * ([[graft.queries.LlmQueries]] l13): with HETEROGENEOUS interval
  * lengths a long window can swallow many later short ones, so the
  * island test must compare each start against the running MAX of all
  * previous ends — not the previous row's end. That running max is the
  * whole operator:
  *
  *   pmax   = max(en) over (partition key order st, en rows unbounded
  *            preceding .. 1 preceding)
  *   island = running count of rows with st > pmax  (null pmax = first)
  *
  * then one groupBy (key, island) → (min st, max en, count). Touching
  * intervals (st = previous max end) MERGE — half-open [st, en) windows
  * that share an endpoint form one continuous span.
  *
  * Determinism: island membership is order-invariant under (st, en)
  * ties — two identical keys cannot open an island against each other
  * (an equal start is ≤ the twin's end because en > st always), so the
  * per-island aggregate is a pure function of the interval multiset.
  * Callers keep st/en in exact integer units (e13 uses microseconds).
  *
  * 100 TB posture: ONE hash exchange on the key feeds both window
  * functions (same partitioning, same sort — Spark plans one Sort and
  * one Exchange, two Window nodes) and the final groupBy reuses the
  * partitioning; no self-join, no corpus-wide window, no driver state.
  */
object Intervals {

  /** The complement view: the GAPS between a key's coalesced islands —
    * (key, after_island, gap_start, gap_end, gap_us). e14's engine; the
    * idle-time/availability read of the same window machinery (a gap
    * exists only between consecutive islands, so a key with one island
    * emits nothing). One more lead() over the ISLAND frame (≪ input),
    * sharing the key partitioning. */
  def gaps(iv: DataFrame, key: String = "user_id",
      st: String = "st", en: String = "en"): DataFrame = {
    val w = Window.partitionBy(key).orderBy("island")
    coalesce(iv, key, st, en)
      .withColumn("nxt_start", lead("start_us", 1).over(w))
      .filter(col("nxt_start").isNotNull)
      .select(col(key), col("island").as("after_island"),
        col("end_us").as("gap_start_us"),
        col("nxt_start").as("gap_end_us"),
        (col("nxt_start") - col("end_us")).as("gap_us"))
  }

  /** Coalesce [st, en) rows per `key` → (key, island, start, end,
    * n_events), island numbered 1.. in start order within each key. */
  def coalesce(iv: DataFrame, key: String = "user_id",
      st: String = "st", en: String = "en"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(st, en)
    val mx = iv.withColumn("pmax",
      max(en).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val isl = mx.withColumn("island",
      sum((col("pmax").isNull || col(st) > col("pmax")).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col(key), col("island").cast("long").as("island"))
      .agg(min(st).cast("long").as("start_us"),
        max(en).cast("long").as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
