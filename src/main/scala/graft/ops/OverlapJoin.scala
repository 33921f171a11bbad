package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval × interval OVERLAP join, bucketed — every same-key pair of
  * half-open intervals [aStart, aEnd) × [bStart, bEnd) that overlap:
  * `aStart < bEnd AND bStart < aEnd` (touching endpoints do NOT match —
  * the half-open convention every other temporal operator here uses).
  * Completes the inequality-join family: E4 as-of (time order), E5
  * point-in-interval (containment), E10 value band (numeric tolerance),
  * E12 nearest (symmetric distance) — THIS is two interval SETS against
  * each other, the session-overlap / validity-window-reconciliation /
  * double-booking shape.
  *
  * Spark-first plan: the naive theta join is a per-key nested loop
  * (O(|A|·|B|) per key). Instead BOTH sides explode into the fixed-width
  * epoch buckets they cover (bounded by len/bucket + 2 replicas, the
  * [[RangeJoin]] discipline) and the match becomes an equi-join on
  * (key, bucket) + the exact overlap filter. Two overlapping intervals
  * can share MANY buckets, so unlike E5 (where the point owns one home
  * bucket) the candidate join would duplicate pairs; the CANONICAL
  * BUCKET rule dedups structurally, with no distinct: a pair is kept
  * only in the bucket containing the OVERLAP'S START, max(aStart,
  * bStart). That bucket is covered by both sides whenever the pair
  * truly overlaps (aStart ≤ max ≤ aEnd and bStart ≤ max ≤ bEnd, and the
  * explode covers through end's own second), and it is unique — so
  * every overlapping pair survives in exactly ONE candidate row.
  * Dup-free and lossless by construction; the e16 oracle (DuckDB's
  * plain inequality join — an independent formulation) certifies it
  * row for row.
  *
  * Bucket arithmetic runs on epoch SECONDS exactly like [[RangeJoin]]
  * (exact in doubles; micros would pass 2^53), and the full-precision
  * overlap filter keeps semantics exact. Pick `bucketSeconds` near the
  * typical interval length; hot (key, bucket) pairs are ordinary
  * equi-join skew (AQE skew-join / salting apply) for the TASK, and
  * the quadratic-OUTPUT cell — the one failure no bucket width or salt
  * can bound — has a declared valve in [[cappedIntervalOverlap]]
  * (e17, VERDICT r18 #5).
  */
object OverlapJoin {

  def intervalOverlap(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long = 86400L): DataFrame =
    candidates(a, b, key, aStart, aEnd, bStart, bEnd, bucketSeconds)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .drop("__b")

  /** The canonical-bucket candidate rows BEFORE the exact overlap
    * filter — the operator's work-row frame (bucket-width tuning trades
    * on this count; a hot key × long intervals blowing up here is the
    * one superlinear failure mode). */
  private[graft] def candidates(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(!(a.columns ++ b.columns).contains("__b"),
      "frames may not contain the reserved column __b")
    val w = lit(bucketSeconds.toDouble)
    bucketed(a, aStart, aEnd, bucketSeconds)
      .join(bucketed(b, bStart, bEnd, bucketSeconds), Seq(key, "__b"))
      // canonical bucket: exactly one shared bucket carries each pair
      .filter(col("__b") ===
        floor(unix_timestamp(greatest(col(aStart), col(bStart))) / w)
          .cast("long"))
  }

  /** Capped interval-overlap join (e17, VERDICT r18 #5 — the family's
    * declared saturation valve, the l139/l161/l162 discipline brought
    * to the one superlinear failure mode the e16 scaladoc only
    * described in prose): each (key, bucket) CELL's candidate work
    * na·nb is bounded by `workCap`; a cell past it is REFUSED whole —
    * no pair whose canonical bucket lands in a refused cell is emitted.
    * The product rule caps exactly the quantity that blows up (cell
    * join output = na·nb rows), so total candidate work is ≤
    * workCap · #active-cells — LINEAR in the interval count — while a
    * hot key × long-interval pileup (the double-booked hub calendar)
    * degrades to a declared miss instead of a straggler task.
    * Deterministic: refusal depends only on exact per-cell counts, so
    * both engines agree row for row, and capped output ⊆ exact output
    * always (the cell join is a subset, the canonical + overlap
    * filters are identical). */
  def cappedIntervalOverlap(a: DataFrame, b: DataFrame, key: String,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long = 86400L, workCap: Long = 16L): DataFrame =
    cappedCandidates(a, b, key, aStart, aEnd, bStart, bEnd, bucketSeconds,
      workCap)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .drop("__b")

  /** The capped candidate stage (work-row frame of the capped engine):
    * per-cell counts on BOTH exploded sides (map-combinable aggregates
    * on the same (key, bucket) key the join shuffles on), the
    * refused-cell cut, then the cell equi-join restricted to admitted
    * cells — per-cell output provably ≤ workCap rows. */
  private[graft] def cappedCandidates(a: DataFrame, b: DataFrame,
      key: String, aStart: String, aEnd: String, bStart: String,
      bEnd: String, bucketSeconds: Long = 86400L,
      workCap: Long = 16L): DataFrame = {
    require(!(a.columns ++ b.columns).contains("__b"),
      "frames may not contain the reserved column __b")
    val w = lit(bucketSeconds.toDouble)
    val ab = bucketed(a, aStart, aEnd, bucketSeconds)
    val bb = bucketed(b, bStart, bEnd, bucketSeconds)
    val admitted = activeCells(ab, bb, key)
      .filter(col("__na") * col("__nb") <= workCap)
      .select(col(key), col("__b"))
    ab.join(admitted, Seq(key, "__b"))
      .join(bb, Seq(key, "__b"))
      .filter(col("__b") ===
        floor(unix_timestamp(greatest(col(aStart), col(bStart))) / w)
          .cast("long"))
  }

  /** ACTIVE cells (both sides present) with their exact side counts —
    * the refusal ledger e17's accounting row reads `n_cells_refused`
    * from. */
  private[graft] def activeCells(ab: DataFrame, bb: DataFrame,
      key: String): DataFrame =
    ab.groupBy(col(key), col("__b")).agg(count(lit(1)).as("__na"))
      .join(bb.groupBy(col(key), col("__b")).agg(count(lit(1)).as("__nb")),
        Seq(key, "__b"))

  /** The exploded bucket frame, shared by the capped engine and its
    * refusal ledger. */
  private[graft] def bucketed(df: DataFrame, s: String, e: String,
      bucketSeconds: Long = 86400L): DataFrame =
    df.withColumn("__b",
      explode(sequence(
        floor(unix_timestamp(col(s)) / lit(bucketSeconds.toDouble)).cast("long"),
        floor(unix_timestamp(col(e)) / lit(bucketSeconds.toDouble)).cast("long"))))
}
