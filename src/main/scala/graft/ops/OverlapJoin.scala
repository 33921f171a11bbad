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
  * equi-join skew (AQE skew-join / salting apply).
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
    def bucketsOf(df: DataFrame, s: String, e: String) =
      df.withColumn("__b",
        explode(sequence(
          floor(unix_timestamp(col(s)) / w).cast("long"),
          floor(unix_timestamp(col(e)) / w).cast("long"))))
    bucketsOf(a, aStart, aEnd)
      .join(bucketsOf(b, bStart, bEnd), Seq(key, "__b"))
      // canonical bucket: exactly one shared bucket carries each pair
      .filter(col("__b") ===
        floor(unix_timestamp(greatest(col(aStart), col(bStart))) / w)
          .cast("long"))
  }
}
