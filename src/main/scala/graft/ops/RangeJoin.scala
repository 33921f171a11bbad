package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join, bucketed — each point row matched to
  * every interval row of the same key whose [start, end) contains it.
  *
  * Spark-first plan: Spark would execute the naive `p.ts >= start && p.ts
  * < end` theta-join as a per-key nested loop (O(|P|·|I|) comparisons per
  * key — with a broadcast or cartesian shape, the classic range-join
  * blowup). Instead time is cut into fixed-width epoch buckets: each
  * interval EXPLODES into the buckets it covers (bounded by
  * len/bucket + 2), each point computes its ONE bucket, and the match
  * becomes an equi-join on (key, bucket) + the exact containment filter.
  * Shuffle fan-out is bounded and hash-partitioned; a point meets an
  * interval only in the point's own bucket, so the output needs NO
  * dedup. Pick `bucketSeconds` near the typical interval length: wider
  * buckets → fewer interval replicas but more false candidates per
  * bucket; narrower → the reverse. Hot (key, bucket) pairs are ordinary
  * equi-join skew — AQE skew-join or ScaleQueries-style salting applies.
  *
  * Bucket arithmetic runs on epoch SECONDS (exact in doubles; epoch
  * micros would exceed 2^53 under Column division) and covers through
  * `end`'s own second, so a sub-second interval tail can admit one
  * harmless extra candidate bucket — the full-precision containment
  * filter keeps semantics exact.
  *
  * Measured candidate scaling (WorkRowAudit r15, the e5 fixture over
  * events at sf0.001 → 0.01 → 0.1): 323 → 3 425 → 34 155 match rows —
  * +1.03 / +1.00 per decade, i.e. LINEAR. The events table's keys and
  * time span both grow with SF, so per-(key, bucket) density stays flat;
  * this is the audit family's clean row, and the one whose failure mode
  * (a hot key × wide interval) is ordinary equi-join skew rather than
  * filter saturation.
  */
object RangeJoin {
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      ts: String, start: String, end: String,
      bucketSeconds: Long = 86400L): DataFrame =
    candidates(points, intervals, key, ts, start, end, bucketSeconds)
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__b")

  /** The (key, bucket) equi-join match rows BEFORE the exact containment
    * filter — the operator's work-row frame, exposed for the candidate
    * scaling audit (graft.WorkRowAudit): bucket-width tuning is exactly a
    * trade on this count, and a hot (key, bucket) pair blowing up here is
    * the operator's one superlinear failure mode. */
  private[graft] def candidates(points: DataFrame, intervals: DataFrame,
      key: String, ts: String, start: String, end: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(!(points.columns ++ intervals.columns).contains("__b"),
      "frames may not contain the reserved column __b")
    val w = lit(bucketSeconds.toDouble)
    val ic = intervals.withColumn("__b",
      explode(sequence(
        floor(unix_timestamp(col(start)) / w).cast("long"),
        floor(unix_timestamp(col(end)) / w).cast("long"))))
    val pc = points.withColumn("__b",
      floor(unix_timestamp(col(ts)) / w).cast("long"))
    pc.join(ic, Seq(key, "__b"))
  }
}
