package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** H8-H11 — evaluation metrics as DataFrame aggregates over a scored frame
  * with columns `label` (0/1), `prediction` (0/1), `score` (higher ⇒ more
  * positive). All exact, all distributed:
  *
  * The threshold sweep (ROC, PR, AUC, AP) derives from ONE per-distinct-score
  * cumulative frame. The cumulative is computed scale-safely: group by score,
  * range-partition DESCENDING, per-partition running sums via a window keyed
  * by partition id, plus driver-computed partition offsets (one tiny collect
  * of ≤P rows) — never a single-task global sort, so a billion-row scored set
  * sweeps fine (SURVEY §2.H9-H10).
  *
  * sklearn parity notes: ROC-AUC via trapezoid over all distinct thresholds
  * equals the tie-corrected Mann-Whitney statistic — the formula used here.
  * Average precision is sklearn's STEP-WISE Σ(Rₙ−Rₙ₋₁)·Pₙ, NOT Spark's
  * interpolated areaUnderPR (SURVEY H10).
  */
object Metrics {

  /** H8: accuracy = mean(label == prediction). */
  def accuracy(scored: DataFrame): Double =
    scored.agg(avg((col("label") === col("prediction")).cast(DoubleType)))
      .head().getDouble(0)

  /** Per-distinct-score cumulative confusion counts, score DESCENDING:
    * (s, np, nn, tp, fp) — np/nn = positives/negatives AT s, tp/fp =
    * positives/negatives with score ≥ s.
    *
    * Bucket boundaries are a DETERMINISTIC function of the data — equal-
    * width cuts over [min,max], recursively re-cut inside any bucket
    * holding more than maxBucket distinct scores (using that bucket's
    * EXACT observed min/max, the Stats.mediansFromStats pattern) — never
    * `repartitionByRange`: range partitioning SAMPLES its boundaries, and
    * the lazy frame re-executes between the offsets collect and the
    * windowed pass, so sampled boundaries can disagree between the two
    * executions and silently corrupt every cumulative count downstream
    * (observed as run-to-run AUC swings of ±0.01 on identical inputs).
    * The refinement bounds per-task window work even when 99% of distinct
    * scores sit in 1% of the range — one level usually resolves it, since
    * the re-cut targets the concentrated sliver's own bounds. */
  /** pid = #cuts above s (cuts kept DESCENDING), so bucket 0 holds the
    * HIGHEST scores and pid order is score order — what the prefix offsets
    * need. The cut list is a literal: O(|cuts|) per row, inside codegen. */
  private def pidCol(cs: Seq[Double]): Column =
    if (cs.isEmpty) lit(0)
    else size(filter(lit(cs.toArray), b => b > col("s")))

  /** Deterministic skew-proof bucket boundaries over the distinct-score
    * frame `g`: start from p equal-width cuts over [lo,hi]; while any
    * bucket holds more than maxBucket = max(4·⌈n/p⌉, 1024) distinct scores,
    * re-cut it by ITS OWN exact min/max (one ≤#buckets-row agg per level,
    * ≤6 levels). Every boundary is an exact aggregate of the data — no
    * sampling — so the lazily re-executed frame always buckets identically. */
  private[ml] def refineCuts(g: DataFrame, p: Int, nDistinct: Long,
      lo: Double, hi: Double): Seq[Double] = {
    def cutsOf(blo: Double, bhi: Double, parts: Int): Seq[Double] =
      (1 until parts).map(i => blo + (bhi - blo) * i / parts)
        .filter(c => c > blo && c < bhi).distinct
    val maxBucket = math.max(4L * ((nDistinct + p - 1) / p), 1024L)
    var cuts: Seq[Double] = cutsOf(lo, hi, p).sorted(Ordering[Double].reverse)
    var depth = 0
    var done = cuts.isEmpty || nDistinct <= maxBucket
    while (!done && depth < 6) {
      val stats = g.groupBy(pidCol(cuts).as("pid"))
        .agg(count(lit(1)).as("cnt"), min("s").as("blo"), max("s").as("bhi"))
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      val heavy = stats.filter { case (cnt, blo, bhi) => cnt > maxBucket && blo < bhi }
      if (heavy.isEmpty) done = true
      else {
        val extra = heavy.flatMap { case (cnt, blo, bhi) =>
          cutsOf(blo, bhi, math.min(16L, (cnt + maxBucket - 1L) / maxBucket).toInt + 1)
        }
        cuts = (cuts ++ extra).distinct.sorted(Ordering[Double].reverse)
        depth += 1
      }
    }
    cuts
  }

  def binaryStats(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    val g = scored
      .groupBy(col("score").cast(DoubleType).as("s"))
      .agg(sum(when(col("label") === 1.0, 1L).otherwise(0L)).as("np"),
        count(lit(1)).as("n"))
      .withColumn("nn", col("n") - col("np"))
    val p = math.max(spark.sparkContext.defaultParallelism, 2)

    // the eager phase — min/max probe, up to 6 refineCuts levels, AND the
    // totals collect below — scans g several times: cache it through all of
    // them and release before returning (ADVICE r05: unpersisting after
    // refineCuts left the totals collect rescanning g uncached; the lazy
    // result frame still recomputes g once per downstream action)
    g.cache()
    val (parts, totals) = try {
      val mmRow = g.agg(min("s"), max("s"), count(lit(1))).head()
      if (mmRow.isNullAt(0))
        return g.select(col("s"), col("np"), col("nn"),
          col("np").as("tp"), col("nn").as("fp")) // empty input: empty stats
      val (lo, hi, nDistinct) = (mmRow.getDouble(0), mmRow.getDouble(1), mmRow.getLong(2))
      val cs = refineCuts(g, p, nDistinct, lo, hi)
      val pts = g.withColumn("pid", pidCol(cs)).repartition(col("pid"))
      val tot = pts.groupBy("pid")
        .agg(sum("np").as("tnp"), sum("nn").as("tnn"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      (pts, tot)
    } finally { g.unpersist(); () }
    val offsets = totals.scanLeft((0, 0L, 0L)) { case ((_, anp, ann), (_, tnp, tnn)) =>
      (0, anp + tnp, ann + tnn)
    }.init.zip(totals).map { case ((_, onp, onn), (pid, _, _)) => Row(pid, onp, onn) }
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("onp", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("onn", org.apache.spark.sql.types.LongType))))

    val w = Window.partitionBy("pid").orderBy(col("s").desc)
    parts
      .withColumn("cnp", sum("np").over(w))
      .withColumn("cnn", sum("nn").over(w))
      .join(broadcast(offDf), Seq("pid"))
      .select(col("s"), col("np"), col("nn"),
        (col("cnp") + col("onp")).as("tp"),
        (col("cnn") + col("onn")).as("fp"))
  }

  /** H9: exact ROC-AUC (trapezoid ≡ tie-corrected Mann-Whitney):
    * Σ np_s·(negBelow_s + nn_s/2) / (P·N), negBelow = N − fp. */
  def rocAuc(scored: DataFrame): Double = {
    val stats = binaryStats(scored).cache()
    try {
      val t = stats.agg(sum("np").as("P"), sum("nn").as("N")).head()
      val (pos, neg) = (t.getLong(0), t.getLong(1))
      if (pos == 0L || neg == 0L) Double.NaN
      else {
        val s = stats.agg(sum(col("np") * (lit(neg) - col("fp") + col("nn") / lit(2.0))))
          .head().getDouble(0)
        s / (pos.toDouble * neg.toDouble)
      }
    } finally { stats.unpersist(); () }
  }

  /** H10: sklearn step-wise average precision Σ (np_s/P)·(tp_s/(tp_s+fp_s))
    * over thresholds descending. */
  def averagePrecision(scored: DataFrame): Double = {
    val stats = binaryStats(scored).cache()
    try {
      val pos = stats.agg(sum("np")).head().getLong(0)
      if (pos == 0L) Double.NaN
      else
        stats.agg(sum(col("np") / lit(pos.toDouble) * col("tp") / (col("tp") + col("fp"))))
          .head().getDouble(0)
    } finally { stats.unpersist(); () }
  }

  /** PR curve points (recall, precision) at each threshold, descending. */
  def prCurve(scored: DataFrame): DataFrame = {
    val stats = binaryStats(scored)
    val pos = stats.agg(sum("np")).head().getLong(0)
    stats.select(col("s").as("threshold"),
      (col("tp") / lit(pos.toDouble)).as("recall"),
      (col("tp") / (col("tp") + col("fp"))).as("precision"))
  }

  /** ROC curve points (fpr, tpr) at each threshold, descending. */
  def rocCurve(scored: DataFrame): DataFrame = {
    val stats = binaryStats(scored).cache()
    val t = stats.agg(sum("np"), sum("nn")).head()
    val (pos, neg) = (t.getLong(0), t.getLong(1))
    stats.select(col("s").as("threshold"),
      (col("fp") / lit(neg.toDouble)).as("fpr"),
      (col("tp") / lit(pos.toDouble)).as("tpr"))
  }

  /** D8/H11 input: confusion counts [[TN, FP], [FN, TP]] (sklearn layout,
    * codes.py:296). */
  def confusion(scored: DataFrame): Array[Array[Long]] = {
    val m = scored.groupBy(col("label").cast(DoubleType).as("l"),
        col("prediction").cast(DoubleType).as("p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    def at(l: Double, p: Double): Long = m.getOrElse((l, p), 0L)
    Array(Array(at(0, 0), at(0, 1)), Array(at(1, 0), at(1, 1)))
  }

  final case class ClassReport(label: Int, precision: Double, recall: Double,
      f1: Double, support: Long)

  /** H11: per-class precision/recall/F1/support — sklearn
    * classification_report for the binary case (codes.py:293-294). */
  def report(scored: DataFrame): Seq[ClassReport] = {
    val cm = confusion(scored)
    val Array(Array(tn, fp), Array(fn, tp)) = cm
    def div(a: Long, b: Long): Double = if (b == 0L) 0.0 else a.toDouble / b
    def f1(p: Double, r: Double): Double = if (p + r == 0.0) 0.0 else 2 * p * r / (p + r)
    val p0 = div(tn, tn + fn); val r0 = div(tn, tn + fp)
    val p1 = div(tp, tp + fp); val r1 = div(tp, tp + fn)
    Seq(ClassReport(0, p0, r0, f1(p0, r0), tn + fp),
      ClassReport(1, p1, r1, f1(p1, r1), fn + tp))
  }
}
