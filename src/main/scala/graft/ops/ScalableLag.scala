package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof per-group lag for LOW-cardinality partition keys.
  *
  * `lag(...).over(Window.partitionBy(key))` sorts each key's rows inside ONE
  * task, so with ~57 jurisdictions (codes.py:55-57) a 100 TB table caps out
  * at 57-way parallelism and a multi-TB key must sort in a single task —
  * the scale-killer flagged in round 2. This operator keeps identical
  * results with parallelism O(numPartitions), independent of key count:
  *
  *  1. range-partition by (key, order) — each key's rows stay CONTIGUOUS
  *     across partition ids but may span many partitions;
  *  2. window per (key, split=partition-id) — each split sorts only its own
  *     slice, so no task ever sees more than one partition of data;
  *  3. boundary exchange: the last `maxLag` rows of every (key, split) are
  *     replicated into the next `maxLag` splits as helper rows. Contiguity
  *     guarantees every intervening split holds ≥1 row of the key, so the
  *     true predecessors of a split's leading rows are always among the
  *     helpers shipped from the previous `maxLag` splits; surplus helpers
  *     sort strictly earlier and cannot disturb any real row's lag.
  *  4. recompute the per-(key, split) lag over base+helpers, drop helpers.
  *
  * Two linear shuffles (range + window hash) replace one skewed shuffle.
  * Requires `order` to be a TOTAL order within each key (pass a unique
  * tiebreak column, same contract as the plain-window form, SURVEY §4.3-1)
  * and the same SortOrder must be used for ranges and windows — pass
  * `.asc_nulls_last` etc. explicitly if nulls are present.
  *
  * INVARIANT: every consumer of `base` below stays inside ONE action, so
  * Catalyst's ReuseExchange executes the range shuffle once and every
  * branch sees the same sampled boundaries / split ids. Never collect an
  * intermediate of this frame in a separate action and join it back —
  * range boundaries are SAMPLED per execution and can differ between
  * executions (that exact bug corrupted Metrics.binaryStats' cumulative
  * counts; it uses deterministic fixed-width buckets now).
  */
object ScalableLag {

  /** One requested lag column: (output name, offset ≥ 1, default). The
    * lagged value is `coalesce(lag(src, n), default)` — the fillna-after-
    * shift shape (codes.py:58-59) that also fills null source values. */
  final case class LagCol(name: String, offset: Int, default: Column)

  def withLags(
      df: DataFrame,
      partitionKeys: Seq[String],
      order: Seq[Column],
      src: Column,
      lags: Seq[LagCol],
      numPartitions: Option[Int] = None): DataFrame = {
    require(lags.nonEmpty && lags.forall(_.offset >= 1))
    val p = numPartitions.getOrElse(
      math.max(df.sparkSession.sparkContext.defaultParallelism, 2))
    val maxLag = lags.map(_.offset).max
    val keyCols = partitionKeys.map(col)

    val base = df
      .repartitionByRange(p, keyCols ++ order: _*)
      .withColumn("__split", spark_partition_id())
      .withColumn("__helper", lit(0))

    val wPart = Window.partitionBy(keyCols :+ col("__split"): _*)
    val tagged = base
      .withColumn("__rn", row_number().over(wPart.orderBy(order: _*)))
      .withColumn("__cnt", count(lit(1)).over(wPart))
    val candidates = tagged
      .filter(col("__rn") > col("__cnt") - maxLag)
      .drop("__rn", "__cnt")
    val helpers = (1 to maxLag).map(d =>
      candidates
        .withColumn("__split", col("__split") + d)
        .withColumn("__helper", lit(1)))

    val aug = helpers.foldLeft(tagged.drop("__rn", "__cnt"))(_ unionByName _)
    val wLag = Window
      .partitionBy(keyCols :+ col("__split"): _*)
      .orderBy(order: _*)
    val lagged = lags.foldLeft(aug) { case (d, LagCol(name, n, dflt)) =>
      d.withColumn(name, coalesce(lag(src, n).over(wLag), dflt))
    }
    lagged.filter(col("__helper") === 0).drop("__split", "__helper")
  }
}
