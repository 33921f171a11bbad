package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scale-safe scalar statistics.
  *
  * Spark's exact `median()`/`percentile()` is a TypedImperativeAggregate that
  * buffers EVERY value in a single aggregation buffer — a multi-GB buffer and
  * an executor OOM at 100× data, impossible at 100 TB. These helpers keep the
  * exact (pandas-interpolating, codes.py:35) semantics with distributed plans:
  * a count job plus a range-partitioned sort, picking the middle one/two rows
  * by global index. No step holds more than a partition in memory.
  */
object Stats {

  /** Exact interpolated median of a column: (n odd) the middle value,
    * (n even) the mean of the two middle values — pandas `Series.median`.
    * Returns None when there are no non-null values (ADVICE: never throw on
    * empty/all-null input). Two jobs: count, then sort + zipWithIndex filter.
    */
  def exactMedian(df: DataFrame, c: Column): Option[Double] = {
    val vals = df.select(c.cast(DoubleType).as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    if (n == 0L) None
    else {
      val mid = (n - 1L) / 2L                  // lower middle index, 0-based
      val take = if (n % 2L == 0L) 2 else 1
      // RDD zipWithIndex preserves the range-partitioned sort order and
      // assigns global indices without collecting anything to the driver.
      val middle = vals.sort("v").rdd
        .zipWithIndex()
        .filter { case (_, i) => i >= mid && i < mid + take }
        .map(_._1.getDouble(0))
        .collect()
      Some(middle.sum / take)
    }
  }

  /** Mode with pandas' `mode()[0]` tie-break: the SMALLEST value among the
    * most frequent (codes.py:83-87, SURVEY §4.3-7). Distributed group-by
    * count + TakeOrderedAndProject; None on empty/all-null input. */
  def exactModeString(df: DataFrame, c: Column): Option[String] = {
    df.select(c.as("v")).filter(col("v").isNotNull)
      .groupBy("v").count()
      .orderBy(desc("count"), asc("v")).limit(1)
      .collect().headOption.map(_.getString(0))
  }
}
