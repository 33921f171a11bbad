package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, EtlQueries, ExtQueries, LlmQueries, MlQueries, Q, ScaleQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each declared query is a SURVEY §2 operator (or an extension op) over the
  * driver testdata, with matching DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** All declared operator queries. */
  def allQueries: Seq[Q] =
    CoreQueries.all ++ EtlQueries.all ++ ExtQueries.all ++ LlmQueries.all ++
      MlQueries.all ++ ScaleQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Monthly detection-rate — the reference's own EDA query (codes.py:141-147)
    * re-expressed as one conditional aggregate. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.d6_monthly_rate.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
