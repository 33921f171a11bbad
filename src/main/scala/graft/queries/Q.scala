package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.Tables

/** One declared operator query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB as the oracle
  * (SURVEY.md §5.2-1). Conventions that make the hash-compare deterministic:
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - float aggregates are rounded (or summed as DECIMAL then cast) so
  *    summation-order differences between engines cannot surface;
  *  - all integer/boolean outputs are widened to BIGINT on both sides
  *    (`normalize` here, explicit CASTs in the SQL) so dtypes agree.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Widen int-ish and float columns so Spark output dtypes match the
    * BIGINT/DOUBLE the oracle SQL produces. */
  private def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case IntegerType | ShortType | ByteType | BooleanType =>
          col(f.name).cast(LongType).as(f.name)
        case FloatType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  def apply(name: String, sql: String)(f: (SparkSession, String) => DataFrame): Q =
    new Q(name, (s, d) => normalize(f(Tables.prep(s), d)), Some(sql.trim))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def noOracle(name: String)(f: (SparkSession, String) => DataFrame): Q =
    new Q(name, (s, d) => normalize(f(Tables.prep(s), d)), None)
}
