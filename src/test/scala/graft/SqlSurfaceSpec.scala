package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface contract: every declared query carries ANSI oracle SQL,
  * and for the dialect-portable subset that SQL must be runnable ON THE
  * ENGINE ITSELF — `spark.sql(oracleSql)` over temp views of the testdata
  * tables, producing exactly the declared DataFrame-route rows. A SQL user
  * of this engine writes exactly these statements, so the contract text
  * doubles as the engine's own SQL regression corpus. (The excluded
  * oracles use DuckDB-only constructs — string_split/list_* lambdas,
  * unnest, quantile_cont, strftime, recursive CTEs — their Spark-side
  * semantics are covered by the DSL route plus the driver's cross-engine
  * hash gate.)
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** ANSI-portable declared queries: plain aggregates, joins, set ops,
    * ROLLUP/GROUPING, FILTER clauses, NOT EXISTS — parse and mean the
    * same on Spark SQL. */
  private val portable = Seq(
    "b1_projection", "b3_filter", "f1_multi_sort",
    "d1_group_mean", "d2_group_count", "d7_topk_counts", "d8_confusion_pivot",
    "d9_rollup",
    "e1_left_join", "e6_anti_join", "e7_full_outer_join",
    "g2_union", "g3_except", "g4_intersect", "g5_except_all", "g6_intersect_all",
    "d21_grouping_sets", "e9_shuffle_hash_join", "a17_corrupt_csv",
    // round-15 additions whose oracle SQL is dialect-portable: the
    // single-pass profile (UNION ALL + multi-distinct), the two-level
    // weighted median (window sums + decimal compares), relational
    // division (comma join + count-matching), the event-flow matrix
    // (lead with default), and Gini (histogram window + integer sums)
    "c14_column_profile", "d23_weighted_median", "g8_division",
    "l154_event_flow", "l158_gini_concentration",
    // round-16 additions: HHI (pure aggregates over n_chars) and the
    // capped PassJoin audit (VALUES-table segment bounds + substr +
    // levenshtein + scalar subqueries — all ANSI/Spark-parseable)
    "l168_hhi_concentration", "l162_capped_editjoin",
    // round-16 continuation: MCC (regr_slope/intercept fit CTE + CASE
    // cells + DECIMAL(38,0) cross-products — all Spark-parseable)
    "h18_mcc")

  /** Widen int-ish cells so an INT-vs-BIGINT dtype difference between the
    * two routes can't fail a value-equal comparison (Q.normalize widens
    * the DSL route; raw spark.sql output is compared by value). */
  private def widen(v: Any): Any = v match {
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case f: Float => f.toDouble
    // Spark SQL round(decimal, 6) stays DECIMAL where the DSL route
    // rounds a DOUBLE (1.0 parses as DECIMAL(2,1) in SQL, lit(1.0) is a
    // double) — same value, different runtime class
    case d: java.math.BigDecimal => d.doubleValue
    case x => x
  }

  test("the declared oracle SQL runs ON the engine and matches the DSL route " +
      "for every ANSI-portable query") {
    val views = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    views.foreach { t =>
      Tables.table(spark, sf, t).createOrReplaceTempView(t)
    }
    // events goes through its nanos-aware accessor, not the raw reader
    Tables.events(spark, sf).createOrReplaceTempView("events")
    try {
      portable.foreach { name =>
        val oracle = SparkEntry.oracleSql.getOrElse(name,
          fail(s"$name has no oracle SQL"))
        val viaSql = spark.sql(oracle).collect().map(_.toSeq.map(widen)).toSeq
        val viaDsl = SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toSeq.map(widen)).toSeq
        assert(viaSql == viaDsl,
          s"$name: the oracle SQL run through spark.sql diverges from the " +
            s"declared DataFrame route (${viaSql.length} vs ${viaDsl.length} rows)")
      }
    } finally (views :+ "events").foreach(v => spark.catalog.dropTempView(v))
  }
}
