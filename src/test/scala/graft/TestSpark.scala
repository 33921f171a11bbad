package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One SparkSession shared by every suite in the forked test JVM.
  * Every assertion in the suite is partitioning-proof (hash-derived data,
  * set comparisons, total orders), so the core count only affects wall
  * time: use the machine (the GoldenSpec trains GBTs on a 60k-row fixture)
  * while keeping shuffle partitions low for the many tiny property-test
  * jobs; UTC + ANSI-off mirrors the production session settings
  * (Tables.prep) so semantics under test are identical.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 32) // matches ml/Calibrate: the
      // golden metrics were fitted under this partitioning (GBT tree builds
      // are float-order sensitive to it; everything else is invariant)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // production session contract: the graft_* natives resolve by NAME,
    // so the suite session registers them exactly like Tables.prep /
    // GraftExtensions would — otherwise a suite that touches TextOps
    // primitives directly only passes when another suite registered first
    graft.Tables.prep(s)
  }

  /** NWSS-shaped test frame builder: just the raw columns the EP1 stages
    * touch (dropCols treats the rest as already dropped — pandas
    * errors='ignore' semantics make that a no-op). Values are Options so
    * null-semantics cases are explicit at the call site.
    */
  case class NwssRow(
      wwtp_jurisdiction: Option[String] = Some("AK"),
      sample_collect_date: Option[String] = Some("2023-01-15"),
      population_served: Option[Long] = Some(10000L),
      flow_rate: Option[Double] = Some(1.0),
      pcr_target_avg_conc: Option[Double] = Some(5.0),
      pcr_target_flowpop_lin: Option[Double] = Some(2.0),
      counties_served: Option[String] = Some("c1"),
      lod_sewage: Option[Double] = Some(0.1),
      pasteurized: Option[String] = Some("No"),
      pcr_gene_target_agg: Option[String] = Some("n1"),
      rec_eff_percent: Option[Double] = Some(50.0),
      row_id: Long = 0L)

  val nwssTestSchema: StructType = StructType(Seq(
    StructField("wwtp_jurisdiction", StringType),
    StructField("sample_collect_date", StringType),
    StructField("population_served", LongType),
    StructField("flow_rate", DoubleType),
    StructField("pcr_target_avg_conc", DoubleType),
    StructField("pcr_target_flowpop_lin", DoubleType),
    StructField("counties_served", StringType),
    StructField("lod_sewage", DoubleType),
    StructField("pasteurized", StringType),
    StructField("pcr_gene_target_agg", StringType),
    StructField("rec_eff_percent", DoubleType),
    StructField("row_id", LongType)))

  def nwssDf(rows: Seq[NwssRow]): DataFrame = {
    val rs = rows.map { r =>
      Row(r.wwtp_jurisdiction.orNull, r.sample_collect_date.orNull,
        r.population_served.map(Long.box).orNull, r.flow_rate.map(Double.box).orNull,
        r.pcr_target_avg_conc.map(Double.box).orNull,
        r.pcr_target_flowpop_lin.map(Double.box).orNull,
        r.counties_served.orNull, r.lod_sewage.map(Double.box).orNull,
        r.pasteurized.orNull, r.pcr_gene_target_agg.orNull,
        r.rec_eff_percent.map(Double.box).orNull, Long.box(r.row_id))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rs, 2), nwssTestSchema)
  }
}
