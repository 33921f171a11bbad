package graft.schema

import org.apache.spark.sql.types._

/** Explicit schema for the CDC NWSS wastewater CSV the reference reads
  * (codes.py:21, 35 columns per ipynb:80; column list per FIXTURES.md §1).
  * We never use inferSchema: one scan, deterministic types (SURVEY §1.1).
  *
  * All columns nullable — the pipeline's whole point is null handling.
  * `sample_collect_date` loads as StringType and is parsed with coercion by
  * the dateParts stage (codes.py:28, errors='coerce' ⇒ null on malformed).
  * 7 of the 35 columns are never referenced by the reference code; they ride
  * along as filler_01..filler_07 until the column drop / dedup.
  */
object Nwss {

  val raw: StructType = StructType(Seq(
    StructField("sewershed_id", IntegerType),
    StructField("wwtp_jurisdiction", StringType),
    StructField("county_fips", StringType), // leading zeros ⇒ string
    StructField("counties_served", StringType),
    StructField("population_served", LongType),
    StructField("sample_id", StringType),
    StructField("sample_collect_date", StringType),
    StructField("sample_type", StringType),
    StructField("sample_matrix", StringType),
    StructField("sample_location", StringType),
    StructField("flow_rate", DoubleType),
    StructField("pcr_target", StringType),
    StructField("pcr_target_avg_conc", DoubleType),
    StructField("pcr_target_flowpop_lin", DoubleType),
    StructField("pcr_target_mic_lin", DoubleType),
    StructField("pcr_gene_target_agg", StringType),
    StructField("lod_sewage", DoubleType),
    StructField("ntc_amplify", StringType),
    StructField("inhibition_adjust", StringType),
    StructField("pasteurized", StringType),
    StructField("hum_frac_target_mic", StringType),
    StructField("hum_frac_mic_conc", DoubleType),
    StructField("hum_frac_mic_unit", StringType),
    StructField("rec_eff_percent", DoubleType),
    StructField("rec_eff_target_name", StringType),
    StructField("rec_eff_spike_matrix", StringType),
    StructField("rec_eff_spike_conc", DoubleType),
    StructField("date_updated", StringType)
  ) ++ (1 to 7).map(i => StructField(f"filler_$i%02d", StringType)))

  /** The 12 columns dropped by the reference (codes.py:72-79). */
  val columnsToDrop: Seq[String] = Seq(
    "inhibition_adjust", "sample_id", "date_updated", "rec_eff_target_name",
    "rec_eff_spike_matrix", "rec_eff_spike_conc", "hum_frac_mic_unit",
    "pcr_target_mic_lin", "hum_frac_mic_conc", "hum_frac_target_mic",
    "ntc_amplify", "pcr_target")

  /** The 16 columns the pipeline derives (FIXTURES.md §2). */
  val derived: Seq[String] = Seq(
    "collection_month", "collection_week", "collection_dayofweek",
    "flow_rate_missing", "flowpop_lin_missing",
    "log_population_served", "log_flow_rate",
    "influenza_a_detected", "log_pcr_target_conc",
    "log_conc_lag1", "log_conc_lag2",
    "population_group", "jurisdiction_target_mean",
    "population_group_encoded", "pop_x_flow", "pop_x_rec_eff")

  /** 14-column ML feature list (codes.py:183-189). */
  val features: Seq[String] = Seq(
    "collection_month", "collection_week", "collection_dayofweek",
    "log_population_served", "log_flow_rate", "rec_eff_percent",
    "flow_rate_missing", "flowpop_lin_missing",
    "population_group_encoded", "log_conc_lag1", "log_conc_lag2",
    "jurisdiction_target_mean", "pop_x_flow", "pop_x_rec_eff")

  val label: String = "influenza_a_detected"
}
