package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.{nwssDf, NwssRow}

/** Unit tests for the EP1 stages' load-bearing null/tie semantics
  * (SURVEY §1.4, §4.3) and the B9 conditional-schema branches. */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def col1[T](df: org.apache.spark.sql.DataFrame, c: String): Seq[T] =
    df.orderBy("row_id").select(c).collect().toSeq
      .map(r => (if (r.isNullAt(0)) null else r.get(0)).asInstanceOf[T])

  // --- §1.4-1: the label line (codes.py:50) --------------------------------
  test("label: NaN > 0 is False — null conc yields 0, never null") {
    val df = Features.logsAndLabel(nwssDf(Seq(
      NwssRow(pcr_target_avg_conc = None, row_id = 0),
      NwssRow(pcr_target_avg_conc = Some(0.0), row_id = 1),
      NwssRow(pcr_target_avg_conc = Some(3.5), row_id = 2),
      NwssRow(pcr_target_avg_conc = Some(-1.0), row_id = 3))))
    assert(col1[Int](df, "influenza_a_detected") === Seq(0, 0, 1, 0))
  }

  // --- §1.4-2: asymmetric NaT handling (codes.py:29-31) --------------------
  test("dateParts: bad date → week -1 but month/dayofweek stay null") {
    val df = Features.dateParts(nwssDf(Seq(
      NwssRow(sample_collect_date = Some("2023-01-15"), row_id = 0), // Sunday
      NwssRow(sample_collect_date = Some("not-a-date"), row_id = 1),
      NwssRow(sample_collect_date = None, row_id = 2))))
    assert(col1[Int](df, "collection_month") === Seq(1, null, null))
    assert(col1[Int](df, "collection_week") === Seq(2, -1, -1))
    assert(col1[Int](df, "collection_dayofweek") === Seq(6, null, null))
  }

  // --- §1.4-3: shift-then-fillna(0) (codes.py:56-59) -----------------------
  test("lag: leading rows AND null lagged values fill with 0") {
    val df = Features.lagFeatures(Seq(col("row_id")))(Features.logsAndLabel(nwssDf(Seq(
      NwssRow(wwtp_jurisdiction = Some("AK"), sample_collect_date = Some("2023-01-01"),
        pcr_target_avg_conc = Some(10.0), row_id = 0),
      NwssRow(wwtp_jurisdiction = Some("AK"), sample_collect_date = Some("2023-01-02"),
        pcr_target_avg_conc = None, row_id = 1), // log1p(null) = null → lagged null
      NwssRow(wwtp_jurisdiction = Some("AK"), sample_collect_date = Some("2023-01-03"),
        pcr_target_avg_conc = Some(5.0), row_id = 2),
      NwssRow(wwtp_jurisdiction = Some("AL"), sample_collect_date = Some("2023-01-01"),
        pcr_target_avg_conc = Some(7.0), row_id = 3)))))
    val lag1 = col1[Double](df, "log_conc_lag1")
    assert(lag1(0) === 0.0)                   // leading row
    assert(lag1(1) === math.log1p(10.0))
    assert(lag1(2) === 0.0)                   // lagged value was null → 0
    assert(lag1(3) === 0.0)                   // new group
    val lag2 = col1[Double](df, "log_conc_lag2")
    assert(lag2(0) === 0.0 && lag2(1) === 0.0)
    assert(lag2(2) === math.log1p(10.0))
  }

  test("lag: date ties are broken deterministically by the tiebreak column") {
    val base = Features.logsAndLabel(nwssDf(Seq(
      NwssRow(sample_collect_date = Some("2023-01-01"), pcr_target_avg_conc = Some(1.0), row_id = 0),
      NwssRow(sample_collect_date = Some("2023-01-01"), pcr_target_avg_conc = Some(2.0), row_id = 1),
      NwssRow(sample_collect_date = Some("2023-01-01"), pcr_target_avg_conc = Some(3.0), row_id = 2))))
    val df = Features.lagFeatures(Seq(col("row_id")))(base)
    assert(col1[Double](df, "log_conc_lag1") ===
      Seq(0.0, math.log1p(1.0), math.log1p(2.0)))
  }

  // --- pd.cut right-exclusive bins + cat.codes (codes.py:61-63,99-104) -----
  test("binPopulation: [0,20k)[20k,50k)[50k,200k)[200k,∞), null/negative → null") {
    val df = Features.encodeOrdinal(Features.binPopulation(nwssDf(Seq(
      NwssRow(population_served = Some(0L), row_id = 0),
      NwssRow(population_served = Some(19999L), row_id = 1),
      NwssRow(population_served = Some(20000L), row_id = 2),
      NwssRow(population_served = Some(49999L), row_id = 3),
      NwssRow(population_served = Some(50000L), row_id = 4),
      NwssRow(population_served = Some(199999L), row_id = 5),
      NwssRow(population_served = Some(200000L), row_id = 6),
      NwssRow(population_served = None, row_id = 7),
      NwssRow(population_served = Some(-5L), row_id = 8)))))
    assert(col1[String](df, "population_group") === Seq(
      "Small", "Small", "Medium", "Medium", "Large", "Large", "Very Large", null, null))
    assert(col1[Int](df, "population_group_encoded") === Seq(0, 0, 1, 1, 2, 2, 3, -1, -1))
  }

  // --- B9 conditional schema branches (codes.py:38-43,86-93) ---------------
  test("B9: absent pcr_target_flowpop_lin → constant-0 flag column") {
    val df = Features.imputeFlowpop(nwssDf(Seq(
      NwssRow(row_id = 0), NwssRow(row_id = 1))).drop("pcr_target_flowpop_lin"))
    assert(col1[Int](df, "flowpop_lin_missing") === Seq(0, 0))
  }

  test("B9: present flowpop — flag computed AFTER fill is constant 0 (reference bug preserved)") {
    val df = Features.imputeFlowpop(nwssDf(Seq(
      NwssRow(pcr_target_flowpop_lin = Some(4.0), row_id = 0),
      NwssRow(pcr_target_flowpop_lin = None, row_id = 1),
      NwssRow(pcr_target_flowpop_lin = Some(8.0), row_id = 2))))
    assert(col1[Int](df, "flowpop_lin_missing") === Seq(0, 0, 0))
    // null filled with exact interpolated median of {4, 8} = 6
    assert(col1[Double](df, "pcr_target_flowpop_lin") === Seq(4.0, 6.0, 8.0))
  }

  test("B9: absent rec_eff_percent → constant 0.0; present → clip keeps null (np.clip NaN)") {
    val absent = Features.clipRecEff(nwssDf(Seq(NwssRow(row_id = 0))).drop("rec_eff_percent"))
    assert(col1[Double](absent, "rec_eff_percent") === Seq(0.0))
    val present = Features.clipRecEff(nwssDf(Seq(
      NwssRow(rec_eff_percent = Some(150.0), row_id = 0),
      NwssRow(rec_eff_percent = Some(42.0), row_id = 1),
      NwssRow(rec_eff_percent = None, row_id = 2))))
    assert(col1[Double](present, "rec_eff_percent") === Seq(100.0, 42.0, null))
  }

  // --- imputeFlow: flag BEFORE fill (correct order, unlike stage 3) --------
  test("imputeFlow: missing flag reflects pre-fill nulls; fill uses exact median") {
    val df = Features.imputeFlow(nwssDf(Seq(
      NwssRow(flow_rate = Some(1.0), row_id = 0),
      NwssRow(flow_rate = None, row_id = 1),
      NwssRow(flow_rate = Some(3.0), row_id = 2))))
    assert(col1[Int](df, "flow_rate_missing") === Seq(0, 1, 0))
    assert(col1[Double](df, "flow_rate") === Seq(1.0, 2.0, 3.0))
  }

  // --- target encoding default (codes.py:67-69) ----------------------------
  test("targetEncode: per-jurisdiction label mean; null jurisdiction → 0.5") {
    val df = Features.targetEncode(Features.logsAndLabel(nwssDf(Seq(
      NwssRow(wwtp_jurisdiction = Some("AK"), pcr_target_avg_conc = Some(1.0), row_id = 0),
      NwssRow(wwtp_jurisdiction = Some("AK"), pcr_target_avg_conc = None, row_id = 1),
      NwssRow(wwtp_jurisdiction = None, pcr_target_avg_conc = Some(1.0), row_id = 2)))))
    val enc = df.orderBy("row_id").select("jurisdiction_target_mean").collect().map(_.getDouble(0))
    assert(enc(0) === 0.5 && enc(1) === 0.5) // AK mean = (1+0)/2
    assert(enc(2) === 0.5)                   // null key falls back to default
  }

  // --- dedup is a fixpoint (codes.py:96) -----------------------------------
  test("dedup: idempotent and drops exact duplicates") {
    val df = nwssDf(Seq(NwssRow(row_id = 0), NwssRow(row_id = 0), NwssRow(row_id = 1)))
    val once = Features.dedup(df)
    assert(once.count() === 2)
    assert(Features.dedup(once).count() === 2)
  }

  // --- full composition smoke ----------------------------------------------
  test("pipeline: composes all 13 stages and emits every derived column") {
    val df = Features.pipeline(Seq(col("row_id")))(nwssDf(
      (0 until 8).map(i => NwssRow(
        wwtp_jurisdiction = Some(if (i % 2 == 0) "AK" else "AL"),
        sample_collect_date = Some(f"2023-01-${i + 1}%02d"),
        pcr_target_avg_conc = if (i % 3 == 0) None else Some(i.toDouble),
        row_id = i.toLong))))
    graft.schema.Nwss.derived.foreach(c => assert(df.columns.contains(c), s"missing $c"))
    // 12 test columns + 16 derived = 28 (the full 39 needs the 35-col fixture)
    assert(df.columns.length === 28)
    assert(df.count() === 8)
  }
}
