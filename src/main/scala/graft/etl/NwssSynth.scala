package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic generator for the NWSS input CSV shape
  * (FIXTURES.md §1: 35 columns, ipynb:38-80 value domains). The real blob was
  * stripped from the reference repo (.MISSING_LARGE_BLOBS:1), so golden tests
  * replay EP1/EP3 on this instead.
  *
  * Every value derives from `xxhash64(id, seed, tag)` — NO rand(): results
  * are identical under any partitioning / core count / execution order, which
  * is what makes golden assertions on row counts and model metrics possible.
  *
  * The label's latent structure is tunable so the ML golden test (SURVEY §5.2-2)
  * can be calibrated to the notebook's published metrics (BASELINE.md):
  *  - `jurSd`    per-jurisdiction base rate  → linear signal via target encoding;
  *  - `waveAmp`  per-jurisdiction epidemic wave → signal via the lag features;
  *  - `seasonAmp` calendar-month cosine and `popNl` non-monotone population
  *    response → NON-linear signal a depth-3 GBT captures but OLS cannot,
  *    which is what opens the reference's GBT-vs-OLS metric gap;
  *  - `noise`    logistic noise → overall AUC level;
  *  - `threshold` → class balance (reference: 58/42, ipynb:483-489).
  */
object NwssSynth {

  final case class Config(
      rows: Long = 265000L,
      nJurisdictions: Int = 57,
      nSites: Int = 420,
      days: Int = 730, // 2022-01-01 .. 2023-12-31
      // latent-label knobs (calibrated against BASELINE.md by GoldenSpec)
      noise: Double = 1.0,
      jurSd: Double = 0.9,
      waveAmp: Double = 1.0,
      seasonAmp: Double = 0.8,
      popLin: Double = 0.35,
      popNl: Double = 0.8,
      recLin: Double = 0.15,
      threshold: Double = 0.25,
      slope: Double = 1.0, // sigmoid sharpness: saturates the extremes (head purity)
      pMiss: Double = 0.0, // one-sided missed-detection rate (false negatives)
      missBelow: Double = 99.0, // latent ceiling for pMiss: misses happen only in
                                // samples whose latent (≈ concentration) sits below
                                // this — the assay-sensitivity reality that
                                // detections near the LOD get dropped. Mid-latent
                                // misses land mid-RANKING: they pull AUC down
                                // without polluting the score head (AP) or the
                                // 0.5 decision boundary (accuracy/confusion);
                                // 99.0 = unconditional (the old behavior)
      winterMiss: Double = 0.0, // extra flow-missingness during surges: a near-
                                // BINARY predictor — separates cleanly at the
                                // 0.5 threshold (accuracy↑) but its ties cap
                                // what it can add to ranking (AUC barely moves)
      concSd: Double = 0.4,
      recPopCorr: Double = 0.7,  // rec-eff's loading on the site-size factor
                                 // (bigger utilities run tighter assays): with the
                                 // pop/flow/interaction block it sets how much of
                                 // rec_eff is its own PCA direction
      dowPopSlope: Double = 1.25, // how sharply sampling weekday tracks plant
                                  // size (fixed composite schedules at big
                                  // utilities): ditto for collection_dayofweek
      concFloor: Double = -99.0, // conc stops tracking the latent below this:
                                 // off-season lag features lose RANKING info
                                 // (AUC↓) while regime info (0 vs low vs high)
                                 // survives (accuracy/AP ~unchanged)
      // missingness / dirtiness (exercises every §1.4 edge)
      pBadDate: Double = 0.010,
      pNullDate: Double = 0.005,
      pFlowNullSmall: Double = 0.30, // small plants miss flow far more often:
      pFlowNullBig: Double = 0.02,   //  ties flow_rate_missing to the pop factor
      pConcNull: Double = 0.06,      // null conc → label 0 (codes.py:50)
      pFlowpopNull: Double = 0.25,
      pLodNull: Double = 0.30,
      pPastNull: Double = 0.10,
      pCountyNull: Double = 0.05,
      pGeneNull: Double = 0.08,
      pRecNull: Double = 0.05,
      pDup: Double = 0.002, // exact duplicate rows (dedup, codes.py:96)
      seed: Long = 42L)

  /** 35-column DataFrame matching schema.Nwss.raw exactly. */
  def generate(spark: SparkSession, cfg: Config, numPartitions: Int = 32): DataFrame = {
    val big = 1L << 40

    // uniform in (0,1) from a hash of (expr, seed, tag) — partitioning-proof
    def uOf(e: Column, tag: String): Column =
      (pmod(xxhash64(e, lit(cfg.seed), lit(tag)), lit(big)).cast(DoubleType) + 0.5) / big.toDouble
    // standard normal via Box-Muller on two independent hashes
    def zOf(e: Column, tag: String): Column =
      sqrt(lit(-2.0) * log(uOf(e, tag + "~1"))) * cos(lit(2.0 * math.Pi) * uOf(e, tag + "~2"))

    val df0 = spark.range(0L, cfg.rows, 1L, numPartitions)

    // ---- staged shared-column materialization (VERDICT r16 #2) ----------
    // Every multiply-referenced non-cheap expression becomes a NAMED column
    // in its own select. CollapseProject never inlines a non-cheap output
    // that is referenced more than once, so the stages survive to the
    // physical plan, and whole-stage codegen evaluates each shared value
    // ONCE into a local instead of duplicating its entire hash/Box-Muller
    // tree into every consumer. The old single-select form collapsed to a
    // ~17k-line generated method that janino refused to compile — Spark
    // fell back to INTERPRETED execution for the whole synth stage,
    // silently (only an ERROR log line). CodegenHardeningSpec pins the
    // compiled path; GoldenSpec pins that values are bit-identical (same
    // expressions, same double ops — only the sharing structure changed).

    // duplicate rows: a pDup fraction of ids clone their predecessor entirely
    val s1 = df0.select(
      when(uOf(col("id"), "dup") < cfg.pDup && col("id") > 0, col("id") - 1)
        .otherwise(col("id")).as("gbase"))

    def u(tag: String): Column = uOf(col("gbase"), tag)
    def z(tag: String): Column = zOf(col("gbase"), tag)

    // --- entities: sewershed site → jurisdiction (sites nest in states) ----
    val s2 = s1.select(col("gbase"),
      pmod(xxhash64(col("gbase"), lit(cfg.seed), lit("site")),
        lit(cfg.nSites.toLong)).as("gsid"),
      pmod(xxhash64(col("gbase"), lit(cfg.seed), lit("week")),
        lit((cfg.days / 7).toLong)).as("gweek"))

    val s3 = s2.select(col("*"),
      pmod(xxhash64(col("gsid"), lit(cfg.seed), lit("jur")),
        lit(cfg.nJurisdictions.toLong)).as("gjid"),
      // the site-size factor: shared by population AND rec-eff's loading
      zOf(col("gsid"), "pop").as("gzpop"))

    // population per site, log-normal-ish; pinned bin-edge sites (FIXTURES §1)
    val popRaw = round(exp(lit(8.2) + lit(1.8) * col("gzpop")))
    val s4 = s3.select(col("*"),
      when(col("gsid") === 0, 20000L).when(col("gsid") === 1, 50000L)
        .when(col("gsid") === 2, 200000L)
        .otherwise(greatest(least(popRaw, lit(5000000.0)), lit(800.0))
          .cast(LongType)).as("gpop"),
      // epidemic waves are near-synchronized across jurisdictions (flu
      // season): ±4-week phase jitter keeps detection regimes bimodal
      (pmod(xxhash64(col("gjid"), lit(cfg.seed), lit("phase")), lit(9L)) - 4L)
        .cast(DoubleType).as("gphase"))

    val recZ = lit(cfg.recPopCorr) * col("gzpop") +
      lit(math.sqrt(1.0 - cfg.recPopCorr * cfg.recPopCorr)) * z("rec")
    val s5 = s4.select(col("*"),
      log1p(col("gpop").cast(DoubleType)).as("glogpop"),
      round(lit(55.0) + lit(22.0) * recZ, 2).as("grecval")) // tail crosses 100 → clip bites

    // --- time ---------------------------------------------------------------
    // sampling weekday follows plant size (big plants sample late-week)
    val dowBase = least(lit(5.0),
      greatest(lit(0.0), floor((col("glogpop") - 7.5) * cfg.dowPopSlope)))
    val dow = dowBase.cast(LongType) +
      pmod(xxhash64(col("gbase"), lit(cfg.seed), lit("dowj")), lit(2L))
    val dayIdx = col("gweek") * 7 + dow
    // 2022-01-03 is a Monday, so weekday(date) == dow (Mon=0)
    val s6 = s5.select(col("*"),
      date_add(to_date(lit("2022-01-03")), dayIdx.cast(IntegerType)).as("gdate"))

    // --- latent detection propensity ---------------------------------------
    val jurBase = lit(cfg.jurSd) * zOf(col("gjid"), "jbase")
    val wave = cos(lit(2.0 * math.Pi) *
      (col("gweek").cast(DoubleType) + col("gphase")) / 52.0) // winter peak
    val season = cos(lit(2.0 * math.Pi) *
      (month(col("gdate")).cast(DoubleType) - 1.0) / 12.0)
    val popDev = (col("glogpop") - 10.5) / 1.2
    val latent = jurBase +
      lit(cfg.waveAmp) * wave +
      lit(cfg.seasonAmp) * season +
      lit(cfg.popLin) * (col("glogpop") - 10.0) +
      lit(cfg.popNl) * (exp(lit(-0.5) * popDev * popDev) - 0.5) +
      lit(cfg.recLin) * coalesce((col("grecval") - 55.0) / 22.0, lit(0.0)) +
      lit(cfg.noise) * z("eps")
    val s7 = s6.select(col("*"), latent.as("glatent"))

    val pDet = lit(1.0) /
      (lit(1.0) + exp(lit(-cfg.slope) * (col("glatent") - cfg.threshold)))
    val detected = u("det") < pDet &&
      !(col("glatent") < cfg.missBelow && u("miss") < cfg.pMiss)
    val s8 = s7.select(col("*"),
      when(u("concnull") < cfg.pConcNull, lit(null).cast(DoubleType))
        .when(detected, round(exp(lit(2.0) +
          lit(0.9) * greatest(col("glatent"), lit(cfg.concFloor)) +
          lit(cfg.concSd) * z("conc")), 4))
        .otherwise(lit(0.0)).as("gconc"))

    // --- single-use columns, inlined in the final projection ----------------
    val dateStr = date_format(col("gdate"), "yyyy-MM-dd")
    val collectDate = when(u("nulldate") < cfg.pNullDate, lit(null).cast(StringType))
      .when(u("baddate") < cfg.pBadDate, concat(lit("x"), dateStr)) // leading junk → NaT
      .otherwise(dateStr)
    val flowVal = round(lit(0.004) * pow(col("gpop").cast(DoubleType), 0.92) *
      exp(lit(0.10) * z("flow")), 3)
    val surging = cos(lit(2.0 * math.Pi) *
      (col("gweek").cast(DoubleType) + col("gphase")) / 52.0) > 0.35
    val pFlowNull = when(col("gpop") < 20000L, cfg.pFlowNullSmall)
      .otherwise(cfg.pFlowNullBig) +
      when(surging, cfg.winterMiss).otherwise(0.0)
    val flow = when(u("flownull") < pFlowNull, lit(null).cast(DoubleType))
      .otherwise(flowVal)
    val rec = when(u("recnull") < cfg.pRecNull, lit(null).cast(DoubleType))
      .otherwise(col("grecval"))
    val flowpop = when(u("fpnull") < cfg.pFlowpopNull, lit(null).cast(DoubleType))
      .otherwise(round(coalesce(col("gconc"), lit(0.0)) * lit(1000.0) + lit(860.0), 3))
    val lod = when(u("lodnull") < cfg.pLodNull, lit(null).cast(DoubleType))
      .otherwise(round(exp(lit(1.0) + lit(0.5) * z("lod")), 4))

    // --- categorical / string columns --------------------------------------
    def pick(tag: String, vs: Seq[String]): Column =
      vs.zipWithIndex.foldLeft(lit(vs.head)) { case (acc, (v, i)) =>
        when(pmod(xxhash64(col("gbase"), lit(cfg.seed), lit(tag)),
          lit(vs.size.toLong)) === i, v).otherwise(acc)
      }
    val jurName = concat(lit("J"), lpad(col("gjid").cast(StringType), 2, "0"))
    val pasteurized = when(u("pastnull") < cfg.pPastNull, lit(null).cast(StringType))
      .when(u("past") < 0.85, "No").otherwise("Yes")
    val counties = when(u("ctynull") < cfg.pCountyNull, lit(null).cast(StringType))
      .otherwise(concat(lit("County"),
        lpad(pmod(col("gsid"), lit(97L)).cast(StringType), 2, "0")))
    val gene = when(u("genenull") < cfg.pGeneNull, lit(null).cast(StringType))
      .otherwise(pick("gene", Seq("n1", "n2", "n1/n2")))

    s8.select(
      col("gsid").cast(IntegerType).as("sewershed_id"),
      jurName.as("wwtp_jurisdiction"),
      lpad(pmod(xxhash64(col("gsid"), lit(cfg.seed), lit("fips")), lit(99999L)).cast(StringType), 5, "0").as("county_fips"),
      counties.as("counties_served"),
      col("gpop").as("population_served"),
      md5(concat(lit("s"), col("gbase").cast(StringType), lit(cfg.seed))).as("sample_id"),
      collectDate.as("sample_collect_date"),
      pick("stype", Seq("24-hr time-weighted composite", "grab")).as("sample_type"),
      pick("smatrix", Seq("raw wastewater", "post grit removal")).as("sample_matrix"),
      lit("wwtp").as("sample_location"),
      flow.as("flow_rate"),
      lit("flu a").as("pcr_target"),
      col("gconc").as("pcr_target_avg_conc"),
      flowpop.as("pcr_target_flowpop_lin"),
      round(u("mic") / 10000.0, 8).as("pcr_target_mic_lin"),
      gene.as("pcr_gene_target_agg"),
      lod.as("lod_sewage"),
      pick("ntc", Seq("no", "yes")).as("ntc_amplify"),
      pick("inhib", Seq("none", "dilution")).as("inhibition_adjust"),
      pasteurized.as("pasteurized"),
      lit("pepper mild mottle virus").as("hum_frac_target_mic"),
      round(exp(lit(19.0) + z("hum")), 2).as("hum_frac_mic_conc"),
      lit("copies/l wastewater").as("hum_frac_mic_unit"),
      rec.as("rec_eff_percent"),
      lit("bcov vaccine").as("rec_eff_target_name"),
      lit("raw sample").as("rec_eff_spike_matrix"),
      round(lit(5.0) * u("spike"), 3).as("rec_eff_spike_conc"),
      lit("09/26/2025 10:40:00 AM").as("date_updated"),
      pick("f1", Seq("a", "b", "c")).as("filler_01"),
      pick("f2", Seq("a", "b")).as("filler_02"),
      pick("f3", Seq("x", "y", "z")).as("filler_03"),
      lit("const").as("filler_04"),
      pick("f5", Seq("p", "q")).as("filler_05"),
      pick("f6", Seq("m", "n")).as("filler_06"),
      lit("tail").as("filler_07"))
  }

  /** Round-trip through an on-disk CSV so tests exercise the real A1 scan
    * path (header + explicit schema, codes.py:21). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(graft.schema.Nwss.raw).option("header", "true").csv(path)
}
