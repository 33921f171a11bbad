package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Work-row scaling audit (VERDICT r14 #2 + #6): candidate counts per SF
  * for every candidate-generating operator family, at THREE corpus sizes
  * for the document families.
  *
  * Why counts, not wall clocks: local[32] capacity-masks superlinear work
  * (the r14 positive control: naive containment's wall exponent +0.47
  * while its candidate rows grew at +1.99/decade), so each family's
  * CANDIDATE frame — now factored out of the production operators
  * (LlmQueries.jaccardCandidates / minhashCandidates / editCandidates /
  * incrementalCandidates / srpCandidates, RangeJoin.candidates) — is
  * counted directly. The audit reads the REAL candidate stage; there is
  * no re-derivation that can drift from the production filters (the one
  * exception: the l114 containment prefix filter is re-stated here in
  * the NaiveContainmentControl shape, kept as the saturated-vocabulary
  * positive control).
  *
  * Third document point (VERDICT r14 #6): `documents.parquet` is 500 rows
  * at BOTH sf0.001 and sf0.01 and 5 000 at sf0.1, so the committed
  * testdata spans exactly ONE document decade. [[genDocs]] materializes
  * an AUDIT-ONLY sf1-equivalent slice (50 000 docs, scratch path, never a
  * correctness input, regenerated on demand) that reproduces the
  * committed corpus's generative shape measured off sf0.1: the SAME
  * saturated 30-token vocabulary, uniform unigram draw, uniform lengths
  * 10–100, ~0.5% planted near-dup pairs (copy of the preceding doc with
  * the last token replaced by the 'dup' marker). Same for embeddings
  * (500 → 2 000 committed; 20 000 generated, value range matched).
  *
  * Run: `sbt 'Test/runMain graft.WorkRowAudit'` — prints one markdown
  * table (counts + per-decade row exponents) for BENCHNOTES.
  */
object WorkRowAudit {
  // the committed corpus's 30 live tokens (uniform unigram draw at every
  // SF; the 31st type 'dup' is the planted near-dup marker)
  private val Vocab = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  /** The sf1-equivalent documents slice: deterministic (hash-indexed —
    * no RNG state), same schema as the committed table. */
  def genDocs(spark: SparkSession, path: String, nDocs: Long,
      plantHub: Boolean = false): Unit = {
    val vocabCol = array(Vocab.map(lit): _*)
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") % 200 === 1, col("id") - 1).otherwise(col("id")).as("src_id"),
      (col("id") % 200 === 1).as("is_dup"))
    val len = (pmod(xxhash64(col("src_id"), lit("len")), lit(91)) + 10).cast("int")
    val toks = transform(sequence(lit(1), len), pos =>
      element_at(vocabCol, pmod(xxhash64(col("src_id"), pos), lit(30)).cast("int") + 1))
    // planted near-dup: previous doc's tokens with the tail swapped for
    // the marker — J well above the τ=0.8 verify bar, like the committed
    // corpus's 'dup' cohort
    val toks2 = when(col("is_dup"),
      concat(slice(toks, lit(1), size(toks) - 1), array(lit("dup")))).otherwise(toks)
    // boilerplate hub cohort (VERDICT r16 #5, wedge audit only — never
    // mixed into the slices the other families' committed series read):
    // every 200th doc (id % 200 == 7, disjoint from the dup cohort)
    // carries a SHARED 60-token template with only its last token
    // per-doc — pairwise trigram J ≈ 0.9 ≫ τ, so the cohort is a
    // mutual-near-dup clique whose size grows with the corpus, i.e. the
    // l196 scaladoc's "boilerplate shingle bridging docs" blowup mode
    val hubTemplate = transform(sequence(lit(1), lit(60)), pos =>
      element_at(vocabCol, pmod(xxhash64(lit(-1L), pos), lit(30)).cast("int") + 1))
    val hubToks = concat(slice(hubTemplate, lit(1), lit(59)),
      array(element_at(vocabCol,
        pmod(xxhash64(col("doc_id"), lit("hubvar")), lit(30)).cast("int") + 1)))
    val toks3 = if (plantHub)
      when(col("doc_id") % 200 === 7, hubToks).otherwise(toks2)
    else toks2
    base.select(col("doc_id"), concat_ws(" ", toks3).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(path)
  }

  /** The sf1-equivalent embeddings slice (value range matched to the
    * committed table's ~[-0.3, 0.3]). */
  def genEmbeddings(spark: SparkSession, path: String, n: Long): Unit = {
    spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)), pos =>
          (pmod(xxhash64(col("id"), pos), lit(600001)).cast("double") / lit(1e6)
            - lit(0.3)).cast("float")).as("embedding"),
        pmod(col("id"), lit(3)).cast("int").as("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(path)
  }

  private def sh(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.ops.TextOps.shingleSet(graft.ops.TextOps.tokens(col("text")), 3).as("ss"))

  private def phash(docs: DataFrame): DataFrame =
    graft.ops.MediaOps.perceptualHash(docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta")))

  /** The l114 containment prefix-filter candidate count — the
    * NaiveContainmentControl shape, kept as the positive control the
    * saturated vocabulary is known to blow up (+3.69/decade measured in
    * r14 over the single committed decade). */
  private def containCandidates(docs: DataFrame): Long = {
    val tau = 0.8
    val hashed = sh(docs).select(col("doc_id"), size(col("ss")).as("nf"),
      array_distinct(graft.functions.TextExprs.xxhash64Array(col("ss"))).as("hss"))
      .filter(col("nf") > 0)
    val ex = hashed.select(col("doc_id"), col("nf"), explode(col("hss")).as("sng"))
    val withDf = ex.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("sng"))).localCheckpoint(false)
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("sng"))
    val prefix = withDf.withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("nf") - ceil(lit(tau) * col("nf") - 1e-9) + 1)
      .select(col("doc_id").as("i"), col("sng"))
    val full = withDf.select(col("doc_id").as("j"), col("sng"))
    prefix.join(full, Seq("sng")).filter(col("i") =!= col("j"))
      .select("i", "j").distinct().count()
  }

  /** l29's declared adaptive signature width (the l29 query's own rule). */
  private def srpRows(n: Long): Int =
    (4 to 12).find(r => (32L << r) >= n).getOrElse(12)

  private def e5Candidates(spark: SparkSession, d: String): Long = {
    val ev = Tables.events(spark, d)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 3 DAYS")).as("s_end"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("e_ts"))
    graft.ops.RangeJoin.candidates(
      errors, signups, "user_id", "e_ts", "s_ts", "s_end").count()
  }

  private def e16Candidates(spark: SparkSession, d: String): Long = {
    val ev = Tables.events(spark, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_s"), (col("ts") + expr("INTERVAL 2 DAYS")).as("p_e"))
    val sg = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("user_id"),
        col("ts").as("s_s"), (col("ts") + expr("INTERVAL 3 DAYS")).as("s_e"))
    graft.ops.OverlapJoin.candidates(
      p, sg, "user_id", "p_s", "p_e", "s_s", "s_e").count()
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val genBase = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_audit"
    val docsGen = s"$genBase/documents.parquet"
    val embGen = s"$genBase/embeddings.parquet"
    genDocs(spark, docsGen, 50000L)
    genEmbeddings(spark, embGen, 20000L)

    def docsAt(p: String): DataFrame = spark.read.parquet(p)
    val docPoints = Seq(
      ("sf0.01", "/root/testdata/sf0.01/documents.parquet"),
      ("sf0.1", "/root/testdata/sf0.1/documents.parquet"),
      ("sf1*", docsGen))
    val embPoints = Seq(
      ("sf0.01", "/root/testdata/sf0.01/embeddings.parquet"),
      ("sf0.1", "/root/testdata/sf0.1/embeddings.parquet"),
      ("sf1*", embGen))

    import graft.queries.LlmQueries
    val docFamilies: Seq[(String, DataFrame => Long)] = Seq(
      ("l4 prefix+positional (PPJoin)",
        (d: DataFrame) => LlmQueries.jaccardCandidates(sh(d)).count()),
      ("l5 minhash band buckets",
        (d: DataFrame) => LlmQueries.minhashCandidates(sh(d)).count()),
      ("l26 PassJoin segments",
        (d: DataFrame) => LlmQueries.editCandidates(
          d.select(col("doc_id"), lower(substring(col("text"), 1, 20)).as("s20"))).count()),
      ("l97 incremental probe",
        (d: DataFrame) => LlmQueries.incrementalCandidates(
          sh(d.filter(col("doc_id") % 2 === 0)),
          sh(d.filter(col("doc_id") % 2 === 1))).count()),
      ("l114 containment prefix (control)",
        (d: DataFrame) => containCandidates(d)),
      ("l139 df-capped Jaccard (cap=4, the valve)",
        (d: DataFrame) => LlmQueries.cappedJaccardCandidates(
          sh(d), tau = 0.8, cap = 4).count()),
      ("l162 df-capped PassJoin (cap=4, the valve)",
        (d: DataFrame) => LlmQueries.cappedEditCandidates(
          d.select(col("doc_id"), lower(substring(col("text"), 1, 20)).as("s20")),
          k = 2, cap = 4).count()),
      ("l161 df-capped incremental (cap=4, the valve)",
        (d: DataFrame) => LlmQueries.cappedIncrementalCandidates(
          sh(d.filter(col("doc_id") % 2 === 0)),
          sh(d.filter(col("doc_id") % 2 === 1)), tau = 0.8, cap = 4).count()),
      ("l196 wedge checks (on the verified pair graph)",
        (d: DataFrame) => LlmQueries.wedgeCandidates(
          LlmQueries.jaccardNearDupFrom(sh(d))).count()),
      // the DECLARED row since r19 (VERDICT r18 #2): 4x16-bit bands,
      // ham<=3 pigeonhole, band space 65536 values
      ("l150 dHash 4x16 bands (the declared row)",
        (d: DataFrame) => LlmQueries.hammingCandidates(
          LlmQueries.rebandTo16(phash(d))).count()),
      // the 8x8 demo form stays ONLY as the saturation comparison point:
      // 256-value band space, Sigma C(n_b,2) ~ N^2/2^9 once saturated —
      // the +1.54 bytes/decade shape the r18 audit missed behind a quiet
      // wall
      ("l150 dHash 8x8 bands (saturation comparison, NOT declared)",
        (d: DataFrame) => LlmQueries.hammingCandidates(phash(d)).count()))

    val out = new StringBuilder
    out ++= "| family | " + docPoints.map(_._1).mkString(" | ") +
      " | exp/decade |\n"
    out ++= "|---|" + docPoints.map(_ => "---").mkString("|") + "|---|\n"
    def expStr(cs: Seq[Long]): String =
      cs.sliding(2).map { case Seq(a, b) =>
        if (a > 0 && b > 0) f"${math.log10(b.toDouble / a)}%+.2f" else "n/a"
      }.mkString(" / ")
    docFamilies.foreach { case (name, f) =>
      val cs = docPoints.map { case (_, p) => f(docsAt(p)) }
      out ++= s"| $name | " + cs.mkString(" | ") + s" | ${expStr(cs)} |\n"
      println(s"[audit] $name: ${cs.mkString(", ")}")
    }
    // Wedge family on HUB-PLANTED slices (VERDICT r16 #5): the committed
    // corpora's dup graph is a pure matching (0 wedges at every point),
    // so l196's committed-series row above cannot show the blowup mode OR
    // the cap working. These three generated points plant the boilerplate
    // clique (cohort size n/200) at EVERY size, so the series is
    // meaningful end to end: uncapped wedges grow ~ cohort³ (the ≥ +2
    // exponent that triggered declaring l212), capped wedges grow ~ n.
    val hubPoints = Seq(500L, 5000L, 50000L)
    val hubDirs = hubPoints.map { n =>
      val d = s"$genBase/hub_docs_$n.parquet"
      genDocs(spark, d, n, plantHub = true)
      (s"hub$n", d)
    }
    val wedgeFamilies: Seq[(String, DataFrame => Long)] = Seq(
      ("l196 wedges (hub-planted)",
        (d: DataFrame) => LlmQueries.wedgeCandidates(
          LlmQueries.jaccardNearDupFrom(sh(d))).count()),
      ("l212 capped wedges (cap=8, the valve)",
        (d: DataFrame) => LlmQueries.cappedWedgeCandidates(
          LlmQueries.jaccardNearDupFrom(sh(d)), cap = 8).count()))
    wedgeFamilies.foreach { case (name, f) =>
      val cs = hubDirs.map { case (_, p) => f(docsAt(p)) }
      out ++= s"| $name | " + cs.mkString(" | ") + s" | ${expStr(cs)} |\n"
      println(s"[audit] $name: ${cs.mkString(", ")}")
    }

    // l29: embeddings, the query's own adaptive width per point
    val l29cs = embPoints.map { case (_, p) =>
      val e = spark.read.parquet(p)
      val n = e.count()
      val r = srpRows(n)
      LlmQueries.srpCandidates(planes = 8 * r, bands = 8, rows = r)(e).count()
    }
    out ++= s"| l29 hyperplane-LSH buckets (adaptive rows) | " +
      l29cs.mkString(" | ") + s" | ${expStr(l29cs)} |\n"
    println(s"[audit] l29: ${l29cs.mkString(", ")}")
    // e5: events DO scale with SF — three committed decades, no slice
    val e5points = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val e5cs = e5points.map(d => e5Candidates(spark, d))
    out ++= s"| e5 range-join buckets (events sf0.001→0.1) | " +
      e5cs.mkString(" | ") + s" | ${expStr(e5cs)} |\n"
    println(s"[audit] e5: ${e5cs.mkString(", ")}")
    // e16: canonical-bucket candidates (post-dedup-rule, pre-overlap
    // filter) over the same three committed event decades
    val e16cs = e5points.map(d => e16Candidates(spark, d))
    out ++= s"| e16 overlap-join canonical candidates (events " +
      s"sf0.001→0.1) | " + e16cs.mkString(" | ") +
      s" | ${expStr(e16cs)} |\n"
    println(s"[audit] e16: ${e16cs.mkString(", ")}")
    // e16/e17 hub series (VERDICT r18 #5): the committed events have no
    // hot calendar cell, so the committed series cannot show the blowup
    // mode OR the cap working. Plant a hub user whose same-day interval
    // count grows with the corpus (h = n/50 per side, all in one day
    // bucket): uncapped canonical candidates grow ~h² (+2/decade), the
    // work-capped engine refuses the hub cell once h² > 16 and stays
    // linear in the background.
    val hubSizes = Seq(500L, 5000L, 50000L)
    def hubFrames(n: Long): (DataFrame, DataFrame) = {
      val h = n / 50
      val base = 1704067200L // 2024-01-01, clear of the committed range
      def mk(side: String, lenS: Long) = spark.range(n).select(
        col("id").as(s"${side}_id"),
        when(col("id") < h, lit(-1L)).otherwise(col("id")).as("user_id"),
        timestamp_seconds(
          when(col("id") < h, lit(base) + col("id"))
            .otherwise(lit(base) + (col("id") * 86400L * 3L)))
          .as(s"${side}_s"))
        .withColumn(s"${side}_e",
          col(s"${side}_s") + expr(s"INTERVAL $lenS SECONDS"))
      (mk("a", 3600L), mk("b", 3600L))
    }
    val hubUn = hubSizes.map { n =>
      val (a, b) = hubFrames(n)
      graft.ops.OverlapJoin.candidates(
        a, b, "user_id", "a_s", "a_e", "b_s", "b_e").count()
    }
    val hubCap = hubSizes.map { n =>
      val (a, b) = hubFrames(n)
      graft.ops.OverlapJoin.cappedCandidates(
        a, b, "user_id", "a_s", "a_e", "b_s", "b_e", workCap = 16L).count()
    }
    out ++= s"| e16 overlap candidates (hub-planted, h = n/50) | " +
      hubUn.mkString(" | ") + s" | ${expStr(hubUn)} |\n"
    out ++= s"| e17 work-capped overlap candidates (cap=16, the valve) | " +
      hubCap.mkString(" | ") + s" | ${expStr(hubCap)} |\n"
    println(s"[audit] e16 hub: ${hubUn.mkString(", ")}")
    println(s"[audit] e17 hub capped: ${hubCap.mkString(", ")}")
    println()
    println("rows = docs 500 / 5000 / 50000*; vectors 500 / 2000 / 20000*; " +
      "* = generated audit slice (see scaladoc)")
    println(out.result())
  }
}
