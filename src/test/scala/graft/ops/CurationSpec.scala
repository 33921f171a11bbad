package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.LlmQueries

/** Invariants of the corpus-curation operators (l15-l18) beyond what the
  * DuckDB value oracle pins:
  *  - l17 sampling is a pure function of (doc_id, lang) — the SAME rows
  *    survive under any partitioning, which is the whole point of hash
  *    keying over rand();
  *  - l16 normalization is idempotent, and a redacted text re-redacts to
  *    itself (no mask matches a pattern);
  *  - l15's keep flag is exactly the threshold predicate over the emitted
  *    metrics (no hidden state);
  *  - l18 emits ≤ 3 rows per doc with ranks 1..k, and rank 1 carries the
  *    per-doc maximum score.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("l17: survivor set ≡ an independent JVM md5 of (doc_id, lang)") {
    // the sample must be a pure function of row CONTENT — reproducible
    // across engines and partitionings. Recompute it sequentially with
    // java.security MessageDigest and compare sets.
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
    }
    val expected = docs.filter { case (id, lang) =>
      bucket(id) < (if (lang == "en") 10 else 40)
    }.map(_._1).toSet
    val got = LlmQueries.l17_stratified_sample.fn(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.length)
  }

  test("l16: normalization is idempotent; redacted text is a fixpoint") {
    val out = LlmQueries.l16_normalize_redact.fn(spark, sf)
    // whitespace canonicalization is a fixpoint of clean_text (lowercase
    // is not re-checked: the masks are deliberately uppercase)
    val renorm = out.select(col("doc_id"),
      (col("clean_text") ===
        trim(regexp_replace(col("clean_text"), " +", " "))).as("idem"))
    assert(renorm.filter(!col("idem")).count() == 0)
    // masks contain no lowercase alnum runs matching the patterns, so a
    // second redaction pass changes nothing
    val pats = out.filter(
      col("clean_text").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]+") ||
        col("clean_text").rlike("\\+1-555-[0-9]+"))
    assert(pats.count() == 0)
    // injection actually fired: doc 0 is a %7 doc and must carry masks
    val masked = out.filter(col("n_emails") > 0)
    assert(masked.count() > 0)
  }

  test("l15: keep flag ≡ threshold predicate over the emitted metrics") {
    val out = LlmQueries.l15_quality_filter.fn(spark, sf)
    // re-derive from the ROUNDED emitted metrics; rows whose raw metric
    // sits within rounding distance (1e-6) of a threshold can
    // legitimately flip, so only clear-margin rows must agree
    val re = out.withColumn("keep2",
      (col("dup_bigram_frac") <= 0.05 && col("top_bigram_frac") <= 0.06 &&
        col("n_tokens") >= 20 && col("short_token_frac") <= 0.1).cast("long"))
    val clear = re.filter(
      abs(col("dup_bigram_frac") - 0.05) > 1e-6 &&
        abs(col("top_bigram_frac") - 0.06) > 1e-6 &&
        abs(col("short_token_frac") - 0.1) > 1e-6)
    assert(clear.filter(col("keep") =!= col("keep2")).count() == 0)
    assert(clear.count() > 0)
    // the filter must actually split the corpus
    val k = out.filter(col("keep") === 1).count()
    assert(k > 0 && k < out.count())
  }

  test("l18: ≤3 rows per doc, dense ranks from 1, rank 1 is the max score") {
    val out = LlmQueries.l18_tfidf_topterms.fn(spark, sf)
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rk").as("minrk"), max("rk").as("maxrk"),
        max("tfidf").as("maxscore"),
        max(when(col("rk") === 1, col("tfidf"))).as("r1score"))
    assert(perDoc.filter(col("n") > 3 || col("minrk") =!= 1 ||
      col("maxrk") =!= col("n")).count() == 0)
    assert(perDoc.filter(col("r1score") < col("maxscore")).count() == 0)
  }
}
