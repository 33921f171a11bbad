package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.LlmQueries

/** The l134 df-cap's loss accounting, pinned from both sides:
  *  - with the cap effectively off, the capped engine is EXACTLY the
  *    lossless l114 engine (same pair set — the cap is the only delta);
  *  - on a fixture engineered so one contained doc's every prefix shingle
  *    is corpus-hot, the cap misses exactly that doc's pairs and nothing
  *    else — the ε the declared audit row reports is real loss, not noise;
  *  - on the real corpus fixture the capped set is a subset of the exact
  *    set (the verify step guarantees no false positives survive).
  */
class ContainmentCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tau = 0.8

  /** A ⊂ B and A ⊂ H1..H6; A's shingles appear in all 8 docs (df = 8),
    * every other shingle is unique (df ≤ 2). */
  private def hotFixture = {
    import spark.implicits._
    val aTxt = "a1 a2 a3 a4 a5"
    val docs = Seq(
      (1L, aTxt),
      (2L, aTxt + " b1 b2 b3 b4 b5")) ++
      (1 to 6).map(k => (10L + k, aTxt + s" h${k}1 h${k}2 h${k}3 h${k}4 h${k}5"))
    docs.toDF("doc_id", "text")
  }

  test("cap off: capped engine ≡ the lossless engine pair-for-pair") {
    val df = hotFixture
    val exact = LlmQueries.containmentPairs(df, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedContainmentPairs(df, tau, cap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === capped)
    assert(exact.size === 7, s"fixture must yield A→B and A→H1..H6: $exact")
  }

  test("cap=4: exactly the hot-prefix doc's pairs are missed — ε is real loss") {
    val df = hotFixture
    val exact = LlmQueries.containmentPairs(df, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedContainmentPairs(df, tau, cap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((capped -- exact).isEmpty, "capped must never invent pairs")
    val missed = exact -- capped
    assert(missed === exact.filter(_._1 == 1L),
      s"exactly doc 1's pairs (every prefix shingle df=8 > 4) are undiscoverable: $missed")
    assert(missed.size === 7 && capped.isEmpty)
  }

  test("real corpus fixture: capped ⊆ exact and the declared audit row balances") {
    val sf = "/root/testdata/sf0.001"
    val row = LlmQueries.l134_capped_containment.fn(spark, sf).collect()(0)
    val (nExact, nCapped, missed) =
      (row.getLong(1), row.getLong(2), row.getLong(3))
    assert(nCapped <= nExact && missed === nExact - nCapped)
    assert(row.getLong(6) < row.getLong(5),
      "the cap must actually bite on the corpus index (postings refused)")
    assert(nExact > 0, "the aggregator augmentation must fire")
  }
}
