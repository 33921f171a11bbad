package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.LlmQueries

/** l139 (df-capped Jaccard near-dup) pins — the ContainmentCapSpec
  * discipline for the symmetric family:
  *   - cap off ⇒ the capped engine reproduces l4's lossless engine
  *     pair-for-pair (prefix theorem under the string (df, s) order —
  *     order-insensitivity is the theorem's whole claim);
  *   - a df-hot fixture where the cap PROVABLY loses pairs, so ε is
  *     demonstrated real loss, not decoration;
  *   - capped ⊆ exact always (a cap can only remove candidates).
  */
class CappedJaccardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tau = 0.5

  private def shOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      graft.ops.TextOps.shingleSet(
        graft.ops.TextOps.tokens(col("text")), 3).as("ss"))

  /** Two J=1 pairs: docs 1/2 share ALL shingles drawn from a hot phrase
    * that also riddles six noise docs (every shared shingle df ≥ 8), and
    * docs 3/4 are identical over shingles nothing else has (df = 2). A
    * df cap below 8 can only discover the (3,4) pair. */
  private def hotFixture = {
    import spark.implicits._
    val hot = "a1 a2 a3 a4 a5 a6 a7"
    val rare = "r1 r2 r3 r4 r5 r6 r7"
    val docs = Seq((1L, hot), (2L, hot), (3L, rare), (4L, rare)) ++
      (1 to 6).map(k => (10L + k, hot + s" n${k}1 n${k}2 n${k}3 n${k}4 n${k}5 n${k}6 n${k}7 n${k}8"))
    docs.toDF("doc_id", "text")
  }

  test("cap off: capped engine ≡ l4's lossless engine pair-for-pair") {
    val sh = shOf(hotFixture)
    val exact = LlmQueries.jaccardNearDupFrom(sh, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedJaccardPairs(sh, tau, cap = 1000000L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === capped)
    assert(exact.contains((1L, 2L)) && exact.contains((3L, 4L)),
      s"fixture must yield both planted J=1 pairs: $exact")
  }

  test("cap=4: the hot-vocabulary pair is provably lost, the rare pair kept") {
    val sh = shOf(hotFixture)
    val exact = LlmQueries.jaccardNearDupFrom(sh, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedJaccardPairs(sh, tau, cap = 4L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((capped -- exact).isEmpty, "capped must never invent pairs")
    assert(capped.contains((3L, 4L)), "df=2 prefixes survive a cap of 4")
    assert(!capped.contains((1L, 2L)),
      "every (1,2) prefix shingle has df >= 8 — the cap must make the pair undiscoverable")
  }

  // ---- l161: the same cap composed into l97's incremental probe ----

  private def parity(df: org.apache.spark.sql.DataFrame, even: Boolean) =
    if (even) df.filter(col("doc_id") % 2 === 0)
    else df.filter(col("doc_id") % 2 === 1)

  test("l161 cap off: capped incremental ≡ l97's lossless incremental engine") {
    val sh = shOf(hotFixture)
    val (base, inc) = (parity(sh, even = true), parity(sh, even = false))
    val exact = LlmQueries.jaccardIncrementalFrom(base, inc, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedIncrementalPairs(base, inc, tau, cap = 1000000L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === capped)
    assert(exact.contains((2L, 1L)) && exact.contains((4L, 3L)),
      s"both planted J=1 pairs are cross-parity and must survive: $exact")
  }

  test("l161 cap=2: the hot cross-era pair is provably lost, the rare pair kept") {
    val sh = shOf(hotFixture)
    val (base, inc) = (parity(sh, even = true), parity(sh, even = false))
    val exact = LlmQueries.jaccardIncrementalFrom(base, inc, tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every hot shingle lives in base docs {2, 12, 14, 16} → base df = 4;
    // the rare pair's shingles live only in base doc 4 → base df = 1
    val capped = LlmQueries.cappedIncrementalPairs(base, inc, tau, cap = 2L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((capped -- exact).isEmpty, "capped must never invent pairs")
    assert(capped.contains((4L, 3L)), "base-df=1 prefixes survive a cap of 2")
    assert(!capped.contains((2L, 1L)),
      "every (2,1) prefix shingle has base df = 4 — cap 2 must make the pair undiscoverable")
  }

  test("l161 real corpus: capped ⊆ exact, and the declared audit row balances") {
    val sf = "/root/testdata/sf0.001"
    val row = LlmQueries.l161_capped_incremental.fn(spark, sf).collect()(0)
    val (cap, nExact, nCapped, missed) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(cap === 4L)
    assert(nCapped <= nExact && missed === nExact - nCapped)
    assert(row.getLong(6) < row.getLong(5),
      "the cap must bite (postings_kept < postings_total) on the saturated corpus")
    if (nExact > 0) {
      val eps = row.getDouble(4)
      assert(math.abs(eps - missed.toDouble / nExact) < 1e-6)
    }
  }

  test("real corpus: capped ⊆ exact, and the declared audit row balances") {
    val sf = "/root/testdata/sf0.001"
    val row = LlmQueries.l139_capped_neardup.fn(spark, sf).collect()(0)
    val (cap, nExact, nCapped, missed) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(cap === 4L)
    assert(nCapped <= nExact && missed === nExact - nCapped)
    assert(row.getLong(6) < row.getLong(5),
      "the cap must bite (postings_kept < postings_total) on the saturated corpus")
    if (nExact > 0) {
      val eps = row.getDouble(4)
      assert(math.abs(eps - missed.toDouble / nExact) < 1e-6)
    }
  }
}
