package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.LlmQueries

/** l162 (segment-df-capped PassJoin) pins — the CappedJaccardSpec
  * discipline for the edit-distance family:
  *   - cap off ⇒ the capped engine reproduces l26's lossless PassJoin
  *     engine pair-for-pair (the lemma is untouched by a cap that
  *     refuses nothing);
  *   - a segment-hot fixture where the cap PROVABLY loses a pair (every
  *     canonical segment of both members hot) while the rare pair is
  *     kept — ε is demonstrated real loss, not decoration;
  *   - capped ⊆ exact always (a cap can only remove candidates).
  */
class CappedEditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 20-char strings, segment bounds (0,1,7)(1,8,7)(2,15,6). Docs 1/2 are
    * the identical hot string A+B+C; three noise docs share EACH of its
    * canonical segments at the canonical offset (so every (sid, seg) of
    * docs 1/2 has df = 5) but differ everywhere else (levenshtein far
    * beyond 2). Docs 3/4 are an identical rare string whose segments
    * nobody else has (df = 2). */
  private def hotFixture = {
    import spark.implicits._
    val A = "aaaaaaa"; val B = "bbbbbbb"; val C = "cccccc"
    val hot = A + B + C
    val rare = "ddddddd" + "eeeeeee" + "ffffff"
    def fill(n: Int, c0: Char) = (0 until n).map(i => (c0 + i % 9).toChar).mkString
    val noise =
      (0 until 3).map(k => (10L + k, A + fill(13, ('k' + 3 * k).toChar))) ++
        (0 until 3).map(k => (20L + k, fill(7, ('k' + 3 * k).toChar) + B + fill(6, 'x'))) ++
        (0 until 3).map(k => (30L + k, fill(14, ('k' + 3 * k).toChar) + C))
    (Seq((1L, hot), (2L, hot), (3L, rare), (4L, rare)) ++ noise)
      .toDF("doc_id", "s20")
  }

  test("cap off: capped engine ≡ l26's lossless PassJoin engine pair-for-pair") {
    val f = hotFixture
    val exact = LlmQueries.editNearDupFrom(f)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedEditNearDup(f, 2, cap = 1000000L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === capped)
    assert(exact.contains((1L, 2L)) && exact.contains((3L, 4L)),
      s"fixture must yield both planted dist=0 pairs: $exact")
  }

  test("cap=4: the segment-hot pair is provably lost, the rare pair kept") {
    val f = hotFixture
    val exact = LlmQueries.editNearDupFrom(f)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = LlmQueries.cappedEditNearDup(f, 2, cap = 4L)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((capped -- exact).isEmpty, "capped must never invent pairs")
    assert(capped.contains((3L, 4L)), "df=2 segments survive a cap of 4")
    assert(!capped.contains((1L, 2L)),
      "every canonical segment of docs 1/2 has df = 5 — the cap must make the pair undiscoverable")
  }

  test("real corpus: capped ⊆ exact, and the declared audit row balances") {
    val sf = "/root/testdata/sf0.001"
    val row = LlmQueries.l162_capped_editjoin.fn(spark, sf).collect()(0)
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
