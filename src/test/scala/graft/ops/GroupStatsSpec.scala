package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.LlmQueries

/** Closed-form pins for the k-group battery (l164 Kruskal–Wallis, l165
  * one-way ANOVA, l166 Theil) — the DriftTestsSpec discipline: the real
  * corpus is uniform by construction, so the statistics legitimately read
  * near-null there; these fixtures prove the engines MOVE (complete
  * separation) and ZERO (identical groups / constant mass) at hand-
  * computable values.
  */
class GroupStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def tcOf(rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("source", "nt")
  }

  test("l164: complete separation {1,2,3} vs {4,5,6} hits the closed form H = 27/7") {
    val h = LlmQueries.kruskalWallis(tcOf(
      Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "b" -> 4L, "b" -> 5L, "b" -> 6L)))
      .collect()(0)
    assert(h.getLong(0) === 6L && h.getLong(1) === 2L)
    // R_a = 6, R_b = 15: H = 12/(6·7)·(36/3 + 225/3) − 3·7 = 27/7
    assert(math.abs(h.getDouble(2) - 27.0 / 7.0) < 1e-6)
    // no ties — the correction must be a no-op
    assert(math.abs(h.getDouble(3) - h.getDouble(2)) < 1e-9)
  }

  test("l164: identical groups read H = 0 exactly (all ranks tie-averaged equal)") {
    val h = LlmQueries.kruskalWallis(tcOf(
      Seq("a" -> 5L, "a" -> 5L, "b" -> 5L, "b" -> 5L))).collect()(0)
    assert(math.abs(h.getDouble(2)) < 1e-9)
  }

  test("l165: {1,2,3} vs {4,5,6} hits SSB = 13.5, SSW = 4, F = 13.5") {
    val r = LlmQueries.anovaF(tcOf(
      Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "b" -> 4L, "b" -> 5L, "b" -> 6L)))
      .collect()(0)
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(math.abs(r.getDouble(2) - 13.5) < 1e-6)
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-6)
  }

  test("l166: constant mass reads Theil = 0 exactly; {1,3} hits the hand value") {
    import spark.implicits._
    val t = LlmQueries.theilBySource(
      Seq(("c", 7L), ("c", 7L), ("c", 7L), ("u", 1L), ("u", 3L))
        .toDF("source", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(t("c").getDouble(4) === 0.0)
    val expected = ((1.0 / 2) * math.log(1.0 / 2) +
      (3.0 / 2) * math.log(3.0 / 2)) / 2
    assert(math.abs(t("u").getDouble(4) - expected) < 1e-6)
  }

  test("l164/l165 on the corpus: finite, defined, k matches the source count") {
    val kw = LlmQueries.l164_kruskal_wallis.fn(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val f = LlmQueries.l165_anova_f.fn(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(kw.getLong(1) === f.getLong(1))
    assert(!kw.getDouble(3).isNaN && !f.getDouble(4).isNaN)
  }
}
