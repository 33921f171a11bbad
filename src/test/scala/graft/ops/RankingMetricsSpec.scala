package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.LlmQueries

/** Sensitivity pin for the l137 NDCG@5 scorer: the random testdata
  * legitimately scores ≈0 (labels carry no geometric signal), so this
  * fixture proves the metric's whole range — an engineered clustered
  * corpus where every query's five nearest neighbors share its label
  * must score exactly 1.0, and the DCG equals the closed-form ideal. */
class RankingMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Three tight clusters of 30 vectors, one per label; each cluster
    * holds one query id (multiple of 100). Base directions are axis
    * unit vectors; members get a tiny deterministic jitter so cosines
    * are distinct (no rank ties beyond the vec_id tiebreak). */
  private def clustered = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until 30
    } yield {
      val id = c * 100L + i
      val base = Array.fill(8)(0.001)
      base(c) = 1.0
      base((c + 4) % 8) = 0.01 * (i + 1) // deterministic jitter
      (id, c, base.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, 0d, (a, x) -> a + x * x))"))
  }

  test("NDCG@5 is exactly 1.0 on a label-clustered corpus; DCG hits the ideal") {
    val got = LlmQueries.ndcgAt5(clustered).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set(0L, 100L, 200L), s"three queries expected: $got")
    val idealDcg = (1 to 5).map(r => 1.0 / (math.log(r + 1) / math.log(2))).sum
    got.foreach { case (qid, (nRel, rel5, dcg, ndcg)) =>
      assert(nRel === 29L, s"each cluster has 29 same-label peers at $qid")
      assert(rel5 === 5L, s"all five neighbors must share the label at $qid")
      assert(math.abs(dcg - idealDcg) < 1e-6, s"dcg=$dcg ideal=$idealDcg at $qid")
      assert(ndcg === 1.0, s"perfect retrieval must score 1.0 at $qid")
    }
  }
}
