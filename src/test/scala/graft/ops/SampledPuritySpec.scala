package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.LlmQueries

/** l163 (md5-sampled cluster purity) pins — VERDICT r15 #4:
  *   - sample ≡ full on every cluster at or under the pair cap (the
  *     valve must be a no-op where it doesn't bite);
  *   - the over-cap cluster is truncated to exactly cap pairs with the
  *     sampled flag set and the truncation declared (n_pairs intact);
  *   - subset-min monotonicity: a sampled min_jac can never UNDERCUT
  *     the full engine's min (a sample alarm is always a real alarm);
  *   - the real corpus has at least one sampled cluster (the demo cap
  *     bites) and every unsampled row matches l156's full audit.
  */
class SampledPuritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tau = 0.5

  /** Cluster 1 = a 4-node star-glued family (6 pairs: nodes 1,2,3 share
    * everything; node 4 overlaps only node 3's tail — the chained
    * member), cluster 10 = a clean 2-node pair (1 pair). */
  private def fixture = {
    import spark.implicits._
    graft.functions.SetExprs.register(spark)
    val lbl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "cluster")
    val shS = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("a", "b", "c", "d", "e", "f")),
      (4L, Seq("e", "f", "g", "h")),
      (10L, Seq("x", "y", "z")),
      (11L, Seq("x", "y", "w")))
      .toDF("doc_id", "ss")
      .select(col("doc_id"), sort_array(col("ss")).as("ss"))
    (lbl, shS)
  }

  test("sample ≡ full on every under-cap cluster; over-cap cluster truncated + flagged") {
    val (lbl, shS) = fixture
    val full = LlmQueries.sampledPurity(lbl, shS, tau, cap = 1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sampled = LlmQueries.sampledPurity(lbl, shS, tau, cap = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(full.keySet === sampled.keySet)
    // cluster 10: 1 pair <= cap — every column identical, sampled = 0
    assert(sampled(10L).getLong(4) === 0L)
    assert(sampled(10L).toSeq === full(10L).toSeq)
    // cluster 1: 6 pairs -> 2 scored, flag set, n_pairs still declares 6
    assert(sampled(1L).getLong(2) === 6L && sampled(1L).getLong(3) === 2L)
    assert(sampled(1L).getLong(4) === 1L)
    assert(full(1L).getLong(3) === 6L && full(1L).getLong(4) === 0L)
  }

  test("subset-min monotonicity: sampled min_jac never undercuts the full min") {
    val (lbl, shS) = fixture
    val full = LlmQueries.sampledPurity(lbl, shS, tau, cap = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    for (cap <- Seq(1L, 2L, 3L, 5L)) {
      val s = LlmQueries.sampledPurity(lbl, shS, tau, cap)
        .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
      s.foreach { case (c, mn) =>
        assert(mn >= full(c) - 1e-9, s"cap=$cap cluster=$c: sampled min $mn < full ${full(c)}")
      }
    }
  }

  test("real corpus: the demo cap bites, and unsampled rows ≡ l156's full audit") {
    val sf = "/root/testdata/sf0.001"
    val sampled = LlmQueries.l163_sampled_purity.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(sampled.values.exists(_.getLong(4) === 1L),
      "at least one cluster must exceed the pair cap at sf0.001")
    val full = LlmQueries.l156_cluster_purity.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(sampled.keySet === full.keySet)
    sampled.values.filter(_.getLong(4) === 0L).foreach { r =>
      val f = full(r.getLong(0))
      // l156 row: cluster, size, n_pairs, min_jac, mean_jac, has_chained_pair
      assert(r.getLong(1) === f.getLong(1) && r.getLong(2) === f.getLong(2))
      assert(r.getDouble(5) === f.getDouble(3) && r.getDouble(6) === f.getDouble(4))
      assert(r.getLong(7) === f.getLong(5))
    }
  }
}
