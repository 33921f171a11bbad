package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Deterministic invariants of Graph.connectedComponents: labels are the
  * component minimum, long chains converge within the round budget,
  * self-loops/duplicate/reversed edges are harmless. The random-graph
  * equivalence law lives in [[GraphProps]]. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long path converges (diameter stress) and labels by minimum") {
    // 0-1-2-...-19 as a single chain, declared in shuffled order
    val chain = (0L until 19L).map(k => (k + 1, k))
    val got = ccOf(new scala.util.Random(7).shuffle(chain))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 19L).toSet)
  }

  test("diameter beyond the default budget escalates to star rounds") {
    // 40 nodes, diameter 39 > the default maxIter=25: propagation alone
    // would hit the cap; the Kiveris escalation must finish the job
    val chain = (0L until 39L).map(k => (k + 1, k))
    val got = ccOf(new scala.util.Random(11).shuffle(chain))
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 39L).toSet)
  }

  test("self-loops and duplicate edges are harmless") {
    val got = ccOf(Seq((5L, 5L), (5L, 9L), (9L, 5L), (2L, 3L), (3L, 2L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 3L -> 2L))
  }

  test("two components stay separate") {
    val got = ccOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
