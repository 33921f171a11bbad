package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Graph.connectedComponents ≡ a sequential union-find on random graphs —
  * the property proof that lets l14 lean on the distributed min-label
  * propagation as "exact". Each check runs real Spark jobs (several
  * propagation rounds), so case counts are kept deliberately low. */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential oracle: union-find, roots kept at component minima. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private val genEdges = for {
    n <- Gen.choose(2, 25)
    m <- Gen.choose(1, 35)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield es

  property("≡ union-find on random graphs") =
    Prop.forAllNoShrink(genEdges) { es =>
      val got = Graph.connectedComponents(es.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(es)
    }

  /** The large-star/small-star fallback must be exact on ANY topology —
    * it is the path [[Graph.connectedComponents]] escalates to when the
    * diameter exceeds the propagation budget, so it gets the same
    * union-find law directly (self-loops included: those nodes must come
    * back as singletons). */
  property("twoPhase ≡ union-find on random graphs") =
    Prop.forAllNoShrink(genEdges) { es =>
      val got = Graph.twoPhase(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(es)
    }

  /** Adversarial diameter: a shuffled 40-node path (diameter 39) with a
    * tiny propagation budget forces the escalation, which must still land
    * on the exact components. */
  property("path graph beyond the propagation budget converges via escalation") =
    Prop.forAllNoShrink(Gen.choose(30, 45)) { n =>
      val chain = (0L until n.toLong - 1).map(k => (k + 1, k))
      val es = new scala.util.Random(n).shuffle(chain)
      val got = Graph.connectedComponents(es.toDF("i", "j"), maxIter = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == unionFind(es)
    }
}
