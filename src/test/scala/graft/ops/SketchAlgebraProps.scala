package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Pure-math laws behind l59 (bottom-k overlap sketches) and l61 (stride
  * interleave) on random inputs — no Spark session, so hundreds of cases
  * are cheap. The Spark implementations are pinned ≡ fixtures in
  * LlmOpsSpec; these props argue the ALGORITHMS' guarantees hold off the
  * fixture too:
  *  - bottom-k of a union is recoverable from the parts' bottom-ks (the
  *    mergeability l59's 100 TB posture rests on);
  *  - the sketch Jaccard estimate is EXACT whenever the union fits in k
  *    (the small-set regime degrades to set arithmetic, not noise);
  *  - membership of a union-bottom-k element in a part is decidable FROM
  *    the part's sketch (the estimator never needs the full sets);
  *  - the stride schedule keeps every prefix within a constant of each
  *    domain's weight share while no domain is exhausted (the l61
  *    fairness bound, at the same ⌊2²⁰/w⌋ quantization the query uses).
  */
object SketchAlgebraProps extends Properties("SketchAlgebra") {

  private def bottomK(s: Set[String], k: Int): Seq[String] =
    s.toSeq.sorted.take(k)

  private val hexish: Gen[String] =
    Gen.listOfN(8, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)

  private val twoSets: Gen[(Set[String], Set[String], Int)] = for {
    shared <- Gen.listOf(hexish)
    onlyA <- Gen.listOf(hexish)
    onlyB <- Gen.listOf(hexish)
    k <- Gen.choose(1, 64)
  } yield ((shared ++ onlyA).toSet, (shared ++ onlyB).toSet, k)

  property("bottom-k of a union == bottom-k of the parts' bottom-ks") =
    Prop.forAllNoShrink(twoSets) { case (a, b, k) =>
      bottomK((bottomK(a, k) ++ bottomK(b, k)).toSet, k) ==
        bottomK(a ++ b, k)
    }

  property("sketch membership test agrees with the full set on union-bottom-k") =
    Prop.forAllNoShrink(twoSets) { case (a, b, k) =>
      val ska = bottomK(a, k).toSet
      val x = bottomK(a ++ b, k)
      // x ∈ bk(A∪B) ∧ x ∈ A ⇒ x ≤ A's k-th smallest ⇒ x ∈ bk(A)
      x.forall(h => a.contains(h) == ska.contains(h))
    }

  // small-set generator: the union always fits in k, so the estimate has
  // no sampling at all and must equal the exact Jaccard
  private val smallSets: Gen[(Set[String], Set[String], Int)] = for {
    shared <- Gen.resize(10, Gen.nonEmptyListOf(hexish))
    onlyA <- Gen.resize(10, Gen.listOf(hexish))
    onlyB <- Gen.resize(10, Gen.listOf(hexish))
  } yield {
    val a = (shared ++ onlyA).toSet; val b = (shared ++ onlyB).toSet
    (a, b, (a ++ b).size + 1)
  }

  property("the estimate is EXACT when the union fits in k") =
    Prop.forAllNoShrink(smallSets) { case (a, b, k) =>
      val union = a ++ b
      val ska = bottomK(a, k).toSet; val skb = bottomK(b, k).toSet
      val x = bottomK(union, k)
      val est = x.count(h => ska.contains(h) && skb.contains(h)).toDouble / x.size
      est == (a & b).size.toDouble / union.size
    }

  private val mixture: Gen[Seq[(Int, Int, Int)]] = for {
    nDoms <- Gen.choose(2, 5)
    doms <- Gen.sequence[Seq[(Int, Int, Int)], (Int, Int, Int)](
      (0 until nDoms).map { d =>
        for { w <- Gen.choose(1, 8); n <- Gen.choose(5, 120) } yield (d, w, n)
      })
  } yield doms

  property("stride schedule: every prefix holds each domain within 3 of its share " +
      "until some domain exhausts") =
    Prop.forAllNoShrink(mixture) { doms =>
      val bigW = doms.map(_._2).sum.toDouble
      // the l61 construction: domain d's r-th item at vt = r·⌊2²⁰/w⌋,
      // total order (vt, d, r)
      val order = doms.flatMap { case (d, w, n) =>
        val stride = (1 << 20) / w
        (1 to n).map(r => (r.toLong * stride, d, r))
      }.sorted.map(_._2)
      val horizon = doms.map { case (_, w, n) => (n * bigW / w).toLong }
        .min.min(order.size.toLong).toInt
      val counts = collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      order.take(horizon).zipWithIndex.forall { case (d, i) =>
        counts(d) += 1
        val n = i + 1
        doms.forall { case (dom, w, _) =>
          math.abs(counts(dom) - n * w / bigW) <= 3.0 + 1e-9
        }
      }
    }
}
