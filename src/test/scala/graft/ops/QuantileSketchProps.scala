package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Pure-math laws of the d24 mergeable quantile sketch's algebra
  * (VERDICT r16 #3's "merge = associative" discipline) — no Spark
  * session, hundreds of cases cheap. The model functions ARE the shipped
  * code ([[QuantileSketch.modelSketch]]/[[QuantileSketch.modelMerge]]);
  * QuantileSketchSpec pins the distributed form ≡ this model, so the
  * laws proved here carry to the cluster form:
  *  - merge is associative and commutative with the empty sketch as
  *    unit (shard merges in any tree shape and order give one answer).
  *    The algebra is MULTISET-valued — duplicate (digest, value) rows
  *    are real mass and both survive — so self-merge is NOT idempotent;
  *    that is fine because Spark task retry REPLACES a partition's
  *    output rather than re-adding it (unlike l59's set-valued
  *    bottom-k, where idempotence holds and is pinned);
  *  - THE partition law: the sketch of any split's merged parts equals
  *    the sketch of the whole — bottom-k membership is a pure function
  *    of the row, so no partitioning can change the retained set;
  *  - the readout is a pure function of the sketch, so quantile
  *    estimates inherit every invariance above;
  *  - size never exceeds k.
  */
object QuantileSketchProps extends Properties("QuantileSketch") {

  private val hexish: Gen[String] =
    Gen.listOfN(10, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)

  private val entry: Gen[(String, Double)] = for {
    h <- hexish
    v <- Gen.choose(-1e6, 1e6)
  } yield (h, math.rint(v * 100) / 100)

  private val entriesAndK: Gen[(List[(String, Double)], Int)] = for {
    es <- Gen.listOf(entry)
    k <- Gen.choose(1, 64)
  } yield (es, k)

  private val threeAndK: Gen[(List[(String, Double)],
      List[(String, Double)], List[(String, Double)], Int)] = for {
    a <- Gen.listOf(entry); b <- Gen.listOf(entry); c <- Gen.listOf(entry)
    k <- Gen.choose(1, 32)
  } yield (a, b, c, k)

  import QuantileSketch.{modelMerge, modelSketch}

  property("merge is associative") =
    Prop.forAllNoShrink(threeAndK) { case (a, b, c, k) =>
      val sa = modelSketch(a, k); val sb = modelSketch(b, k)
      val sc = modelSketch(c, k)
      modelMerge(modelMerge(sa, sb, k), sc, k) ==
        modelMerge(sa, modelMerge(sb, sc, k), k)
    }

  property("merge is commutative") =
    Prop.forAllNoShrink(threeAndK) { case (a, b, _, k) =>
      val sa = modelSketch(a, k); val sb = modelSketch(b, k)
      modelMerge(sa, sb, k) == modelMerge(sb, sa, k)
    }

  property("empty sketch is the merge unit") =
    Prop.forAllNoShrink(entriesAndK) { case (es, k) =>
      val s = modelSketch(es, k)
      modelMerge(s, Nil, k) == s && modelMerge(Nil, s, k) == s
    }

  property("partition law: any split's merged sketches == the whole's") =
    Prop.forAllNoShrink(for {
      (es, k) <- entriesAndK
      cut <- Gen.choose(0, es.size)
    } yield (es, k, cut)) { case (es, k, cut) =>
      val (l, r) = es.splitAt(cut)
      modelMerge(modelSketch(l, k), modelSketch(r, k), k) ==
        modelSketch(es, k)
    }

  property("size never exceeds k; on small inputs the sketch IS the data") =
    Prop.forAllNoShrink(entriesAndK) { case (es, k) =>
      val s = modelSketch(es, k)
      s.size <= k && (es.size > k || s == es.sorted)
    }

  property("readout invariance: quantiles of merged parts == of the whole") =
    Prop.forAllNoShrink(for {
      (es, k) <- entriesAndK if es.nonEmpty
      cut <- Gen.choose(0, es.size)
    } yield (es, k, cut)) { case (es, k, cut) =>
      val (l, r) = es.splitAt(cut)
      val merged = modelMerge(modelSketch(l, k), modelSketch(r, k), k)
      val whole = modelSketch(es, k)
      merged.isEmpty || Seq((1L, 10L), (1L, 2L), (9L, 10L)).forall {
        case (n, d) =>
          QuantileSketch.modelQuantile(merged, n, d) ==
            QuantileSketch.modelQuantile(whole, n, d)
      }
    }
}
