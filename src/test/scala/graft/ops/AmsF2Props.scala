package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Pure-math laws of the GROUPED AMS F₂ counter algebra (VERDICT r17 #4:
  * "merge-law prop extended to the grouped form") — no Spark session,
  * hundreds of cases cheap. The model function IS the shipped code
  * ([[AmsF2.modelCountersBy]] built on [[AmsF2.modelSign]]); AmsF2Spec
  * pins the distributed `countersBy`/`estimateBy` ≡ this model across
  * partitionings, so the laws proved here carry to the cluster form:
  *  - grouped merge law: the per-bucket counters of a concatenation are
  *    the elementwise per-bucket sums (missing bucket = zero vector) —
  *    shard merge of the grouped sketch is plain integer + per bucket,
  *    exactly the global d26 law applied bucketwise;
  *  - bucket-partition law: bucketing loses nothing — summing every
  *    bucket's counter vector reproduces the GLOBAL counters, because a
  *    key lives in exactly one bucket and signs depend only on the key.
  */
object AmsF2Props extends Properties("AmsF2") {

  private val row: Gen[(String, String)] = for {
    b <- Gen.oneOf("b0", "b1", "b2", "b3")
    k <- Gen.choose(0, 40).map(i => s"k$i")
  } yield (b, k)

  private val twoListsAndR: Gen[(List[(String, String)],
      List[(String, String)], Int)] = for {
    a <- Gen.listOf(row)
    b <- Gen.listOf(row)
    r <- Gen.choose(1, 16)
  } yield (a, b, r)

  private def add(x: Option[Seq[Long]], y: Option[Seq[Long]],
      r: Int): Seq[Long] = {
    val zx = x.getOrElse(Seq.fill(r)(0L))
    val zy = y.getOrElse(Seq.fill(r)(0L))
    zx.zip(zy).map { case (p, q) => p + q }
  }

  property("grouped merge law: countersBy(a ++ b) = per-bucket " +
      "elementwise sum of countersBy(a) and countersBy(b)") =
    Prop.forAllNoShrink(twoListsAndR) { case (a, b, r) =>
      val whole = AmsF2.modelCountersBy(a ++ b, r)
      val ma = AmsF2.modelCountersBy(a, r)
      val mb = AmsF2.modelCountersBy(b, r)
      val buckets = ma.keySet ++ mb.keySet
      buckets == whole.keySet &&
        buckets.forall(bk => whole(bk) == add(ma.get(bk), mb.get(bk), r))
    }

  property("bucket-partition law: summing every bucket's counters " +
      "reproduces the global counters") =
    Prop.forAllNoShrink(twoListsAndR) { case (a, b, r) =>
      val rows = a ++ b
      val grouped = AmsF2.modelCountersBy(rows, r)
      val global = (0 until r).map(i =>
        rows.map { case (_, k) => AmsF2.modelSign(i, k).toLong }.sum)
      (0 until r).map(i => grouped.values.map(_(i)).sum) == global
    }
}
