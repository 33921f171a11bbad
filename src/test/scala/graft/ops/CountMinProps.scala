package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Count-min laws on random skewed key sets:
  *  - estimates never UNDERcount (the one-sided CM guarantee — min over
  *    rows of counters that each include the key's true count);
  *  - sketches MERGE by adding counters: union-then-sketch equals
  *    sketch-then-sum, the property that makes the sketch shardable;
  *  - never-seen keys probe safely (0 or collision mass, never negative,
  *    never a crash on missing counters).
  * Each check runs real Spark jobs, so case counts are kept low. */
object CountMinProps extends Properties("CountMin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed keys: small ids drawn quadratically often
  private val keys: Gen[List[Long]] =
    Gen.choose(1, 120).flatMap(n => Gen.listOfN(n,
      Gen.choose(0, 19).map(x => (x * x / 20).toLong)))

  property("estimate >= exact count for every present key") =
    Prop.forAllNoShrink(keys) { ks =>
      val df = ks.toDF("k")
      val sk = CountMin.sketch(df, col("k"))
      val est = CountMin.estimate(sk, df, col("k"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      Prop(exact.forall { case (k, n) => est(k) >= n }) :|
        s"est=$est exact=$exact"
    }

  property("sketches merge by summing counters (union ≡ sum of parts)") =
    Prop.forAllNoShrink(keys, keys) { (a, b) =>
      def counters(df: org.apache.spark.sql.DataFrame) =
        CountMin.sketch(df, col("k")).collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val whole = counters((a ++ b).toDF("k"))
      val pa = counters(a.toDF("k"))
      val pb = counters(b.toDF("k"))
      val merged = (pa.keySet ++ pb.keySet).map(rc =>
        rc -> (pa.getOrElse(rc, 0L) + pb.getOrElse(rc, 0L))).toMap
      Prop(whole == merged) :| s"whole=$whole merged=$merged"
    }

  property("never-seen keys probe safely (>= 0, no crash)") =
    Prop.forAllNoShrink(keys) { ks =>
      val sk = CountMin.sketch(ks.toDF("k"), col("k"))
      val probes = List(1000L, 2000L, 3000L).toDF("k")
      val est = CountMin.estimate(sk, probes, col("k"))
        .collect().map(_.getLong(1))
      Prop(est.length == 3 && est.forall(_ >= 0L)) :| s"est=${est.toList}"
    }
}
