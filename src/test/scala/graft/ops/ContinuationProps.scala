package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark
import graft.queries.LlmQueries

/** Invariance laws for the round-16 continuation engines — the
  * GroupStatsProps discipline applied to the new battery: the spec
  * fixtures pin VALUES, these pin the STRUCTURE.
  *  - Wasserstein-1 ignores a common location shift and scales EXACTLY
  *    with an integer dilation (it is the one drift metric measured in
  *    the variable's own units — the law is its defining feature);
  *  - Welch's t is location- and scale-free;
  *  - CUPED's adjusted diff ignores common shifts of either the metric
  *    or the covariate (an estimator that moved under recentering would
  *    be biased by bookkeeping);
  *  - interval coalescing is IDEMPOTENT — islands re-coalesce to
  *    themselves (the fixpoint that makes e13's output a canonical
  *    form), and e14's gaps tile the complement exactly;
  *  - the SRM χ² is arm-label symmetric;
  *  - t-closeness is invariant under any bijective relabeling of the
  *    sensitive attribute (TVD sees distributions, not names);
  *  - jackknife influence carries the sign of (own rate − full rate);
  *  - local clustering coefficients sit in [0, 1] with tri ≤ C(deg,2);
  *  - rendezvous resharding n → n+1 moves docs ONLY to the new shard,
  *    for every n — the spec pins n = 16, the law holds universally.
  * Each check runs real Spark jobs — case counts deliberately low.
  */
object ContinuationProps extends Properties("Continuation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2–4 sources, 3–20 small positive token counts each. */
  private val grouped: Gen[List[(String, Long)]] = for {
    k <- Gen.choose(2, 4)
    rows <- Gen.sequence[List[List[(String, Long)]], List[(String, Long)]](
      (0 until k).toList.map { g =>
        Gen.choose(3, 20).flatMap(n =>
          Gen.listOfN(n, Gen.choose(1L, 200L).map(v => (s"g$g", v))))
      })
  } yield rows.flatten

  private def tc(rows: List[(String, Long)]): DataFrame =
    rows.toDF("source", "nt")

  property("W1 ignores a common +137 shift and dilates EXACTLY under x -> 5x") =
    Prop.forAll(grouped) { rows =>
      def w1(f: List[(String, Long)]): Map[String, (Long, Double)] =
        LlmQueries.wassersteinBySource(tc(f)).collect()
          .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
      val base = w1(rows)
      val shift = w1(rows.map { case (g, v) => (g, v + 137L) })
      val scale = w1(rows.map { case (g, v) => (g, 5L * v) })
      base.keys.forall { s =>
        base(s)._1 == shift(s)._1 &&
          scale(s)._1 == 5L * base(s)._1 &&
          math.abs(scale(s)._2 - 5.0 * base(s)._2) < 1e-4
      }
    }

  property("Welch t and df are invariant under x -> x + 1000 and x -> 3x") =
    Prop.forAll(grouped) { rows =>
      def wt(f: List[(String, Long)]): Map[String, (Double, Double)] =
        LlmQueries.welchT(tc(f)).collect().map { r =>
          r.getString(0) -> ((
            if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
            if (r.isNullAt(6)) Double.NaN else r.getDouble(6)))
        }.toMap
      val base = wt(rows)
      val shift = wt(rows.map { case (g, v) => (g, v + 1000L) })
      val scale = wt(rows.map { case (g, v) => (g, 3L * v) })
      def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) || math.abs(a - b) < 1e-3
      base.keys.forall { s =>
        eq(base(s)._1, shift(s)._1) && eq(base(s)._2, shift(s)._2) &&
          eq(base(s)._1, scale(s)._1) && eq(base(s)._2, scale(s)._2)
      }
    }

  /** Two arms, 4–15 units each, cents in [0, 500]. */
  private val armed: Gen[List[(Long, Long, Long)]] = for {
    rows <- Gen.sequence[List[List[(Long, Long, Long)]], List[(Long, Long, Long)]](
      List(0L, 1L).map { arm =>
        Gen.choose(4, 15).flatMap(n => Gen.listOfN(n, for {
          x <- Gen.choose(0L, 500L); y <- Gen.choose(0L, 500L)
        } yield (arm, x, y)))
      })
  } yield rows.flatten

  property("CUPED diff is invariant under y -> y + c and x -> x + c recentering") =
    Prop.forAll(armed, Gen.choose(1L, 300L)) { (rows, c) =>
      def read(f: List[(Long, Long, Long)]): Row =
        LlmQueries.cupedReadout(f.toDF("arm", "x", "y")).collect()(0)
      val base = read(rows)
      val yShift = read(rows.map { case (a, x, y) => (a, x, y + c) })
      val xShift = read(rows.map { case (a, x, y) => (a, x + c, y) })
      def d(r: Row) = r.getDouble(5)
      def th(r: Row) = r.getDouble(2)
      math.abs(d(base) - d(yShift)) < 1e-3 &&
        math.abs(d(base) - d(xShift)) < 1e-3 &&
        math.abs(th(base) - th(xShift)) < 1e-3
    }

  /** 1–3 users, 2–10 intervals each, starts in [0, 200], spans 1–60. */
  private val intervals: Gen[List[(Long, Long, Long)]] = for {
    u <- Gen.choose(1, 3)
    rows <- Gen.sequence[List[List[(Long, Long, Long)]], List[(Long, Long, Long)]](
      (1 to u).toList.map { uid =>
        Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, for {
          st <- Gen.choose(0L, 200L); len <- Gen.choose(1L, 60L)
        } yield (uid.toLong, st, st + len)))
      })
  } yield rows.flatten

  property("interval coalescing is idempotent and its gaps tile the complement") =
    Prop.forAll(intervals) { rows =>
      val iv = rows.toDF("user_id", "st", "en")
      val isl = Intervals.coalesce(iv).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
      // fixpoint: islands fed back as intervals re-coalesce to themselves
      val again = Intervals.coalesce(
        isl.toDF("user_id", "st", "en")).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
      val tiles = isl.groupBy(_._1).forall { case (u, is) =>
        val span = is.map(_._3).max - is.map(_._2).min
        val mass = is.map(i => i._3 - i._2).sum
        val gaps = Intervals.gaps(iv).collect().filter(_.getLong(0) == u)
          .map(_.getLong(4)).sum
        mass + gaps == span
      }
      again == isl && tiles
    }

  property("SRM chi2 and flag are invariant under swapping the arm labels") =
    Prop.forAll(Gen.choose(1, 400), Gen.choose(1, 400)) { (na, nb) =>
      def run(a: Int, b: Int): (Double, Long) = {
        val r = LlmQueries.srmCheck(
          (Seq.fill(a)(0L) ++ Seq.fill(b)(1L)).toDF("arm")).collect()(0)
        (r.getDouble(3), r.getLong(4))
      }
      run(na, nb) == run(nb, na)
    }

  property("t-closeness is invariant under a bijective relabeling of lang") =
    Prop.forAll(grouped) { rows =>
      // reuse the grouped generator: source -> class key, value mod 3 -> lang
      def d2(f: List[(String, Long)], rename: String => String): DataFrame =
        f.map { case (g, v) => (g, 0L, rename(s"L${v % 3}")) }
          .toDF("source", "nb", "lang")
      def t(df: DataFrame): Seq[Seq[Any]] =
        LlmQueries.tCloseness(df, Seq((1, 3), (1, 5))).collect()
          .map(_.toSeq.toList).toSeq
      t(d2(rows, identity)) == t(d2(rows, l => s"renamed_$l"))
    }

  property("jackknife influence carries the sign of (own rate - full rate)") =
    Prop.forAll(grouped) { rows =>
      val kk = rows.groupBy(_._1).map { case (g, vs) =>
        (g, vs.size.toLong + 5, math.min(vs.size.toLong, vs.count(_._2 > 100).toLong))
      }.toList.toDF("source", "n", "k")
      val full = {
        val t = kk.agg(sum("k"), sum("n")).collect()(0)
        t.getLong(0).toDouble / t.getLong(1)
      }
      val rates = kk.collect().map(r =>
        r.getString(0) -> r.getLong(2).toDouble / r.getLong(1)).toMap
      LlmQueries.jackknifeInfluence(kk).collect().forall { r =>
        val inf = r.getDouble(4)
        val own = rates(r.getString(0))
        if (math.abs(own - full) < 1e-9) math.abs(inf) < 1e-6
        else inf * (own - full) >= -1e-9
      }
    }

  /** Random sparse graphs: 3–20 edges on nodes 0–12. */
  private val graphs: Gen[List[(Long, Long)]] =
    Gen.choose(3, 20).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.distinct))

  property("local clustering: coeff in [0,1] and tri <= C(deg, 2) on random graphs") =
    Prop.forAll(graphs) { edges =>
      LlmQueries.localClustering(edges.toDF("i", "j")).collect().forall { r =>
        val (deg, tri) = (r.getLong(1), r.getLong(2))
        val ok = tri <= deg * (deg - 1) / 2
        if (deg < 2) ok && r.isNullAt(3)
        else ok && r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0
      }
    }

  property("rendezvous n -> n+1: a moved doc lands ONLY on the new shard, for every n") =
    Prop.forAll(Gen.choose(2, 6), Gen.choose(5, 40)) { (n, docs) =>
      val df = (0 until docs).map(_.toLong).toDF("doc_id")
        .select(col("doc_id"), LlmQueries.rendezvousShard(n).as("s0"),
          LlmQueries.rendezvousShard(n + 1).as("s1"))
      df.collect().forall { r =>
        r.getLong(1) == r.getLong(2) || r.getLong(2) == n.toLong
      }
    }
}
