package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark
import graft.queries.LlmQueries

/** Invariance laws for the round-16 statistics battery — the closed-form
  * fixtures in GroupStatsSpec pin VALUES; these pin the STRUCTURE every
  * textbook derivation rests on, over random grouped integer data:
  *  - location tests ignore location shifts where they should (ANOVA's F
  *    and Brown–Forsythe's F under x → x + c);
  *  - scale-free inequality measures ignore scale (Theil/Atkinson/Gini
  *    under x → k·x);
  *  - rank statistics ignore any strictly monotone relabeling of the
  *    values (Kruskal–Wallis under x → 3x + 7);
  *  - trend statistics anti-symmetrize (Mann–Kendall under y → −y);
  *  - Lorenz shares are monotone in the decile and exactly 1 at the top.
  * Each check runs real Spark jobs — case counts deliberately low.
  */
object GroupStatsProps extends Properties("GroupStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2–4 groups, 3–25 positive integer values each. */
  private val grouped: Gen[List[(String, Long)]] = for {
    k <- Gen.choose(2, 4)
    rows <- Gen.sequence[List[List[(String, Long)]], List[(String, Long)]](
      (0 until k).toList.map { g =>
        Gen.choose(3, 25).flatMap(n =>
          Gen.listOfN(n, Gen.choose(1L, 500L).map(v => (s"g$g", v))))
      })
  } yield rows.flatten

  private def tc(rows: List[(String, Long)]): DataFrame =
    rows.toDF("source", "nt")

  private def one(df: DataFrame): org.apache.spark.sql.Row = df.collect()(0)

  property("ANOVA F and Brown–Forsythe F are shift-invariant (x -> x + 1000)") =
    Prop.forAll(grouped) { rows =>
      val base = one(LlmQueries.anovaF(tc(rows)))
      val shifted = one(LlmQueries.anovaF(tc(rows.map { case (g, v) => (g, v + 1000L) })))
      val bfB = one(LlmQueries.brownForsythe(tc(rows)))
      val bfS = one(LlmQueries.brownForsythe(tc(rows.map { case (g, v) => (g, v + 1000L) })))
      def f(r: org.apache.spark.sql.Row) =
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)
      ((f(base).isNaN && f(shifted).isNaN) || math.abs(f(base) - f(shifted)) < 1e-4) &&
        ((f(bfB).isNaN && f(bfS).isNaN) || math.abs(f(bfB) - f(bfS)) < 1e-4)
    }

  property("Theil, Atkinson and Gini are scale-invariant (x -> 3x)") =
    Prop.forAll(grouped) { rows =>
      def frame(f: List[(String, Long)]) = f.toDF("source", "v")
      val scaled = rows.map { case (g, v) => (g, 3L * v) }
      val t0 = LlmQueries.theilBySource(frame(rows))
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      val t1 = LlmQueries.theilBySource(frame(scaled))
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      val a0 = LlmQueries.atkinsonBySource(frame(rows))
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      val a1 = LlmQueries.atkinsonBySource(frame(scaled))
        .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
      val g0 = LlmQueries.giniBySource(frame(rows))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val g1 = LlmQueries.giniBySource(frame(scaled))
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      t0.keys.forall { s =>
        math.abs(t0(s) - t1(s)) < 1e-4 && math.abs(a0(s) - a1(s)) < 1e-4 &&
          math.abs(g0(s) - g1(s)) < 1e-4
      }
    }

  property("Kruskal–Wallis H is invariant under the monotone map x -> 3x + 7") =
    Prop.forAll(grouped) { rows =>
      val h0 = one(LlmQueries.kruskalWallis(tc(rows))).getDouble(3)
      val h1 = one(LlmQueries.kruskalWallis(
        tc(rows.map { case (g, v) => (g, 3L * v + 7L) }))).getDouble(3)
      math.abs(h0 - h1) < 1e-6
    }

  private val series: Gen[List[(Long, Long)]] =
    Gen.choose(4, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 1000L)).map(vs =>
        vs.zipWithIndex.map { case (v, i) => (7L * i, v) }))

  property("Mann–Kendall anti-symmetrizes under y -> -y (S, z, slope flip; |z| kept)") =
    Prop.forAll(series) { wk =>
      val a = one(LlmQueries.mannKendall(wk.toDF("d", "c")))
      val b = one(LlmQueries.mannKendall(
        wk.map { case (d, c) => (d, -c) }.toDF("d", "c")))
      a.getLong(1) == -b.getLong(1) && a.getLong(2) == b.getLong(2) &&
        math.abs(a.getDouble(3) + b.getDouble(3)) < 1e-6 &&
        math.abs(a.getDouble(4) + b.getDouble(4)) < 1e-6 &&
        a.getLong(5) == b.getLong(5)
    }

  property("Lorenz shares are monotone in the decile and exactly 1 at the top") =
    Prop.forAll(grouped) { rows =>
      val bySrc = LlmQueries.lorenzCurve(rows.toDF("source", "v"))
        .collect().groupBy(_.getString(0))
      bySrc.values.forall { pts =>
        val shares = pts.sortBy(_.getLong(1)).map(_.getDouble(4))
        shares.zip(shares.tail).forall { case (x, y) => x <= y + 1e-9 } &&
          math.abs(shares.last - 1.0) < 1e-9
      }
    }
}
