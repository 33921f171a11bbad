package graft.ops

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Property laws for the scale-safe scalar statistics (SURVEY §5.2-3):
  *  - exactMedian ≡ the naive interpolated median (pandas Series.median)
  *    computed in plain Scala on the same values;
  *  - mode tie-breaks to the SMALLEST value (pandas mode()[0], codes.py:83-87);
  *  - both return None (never throw) on empty / all-null input (ADVICE r02).
  * Each check runs real Spark jobs, so case counts are kept deliberately low.
  */
object StatsProps extends Properties("Stats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** pandas Series.median: mean of the two middle order statistics. */
  private def naiveMedian(xs: Seq[Double]): Option[Double] =
    if (xs.isEmpty) None
    else {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) Some(s(n / 2))
      else Some((s(n / 2 - 1) + s(n / 2)) / 2.0)
    }

  private val values: Gen[List[Double]] =
    Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 8.0)))

  property("exactMedian == naive interpolated median") = Prop.forAll(values) { xs =>
    val withNulls = xs.map(Option(_)) ++ List(None, None) // nulls must be ignored
    val df = withNulls.toDF("v")
    val got = Stats.exactMedian(df, col("v"))
    val want = naiveMedian(xs)
    (got, want) match {
      case (None, None)         => Prop.passed
      case (Some(g), Some(w))   => Prop(math.abs(g - w) < 1e-9) :| s"got $g want $w"
      case other                => Prop.falsified :| s"mismatch $other"
    }
  }

  /** quantile_cont / pandas Series.quantile: idx = (n−1)p, linear interp. */
  private def naiveQuantile(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val idx = (s.length - 1L) * p
    val lo = math.floor(idx).toInt
    val frac = idx - lo
    if (frac > 0.0) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
  }

  property("quantilesFromStats == naive interpolated quantiles") =
    Prop.forAll(values, Gen.choose(0.0, 1.0)) { (xs, pRaw) =>
      if (xs.isEmpty) Prop.passed else {
        val ps = Seq(0.0, 0.25, 0.5, pRaw, 1.0)
        val df = xs.map(Option(_)).appended(None).toDF("v")
        val spec = Stats.MedianSpec("q", col("v"), xs.length,
          xs.min, xs.max)
        // tiny buckets + collect cap force the recursion path too
        val got = Stats.quantilesFromStats(df, Seq(spec), ps, nb = 4, maxCollect = 4)("q")
        val want = ps.map(naiveQuantile(xs, _))
        Prop(got.zip(want).forall { case (g, w) => math.abs(g - w) < 1e-9 }) :|
          s"got $got want $want"
      }
    }

  property("exactQuantilesDisc == naive order-stat pick (quantile_disc)") =
    Prop.forAll(values, Gen.choose(0.0, 1.0)) { (xs, pRaw) =>
      if (xs.isEmpty) Prop.passed else {
        val ps = Seq(0.0, 0.25, 0.5, pRaw, 1.0)
        val df = xs.map(Option(_)).appended(None).toDF("v")
        val got = Stats.exactQuantilesDisc(df, col("v"), ps).get
        val s = xs.sorted
        val want = ps.map(p =>
          s(math.max(0L, math.ceil(p * xs.length).toLong - 1L).toInt))
        // a discrete quantile is an exact element — bit equality, no eps
        Prop(got == want) :| s"got $got want $want" &&
          Prop(got.forall(xs.contains)) :| "every value must be a real element"
      }
    }

  property("exactQuantiles is None on empty/all-null; groupQuantiles handles null keys and all-null groups") =
    Prop.secure {
      val empty = Seq.empty[Option[Double]].toDF("v")
      val allNull = Seq[Option[Double]](None, None).toDF("v")
      val ok1 = Stats.exactQuantiles(empty, col("v"), Seq(0.5)).isEmpty &&
        Stats.exactQuantiles(allNull, col("v"), Seq(0.5)).isEmpty
      // groups: "a" has values, "b" is all-null, null key has values
      val df = Seq(
        (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
        (Some("b"), None),
        (None: Option[String], Some(10.0)), (None: Option[String], Some(20.0)))
        .toDF("g", "v")
      val got = Stats.groupQuantiles(df, col("g"), col("v"), Seq(0.5))
      val ok2 = got(Some("a")).contains(Seq(2.0)) &&
        got(Some("b")).isEmpty &&
        got(None).contains(Seq(15.0))
      Prop(ok1 && ok2) :| s"got $got"
    }

  private val groupedRows: Gen[List[(Option[String], Option[Double])]] =
    Gen.choose(0, 50).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf(Gen.const(None: Option[String]),
        Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h").map(Option(_)))
      v <- Gen.oneOf(Gen.const(None: Option[Double]),
        Gen.chooseNum(-1e6, 1e6).map(x => Option(math.rint(x) / 8.0)))
    } yield (g, v)))

  /** The windowed two-pass per-group quantile (the high-cardinality path)
    * must agree EXACTLY — same order statistics, same IEEE interpolation —
    * with the predicated-spec histogram engine (the enum-key path), null
    * keys included; all-null groups are absent from the windowed output
    * where the spec engine maps them to None. */
  property("groupQuantileWindowed ≡ the predicated-spec engine on random grouped data") =
    Prop.forAllNoShrink(groupedRows, Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)) { (rows, p) =>
      val df = rows.toDF("g", "v")
      val spec = Stats.groupQuantiles(df, col("g"), col("v"), Seq(p))
      val win = Stats.groupQuantileWindowed(df, col("g"), col("v"), p)
        .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
      val specDefined = spec.collect { case (k, Some(vs)) => k -> vs.head }
      val sameVals = specDefined.keySet == win.keySet &&
        specDefined.forall { case (k, v) => win(k) == v }
      val noneAbsent = spec.collect { case (k, None) => k }
        .forall(k => !win.contains(k))
      Prop(sameVals && noneAbsent) :| s"p=$p spec=$specDefined win=$win"
    }

  property("mediansFromStats survives deep histogram recursion (tiny buckets)") =
    Prop.forAll(values) { xs =>
      if (xs.size < 2) Prop.passed else {
        val df = xs.map(Option(_)).toDF("v")
        // nb=4 / maxCollect=1 forces many refinement levels + the grouped
        // terminal pick; result must still be the exact interpolated median
        val spec = Stats.MedianSpec("m", col("v"), xs.size.toLong, xs.min, xs.max)
        val got = Stats.mediansFromStats(df, Seq(spec), nb = 4, maxCollect = 1L)("m")
        val want = naiveMedian(xs).get
        Prop(math.abs(got - want) < 1e-9) :| s"got $got want $want"
      }
    }

  property("exactMedian is None on empty and all-null input") = {
    val empty = Seq.empty[Option[Double]].toDF("v")
    val nulls = Seq[Option[Double]](None, None, None).toDF("v")
    Prop(Stats.exactMedian(empty, col("v")).isEmpty) &&
      Prop(Stats.exactMedian(nulls, col("v")).isEmpty)
  }

  private val words: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")))

  property("exactModeString == most frequent, ties to smallest") = Prop.forAll(words) { ws =>
    val df = (ws.map(Option(_)) :+ None).toDF("v")
    val got = Stats.exactModeString(df, col("v"))
    val want =
      if (ws.isEmpty) None
      else {
        val counts = ws.groupBy(identity).view.mapValues(_.size).toMap
        val top = counts.values.max
        Some(counts.filter(_._2 == top).keys.min) // tie → smallest value
      }
    Prop(got == want) :| s"got $got want $want counts=${ws.groupBy(identity).view.mapValues(_.size).toMap}"
  }

  property("exactModeString is None on empty / all-null input") = {
    val nulls = Seq[Option[String]](None, None).toDF("v")
    Prop(Stats.exactModeString(nulls, col("v")).isEmpty)
  }

  /** Duplicate-heavy distributions — the adversarial case for rank-error
    * sketches (a single value can own a wide rank interval). */
  private val skewedValues: Gen[List[Double]] = for {
    n <- Gen.choose(50, 300)
    dup <- Gen.chooseNum(-100.0, 100.0).map(math.rint)
    fracPct <- Gen.choose(30, 90)
    rest <- Gen.listOfN(n, Gen.chooseNum(-1e4, 1e4).map(math.rint))
  } yield rest.take(n - n * fracPct / 100) ++
    List.fill(n * fracPct / 100)(dup)

  /** The contract d20_quantile_sketch_audit declares as data: the sketch
    * answer's exact rank interval [count(<v̂), count(≤v̂)] brackets the
    * target rank p·N within εN = N/accuracy (+1 for the rank-definition
    * boundary) — measured here with a deliberately COARSE accuracy so the
    * bound is non-trivial, on duplicate-heavy inputs. */
  property("approx_percentile rank error ≤ N/accuracy on duplicate-heavy data") =
    Prop.forAll(skewedValues) { xs =>
      Prop(xs.size >= 50) ==> {
        val accuracy = 100
        val df = xs.toDF("v")
        val c = col("v")
        val ps = Seq(0.25, 0.5, 0.75)
        val approx = df.agg(org.apache.spark.sql.functions.percentile_approx(
            c, org.apache.spark.sql.functions.array(
              ps.map(org.apache.spark.sql.functions.lit): _*),
            org.apache.spark.sql.functions.lit(accuracy)))
          .collect()(0).getSeq[Double](0)
        val n = xs.size.toLong
        val eps = math.ceil(n.toDouble / accuracy).toLong + 1
        val ok = ps.zipWithIndex.forall { case (p, i) =>
          val lo = xs.count(_ < approx(i)).toLong
          val hi = xs.count(_ <= approx(i)).toLong
          lo <= p * n + eps && hi >= p * n - eps
        }
        Prop(ok) :| s"n=$n approx=$approx"
      }
    }
}
