package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The HLL sketch's contract (SURVEY §2 D13): the estimate is accurate to
  * its published error bound, invariant to physical partitioning (the
  * property that makes the sketch mergeable across shards), and ignores
  * nulls like COUNT(DISTINCT). Error assertions use wide multiples of the
  * theoretical 1.04/√64 ≈ 13% relative error so the tests pin correctness,
  * not luck.
  */
class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(n: Int, parts: Int): Double = {
    val df = spark.range(n.toLong).repartition(parts)
      .select((col("id") * 2654435761L).as("v")) // spread ids; values distinct
    Hll.approxDistinct(df.withColumn("g", lit("a")), Seq("g"), col("v"))
      .collect().head.getDouble(1)
  }

  test("estimate within 3x the theoretical error across regimes") {
    // linear-counting regime (n << m·ln m), transition, and raw-HLL regime
    for (n <- Seq(30, 200, 5000)) {
      val est = estimate(n, parts = 8)
      assert(math.abs(est - n) <= math.max(3 * 0.13 * n, 8.0),
        s"n=$n est=$est")
    }
  }

  test("estimate is invariant to partitioning (mergeable sketch)") {
    val a = estimate(3000, parts = 1)
    val b = estimate(3000, parts = 17)
    assert(a == b, s"partitioning changed the estimate: $a vs $b")
  }

  test("register-max merge of two slices equals the sketch of their " +
      "union (the d18 algebra)") {
    // two overlapping slices: merge-then-estimate must equal
    // recompute-over-the-union EXACTLY (not approximately) — registers
    // from merged data ARE the max-merge of the slices' registers
    val a = spark.range(0L, 4000L)
      .select(lit("a").as("g"), (col("id") * 2654435761L).as("v"))
    val b = spark.range(2000L, 7000L)
      .select(lit("b").as("g"), (col("id") * 2654435761L).as("v"))
    val regs = Hll.registers(a.unionAll(b), Seq("g"), col("v"))
    val merged = regs.groupBy(lit("u").as("g"), col("__j"))
      .agg(max("__mj").as("__mj"))
    val viaMerge = Hll.estimateFromRegisters(merged, Seq("g"))
      .collect().head.getDouble(1)
    val recomputed = Hll.approxDistinct(
        a.unionAll(b).select(lit("u").as("g"), col("v")), Seq("g"), col("v"))
      .collect().head.getDouble(1)
    assert(viaMerge === recomputed,
      s"merge must equal recompute bit-for-bit: $viaMerge vs $recomputed")
    val Seq(ea, eb) = Hll.approxDistinct(a.unionAll(b), Seq("g"), col("v"))
      .orderBy("g").collect().map(_.getDouble(1)).toSeq
    assert(viaMerge >= math.max(ea, eb) - 1e-9,
      "a union estimate cannot fall below either slice's estimate")
  }

  test("duplicates don't move the estimate; nulls are ignored") {
    val base = (1 to 400).map(i => (("g"), s"u$i"))
    val dups = base ++ base ++ base
    val withNulls = dups.map { case (g, v) => (g, Option(v)) } ++
      Seq(("g", None: Option[String]), ("g", None: Option[String]))
    val one = Hll.approxDistinct(base.toDF("g", "v"), Seq("g"), col("v"))
      .collect().head.getDouble(1)
    val three = Hll.approxDistinct(withNulls.toDF("g", "v"), Seq("g"), col("v"))
      .collect().head.getDouble(1)
    assert(one == three, s"duplicates/nulls moved the estimate: $one vs $three")
  }

  test("wide (one-aggregation) form matches the two-level form to float ulp") {
    val df = (1 to 3000).map(i => (if (i % 3 == 0) "a" else "b", s"u${i % 700}"))
      .toDF("g", "v")
    val narrow = Hll.approxDistinct(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wide = Hll.approxDistinctWide(df, Seq(col("g")), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(narrow.keySet == wide.keySet)
    for ((k, n) <- narrow) {
      val d = math.abs(n - wide(k)) / n
      assert(d <= 1e-12, s"forms diverged for $k: $n vs ${wide(k)}")
    }
  }

  test("wide form refuses group columns colliding with internal names") {
    // the wide form recovers group columns BY NAME after the register
    // aggregation — a group column named into the internal namespace
    // would silently misgroup (ADVICE r07), so it must refuse loudly
    val df = (1 to 10).map(i => (s"g$i", i)).toDF("__j", "v")
    val e = intercept[IllegalArgumentException] {
      Hll.approxDistinctWide(df, Seq(col("__j")), col("v"))
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    val dup = (1 to 10).map(i => (s"g$i", s"g$i", i)).toDF("a", "b", "v")
    intercept[IllegalArgumentException] {
      Hll.approxDistinctWide(dup, Seq(col("a").as("hll_est")), col("v"))
    }
  }

  test("groups sketch independently") {
    val df = (1 to 1000).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("g", "v")
    val got = Hll.approxDistinct(df, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("even", "odd"))
    for ((_, est) <- got) assert(math.abs(est - 500) <= 3 * 0.13 * 500)
  }
}
