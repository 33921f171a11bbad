package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The native graft_dot expression must be a DROP-IN for the interpreted
  * HOF form it replaced: bit-identical doubles (same left-to-right
  * summation), null array → null, and it must actually stay inside
  * whole-stage codegen (no CodegenFallback in the generated plan).
  */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("graft_dot is bit-identical to the HOF aggregate/zip_with form") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong,
        Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
        Seq.fill(n)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorExprs.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      // exact bit equality, not tolerance: the fold order is pinned
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot on the real embeddings matches the HOF form exactly") {
    VectorExprs.register(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
    val mism = e.select(
        VectorExprs.dot(col("v"), col("v")).as("native"),
        hofDot(col("v"), col("v")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mism === 0L)
  }

  test("null semantics: null array on either side yields null") {
    VectorExprs.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(3.0, 4.0))),
      (Some(Seq(1.0, 2.0)), None)).toDF("a", "b")
    val got = df.select(VectorExprs.dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("null semantics: a null ELEMENT yields null, never garbage (ADVICE r05)") {
    VectorExprs.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(Seq(1.0, null, 3.0), Seq(1.0, 1.0, 1.0)),
      Row(Seq(1.0, 2.0), Seq[Any](null, 1.0)),
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    // RDD-backed so the projection actually reaches codegen (a local Seq
    // constant-folds through ConvertToLocalRelation → interpreted eval)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(VectorExprs.dot(col("a"), col("b")).as("d")).collect()
    assert(got(0).isNullAt(0), "null element on the left must yield null")
    assert(got(1).isNullAt(0), "null element on the right must yield null")
    assert(got(2).getDouble(0) === 11.0)
    // and the interpreted path agrees (constant-folded local relation)
    val local = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b")).as("d")).collect()
    assert(local(0).isNullAt(0))
  }

  test("graft_dot projection compiles into WholeStageCodegen") {
    VectorExprs.register(spark)
    // a parquet-backed frame: a local Seq would fold into LocalTableScan
    // (ConvertToLocalRelation) and never reach codegen at all
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorExprs.dot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen span
    assert(plan.linesIterator.next().startsWith("*("),
      s"the graft_dot projection must sit inside a codegen span:\n$plan")
    // and the generated java actually contains the dot loop (would be absent
    // if the expression fell back to interpreted eval)
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("dotS"), "generated code must inline the dot loop")
  }

  test("graft_dot is SQL-callable once registered (extension surface)") {
    VectorExprs.register(spark)
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("vexp")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM vexp").head().getDouble(0)
    assert(got === 11.0)
  }

  // ------------------------------------------------------------ graft_l2sq

  /** The interpreted form graft_l2sq replaced (r19): fold (aᵢ−bᵢ)² from 0.0
    * in index order over slice()d windows — 1-based element_at over 1-based
    * slice starts, exactly as the PQ family's l2sq helper wrote it. */
  private def hofL2sq(a: org.apache.spark.sql.Column, aOff: Int,
      b: org.apache.spark.sql.Column, bOff: Int, n: Int) = {
    val as = slice(a, aOff + 1, n)
    val bs = slice(b, bOff + 1, n)
    aggregate(sequence(lit(1), lit(n)), lit(0.0), (acc, i) =>
      acc + (element_at(as, i) - element_at(bs, i)) *
        (element_at(as, i) - element_at(bs, i)))
  }

  test("graft_l2sq is bit-identical to the sliced HOF aggregate form") {
    VectorExprs.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)),
        Seq.fill(64)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(7) - 3)))
    }
    val df = rows.toDF("id", "a", "b")
    (0 until 4).foreach { s =>
      val out = df.select(
        VectorExprs.l2sqOff(col("a"), lit(s * 16), col("b"), lit(s * 16),
          lit(16)).as("native"),
        hofL2sq(col("a"), s * 16, col("b"), s * 16, 16).as("hof")).collect()
      out.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"subspace $s fold must be bit-identical")
      }
    }
    // asymmetric offsets (the pqFit seed-assign shape: 16-dim vs full-vector)
    val asym = df.select(
      VectorExprs.l2sqOff(slice(col("a"), 1, 16), lit(0), col("b"), lit(32),
        lit(16)).as("native"),
      hofL2sq(slice(col("a"), 1, 16), 0, col("b"), 32, 16).as("hof")).collect()
    asym.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_l2sq null semantics: null input, null element, OOB window → null") {
    VectorExprs.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0, 1.0)), // plain
      Row(null, Seq(1.0, 1.0, 1.0)),               // null array
      Row(Seq(1.0, null, 3.0), Seq(1.0, 1.0, 1.0)), // null element in window
      Row(Seq(1.0, 2.0), Seq(1.0, 1.0, 1.0)))      // a too short for len 3
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(VectorExprs.l2sqOff(col("a"), lit(0), col("b"), lit(0),
      lit(3)).as("d")).collect()
    assert(got(0).getDouble(0) === (0.0 + 1.0 + 4.0))
    assert(got(1).isNullAt(0), "null array must yield null")
    assert(got(2).isNullAt(0), "null element must yield null")
    assert(got(3).isNullAt(0), "an out-of-bounds window must yield null " +
      "(the element_at-poisoned fold it replaced)")
  }

  test("graft_l2sq projection compiles into WholeStageCodegen") {
    VectorExprs.register(spark)
    val df = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(VectorExprs.l2sqOff(col("v"), lit(0), col("v"), lit(16),
        lit(16)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"the graft_l2sq projection must sit inside a codegen span:\n$plan")
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("l2s"), "generated code must inline the l2sq loop")
  }
}
