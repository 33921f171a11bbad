package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** graft_sorted_intersect_count must be a DROP-IN for
  * `size(array_intersect(a, b))` on sorted distinct arrays (the l4/l5
  * verify hot loop), with graft_dot's null stance (null array or null
  * element → null) and a real codegen span.
  */
class SetExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches size(array_intersect) on random sorted string sets") {
    SetExprs.register(spark)
    val rnd = new scala.util.Random(11)
    // overlapping vocab so intersections are non-trivial; sets are distinct
    // + sorted, the expression's contract
    val rows = (0 until 300).map { i =>
      def set() = Seq.fill(rnd.nextInt(40))(s"w${rnd.nextInt(60)}")
        .distinct.sorted
      (i, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val mism = df.select(
        SetExprs.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(mism === 0L)
  }

  test("empty and disjoint inputs count zero") {
    SetExprs.register(spark)
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "b"), Seq("c", "d"))).toDF("a", "b")
    val got = df.select(SetExprs.sortedIntersectCount(col("a"), col("b"))).collect()
    got.foreach(r => assert(r.getInt(0) === 0))
  }

  test("null semantics: null array or null ELEMENT yields null, never garbage") {
    SetExprs.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(StringType, containsNull = true)),
      StructField("b", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(null, Seq("a")),
      Row(Seq("a"), null),
      Row(Seq(null, "a"), Seq("a", "b")), // sort_array puts nulls first
      Row(Seq("a", "b"), Seq(null, "b")),
      Row(Seq("a", "b", "c"), Seq("b", "c", "d")))
    // RDD-backed so the projection actually reaches codegen (a local Seq
    // constant-folds through ConvertToLocalRelation → interpreted eval)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(SetExprs.sortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0))
    assert(got(2).isNullAt(0), "null element on the left must yield null")
    assert(got(3).isNullAt(0), "null element on the right must yield null")
    assert(got(4).getInt(0) === 2)
    // and the interpreted path agrees (constant-folded local relation)
    val local = Seq((Seq[String](null, "a"), Seq("a")))
      .toDF("a", "b")
      .select(SetExprs.sortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(local(0).isNullAt(0))
  }

  test("projection compiles into WholeStageCodegen") {
    SetExprs.register(spark)
    // a parquet-backed frame: a local Seq would fold into LocalTableScan
    // (ConvertToLocalRelation) and never reach codegen at all
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(sort_array(split(lower(col("text")), " ")).as("t"))
      .select(SetExprs.sortedIntersectCount(col("t"), col("t")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("),
      s"the intersect-count projection must sit inside a codegen span:\n$plan")
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(code.contains("sicCmp"), "generated code must inline the merge loop")
  }

  test("SQL-callable once registered (extension surface)") {
    SetExprs.register(spark)
    Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
      .createOrReplaceTempView("sexp")
    val got = spark.sql(
      "SELECT graft_sorted_intersect_count(a, b) AS c FROM sexp").head().getInt(0)
    assert(got === 2)
  }
}
