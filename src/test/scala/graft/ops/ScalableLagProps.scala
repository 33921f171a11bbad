package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark

/** Equivalence law (round-2 verdict, What's-wrong #1 / Next-round #5):
  * ScalableLag.withLags over few partitions must produce EXACTLY the rows of
  * the plain skewed window `coalesce(lag(v, n).over(partitionBy(k)), 0)`,
  * including null order values, key ties broken by the unique id, duplicate
  * order keys, keys thinner than the lag depth, and null group keys.
  */
object ScalableLagProps extends Properties("ScalableLag") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("d", IntegerType),
    StructField("v", DoubleType),
    StructField("id", LongType, nullable = false)))

  private case class R(k: Option[String], d: Option[Int], v: Option[Double])

  private val rowGen: Gen[R] = for {
    k <- Gen.frequency(9 -> Gen.oneOf("a", "b", "c", "d").map(Some(_)), 1 -> Gen.const(None))
    d <- Gen.frequency(9 -> Gen.choose(0, 8).map(Some(_)), 1 -> Gen.const(None))
    v <- Gen.frequency(4 -> Gen.choose(-50, 50).map(x => Some(x.toDouble)), 1 -> Gen.const(None))
  } yield R(k, d, v)

  private val dataGen: Gen[List[R]] =
    Gen.choose(0, 120).flatMap(n => Gen.listOfN(n, rowGen))

  property("withLags == plain skewed window, for lag 1 and 2") =
    Prop.forAll(dataGen) { rs =>
      val rows = rs.zipWithIndex.map { case (r, i) =>
        Row(r.k.orNull, r.d.map(Int.box).orNull, r.v.map(Double.box).orNull, Long.box(i.toLong))
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)

      val order = Seq(col("d").asc_nulls_last, col("id").asc)
      val w = Window.partitionBy(col("k")).orderBy(order: _*)
      val expected = df
        .withColumn("l1", coalesce(lag(col("v"), 1).over(w), lit(0.0)))
        .withColumn("l2", coalesce(lag(col("v"), 2).over(w), lit(0.0)))
        .select("id", "l1", "l2").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq

      val got = ScalableLag.withLags(
        df, Seq("k"), order, col("v"),
        Seq(ScalableLag.LagCol("l1", 1, lit(0.0)), ScalableLag.LagCol("l2", 2, lit(0.0))),
        numPartitions = Some(5))
        .select("id", "l1", "l2").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1).toSeq

      Prop(got == expected) :| s"got=$got expected=$expected"
    }
}
