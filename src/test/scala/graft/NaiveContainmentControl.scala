package graft

import org.apache.spark.sql.functions._

/** Scratch positive control for the two-point scaling audit (not part of
  * the suite): times the UNFILTERED inverted-index containment self-join
  * (the pre-fix l114 shape, Σ df² cost) at two SFs so BENCHNOTES can
  * record that the audit's exponent flag catches a real superlinear
  * operator. */
object NaiveContainmentControl {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    def run(sf: String): (Double, Long) = {
      val docs = Tables.documents(spark, sf)
      val ex = docs.select(col("doc_id"),
        explode(graft.ops.TextOps.shingles(
          graft.ops.TextOps.tokens(col("text")), 3)).as("s"))
        .distinct()
      val t0 = System.nanoTime()
      val n = ex.as("a").join(ex.as("b"), "s")
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run("/root/testdata/sf0.001") // warm the session
    val (t1, n1) = run("/root/testdata/sf0.01")
    val (t2, n2) = run("/root/testdata/sf0.1")
    println(f"CONTROL sf0.01: $t1%.2f s, $n1 pairs; sf0.1: $t2%.2f s, $n2 pairs; " +
      f"time_exp=${math.log10(t2 / t1)}%.2f pair_exp=${math.log10(n2.toDouble / n1)}%.2f")
    // the filtered comparison: candidate count under l114's containment
    // prefix (tau=0.8) on the same raw corpus
    def filtered(sf: String): Long = {
      val docs = Tables.documents(spark, sf)
      val tau = 0.8
      val sh = docs.select(col("doc_id"),
        graft.ops.TextOps.shingleSet(
          graft.ops.TextOps.tokens(col("text")), 3).as("ss"))
      val hashed = sh.select(col("doc_id"), size(col("ss")).as("nf"),
        array_distinct(
          graft.functions.TextExprs.xxhash64Array(col("ss"))).as("hss"))
        .filter(col("nf") > 0)
      val ex = hashed.select(col("doc_id"), col("nf"),
        explode(col("hss")).as("sng"))
      val withDf = ex.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("sng"))).localCheckpoint(false)
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("sng"))
      val prefix = withDf.withColumn("rk", row_number().over(byRarity))
        .filter(col("rk") <= col("nf") - ceil(lit(tau) * col("nf") - 1e-9) + 1)
        .select(col("doc_id").as("i"), col("sng"))
      val full = withDf.select(col("doc_id").as("j"), col("sng"))
      prefix.join(full, Seq("sng")).filter(col("i") =!= col("j"))
        .select("i", "j").distinct().count()
    }
    val f1 = filtered("/root/testdata/sf0.01")
    val f2 = filtered("/root/testdata/sf0.1")
    println(f"FILTERED candidates sf0.01: $f1; sf0.1: $f2; " +
      f"cand_exp=${math.log10(f2.toDouble / f1)}%.2f")
  }
}
