package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Throwaway stage-level profiler for the l4 near-dup pipeline. */
object ProfileL4 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    val sh = docs.select(col("doc_id"), TextOps.shingleSet(TextOps.tokens(col("text")), 3).as("ss"))
    time("n countDistinct")(sh.select(countDistinct(col("doc_id"))).head)
    time("df agg+collect")(
      sh.select(explode(col("ss")).as("s")).groupBy("s").count().filter(col("count") > 500).collect())
    val cached = sh.withColumn("ssc", col("ss")).cache()
    time("cache materialize")(cached.count)
    val ex = cached.select(col("doc_id"), explode(col("ssc")).as("sng"))
    val cand = ex.as("a").join(ex.as("b"),
        col("a.sng") === col("b.sng") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
    time("cand join+distinct")(cand.count)
    val jac = TextOps.jaccard(col("da.ss"), col("db.ss"))
    val out = cand.join(cached.as("da"), col("i") === col("da.doc_id"))
      .join(cached.as("db"), col("j") === col("db.doc_id"))
      .filter(jac >= 0.5).select(col("i"), col("j"), round(jac, 6).as("jac")).orderBy("i", "j")
    time("verify+sort")(out.write.format("noop").mode("overwrite").save())
    time("full l4 via queries")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l4 again (cache warm)")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l5 after l4")(
      graft.queries.LlmQueries.l5_minhash_lsh.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
