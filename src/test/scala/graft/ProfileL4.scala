package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for the l4/l5 near-dup pipeline. */
object ProfileL4 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    time("l4 (prefix-filtered, cold cache)")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l4 again (cache warm)")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l5 after l4")(
      graft.queries.LlmQueries.l5_minhash_lsh.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l6 brute cosine")(
      graft.queries.LlmQueries.l6_topk_cosine.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l7 ivf ann")(
      graft.queries.LlmQueries.l7_ann_ivf.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("l11 embed neardup")(
      graft.queries.LlmQueries.l11_embed_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
