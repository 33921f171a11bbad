package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for the l7/l11 IVF pipeline. */
object ProfileL11 {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val e = Tables.embeddings(spark, d)
    time("warmup count")(e.count())
    time("fit via l7 plan build only") {
      graft.queries.LlmQueries.annIvf(nprobe = 1)(e).queryExecution.analyzed
    }
    time("l11 body given fit")(
      graft.queries.LlmQueries.embedNearDup(tau = 0.4)(e)
        .write.format("noop").mode("overwrite").save())
    time("l11 full again")(
      graft.queries.LlmQueries.embedNearDup(tau = 0.4)(e)
        .write.format("noop").mode("overwrite").save())
    time("l7 full")(
      graft.queries.LlmQueries.annIvf(nprobe = 3)(e)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
