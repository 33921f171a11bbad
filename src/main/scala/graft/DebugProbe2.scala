package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Throwaway micro-experiments for per-task overhead. Not committed to the
  * bench contract. */
object DebugProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prep(spark)
    @volatile var cpuMs = 0L; @volatile var runMs = 0L; @volatile var nt = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val tm = te.taskMetrics
        if (tm != null) { cpuMs += tm.executorCpuTime / 1000000L; runMs += tm.executorRunTime; nt += 1 }
      }
    })
    def timed(name: String)(f: => Unit): Unit = {
      Thread.sleep(300); cpuMs = 0; runMs = 0; nt = 0
      val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"EXP $name%-42s wall=$w%7.2f cpu=${cpuMs / 1e3}%7.2f run=${runMs / 1e3}%7.2f tasks=$nt%5d")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    timed("warm: docs count")(docs.count())
    timed("range(1e6,32) sum")(noop(spark.range(0, 1000000, 1, 32).agg(sum("id"))))
    timed("range(1e6,32) sum again")(noop(spark.range(0, 1000000, 1, 32).agg(sum("id"))))
    timed("docs scan count")(docs.count())
    timed("spread(docs) count")(Tables.spread(docs).count())
    timed("spread(docs) count again")(Tables.spread(docs).count())
    timed("spread(docs) nt sum")(noop(Tables.spread(docs).select(size(split(lower(col("text")), " ")).as("nt")).agg(sum("nt"))))
    timed("docs (no spread) nt sum")(noop(docs.select(size(split(lower(col("text")), " ")).as("nt")).agg(sum("nt"))))
    timed("spread(docs) nt sum again")(noop(Tables.spread(docs).select(size(split(lower(col("text")), " ")).as("nt")).agg(sum("nt"))))
    timed("l164 full")(noop(SparkEntry.queries("l164_kruskal_wallis")(spark, sfDir)))
    timed("l164 full again")(noop(SparkEntry.queries("l164_kruskal_wallis")(spark, sfDir)))
    timed("l165 full")(noop(SparkEntry.queries("l165_anova_f")(spark, sfDir)))
    spark.stop()
  }
}
