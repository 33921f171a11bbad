package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Throwaway diagnostic: run one query and print per-stage task/CPU/run
  * attribution so partition-count-superlinear stages can be located.
  * Not part of the bench contract. */
object DebugProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qname = sys.env.getOrElse("SPARK_GRAFT_PROBE", "l164_kruskal_wallis")
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
    case class St(var name: String = "", var tasks: Int = 0, var cpuMs: Long = 0,
      var runMs: Long = 0, var deserMs: Long = 0, var resSerMs: Long = 0,
      var gcMs: Long = 0, var srBytes: Long = 0, var swBytes: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, St()).name =
            e.stageInfo.name.take(80)
        }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        val tm = te.taskMetrics
        if (tm != null) {
          val s = stages.getOrElseUpdate(te.stageId, St())
          s.tasks += 1
          s.cpuMs += tm.executorCpuTime / 1000000L
          s.runMs += tm.executorRunTime
          s.deserMs += tm.executorDeserializeTime
          s.resSerMs += tm.resultSerializationTime
          s.gcMs += tm.jvmGCTime
          s.srBytes += tm.shuffleReadMetrics.totalBytesRead
          s.swBytes += tm.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    // warmup/caches as the bench would have them
    for ((tag, build) <- graft.queries.LlmQueries.cacheBuilders ++ graft.queries.MlQueries.cacheBuilders
         if sys.env.get("SPARK_GRAFT_PROBE_CACHES").exists(_.split(",").contains(tag)))
      build(spark, sfDir)
    Thread.sleep(500)
    synchronized { stages.clear() }
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"PROBE $qname cpus=$cpus wall=$wall%.2f s")
    println(f"${"stage"}%6s ${"tasks"}%6s ${"cpu_s"}%8s ${"run_s"}%8s ${"deser_s"}%8s ${"gc_s"}%6s ${"sr_kb"}%8s  name")
    var (tc, tcpu, trun) = (0, 0L, 0L)
    for ((id, s) <- stages.toSeq.sortBy(_._1)) {
      tc += s.tasks; tcpu += s.cpuMs; trun += s.runMs
      println(f"$id%6d ${s.tasks}%6d ${s.cpuMs / 1e3}%8.2f ${s.runMs / 1e3}%8.2f ${s.deserMs / 1e3}%8.2f ${s.gcMs / 1e3}%6.2f ${s.srBytes / 1024}%8d  ${s.name}")
    }
    println(f"TOTAL tasks=$tc cpu=${tcpu / 1e3}%.2f s run=${trun / 1e3}%.2f s")
    spark.stop()
  }
}
