package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The streaming ops replayed over the real events table, micro-batched
  * file-by-file, asserted equal to their batch forms — the
  * batch/streaming-symmetry contract StreamingOps promises.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** events re-written as micro-batchable files (8 splits, duplicated when
    * asked) with a plain TIMESTAMP column (the nanos quirk is a batch-scan
    * concern, already covered by Tables.events). */
  private def stage(dups: Boolean): (String, DataFrame) = {
    val batch = graft.Tables.events(spark, sf).select("event_id", "ts", "value")
    val dir = Files.createTempDirectory("graft_stream_src").toString
    val staged = if (dups) batch.union(batch) else batch
    staged.repartition(8).write.mode("overwrite").parquet(dir)
    (dir, batch)
  }

  private def runStream(dir: String, f: DataFrame => DataFrame, name: String,
      mode: String): DataFrame = {
    val src = spark.readStream
      .schema(graft.Tables.events(spark, sf).select("event_id", "ts", "value").schema)
      .option("maxFilesPerTrigger", 2) // several micro-batches, watermark advances
      .parquet(dir)
    val q = f(src).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming weekly window equals the batch d5 aggregation") {
    val (dir, batch) = stage(dups = false)
    val expected = StreamingOps.weeklyAvg(batch)
      .collect().map(_.toSeq).toSet
    val got = runStream(dir, StreamingOps.weeklyAvg(_), "weekly_stream", "complete")
      .collect().map(_.toSeq).toSet
    assert(got === expected)
  }

  test("streaming dedup emits each event_id exactly once") {
    // files arrive in arbitrary (non-time) order, so the watermark must
    // exceed the table's time span or re-arrivals of old rows would be
    // dropped as late data rather than deduped — the late-drop behavior
    // itself is pinned by the MemoryStream test below
    val (dir, batch) = stage(dups = true)
    val got = runStream(dir,
      StreamingOps.dedupByEventId(_, watermark = "3650 days"), "dedup_stream", "append")
    val n = got.count()
    val distinctIds = batch.select("event_id").distinct().count()
    assert(n === distinctIds, "one surviving row per event_id")
    assert(got.groupBy("event_id").count().filter(col("count") > 1).isEmpty)
  }

  test("watermark drops rows that arrive later than the allowed lateness") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = StreamingOps.dedupByEventId(
        mem.toDF().toDF("event_id", "ts", "value"), watermark = "7 days")
      .writeStream.format("memory").queryName("late_stream").outputMode("append")
      .start()
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    mem.addData((1L, t("2024-03-01"), 1.0), (2L, t("2024-03-10"), 2.0))
    q.processAllAvailable() // watermark advances to 2024-03-03
    mem.addData((3L, t("2024-02-20"), 3.0)) // 12 days late — beyond the 7 allowed
    q.processAllAvailable()
    mem.addData((4L, t("2024-03-09"), 4.0)) // 1 day late — within allowance
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("late_stream").select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L), s"late row must be dropped, got $ids")
  }
}
