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

  test("streaming weekly approx-distinct equals the batch sketch") {
    // duplicated input makes the DISTINCT semantics observable: the
    // estimate must not move when every row arrives twice
    val (dir, batch) = stage(dups = true)
    val expected = StreamingOps.weeklyApproxDistinct(batch)
      .collect().map(_.toSeq).toSet
    val got = runStream(dir, StreamingOps.weeklyApproxDistinct(_),
      "hll_stream", "complete")
      .collect().map(_.toSeq).toSet
    assert(got === expected,
      "micro-batch register merges must reproduce the batch estimate")
    // and the estimate tracks the exact weekly cardinality, week by week
    val exact = batch
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"))
      .agg(countDistinct("event_id").as("n"))
      .select(date_format(date_add(col("w.end").cast("date"), -1),
        "yyyy-MM-dd").as("week_ending"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ests = got.toSeq
      .map(s => s(0).asInstanceOf[String] -> s(1).asInstanceOf[Double]).toMap
    assert(ests.keySet === exact.keySet)
    for ((wk, e) <- ests) {
      val n = exact(wk).toDouble
      assert(math.abs(e - n) / math.max(n, 1.0) <= 0.45,
        s"week $wk: estimate $e vs exact $n exceeds the HLL bound")
    }
  }

  test("streaming weekly count-min sketch equals the batch cells; offline " +
      "estimation over the streamed cells is exact-or-over") {
    import spark.implicits._
    // duplicated input: every event arrives twice, so each key's exact
    // weekly count is 2 and the exact-or-over contract is observable
    val (dir, batch) = stage(dups = true)
    val doubled = batch.union(batch)
    val expected = StreamingOps.weeklyCmSketch(doubled, col("event_id"))
      .collect().map(_.toSeq).toSet
    val got = runStream(dir,
        StreamingOps.weeklyCmSketch(_, col("event_id")), "cm_stream", "complete")
      .collect().map(_.toSeq).toSet
    assert(got === expected,
      "micro-batch counter merges must reproduce the batch sketch cell for cell")
    // the lambda split: estimation runs OFFLINE against the streamed cells
    val wk = got.map(_(0).asInstanceOf[String]).min
    val sk = got.toSeq.filter(_(0) == wk)
      .map(s => (s(1).asInstanceOf[Long], s(2).asInstanceOf[Long],
        s(3).asInstanceOf[Long]))
      .toDF("r", "c", "cnt")
    val weekKeys = doubled
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"),
        col("event_id"))
      .agg(count(lit(1)).as("n_exact"))
      .select(date_format(date_add(col("w.end").cast("date"), -1),
        "yyyy-MM-dd").as("week_ending"), col("event_id"), col("n_exact"))
      .filter(col("week_ending") === wk)
      .limit(50)
    val ests = graft.ops.CountMin.estimate(sk, weekKeys, col("event_id"))
      .join(weekKeys.withColumnRenamed("event_id", "key"), Seq("key"))
      .select("key", "cm_est", "n_exact").collect()
    assert(ests.nonEmpty)
    ests.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CM estimate for key ${r.getLong(0)} under-counted: " +
          s"${r.getLong(1)} < ${r.getLong(2)} — the sketch must never under-estimate")
    }
  }

  test("streaming drift monitor: CUSUM over streamed weekly means equals " +
      "the batch chart, and an injected late-era shift raises the alarm " +
      "through the streaming path") {
    import spark.implicits._
    val (dir, batch) = stage(dups = false)
    // append a drifted era: three extra weeks far above the baseline,
    // landing as new source files the stream picks up like any arrival
    val maxTs = batch.agg(max("ts")).collect()(0).getTimestamp(0)
    val drift = (1 to 21).map { d =>
      (900000L + d, new java.sql.Timestamp(
        maxTs.getTime + (7L + d) * 24 * 3600 * 1000), 1000.0)
    }.toDF("event_id", "ts", "value")
    drift.repartition(1).write.mode("append").parquet(dir)
    def weekly(df: DataFrame): DataFrame =
      StreamingOps.weeklyAvg(df)
        .select(col("week_ending").as("we"),
          col("avg_value").cast("double").as("x"))
    val streamedWeekly =
      runStream(dir, StreamingOps.weeklyAvg(_), "cusum_stream", "complete")
        .select(col("week_ending").as("we"),
          col("avg_value").cast("double").as("x"))
    val gotChart = graft.queries.LlmQueries.cusum(streamedWeekly, 4)
      .collect().map(_.toSeq).toSet
    val expChart = graft.queries.LlmQueries
      .cusum(weekly(batch.unionByName(drift)), 4)
      .collect().map(_.toSeq).toSet
    assert(gotChart === expChart,
      "the chart over streamed weekly rows must equal the batch chart")
    val rows = gotChart.toSeq.map(s => (s(0).asInstanceOf[String],
      s(4).asInstanceOf[Long])).sortBy(_._1)
    val baseWeeks = rows.take(4).map(_._1)
    assert(rows.filter(r => baseWeeks.contains(r._1)).forall(_._2 == 0L),
      "the baseline era must not alarm")
    assert(rows.last._2 === 1L,
      s"the +shift era must latch the alarm through the streamed path: $rows")
  }

  test("streaming weekly quantile sketch (l213 body) equals the batch " +
      "fold — bottom-k state is order-free across micro-batches") {
    val (dir, batch) = stage(dups = false)
    val expected = StreamingOps.weeklyQuantileSketch(batch)
      .collect().map(_.toSeq).toSet
    val emitted = runStream(dir, StreamingOps.weeklyQuantileSketch(_),
      "qsk_stream", "update").collect().map(_.toSeq)
    // update mode emits once per (key, touched batch); n_seen is strictly
    // monotone per key, so the final row per key is its max-n_seen row —
    // the identifiability the op's scaladoc declares
    val finals = emitted.groupBy(_.head).map { case (_, rows) =>
      rows.maxBy(_(1).asInstanceOf[Long]) }.toSet
    assert(finals === expected,
      "the micro-batched fold must land on the batch bottom-k exactly")
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

  test("streaming session windows equal the batch sessionization") {
    // sessionAgg groups by user_id, which stage() drops — re-stage with it
    val batch = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "value")
    val dir = Files.createTempDirectory("graft_stream_sess").toString
    batch.repartition(8).write.mode("overwrite").parquet(dir)
    // files arrive in arbitrary (non-time) order, and session windows
    // filter watermark-late rows even in complete mode (their state is
    // merge-managed, unlike plain windowed aggs) — so the watermark must
    // exceed the table's span for the equality to be exact; the late-close
    // behavior itself is pinned by the append-mode test below
    val wm = "3650 days"
    val expected = StreamingOps.sessionAgg(batch, watermark = wm)
      .collect().map(_.toSeq).toSet
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
    val q = StreamingOps.sessionAgg(src, watermark = wm).writeStream
      .format("memory").queryName("session_stream").outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("session_stream").collect().map(_.toSeq).toSet
    assert(got === expected,
      "incremental session merging must converge to the batch gap-split")
    // sanity: sessions actually merge events (not one session per event)
    assert(expected.exists(_(3).asInstanceOf[Long] > 1L))
  }

  test("streaming session sequences (l98 body) equal the batch assembly, " +
      "order intact across micro-batch session merges") {
    val batch = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
    val dir = Files.createTempDirectory("graft_stream_seq").toString
    batch.repartition(8).write.mode("overwrite").parquet(dir)
    // the vocab side input is batch-built either way (stream-static join)
    val typeIds = batch.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .agg(collect_list(struct((-col("c")).as("nc"), col("event_type"))).as("raw"))
      .select(posexplode(array_sort(col("raw"))))
      .select(col("col").getField("event_type").as("event_type"),
        col("pos").cast("long").as("tid"))
    val wm = "3650 days"
    val expected = StreamingOps.sessionSequences(batch, typeIds, watermark = wm)
      .collect().map(_.toSeq).toSet
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val q = StreamingOps.sessionSequences(src, typeIds, watermark = wm)
      .writeStream.format("memory").queryName("seq_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("seq_stream").collect().map(_.toSeq).toSet
    assert(got === expected,
      "session merges across micro-batches must preserve the event order " +
        "inside every emitted id-sequence")
    // the sequences are real multi-event trails, not singletons
    assert(expected.exists(_(3).asInstanceOf[String].contains(" ")))
  }

  test("stream-stream interval join equals the batch inequality join") {
    val batch = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(0.0)) // unused by the body; keeps one schema
      .select("event_id", "ts", "user_id", "event_type")
    val dir = Files.createTempDirectory("graft_stream_ij").toString
    batch.repartition(8).write.mode("overwrite").parquet(dir)
    // files arrive in arbitrary (non-time) order, so the watermark must
    // exceed the table's span for exact equality — the state-expiry
    // behavior at tight watermarks is Spark's own contract, not ours
    val wm = "3650 days"
    val expected = StreamingOps.intervalJoin(batch, watermark = wm)
      .collect().map(_.toSeq).toSet
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
    val q = StreamingOps.intervalJoin(src, watermark = wm).writeStream
      .format("memory").queryName("ij_stream").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ij_stream").collect().map(_.toSeq).toSet
    assert(got === expected,
      "watermarked stream-stream join must reconstruct the batch join")
    assert(expected.nonEmpty, "fixture must produce at least one joined pair")
  }

  test("stream-stream LEFT OUTER interval join: equals batch once the " +
      "watermark finalizes; null rows are withheld until it does") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wm = "1 hour"
    val real = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._2.getTime)
    // far-future sentinels on an unused user, ONE OF EACH TYPE per wave:
    // the global watermark is the MIN across both sides' watermark
    // nodes, and each side only sees its own event type post-filter — a
    // click-only sentinel would leave the errors-side watermark at the
    // last real error and hold that error's null row forever (observed
    // live: exactly the max-ts error row missing). Wave 1 drives both
    // watermarks past every real error's window; wave 2 triggers the
    // batch in which that watermark APPLIES (batch N's watermark
    // finalizes state in batch N+1). Sentinel rows themselves are
    // excluded from the comparison on both sides.
    val maxTs = real.last._2.getTime
    def sentinels(id: Long, offsetH: Int) = Seq(
      (id, new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "click"),
      (id + 1, new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "error"))
    val batchDf = real.toSeq.toDF("event_id", "ts", "user_id", "event_type")
    val expected = StreamingOps.intervalJoinLeftOuter(batchDf, watermark = wm)
      .collect().map(_.toSeq).toSet
    val (expNull, expMatched) = expected.partition(_(2) == null)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingOps.intervalJoinLeftOuter(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        watermark = wm)
      .writeStream.format("memory").queryName("loj_stream")
      .outputMode("append").start()
    // feed in event-time order, three slices, watermark advancing between
    real.grouped((real.length + 2) / 3).foreach { slice =>
      mem.addData(slice.toIndexedSeq); q.processAllAvailable()
    }
    // before finalization: every match is already out (inner rows don't
    // wait), but the tail errors' null rows MUST still be withheld
    val early = spark.table("loj_stream").collect().map(_.toSeq).toSet
    assert(early.filter(_(2) != null) === expMatched,
      "matched rows must stream out without waiting for the watermark")
    assert(early.count(_(2) == null) < expNull.size,
      "some null rows must still be held in state before finalization")
    mem.addData(sentinels(900001L, 24)); q.processAllAvailable()
    mem.addData(sentinels(900011L, 48)); q.processAllAvailable()
    q.stop()
    val got = spark.table("loj_stream").collect().map(_.toSeq)
      .filter(_(0) != -1L).toSet
    assert(got === expected,
      "after watermark finalization the stream must equal the batch " +
        "outer join exactly")
    assert(expNull.nonEmpty && expMatched.nonEmpty,
      "fixture must exercise both the matched and the null paths")
    info(s"l118 stream: ${expMatched.size} matched, ${expNull.size} null " +
      s"rows, ${early.count(_(2) == null)} released pre-finalization")
  }

  test("stream-stream FULL OUTER interval join: equals batch after the " +
      "watermark finalizes; BOTH orphan sides emit null rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wm = "1 hour"
    val real = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._2.getTime)
    val maxTs = real.last._2.getTime
    def sentinels(id: Long, offsetH: Int) = Seq(
      (id, new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "click"),
      (id + 1, new java.sql.Timestamp(maxTs + offsetH * 3600L * 1000), -1L, "error"))
    val batchDf = real.toSeq.toDF("event_id", "ts", "user_id", "event_type")
    val expected = StreamingOps.intervalJoinFullOuter(batchDf, watermark = wm)
      .collect().map(_.toSeq).toSet
    val orphanErr = expected.count(r => r(2) == null)
    val orphanClick = expected.count(r => r(1) == null)
    assert(orphanErr > 0 && orphanClick > 0,
      "fixture must exercise BOTH orphan sides or the mode is vacuous")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingOps.intervalJoinFullOuter(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        watermark = wm)
      .writeStream.format("memory").queryName("foj_stream")
      .outputMode("append").start()
    real.grouped((real.length + 2) / 3).foreach { slice =>
      mem.addData(slice.toIndexedSeq); q.processAllAvailable()
    }
    mem.addData(sentinels(900021L, 24)); q.processAllAvailable()
    mem.addData(sentinels(900031L, 48)); q.processAllAvailable()
    q.stop()
    // sentinel rows all carry user_id = -1 (matched sentinel-vs-sentinel
    // pairs included) and are excluded; everything real must equal batch
    val got = spark.table("foj_stream").collect().map(_.toSeq)
      .filter(_(0) != -1L).toSet
    assert(got === expected,
      "after finalization the stream must equal the batch full outer exactly")
    info(s"l157 stream: ${expected.size} rows, $orphanErr orphan errors, " +
      s"$orphanClick orphan clicks")
  }

  test("stream-stream LEFT SEMI interval join: equals the batch EXISTS, " +
      "one row per error regardless of click fan-out, no null rows ever") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wm = "1 hour"
    val real = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect().sortBy(_._2.getTime)
    val batchDf = real.toSeq.toDF("event_id", "ts", "user_id", "event_type")
    val expected = StreamingOps.intervalJoinLeftSemi(batchDf, watermark = wm)
      .collect().map(_.toSeq).toSet
    // fan-out premise: at least one attributed error has >1 click in its
    // window — the mode distinction from inner is non-vacuous
    val fanOut = StreamingOps.intervalJoin(batchDf, watermark = wm)
      .groupBy("err_id").count().filter(col("count") > 1).count()
    assert(fanOut > 0, "fixture must contain an error with multiple clicks")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingOps.intervalJoinLeftSemi(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        watermark = wm)
      .writeStream.format("memory").queryName("semi_stream")
      .outputMode("append").start()
    real.grouped((real.length + 2) / 3).foreach { slice =>
      mem.addData(slice.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("semi_stream").collect().map(_.toSeq)
    assert(rows.toSet === expected,
      "semi rows emit on match without any watermark wait — the final " +
        "table must equal the batch EXISTS exactly")
    assert(rows.length === rows.toSet.size,
      "exactly one emission per attributed error, even with click fan-out")
    info(s"l147 stream: ${rows.length} attributed errors, " +
      s"$fanOut with multi-click windows, 0 duplicates")
  }

  test("streaming LSH near-dup candidates equal the batch candidate set") {
    import spark.implicits._
    // the expected-set pipeline below uses the TextExprs natives directly
    // (resolved by NAME), so the suite session needs them registered like
    // any production session (Tables.prep / GraftExtensions route)
    graft.functions.TextExprs.register(spark)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    // expected: the batch band-bucket self-join over the SAME primitives
    val sigs = graft.ops.TextOps.minhashSignatures(
      docs.select(col("doc_id"),
        graft.ops.TextOps.shingleSet(graft.ops.TextOps.tokens(col("text")), 3).as("ss")),
      "doc_id", "ss", 64)
    val bands = sigs.select(col("doc_id"),
        explode(graft.ops.TextOps.lshBands(col("sig"), 16, 4)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.key").as("key"))
    val expected = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "corpus must have LSH collisions")

    // batch mode: same body, state starts empty per bucket
    val gotBatch = StreamingOps.lshCandidatePairs(docs).collect().toSet
    assert(gotBatch === expected)

    // streaming: two chunks, so cross-chunk pairs must come from STATE
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.lshCandidatePairs(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lsh_stream").outputMode("append")
      .start()
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = rows.splitAt(rows.length / 2)
    mem.addData(h1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(h2.toIndexedSeq)
    q.processAllAvailable()
    // re-arrival of known docs must add NOTHING (already in state)
    mem.addData(h1.take(20).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val gotStream = spark.table("lsh_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotStream === expected,
      "incremental bucket state must reconstruct exactly the batch candidates")
  }

  test("md5-variant streaming LSH equals its batch candidate set (the l19 body)") {
    import spark.implicits._
    // the md5 variant's batch run IS the oracle-hashed l19 declaration;
    // this pins that a chunked stream through the same bucket store
    // reconstructs it exactly, so the oracle row certifies the streaming
    // operator, not just a batch lookalike
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val expected = StreamingOps.lshCandidatePairsMd5(docs).collect().toSet
    assert(expected.nonEmpty, "corpus must have md5-LSH collisions")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.lshCandidatePairsMd5(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lsh_md5_stream").outputMode("append")
      .start()
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val (h1, h2) = rows.splitAt(rows.length / 2)
    mem.addData(h1.toIndexedSeq)
    q.processAllAvailable()
    mem.addData(h2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val gotStream = spark.table("lsh_md5_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotStream === expected)
  }

  test("streaming passage chunking (l45 body) equals the batch output") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val expected = graft.queries.LlmQueries.passageChunks(docs)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val q = graft.queries.LlmQueries.passageChunks(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream").outputMode("append")
      .start()
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
      mem.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("chunk_stream").collect().map(_.toSeq).toSet
    assert(got === expected,
      "the per-row chunker must emit identical rows on a chunked stream")
  }

  /** The l19 eviction scenario, session-parametric so the SAME script runs
    * under the default (HDFS-backed in-heap) state store and under
    * RocksDB: near-dup pair via state → horizon passes → bucket evicted →
    * post-expiry twin pairs with nothing → sub-watermark straggler
    * pre-filtered. Returns (emitted pairs, straggler-dropped?). */
  private def evictionScenario(s: org.apache.spark.sql.SparkSession,
      name: String): (Set[(Long, Long)], Boolean) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different content with no shared trigram shingles at all whatsoever"
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingOps.lshCandidatePairs(
        mem.toDF().toDF("doc_id", "text", "arrive_ts"),
        tsCol = Some("arrive_ts"), horizon = "1 hour")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    // near-identical docs at t0/t5 share every band bucket → pair via state
    mem.addData(Seq((1L, text, ts(0))))
    q.processAllAvailable()
    mem.addData(Seq((2L, text, ts(5))))
    q.processAllAvailable()
    // unrelated doc 3h on → watermark (horizon behind max event) moves to
    // t+120, past the (1,2) buckets' timeout at newest(t5) + 1h = t65
    mem.addData(Seq((3L, other, ts(180))))
    q.processAllAvailable()
    // timeouts fire only for groups with NO data in the batch — one more
    // unrelated arrival lets the expired buckets actually drop
    mem.addData(Seq((4L, other + " and yet more unrelated filler words", ts(200))))
    q.processAllAvailable()
    // identical text arriving after expiry: its bucket history is gone,
    // so no candidate pair against doc 1 or 2 can be emitted
    mem.addData(Seq((5L, text, ts(210))))
    q.processAllAvailable()
    // late straggler: with EventTimeTimeout armed, Spark PRE-FILTERS rows
    // older than the watermark before they reach the bucket store
    // (runtime-verified; ADVICE r11) — the straggler must be dropped by
    // the watermark, create no state, emit no pairs, and not crash the
    // query. The setTimeoutTimestamp clamp in bucketPairs stays as
    // defense-in-depth behind this engine behavior.
    val droppedBefore = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    mem.addData(Seq((6L, other + " straggler content entirely its own", ts(-120))))
    q.processAllAvailable()
    val droppedAfter = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
    q.stop()
    val got = s.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (got, droppedAfter > droppedBefore)
  }

  private def assertEvictionInvariants(got: Set[(Long, Long)],
      stragglerDropped: Boolean): Unit = {
    assert(stragglerDropped,
      "the sub-watermark straggler must be pre-filtered by the watermark " +
        "(numRowsDroppedByWatermark) before reaching the bucket store")
    assert(got.contains((1L, 2L)), "pre-horizon candidates must be unaffected")
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      "a doc arriving after bucket expiry must not pair with evicted history")
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L),
      "the dropped straggler must not appear in any candidate pair")
  }

  test("lsh bucket store evicts buckets past the horizon (watermark-keyed TTL)") {
    val (got, dropped) = evictionScenario(spark, "lsh_evict")
    assertEvictionInvariants(got, dropped)
  }

  test("transformWithState per-user quota: first-k admission equals the " +
      "batch cut, later arrivals suppressed (the Spark-4 state API)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // transformWithState REQUIRES the multi-column-family store — RocksDB
    // (the conf-scoped child-session idiom of the RocksDB suite below)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.Tables.prep(s2)
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val rows = graft.Tables.events(s2, sf)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .sortBy(r => (r._3.getTime, r._2))
    val k = 3
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      rs.sortBy(r => (r._3.getTime, r._2)).take(k).map(r => (u, r._2))
    }.toSet
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamingOps.perUserQuota(
        mem.toDF().toDF("user_id", "event_id", "ts"), k)
      .writeStream.format("memory").queryName("quota_stream")
      .outputMode("append").start()
    // time-ordered slices: quota state must carry ACROSS batches (a user
    // admitted twice in slice 1 has room for exactly one more later)
    rows.grouped((rows.length + 3) / 4).foreach { slice =>
      mem.addData(slice.toIndexedSeq); q.processAllAvailable()
    }
    // replay probe: re-sending the earliest slice must admit NOTHING new
    // (every user's counter is already at quota or their events were
    // admitted — the suppression is stateful, not per-batch)
    val sizeBefore = s2.table("quota_stream").count()
    mem.addData(rows.take(rows.length / 4).toIndexedSeq)
    q.processAllAvailable()
    val got = s2.table("quota_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got.size.toLong === sizeBefore,
      "a replayed slice must admit nothing once quotas are consumed")
    assert(got === expected,
      "streamed first-k admission must equal the batch row_number cut")
    assert(got.groupBy(_._1).values.forall(_.size <= k),
      "no user may exceed the quota")
    assert(rows.groupBy(_._1).exists(_._2.length > k),
      "fixture must contain a user who actually hits the quota")
    info(s"quota: ${got.size} admitted of ${rows.length} events, " +
      s"${rows.map(_._1).distinct.length} users, k=$k")
  }

  test("transformWithState inactivity timers: silence fires exactly at " +
      "watermark passage; re-arming suppresses; resumption re-opens") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.Tables.prep(s2)
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = StreamingOps.inactivityAlerts(
        mem.toDF().toDF("user_id", "event_id", "ts"), gap = "3 days")
      .writeStream.format("memory").queryName("quiet_stream")
      .outputMode("append").start()
    def rows() = s2.table("quiet_stream")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // user 1: two close events then silence; user 2: one event, long
    // silence, then resumption (two separate quiet periods)
    mem.addData((1L, 10L, t("2024-03-01 00:00:00")),
      (1L, 11L, t("2024-03-01 06:00:00")),
      (2L, 20L, t("2024-03-01 00:00:00")))
    q.processAllAvailable()
    assert(rows().isEmpty, "no one is provably quiet yet")
    // a driver event pushes the watermark past 2024-03-04 06:00 (+3d
    // after user 1's last) — BOTH users' deadlines pass; then user 2
    // resumes, re-opening a fresh window
    mem.addData((9L, 90L, t("2024-03-06 00:00:00")))
    q.processAllAvailable()
    mem.addData((2L, 21L, t("2024-03-06 12:00:00")))
    q.processAllAvailable()
    val mid = rows()
    assert(mid === Set((1L, "2024-03-01 06:00:00.000000"),
      (2L, "2024-03-01 00:00:00.000000")),
      s"both silent users must fire with their LAST event time: $mid")
    // push the watermark past everyone: user 2's second window and the
    // driver user's own window fire; user 1 must NOT fire again (state
    // cleared at first fire, no new events)
    mem.addData((8L, 80L, t("2024-04-01 00:00:00")))
    q.processAllAvailable()
    mem.addData((8L, 81L, t("2024-05-01 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val fin = rows()
    assert(fin.count(_._1 == 1L) === 1, "one quiet row per silence period")
    assert(fin.contains((2L, "2024-03-06 12:00:00.000000")),
      s"resumption must open a fresh window that fires on its own: $fin")
    assert(fin.contains((9L, "2024-03-06 00:00:00.000000")), s"$fin")
    info(s"inactivity: ${fin.size} quiet rows across " +
      s"${fin.map(_._1).toSet.size} users")
  }

  test("stateful ops run unchanged under RocksDBStateStoreProvider (the 100 TB state store)") {
    // the default HDFS-backed store keeps every bucket on the executor
    // HEAP — exactly the state that outgrows memory at corpus scale; the
    // deployment answer is RocksDB (state on local disk, heap holds a
    // block cache). A conf-scoped CHILD session (the a12 idiom: shared
    // context and cache, private conf) flips the provider; the l19
    // eviction scenario and the l55 chained window aggregation — the two
    // heaviest state topologies in the engine (flatMapGroupsWithState +
    // EventTimeTimeout; chained stateful aggs) — must produce IDENTICAL
    // output, and the progress metrics must prove RocksDB actually served
    // the state (no silent fallback).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import scala.jdk.CollectionConverters._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.Tables.prep(s2)

    // (1) l19 eviction: same scenario, same emitted pairs + invariants
    val (gotDefault, _) = evictionScenario(spark, "lsh_evict_heap")
    val (gotRocks, droppedRocks) = evictionScenario(s2, "lsh_evict_rocks")
    assertEvictionInvariants(gotRocks, droppedRocks)
    assert(gotRocks === gotDefault,
      "RocksDB-backed bucket store must emit exactly the default store's pairs")

    // (2) l55 chained PSI: stream under RocksDB ≡ batch monitor
    import s2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val batchEv = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull).select("ts", "value")
    val (edges, refProps) = graft.queries.LlmQueries.psiWeeklyFit(batchEv)
    val rows = batchEv.as[(java.sql.Timestamp, Double)].collect()
      .sortBy(_._1.getTime)
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = StreamingOps.psiWeekly(mem.toDF().toDF("ts", "value"),
        edges, refProps, watermark = "1 hour")
      .writeStream.format("memory").queryName("psi_rocks").outputMode("append")
      .start()
    rows.grouped(rows.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    mem.addData((java.sql.Timestamp.valueOf("2024-03-15 00:00:00"), 0.0))
    q.processAllAvailable()
    // the provider must have ENGAGED: RocksDB registers rocksdb* custom
    // state metrics in the progress — absent means silent fallback
    val rocksEngaged = q.recentProgress.flatMap(_.stateOperators)
      .exists(_.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")))
    q.stop()
    assert(rocksEngaged,
      "progress must carry rocksdb* state metrics — the provider did not engage")
    val got = s2.table("psi_rocks")
      .as[(String, Long, Double)].collect().toSet
    val expected = StreamingOps.psiWeekly(batchEv, edges, refProps)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected,
      "RocksDB-backed chained aggregation must reproduce the batch PSI per closed week")

    // (3) l96 weekly CM sketch: the newest stateful topology (windowed
    // counter grid) — streamed cells under RocksDB ≡ the batch cells
    val evKeys = graft.Tables.events(spark, sf)
      .filter(col("event_id").isNotNull).select("ts", "event_id")
    val kRows = evKeys.as[(java.sql.Timestamp, Long)].collect()
      .sortBy(_._1.getTime)
    val mem2 = MemoryStream[(java.sql.Timestamp, Long)]
    val q2 = StreamingOps.weeklyCmSketch(
        mem2.toDF().toDF("ts", "event_id"), col("event_id"))
      .writeStream.format("memory").queryName("cm_rocks")
      .outputMode("complete").start()
    kRows.grouped(kRows.length / 3 + 1).foreach { c =>
      mem2.addData(c.toSeq: _*); q2.processAllAvailable()
    }
    val rocksEngaged2 = q2.recentProgress.flatMap(_.stateOperators)
      .exists(_.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb")))
    q2.stop()
    assert(rocksEngaged2,
      "the CM sketch query must carry rocksdb* state metrics too")
    val gotCm = s2.table("cm_rocks").collect().map(_.toSeq).toSet
    val expCm = StreamingOps.weeklyCmSketch(evKeys, col("event_id"))
      .collect().map(_.toSeq).toSet
    assert(gotCm === expCm,
      "RocksDB-backed CM counters must equal the batch cells exactly")
  }

  test("lsh state-schema migration: evict-on restart from an evict-off checkpoint " +
      "fails as documented; fresh checkpoint + batch re-seed recovers the candidate set") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cp1 = Files.createTempDirectory("graft_lsh_cp1").toString
    val cp2 = Files.createTempDirectory("graft_lsh_cp2").toString
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    def ts(min: Int) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime + min * 60000L)
    val history = Seq((1L, text, ts(0)), (2L, text + " v2", ts(5)))
    val live = Seq((3L, text + " v3", ts(10)))

    // era 1: the pre-eviction build — tsCol=None keeps the legacy
    // Seq[Long] state encoder — writes checkpoint cp1 (file sink: the
    // memory sink refuses checkpoint recovery, and era 2 must RESTART)
    val out1 = Files.createTempDirectory("graft_lsh_out1").toString
    val mem1 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q1 = StreamingOps.lshCandidatePairs(
        mem1.toDF().toDF("doc_id", "text", "arrive_ts"), tsCol = None)
      .writeStream.format("parquet").option("path", out1).outputMode("append")
      .option("checkpointLocation", cp1)
      .start()
    mem1.addData(history)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out1).count() > 0, "history must produce candidates")

    // (a) restarting from cp1 with eviction ON widens the state encoder to
    // (Seq[Long], Long) — the documented break: the state schema check
    // must refuse the checkpoint, not silently misread old state
    val q2 = StreamingOps.lshCandidatePairs(
        mem1.toDF().toDF("doc_id", "text", "arrive_ts"),
        tsCol = Some("arrive_ts"), horizon = "30 days")
      .writeStream.format("parquet").option("path", out1).outputMode("append")
      .option("checkpointLocation", cp1)
      .start()
    mem1.addData(live)
    val failure = intercept[Exception] { q2.processAllAvailable() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    val msgs = (failure +: chain(failure)).flatMap(t =>
      Option(t.getMessage)).mkString("\n").toLowerCase
    assert(msgs.contains("state") && msgs.contains("schema"),
      s"expected the state-schema incompatibility failure, got:\n$msgs")
    try q2.stop() catch { case _: Throwable => () }

    // (b) the documented recovery: FRESH checkpoint, history re-seeded
    // through the stream from the batch store, then the live tail —
    // the candidate set must equal an uninterrupted evict-on run
    val mem3 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q3 = StreamingOps.lshCandidatePairs(
        mem3.toDF().toDF("doc_id", "text", "arrive_ts"),
        tsCol = Some("arrive_ts"), horizon = "30 days")
      .writeStream.format("memory").queryName("mig_recovered").outputMode("append")
      .option("checkpointLocation", cp2)
      .start()
    mem3.addData(history) // re-seed: batch store replayed in event order
    q3.processAllAvailable()
    mem3.addData(live)
    q3.processAllAvailable()
    q3.stop()
    val recovered = spark.table("mig_recovered")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val mem4 = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q4 = StreamingOps.lshCandidatePairs(
        mem4.toDF().toDF("doc_id", "text", "arrive_ts"),
        tsCol = Some("arrive_ts"), horizon = "30 days")
      .writeStream.format("memory").queryName("mig_uninterrupted").outputMode("append")
      .start()
    mem4.addData(history)
    q4.processAllAvailable()
    mem4.addData(live)
    q4.processAllAvailable()
    q4.stop()
    val uninterrupted = spark.table("mig_uninterrupted")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(recovered === uninterrupted,
      "re-seeded run must reproduce the uninterrupted candidate set")
    assert(recovered.exists(p => p._2 == 3L),
      "cross-era pairs (history × live) must survive the migration")
  }

  test("append-mode sessions close when the watermark passes their end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = StreamingOps.sessionAgg(
        mem.toDF().toDF("event_id", "ts", "user_id", "value"),
        gap = "12 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("session_close").outputMode("append")
      .start()
    def t(d: String) = java.sql.Timestamp.valueOf(d)
    // two events 6h apart -> one session; then an event 3 days on advances
    // the watermark past that session's end, forcing it to emit
    mem.addData((1L, t("2024-03-01 00:00:00"), 7L, 1.0),
      (2L, t("2024-03-01 06:00:00"), 7L, 2.0))
    q.processAllAvailable()
    mem.addData((3L, t("2024-03-04 00:00:00"), 7L, 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("session_close")
      .select("user_id", "n_events", "sum_value").collect().map(_.toSeq)
    // only the CLOSED session is in the append output; the 03-04 session
    // is still open when the query stops
    assert(rows.toSeq === Seq(Seq(7L, 2L, 3.0)),
      s"exactly the closed 2-event session must emit, got ${rows.toSeq}")
  }

  test("streaming weekly PSI (chained window aggs) equals the batch monitor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchEv = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull).select("ts", "value")
    val (edges, refProps) = graft.queries.LlmQueries.psiWeeklyFit(batchEv)
    val rows = batchEv.as[(java.sql.Timestamp, Double)].collect()
      .sortBy(_._1.getTime)
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = StreamingOps.psiWeekly(mem.toDF().toDF("ts", "value"),
        edges, refProps, watermark = "1 hour")
      .writeStream.format("memory").queryName("psi_stream").outputMode("append")
      .start()
    // chronological chunks: the watermark advances between batches and
    // never drops in-order arrivals
    rows.grouped(rows.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    // a far-future sentinel pushes the watermark past every real week's
    // end; its own (still-open) week never emits
    mem.addData((java.sql.Timestamp.valueOf("2024-03-15 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("psi_stream")
      .as[(String, Long, Double)].collect().toSet
    val expected = StreamingOps.psiWeekly(batchEv, edges, refProps)
      .as[(String, Long, Double)].collect().toSet
    assert(got === expected,
      "append-mode chained aggregation must reproduce the batch PSI per closed week")
    assert(got.nonEmpty && got.forall(_._3 >= 0.0))
  }

  test("streaming curation scan (l15/l16 bodies) equals the batch output") {
    // the curation projections are stateless, so the exact batch function
    // bodies must run unchanged over a micro-batched file stream
    import graft.queries.LlmQueries
    val docsBatch = graft.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val dir = Files.createTempDirectory("graft_stream_docs").toString
    docsBatch.repartition(8).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docsBatch.schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)

    // the l80 classifier is four literals over the same stateless metric
    // body — a streaming corpus scores in-flight with zero state
    def score(df: DataFrame): DataFrame = {
      import graft.ml.PinnedQualityLr
      PinnedQualityLr.featureFrame(LlmQueries.qualityMetricsFrame(df))
        .select(col("doc_id"), PinnedQualityLr.score.as("score"),
          (PinnedQualityLr.margin >= 0).cast("long").as("wiki_like"))
    }
    val q0 = score(src)
      .writeStream.format("memory").queryName("stream_score")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q1 = LlmQueries.qualityMetricsFrame(src)
      .writeStream.format("memory").queryName("stream_quality")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val q2 = LlmQueries.normalizeRedactFrame(src)
      .writeStream.format("memory").queryName("stream_redact")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q0.awaitTermination(120000)
    q1.awaitTermination(120000); q2.awaitTermination(120000)

    val gotS0 = spark.table("stream_score").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val expS0 = score(docsBatch).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(gotS0 == expS0 && gotS0.nonEmpty,
      "streaming classifier scoring must equal batch")

    val gotQ = spark.table("stream_quality").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val expQ = LlmQueries.qualityMetricsFrame(docsBatch).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(gotQ == expQ, "streaming quality metrics must equal batch")

    val gotR = spark.table("stream_redact").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val expR = LlmQueries.normalizeRedactFrame(docsBatch).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(gotR == expR, "streaming normalize+redact must equal batch")
    assert(gotQ.nonEmpty && gotR.nonEmpty)

    // the l58 extraction body makes the same stateless claim — hold it to it
    val html = docsBatch.select(col("doc_id"),
      concat(lit("<p>"), col("text"), lit("</p><script>var x = 1;</script>"))
        .as("html"))
    val htmlDir = Files.createTempDirectory("graft_stream_html").toString
    html.repartition(8).write.mode("overwrite").parquet(htmlDir)
    val htmlSrc = spark.readStream.schema(html.schema)
      .option("maxFilesPerTrigger", 2).parquet(htmlDir)
    val q3 = LlmQueries.markupStripFrame(htmlSrc)
      .writeStream.format("memory").queryName("stream_strip")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000)
    val gotS = spark.table("stream_strip").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val expS = LlmQueries.markupStripFrame(html).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(gotS == expS && gotS.nonEmpty,
      "streaming markup strip must equal batch")
  }

  /** The a13 file-ingest + resume scenario, session-parametric (the same
    * motive as [[evictionScenario]]): text shards in the a13
    * `doc_id<TAB>text` line layout arrive in a directory; `readStream.text`
    * + the a13 parse feeds the LSH bucket store; Trigger.AvailableNow
    * drains what exists and STOPS (the backfill contract); a later run
    * with the SAME checkpoint processes ONLY the new files and the bucket
    * state carries across the restart — so cross-era candidate pairs
    * (new doc × old history) must emit even though the old shards are
    * never re-read. */
  private def a13IngestScenario(s: org.apache.spark.sql.SparkSession): Unit = {
    val docs = graft.Tables.documents(s, sf).select("doc_id", "text")
    val inDir = Files.createTempDirectory("graft_a13_in").toString
    val outDir = Files.createTempDirectory("graft_a13_out").toString
    val cp = Files.createTempDirectory("graft_a13_cp").toString
    def writeShards(df: DataFrame): Unit = df
      .select(concat(col("doc_id").cast("string"), lit("\t"), col("text"))
        .as("value"))
      .repartition(4).write.mode("append").text(inDir)
    def drainOnce(): Unit = {
      val src = s.readStream
        .option("maxFilesPerTrigger", 2) // several micro-batches per drain
        .text(inDir)
        .select(split(col("value"), "\t", 2).as("p"))
        .select(element_at(col("p"), 1).cast("long").as("doc_id"),
          element_at(col("p"), 2).as("text"))
      val q = StreamingOps.lshCandidatePairs(src)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)
    }
    def emitted(): Set[(Long, Long)] = s.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val expectedEra1 = StreamingOps.lshCandidatePairs(evens).collect().toSet
    val expectedAll = StreamingOps.lshCandidatePairs(docs).collect().toSet
    assert(expectedEra1.nonEmpty && (expectedAll -- expectedEra1).nonEmpty,
      "fixture must produce candidates in era 1 AND new ones in era 2")

    writeShards(evens)
    drainOnce() // backfill: drains the existing shards, then terminates
    assert(emitted() === expectedEra1,
      "AvailableNow backfill over a13 shards must equal the batch candidates")

    writeShards(odds)
    drainOnce() // resume: same checkpoint — ONLY the new files process
    assert(emitted() === expectedAll,
      "after resume the cumulative candidates must equal the full batch set")
    // cross-era evidence: at least one pair joins a new doc to RESTORED
    // bucket state (one even, one odd member) — proving the checkpoint
    // carried the store, not just the file ledger
    assert(emitted().exists(p => (p._1 + p._2) % 2 == 1),
      "a cross-era (old×new) candidate pair must emit from restored state")
  }

  test("file-source ingest (a13 text layout): AvailableNow backfill, then resume on new files") {
    a13IngestScenario(spark)
  }

  test("file-source ingest resumes under RocksDB: checkpointed state restores from the production store") {
    // the restart path a 100 TB deployment actually runs: RocksDB-backed
    // bucket state written by era 1's AvailableNow drain must RESTORE
    // from the checkpoint (RocksDB snapshot + changelog) when era 2's
    // query starts — the store-specific half of checkpoint recovery the
    // default-store test above can't exercise
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.Tables.prep(s2)
    a13IngestScenario(s2)
  }

  test("streaming weekly novelty (stream-static join) equals the batch monitor") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    // frozen side: STATIC gram frame (no watermark, no state)
    val frozen = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(array_distinct(graft.ops.TextOps.shingles(
        graft.ops.TextOps.tokens(col("text")), 5))).as("gram"))
      .distinct()
    val live = docs.filter(col("doc_id") % 2 === 1)
      .select(to_timestamp(date_add(to_date(lit("2024-01-01")),
        (col("doc_id") % 28).cast("int"))).as("ts"), col("text"))
      .as[(java.sql.Timestamp, String)].collect().sortBy(_._1.getTime)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingOps.weeklyNovelty(mem.toDF().toDF("ts", "text"), frozen,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("novelty_stream")
      .outputMode("append").start()
    // chronological chunks so the watermark only ever closes PAST weeks
    live.grouped(live.length / 4 + 1).foreach { chunk =>
      mem.addData(chunk.toSeq: _*); q.processAllAvailable()
    }
    // far-future sentinel closes the last real week; its own week stays open
    mem.addData((java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
      "w1 w2 w3 w4 w5"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("novelty_stream")
      .as[(String, Long, Long, Double)].collect().toSet
    val expected = StreamingOps.weeklyNovelty(
        docs.filter(col("doc_id") % 2 === 1)
          .select(to_timestamp(date_add(to_date(lit("2024-01-01")),
            (col("doc_id") % 28).cast("int"))).as("ts"), col("text")), frozen)
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got === expected,
      "the stream-static probe must reproduce the batch weekly novelty")
    assert(got.nonEmpty && got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("foreachBatch exactly-once file sink: a replayed batch is idempotent and " +
      "resume lands only the new files") {
    val (dir, batch) = stage(dups = false)
    val out = Files.createTempDirectory("graft_eo_out").toString
    val cp = Files.createTempDirectory("graft_eo_cp").toString
    val schema = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "value").schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(dir)
        .writeStream
        .foreachBatch(StreamingOps.idempotentParquetSink(out) _)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    def landed(): Set[(Long, java.sql.Timestamp, Double)] =
      spark.read.parquet(out).select("event_id", "ts", "value").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    def asSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet

    drain()
    assert(landed() === asSet(batch),
      "the sink must land the full stream exactly once across micro-batches")

    // simulated at-least-once retry: re-run the LAST committed batch's
    // write with the same batchId and the same data (what a crash between
    // sink write and checkpoint commit replays)
    val ids = Option(new java.io.File(out).listFiles()).get
      .map(_.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    assert(ids.length > 1, s"maxFilesPerTrigger=2 over 8 files must micro-batch, got $ids")
    val lastId = ids.max
    // materialize the replayed batch BEFORE the overwrite — a lazy read
    // from the very directory being rewritten would race its own input
    // (the replay in production re-reads the SOURCE offsets, not the sink)
    val lastRows = spark.read.parquet(s"$out/batch_id=$lastId").collect().toList
    val lastData = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(lastRows).asJava), schema)
    StreamingOps.idempotentParquetSink(out)(lastData, lastId)
    assert(landed() === asSet(batch),
      "a replayed (batchId, data) write must be a no-op-equivalent — no duplicates")

    // resume: new source files arrive, same checkpoint — only the new rows
    // land, as fresh batch directories
    val extra = batch.limit(0).sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(900001L,
          java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 1.5),
        org.apache.spark.sql.Row(900002L,
          java.sql.Timestamp.valueOf("2024-03-02 00:00:00"), 2.5)), schema)
    extra.coalesce(1).write.mode("append").parquet(dir)
    drain()
    assert(landed() === (asSet(batch) ++ asSet(extra)),
      "resume from the checkpoint must land exactly the new rows")
  }
}
