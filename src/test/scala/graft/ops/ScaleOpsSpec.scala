package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.{LlmQueries, ScaleQueries}

/** Plan-shape guarantees for the scale-mechanics operators: the whole point
  * of a6/f4 is WHERE the work happens, not just the (oracle-checked)
  * answer. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join runs with no shuffle exchange before the join") {
    val df = ScaleQueries.a6_bucketed_join.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the claim: ZERO hash exchanges — the join consumes bucket i against
    // bucket i (or broadcasts a tiny side, as AQE chose here) and even the
    // per-key aggregate is satisfied by the bucketed scan's partitioning;
    // the only exchange left is the verification ORDER BY's range partition
    assert(plan.contains("Bucketed: true"), s"scans must be bucketed:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed layout must eliminate the join/agg hash exchanges:\n$plan")
    assert(df.count() > 0)
  }

  test("dynamic partition pruning: the dim's key set reaches the fact scan") {
    val df = ScaleQueries.a9_dynamic_pruning.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the pruning expression must sit IN the fact scan's PartitionFilters
    // (a 'dynamicpruning' token elsewhere — e.g. a demoted post-scan
    // runtime filter — would not be the pinned guarantee)
    val inPartitionFilters = plan.linesIterator.exists(l =>
      l.contains("PartitionFilters:") && l.toLowerCase.contains("dynamicpruning"))
    assert(inPartitionFilters,
      s"the join-derived partition selection must sit in the fact scan's " +
        s"PartitionFilters as a dynamicpruning subquery:\n$plan")
    assert(df.count() > 0)
  }

  test("runtime bloom filter: the dim's key bloom reaches the fact scan filter") {
    val df = ScaleQueries.a12_runtime_bloom.fn(spark, sf)
    df.collect() // AQE: the injected subquery shows in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"the fact side must pre-filter through the dim-key bloom:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"the bloom must be built as the two-phase aggregate:\n$plan")
    assert(df.count() > 0)
  }

  test("partitioned scan prunes at planning time — no data-side filter") {
    val df = ScaleQueries.a7_partitioned_scan.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the claim: the returnflag predicate resolves against the directory
    // listing (PartitionFilters), is NOT pushed as a parquet data filter,
    // and the untouched partitions never open
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"predicate must resolve as a partition filter:\n$plan")
    assert(plan.contains("(l_returnflag#") && plan.contains("= R)"),
      s"the R-partition selection must sit in PartitionFilters:\n$plan")
    assert(!plan.contains("PushedFilters: [IsNotNull(l_returnflag"),
      s"a partition-column predicate must not also scan-filter data:\n$plan")
    assert(df.count() > 0)
  }

  test("salted join spreads the hot key and matches the plain join") {
    val salted = ScaleQueries.f4_salted_join.fn(spark, sf)
    // the same rows, computed the naive way
    import org.apache.spark.sql.functions._
    val fact = graft.Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 10 =!= 0, 0L).otherwise(col("l_orderkey") % 25).as("nk"))
    val plain = fact.join(graft.Tables.nation(spark, sf),
        col("nk") === col("n_nationkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("n_name"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain.selectExpr("l_orderkey",
      "CAST(l_linenumber AS BIGINT) AS l_linenumber", "n_name")).isEmpty)
    // the join really is on (key, salt): both sides carry the salt column
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
  }

  test("AQE skew join: the hot partition is split at runtime, result ≡ plain join") {
    import org.apache.spark.sql.functions._
    val df = ScaleQueries.f8_aqe_skew_join.fn(spark, sf)
    val rows = df.collect() // AQE: the skew split shows in the FINAL plan
    val plan = df.queryExecution.executedPlan.toString
    // the pin: Spark's own OptimizeSkewedJoin fired — the executed
    // SortMergeJoin carries skew=true and the shuffle read expanded the
    // one hot partition into multiple splits (dim side duplicated per
    // split); no hand-salting anywhere in the query
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin must split the hot partition:\n$plan")
    // same answer as the plain (and the salted) formulation
    val fact = graft.Tables.lineitem(spark, sf).select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 10 =!= 0, 0L).otherwise(col("l_orderkey") % 25).as("nk"))
    val plain = fact.join(graft.Tables.nation(spark, sf),
        col("nk") === col("n_nationkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("n_name"))
    assert(rows.length.toLong === plain.count())
    assert(df.exceptAll(plain.selectExpr("l_orderkey",
      "CAST(l_linenumber AS BIGINT) AS l_linenumber", "n_name")).isEmpty)
  }

  test("partition upsert rewrites ONLY the touched partitions; state = keep-latest merge") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_spec").toString
    def snapshot(year: Int): Map[String, (Long, Long)] = {
      val p = java.nio.file.Paths.get(s"$dir/o_year=$year")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(p).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(f => f.getFileName.toString ->
          (java.nio.file.Files.size(f),
            java.nio.file.Files.getLastModifiedTime(f).toMillis))
        .toMap
    }
    ScaleQueries.PartitionUpsert.writeBase(spark, sf, dir)
    val untouchedBefore = (1997 to 2001).map(y => y -> snapshot(y)).toMap
    val touchedBefore = snapshot(1995)
    ScaleQueries.PartitionUpsert.applyChanges(spark, sf, dir)
    // the overwrite-scope pin: five year directories byte/mtime-identical,
    // the touched ones actually replaced
    (1997 to 2001).foreach { y =>
      assert(snapshot(y) === untouchedBefore(y),
        s"partition o_year=$y must not be rewritten by the upsert")
    }
    assert(snapshot(1995) !== touchedBefore,
      "the touched partition must have been replaced")
    // merge semantics: updates won, inserts landed, untouched rows intact
    val state = ScaleQueries.PartitionUpsert.readState(spark, dir)
    val base = ScaleQueries.PartitionUpsert.baseFrame(spark, sf)
    val nBase = base.count()
    val nIns = base.filter(col("o_year").isin(1995, 1996) &&
      col("o_orderkey") % 11 === 0).count()
    assert(state.count() === nBase + nIns, "state = base keys + inserted keys")
    val upd = state.as("s").join(base.as("b"), col("s.o_orderkey") === col("b.o_orderkey"))
      .filter(col("b.o_year").isin(1995, 1996) && col("b.o_orderkey") % 7 === 0)
    assert(upd.filter(col("s.o_totalprice") =!= col("b.o_totalprice") + 100000.0)
      .count() === 0L, "every update row must carry the batch price")
    assert(upd.count() > 0, "fixture must exercise updates")
    val inserted = state.filter(col("o_orderkey") >= 900000000L)
    assert(inserted.count() === nIns, "every insert row must land exactly once")
    // rows outside the touched years are bit-identical to base
    val untouchedRows = state.filter(!col("o_year").isin(1995, 1996))
    assert(untouchedRows.exceptAll(
      base.filter(!col("o_year").isin(1995, 1996)).select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_year").cast("long"))).isEmpty)
  }

  test("partition upsert is idempotent: re-applying the batch is a no-op on state") {
    // THE operational property of a CDC landing: a retried/replayed job
    // (driver restart, at-least-once orchestration) must not change the
    // table. Content equality is the contract; file identity is not
    // (dynamic overwrite rewrites the touched partitions each run).
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_idem").toString
    ScaleQueries.PartitionUpsert.writeBase(spark, sf, dir)
    ScaleQueries.PartitionUpsert.applyChanges(spark, sf, dir)
    val first = ScaleQueries.PartitionUpsert.readState(spark, dir).collect()
    ScaleQueries.PartitionUpsert.applyChanges(spark, sf, dir)
    val second = ScaleQueries.PartitionUpsert.readState(spark, dir).collect()
    assert(first.length === second.length)
    assert(first.map(_.toSeq).toSeq === second.map(_.toSeq).toSeq,
      "replaying the changes batch must leave the state bit-identical")
  }

  test("c11 commit posture: the upsert runs on FileOutputCommitter v1 and " +
      "refuses the non-atomic v2 committer (VERDICT r14 #4)") {
    // the conf pin: this session's effective committer resolves to v1
    // (Hadoop's default, not overridden anywhere in the repo), so task
    // output publishes only at job commit — mid-job failure leaves the
    // landed table untouched
    assert(ScaleQueries.PartitionUpsert.committerVersion(spark) === 1,
      "the bench/verify sessions must land c11 under the v1 committer")
    // the pin is executable, not advisory: a session tuned to v2 (the
    // rename-at-task-commit speedup that silently gives up failure
    // atomicity) must fail the job loudly before any file moves
    val key = "mapreduce.fileoutputcommitter.algorithm.version"
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get(key))
    hc.setInt(key, 2)
    try {
      assert(ScaleQueries.PartitionUpsert.committerVersion(spark) === 2,
        "the probe conf must reach the session's effective hadoop conf")
      val dir = java.nio.file.Files.createTempDirectory("graft_upsert_v2").toString
      val e = intercept[IllegalArgumentException] {
        ScaleQueries.PartitionUpsert.writeBase(spark, sf, dir)
      }
      assert(e.getMessage.contains("algorithm v1"),
        s"the refusal must name the committer contract: ${e.getMessage}")
    } finally {
      prev match { case Some(v) => hc.set(key, v); case None => hc.unset(key) }
    }
    assert(ScaleQueries.PartitionUpsert.committerVersion(spark) === 1,
      "the probe must restore the session posture")
  }

  test("as-of join equals the naive range join + argmax, without its plan") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val v = ev.filter(col("event_type") === "view").select("user_id", "ts", "value")
    val got = graft.ops.AsOf.join(p, v, "user_id", "ts",
      Map("ts" -> "view_ts", "value" -> "view_value"))
    // naive truth: theta-join then keep the max view ts per purchase
    // (test-only; this is exactly the blowup the operator exists to avoid)
    val naive = p.as("p").join(v.as("v"),
        col("p.user_id") === col("v.user_id") && col("p.ts") >= col("v.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max(struct(col("v.ts").as("view_ts"), col("v.value").as("view_value"))).as("m"))
      .select(col("event_id"), col("m.view_ts").as("view_ts"),
        col("m.view_value").as("view_value"))
    val gotSet = got.select("event_id", "view_ts", "view_value")
      .collect().map(_.toSeq).toSet
    val naiveSet = naive.collect().map(_.toSeq).toSet
    assert(gotSet === naiveSet)
    assert(got.filter(col("view_ts").isNull).count() > 0,
      "corpus must exercise the no-prior-row (left outer) branch")
    // and the plan is the single-shuffle window form, not a range join
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must never plan a pair blowup:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected the running-window form:\n$plan")
  }

  test("nearest as-of: prior-on-tie fixture, forward/backward picks, one exchange") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq(
      (1L, "u", ts(100)), // equidistant: prior at 90, next at 110 → prior
      (2L, "u", ts(205)), // nearest is NEXT (210 at Δ5 vs 90 at Δ115)
      (3L, "u", ts(10)),  // before every right row → forward-only match (90)
      (4L, "w", ts(50))   // key with no right rows → nulls
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u", ts(90), 9.0), ("u", ts(110), 11.0), ("u", ts(210), 21.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.AsOf.nearest(left, right, "user_id", "ts",
      Map("ts" -> "view_ts", "value" -> "view_value"))
    val byId = got.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(4) === 9.0, "equidistant tie must pick the PRIOR")
    assert(byId(2L).getDouble(4) === 21.0, "a closer following row must win")
    assert(byId(3L).getDouble(4) === 9.0, "a left row before all right rows matches forward")
    assert(byId(4L).isNullAt(3) && byId(4L).isNullAt(4), "no right rows → left-outer nulls")
    // the two directional windows share one hash partitioning — exactly
    // one shuffle, and never a pair blowup
    val ev = graft.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val v = ev.filter(col("event_type") === "view").select("user_id", "ts", "value")
    val corpus = graft.ops.AsOf.nearest(p, v, "user_id", "ts",
      Map("ts" -> "view_ts", "value" -> "view_value"))
    corpus.collect()
    val plan = corpus.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nearest as-of must never plan a pair blowup:\n$plan")
    // AQE's toString appends the pre-execution "Initial Plan" — count
    // shuffles in the final section only
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(exchanges === 1,
      s"both directional windows must share ONE exchange, found $exchanges:\n$finalPlan")
  }

  test("range join equals the naive theta join, as a bucketed equi-join plan") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 3 DAYS")).as("s_end"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("e_ts"))
    val got = graft.ops.RangeJoin.pointInInterval(
      errors, signups, "user_id", "e_ts", "s_ts", "s_end")
    val naive = errors.as("x").join(signups.as("s"),
        col("x.user_id") === col("s.user_id") &&
          col("e_ts") >= col("s_ts") && col("e_ts") < col("s_end"))
      .select(col("error_id"), col("signup_id"))
    val gotSet = got.select("error_id", "signup_id").collect().map(_.toSeq).toSet
    assert(gotSet === naive.collect().map(_.toSeq).toSet)
    assert(gotSet.nonEmpty, "corpus must produce matches")
    // no dedup in the operator, so bucketing must be provably dup-free
    assert(got.count() === gotSet.size.toLong)
    // the plan is a hash equi-join on (key, bucket) — never a nested loop
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("band join equals the naive theta join, as a bucketed equi-join plan") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("value").as("pv"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("value").as("vv"))
    val got = graft.ops.BandJoin.join(p, v, "user_id", "pv", "vv", 5.0)
    val naive = p.as("a").join(v.as("b"),
        col("a.user_id") === col("b.user_id") &&
          abs(col("pv") - col("vv")) <= 5.0)
      .select(col("purchase_id"), col("view_id"))
    val gotSet = got.select("purchase_id", "view_id").collect().map(_.toSeq).toSet
    assert(gotSet === naive.collect().map(_.toSeq).toSet)
    assert(gotSet.nonEmpty, "corpus must produce matches")
    // single home bucket on the probe side ⇒ provably dup-free, no dedup
    assert(got.count() === gotSet.size.toLong)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"band join must stay an equi-join:\n$plan")
  }

  test("bucket-pruned embedding near-dup: perfect precision, measured recall") {
    import org.apache.spark.sql.functions._
    val tau = 0.3 // low enough that cross-bucket pairs exist at sf0.001
    val pruned = LlmQueries.embedNearDup(tau)(graft.Tables.embeddings(spark, sf))
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force truth (test-only; the operator itself must never do this)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dot = aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val nrm = (c: String) => sqrt(aggregate(col(c), lit(0.0), (a, x) => a + x * x))
    val brute = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        (dot / (nrm("a.v") * nrm("b.v"))).as("cos"))
      .filter(col("cos") >= tau)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "threshold too high for this corpus")
    assert((pruned -- brute).isEmpty, "pruned output must be a subset of the truth")
    val recall = (pruned & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"bucket pruning recall collapsed: $recall")
  }

  test("z-order layout keeps BOTH dimensions' per-bucket spans tight; 1-D sort does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg, col, lit, spark_partition_id, xxhash64, max => smax, min => smin}
    // uniform 16-bit dims, hash-derived so the assertion is deterministic
    // and partitioning-proof
    val df = spark.range(20000).select(
      (xxhash64(col("id")).bitwiseAND(lit(65535L))).as("x"),
      (xxhash64(col("id"), lit(1)).bitwiseAND(lit(65535L))).as("y"))
    def meanSpans(keyed: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = keyed.repartitionByRange(8, col("k"))
        .withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((smax("x") - smin("x")).as("sx"), (smax("y") - smin("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).collect().head
      (r.getDouble(0) / 65535.0, r.getDouble(1) / 65535.0)
    }
    val (zx, zy) = meanSpans(df.withColumn("k", ZOrder.zkey(col("x"), col("y"))))
    val (_, sy) = meanSpans(df.withColumn("k", col("x")))
    // 8 range buckets fix the top 3 interleaved bits: y's span contracts
    // to ~1/4 and x's to ~1/2 of the domain (which dim gets 2 bits depends
    // on interleave phase) — both must be well under the full domain,
    // while the 1-D sort leaves y's span at ~the full domain
    assert(zx <= 0.7 && zy <= 0.7,
      s"z-order spans must contract in BOTH dims: x=$zx y=$zy")
    assert(sy >= 0.9, s"1-D baseline should leave y unclustered, got $sy")
    assert(math.max(zx, zy) < sy,
      s"z-order must beat the 1-D sort on the second dimension: $zx/$zy vs $sy")
  }

  test("e13 interval coalesce: a long window swallows later short ones " +
      "through the running max-end (the case previous-end sessionization " +
      "gets wrong), touching windows merge, disjoint ones split") {
    import spark.implicits._
    def run(iv: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] =
      Intervals.coalesce(iv.toDF("user_id", "st", "en")).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
    // chain only closed by the MAX end: [0,100) spans over [10,20) so
    // [95,105) still overlaps, and [101,110) rides the extended end; a
    // previous-row-end rule would split after [10,20)
    val swallow = run(Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 95L, 105L),
      (1L, 101L, 110L)))
    assert(swallow === Seq((1L, 0L, 110L, 4L)),
      s"the running max-end must keep the chain alive: $swallow")
    // touching half-open windows share an endpoint -> one span
    val touch = run(Seq((1L, 0L, 10L), (1L, 10L, 20L)))
    assert(touch === Seq((1L, 0L, 20L, 2L)))
    // a 1-unit gap splits
    val gap = run(Seq((1L, 0L, 10L), (1L, 11L, 20L)))
    assert(gap === Seq((1L, 0L, 10L, 1L), (2L, 11L, 20L, 1L)))
    // keys never merge across users
    val two = Intervals.coalesce(
      Seq((1L, 0L, 10L), (2L, 5L, 15L)).toDF("user_id", "st", "en"))
      .collect()
    assert(two.length === 2)
  }

  test("a21 compaction mechanics: 64 fragments in, the size-computed file " +
      "count out, strictly fewer files, content checksums preserved") {
    import graft.queries.CoreQueries
    val row = CoreQueries.a21_compaction.fn(spark, sf).collect()(0)
    def parts(prefix: String): Array[String] = {
      val p = new org.apache.hadoop.fs.Path(
        graft.Tables.scratchDir(spark, sf, prefix))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
    }
    val small = parts("graft_compact_small")
    val big = parts("graft_compact_out")
    assert(small.length === 64, s"the fragmented write must show the " +
      s"problem: ${small.length} files")
    val p = new org.apache.hadoop.fs.Path(
      graft.Tables.scratchDir(spark, sf, "graft_compact_small"))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val want = math.max(1,
      ((fs.getContentSummary(p).getLength + (32L << 20) - 1) / (32L << 20)).toInt)
    assert(big.length === want && big.length < small.length,
      s"compaction must hit the size-computed count: ${big.length} vs $want")
    // losslessness: checksums equal the direct-table aggregates
    import org.apache.spark.sql.functions._
    val direct = graft.Tables.lineitem(spark, sf).agg(
      count(lit(1)), sum(col("l_orderkey") * 10 + col("l_linenumber")),
      sum(col("l_partkey")) + sum(col("l_suppkey"))).collect()(0)
    assert(row.getLong(0) === direct.getLong(0) &&
      row.getLong(1) === direct.getLong(1) &&
      row.getLong(2) === direct.getLong(2))
  }

  test("e14 gaps: the complement tiles exactly — islands + gaps cover " +
      "[first start, last end] with no overlap; single-island users " +
      "emit nothing") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 10L), (1L, 20L, 30L), (1L, 40L, 41L),
      (2L, 5L, 9L)).toDF("user_id", "st", "en")
    val gaps = Intervals.gaps(iv).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(g => (g._1, g._2))
    assert(gaps.toSeq === Seq((1L, 10L, 20L, 10L), (1L, 30L, 40L, 10L)),
      s"two gaps between three islands, none for the single-island user: " +
        s"${gaps.toSeq}")
    // the tiling identity: island mass + gap mass = total span, per user
    val isl = Intervals.coalesce(iv).collect()
      .filter(_.getLong(0) === 1L)
    val islandMass = isl.map(r => r.getLong(3) - r.getLong(2)).sum
    val gapMass = gaps.filter(_._1 == 1L).map(_._4).sum
    assert(islandMass + gapMass === 41L - 0L,
      "islands and gaps must tile the user's span exactly")
  }

  test("e13 plan: one hash exchange on user_id feeds both windows and the " +
      "island aggregate") {
    val df = ScaleQueries.e13_interval_coalesce.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"the two windows and the groupBy must share ONE user_id exchange, " +
        s"got $exchanges:\n$plan")
    assert(df.count() > 0)
  }

  test("e15 coordinated-sample join: the fan-out estimate tracks the true " +
      "mean; an INDEPENDENT pair of key samples overlaps on ~p^2 of keys " +
      "and the broadcast plan never materializes the full join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val spark2 = spark
    val q = graft.queries.ExtQueries.e15_coordinated_join_sample
    val rows = q.fn(spark2, sf).collect()
    // truth: per-order fan-out mean per status, zero-fanout orders kept
    val truth = graft.Tables.orders(spark2, sf)
      .join(graft.Tables.lineitem(spark2, sf)
        .select(col("l_orderkey"), lit(1L).as("one")),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderstatus")
      .agg((count(col("one")) * 1.0 / countDistinct(col("o_orderkey")))
        .as("fanout"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val est = r.getDouble(3)
      val t = truth(r.getString(0))
      assert(math.abs(est - t) < 0.5,
        s"status ${r.getString(0)}: coordinated fanout $est vs true $t")
    }
    // the coordinated property: the SAME digest picks the SAME keys on
    // any table; an independent (differently-salted) sample of the same
    // size overlaps on only ~k^2/N keys
    val ordKeys = graft.Tables.orders(spark2, sf).select(col("o_orderkey"))
    def keySample(salt: String) = ordKeys
      .orderBy(md5(concat(lit(salt), col("o_orderkey").cast("string"))
        .cast("binary")), col("o_orderkey"))
      .limit(512).collect().map(_.getLong(0)).toSet
    val a = keySample("")
    val b = keySample("independent:")
    val n = ordKeys.count()
    assert(a.size == 512 && (a intersect b).size < 300,
      s"independent samples must overlap on ~512^2/$n keys, " +
        s"got ${(a intersect b).size} — coordinated keeps all 512")
    // plan posture: the sampled key set is the BUILD side of the join
    // (BuildLeft) — a bare BroadcastHashJoin assertion would pass even
    // if the tiny test-SF fact side were the one broadcast
    val plan = q.fn(spark2, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildLeft"),
      s"the k-key set must be the broadcast BUILD side of an inner " +
        s"join, never a shuffle of the fact:\n$plan")
  }
}
