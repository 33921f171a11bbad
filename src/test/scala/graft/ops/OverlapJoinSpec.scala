package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the e16 interval-overlap join: bucketing + the
  * canonical-bucket dedup rule are LOSSLESS and DUP-FREE against a
  * naive theta join on seeded random intervals (including the
  * many-shared-buckets regime), half-open boundary semantics, and the
  * no-nested-loop plan shape. */
class OverlapJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ts(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("≡ naive theta join on 200 seeded random users, and DUP-FREE " +
      "even when pairs share many buckets (3h buckets under multi-day " +
      "intervals)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val day = 86400L
    val a = (1 to 400).map { i =>
      val u = rnd.nextInt(200).toLong
      val s = rnd.nextInt(30).toLong * day + rnd.nextInt(86400)
      (i.toLong, u, ts(s), ts(s + day * (1 + rnd.nextInt(3))))
    }.toDF("a_id", "user_id", "a_s", "a_e")
    val b = (1 to 400).map { i =>
      val u = rnd.nextInt(200).toLong
      val s = rnd.nextInt(30).toLong * day + rnd.nextInt(86400)
      (i.toLong, u, ts(s), ts(s + day * (1 + rnd.nextInt(4))))
    }.toDF("b_id", "user_id", "b_s", "b_e")
    // 3-hour buckets: a 1-4 day interval covers 8-33 buckets, so every
    // overlapping pair shares MANY buckets — the dedup-stress regime
    val got = OverlapJoin.intervalOverlap(
        a, b, "user_id", "a_s", "a_e", "b_s", "b_e", bucketSeconds = 10800L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length === got.distinct.length,
      "canonical-bucket rule must emit each pair exactly once")
    val naive = a.join(b, Seq("user_id"))
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.toSet === naive.toSet && naive.nonEmpty,
      s"bucketed form must equal the theta join (${naive.length} pairs)")
  }

  test("half-open boundary: touching windows do not match; one second " +
      "of true overlap does; nesting does; cross-bucket-boundary pairs " +
      "count once") {
    import spark.implicits._
    val a = Seq(
      (1L, 1L, ts(0), ts(100)),       // vs b1 [100,200): touching — no
      (2L, 1L, ts(0), ts(101)),       // vs b1: 1s overlap — yes
      (3L, 1L, ts(120), ts(130)),     // nested inside b1 — yes
      (4L, 2L, ts(86000), ts(87000))) // spans the 86400 day boundary
      .toDF("a_id", "user_id", "a_s", "a_e")
    val b = Seq(
      (1L, 1L, ts(100), ts(200)),
      (2L, 2L, ts(86300), ts(86500))) // also spans it — overlap [86300,86500)
      .toDF("b_id", "user_id", "b_s", "b_e")
    val got = OverlapJoin.intervalOverlap(
        a, b, "user_id", "a_s", "a_e", "b_s", "b_e")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((2L, 1L), (3L, 1L), (4L, 2L)))
  }

  test("e16 plan: bucketed equi-join — no cartesian product, no " +
      "broadcast nested loop") {
    val df = graft.queries.ScaleQueries.e16_interval_overlap
      .fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct") &&
      !fin.contains("BroadcastNestedLoopJoin"),
      s"the overlap must plan as an equi-join on (user, bucket):\n$p")
  }

  test("e17 capped engine: capped ⊆ exact always; a hot cell past the " +
      "work cap loses exactly ITS pairs (the declared miss mode) while " +
      "every cool cell survives intact; a cell at exactly workCap is " +
      "admitted (boundary in)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val day = 86400L
    // cool background: 60 users, sparse intervals
    val coolA = (1 to 120).map { i =>
      val u = rnd.nextInt(60).toLong
      val s = rnd.nextInt(30).toLong * day + rnd.nextInt(86400)
      (i.toLong, u, ts(s), ts(s + day))
    }
    // hot cell: user 900, six a-intervals × six b-intervals on one day
    // (work 36 > 16 → refused); boundary cell: user 901, 4×4 = 16 → in
    val hotA = (1 to 6).map(i => (900L + i, 900L, ts(40 * day + i), ts(40 * day + 3600 + i)))
    val edgeA = (1 to 4).map(i => (950L + i, 901L, ts(50 * day + i), ts(50 * day + 3600 + i)))
    val a = (coolA ++ hotA ++ edgeA).toDF("a_id", "user_id", "a_s", "a_e")
    val coolB = (1 to 120).map { i =>
      val u = rnd.nextInt(60).toLong
      val s = rnd.nextInt(30).toLong * day + rnd.nextInt(86400)
      (i.toLong, u, ts(s), ts(s + day))
    }
    val hotB = (1 to 6).map(i => (900L + i, 900L, ts(40 * day + 1000 + i), ts(40 * day + 4600 + i)))
    val edgeB = (1 to 4).map(i => (950L + i, 901L, ts(50 * day + 1000 + i), ts(50 * day + 4600 + i)))
    val b = (coolB ++ hotB ++ edgeB).toDF("b_id", "user_id", "b_s", "b_e")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(OverlapJoin.intervalOverlap(
      a, b, "user_id", "a_s", "a_e", "b_s", "b_e"))
    val capped = pairs(OverlapJoin.cappedIntervalOverlap(
      a, b, "user_id", "a_s", "a_e", "b_s", "b_e", workCap = 16L))
    assert(capped.subsetOf(exact), "capped output must be ⊆ exact always")
    val hotExact = exact.filter(p => p._1 >= 900L && p._1 < 950L)
    assert(hotExact.size === 36,
      "the hot cell's 6×6 pairs must all exist in the exact output")
    assert(capped.intersect(hotExact).isEmpty,
      "a refused cell loses exactly its pairs — none may leak through")
    val edgeExact = exact.filter(p => p._1 >= 950L)
    assert(edgeExact.size === 16 && edgeExact.subsetOf(capped),
      "a cell at exactly workCap (4×4 = 16) is admitted — boundary in")
    assert(exact -- hotExact === capped,
      "every cool-cell pair must survive the cap untouched")
    info(s"e17: exact ${exact.size}, capped ${capped.size}, " +
      s"missed ${(exact -- capped).size} (all from the planted hot cell)")
  }
}
