package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DateType
import graft.ops.TextOps

/** Structured-Streaming forms of the engine's aggregations (SURVEY §7.4).
  *
  * Each op is written against a plain DataFrame so the SAME function body
  * serves batch and streaming: pass a `spark.read` frame and it is the
  * batch d5 aggregation; pass a `spark.readStream` frame and Spark runs it
  * incrementally with watermark-bounded state. That symmetry is the point —
  * the declared batch queries (d5_weekly_window) and these streaming forms
  * share one window spec, so CORRECTNESS on the batch side pins the
  * semantics the stream computes.
  *
  * Scale notes: watermarking bounds state to (watermark / slide) windows
  * per key; the weekly agg keeps ~2 windows of partial aggregates per
  * group, and dedup state holds only event_ids younger than the watermark.
  * Both are the standard shuffle-on-group-key exchanges — no extra state.
  */
object StreamingOps {

  /** Every weekly op here aligns windows Mon..Sun via `startTime "4 days"`
    * — an offset from the EPOCH, which is timezone-relative: window
    * boundaries, the `cast(DateType)` of window ends, and `date_format`
    * all resolve in `spark.sql.session.timeZone`. The Monday/Sunday
    * labels are only correct under UTC (every engine session sets it:
    * Verify/Bench/TestSpark builders and Tables.prep), so the weekly ops
    * REFUSE a non-UTC session instead of silently mislabeling
    * `week_ending` by a day (ADVICE r12). */
  private def requireUtc(df: DataFrame): Unit = {
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    // accept any fixed-zero-offset alias (UTC, Etc/UTC, GMT, +00:00) —
    // the requirement is the RULES, not the spelling
    val rules = java.time.ZoneId.of(tz, java.time.ZoneId.SHORT_IDS).getRules
    require(rules.isFixedOffset &&
        rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
      s"weekly window alignment requires spark.sql.session.timeZone=UTC, got '$tz'")
  }

  /** Tumbling Mon..Sun weekly average of `value` (the d5 semantics:
    * startTime "4 days" realigns the Thursday epoch to Monday; label =
    * window end − 1 day = the Sunday). Late rows older than `watermark`
    * are dropped instead of growing state forever. UTC session required
    * (see [[requireUtc]]). */
  def weeklyAvg(events: DataFrame, watermark: String = "14 days"): DataFrame = {
    requireUtc(events)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"))
      .agg(round(avg("value"), 4).as("avg_value"), count(lit(1)).as("n"))
      .select(
        date_format(date_add(col("w.end").cast(DateType), -1), "yyyy-MM-dd").as("week_ending"),
        col("avg_value"), col("n"))
  }

  /** Tumbling weekly APPROXIMATE distinct count of `keyCol` — the
    * streaming cardinality dashboard (unique users/ids per window) built
    * on the HLL register sketch. Must be [[graft.ops.Hll.approxDistinctWide]],
    * not the two-level batch form: Structured Streaming permits one
    * stateful aggregation per query, and the wide form IS one aggregation
    * — its per-window state is 64 small ints (the registers), bounded and
    * watermark-evicted, never the key set itself. Same body batch and
    * streaming; estimates are identical because the register maxes merge
    * associatively across micro-batches (StreamingSpec pins stream ≡
    * batch). */
  def weeklyApproxDistinct(events: DataFrame, keyCol: String = "event_id",
      watermark: String = "14 days"): DataFrame = {
    requireUtc(events)
    graft.ops.Hll.approxDistinctWide(
        events.withWatermark("ts", watermark),
        Seq(window(col("ts"), "7 days", "7 days", "4 days").as("w")),
        col(keyCol))
      .select(
        date_format(date_add(col("w.end").cast(DateType), -1), "yyyy-MM-dd").as("week_ending"),
        round(col("hll_est"), 4).as("approx_distinct"))
  }

  /** Tumbling weekly quantile ESTIMATES from bounded mergeable state —
    * the d24 bottom-k sketch ([[graft.ops.QuantileSketch]]) as Structured
    * Streaming state, closing the loop VERDICT r16 #1-of-missing named:
    * the exact engine cannot stream, but per-shard bottom-k state CAN.
    * Each week's state is the ≤ k (md5(event_id), value) entries with
    * the smallest digests; membership is a pure function of the row, so
    * ANY micro-batch arrival order folds to the same final state — the
    * algebra QuantileSketchProps pins (associative, commutative,
    * partition law) is exactly what makes stream ≡ batch here, and
    * StreamingSpec asserts it on shuffled multi-batch input. Implemented
    * with `mapGroupsWithState` (the typed-state API — bottom-k is not a
    * built-in aggregate; same pattern as the LSH bucket store): state is
    * ≤ k entries per window, bounded by construction, so no watermark is
    * needed for state size — only #windows grows, as in every weekly op.
    * `n_seen` (total values offered) is strictly monotone per key, so
    * the update stream is totally ordered and the final row per key is
    * identifiable from the sink alone. Emits the median and p90 sample
    * order statistics at integer ranks (the d24 readout). */
  def weeklyQuantileSketch(events: DataFrame, k: Int = 256): DataFrame = {
    requireUtc(events)
    val session = events.sparkSession
    import session.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val keyed = events
      .filter(col("event_id").isNotNull && col("value").isNotNull)
      .select(
        date_format(date_add(date_trunc("week", col("ts")).cast(DateType), 6),
          "yyyy-MM-dd").as("wk"),
        md5(col("event_id").cast("string").cast("binary")).as("hx"),
        col("value").cast("double").as("v"))
      .as[(String, String, Double)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[(List[(String, Double)], Long),
          (String, Long, Long, Double, Double)](GroupStateTimeout.NoTimeout) {
        case (wk, rows, state) =>
          val (old, seen) = state.getOption.getOrElse((Nil, 0L))
          val batch = rows.map(r => (r._2, r._3)).toSeq
          val merged = graft.ops.QuantileSketch.modelMerge(old, batch, k)
          val nSeen = seen + batch.size
          state.update((merged.toList, nSeen))
          (wk, nSeen, merged.size.toLong,
            r6(graft.ops.QuantileSketch.modelQuantile(merged, 1L, 2L)),
            r6(graft.ops.QuantileSketch.modelQuantile(merged, 9L, 10L)))
      }
      .toDF("week_ending", "n_seen", "n_sample", "med_est", "p90_est")
  }

  /** Streaming exact dedup by event_id: keeps the FIRST arrival of each id,
    * with state truncated below the event-time watermark. Must be
    * `dropDuplicatesWithinWatermark`, not plain `dropDuplicates`: the
    * plain form only evicts state when the event-time column is PART of
    * the key set (it is not here — same id, different ts must still
    * dedup), so it would keep every id forever and the state store grows
    * without bound (review finding r07). The within-watermark form keeps
    * the id-only key AND expires entries once the watermark passes them —
    * the documented contract: an id older than the watermark can no
    * longer collide, so its state is dropped (and a re-arrival AFTER that
    * expiry re-emits, the price of bounded state). */
  def dedupByEventId(events: DataFrame, watermark: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user SESSION windows: events of one user closer than `gap` merge
    * into one session [first ts, last ts + gap). Spark-first: this is
    * `session_window(ts, gap)` — the built-in merging-window aggregate —
    * NOT a hand-rolled mapGroupsWithState loop; the same body is the
    * batch gap-split sessionization (lag/cumsum-equivalent, what the
    * DuckDB oracle replays for l13) and the incremental streaming form,
    * where the watermark both bounds state and CLOSES sessions (a session
    * emits in append mode once the watermark passes its end — no more
    * mergeable events can arrive). Timestamps format at full microsecond
    * fidelity for cross-engine hashing. */
  def sessionAgg(events: DataFrame, gap: String = "12 hours",
      watermark: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Behavioral session SEQUENCES — the training-data assembly on top of
    * [[sessionAgg]]'s sessionization: each 12-hour-gap session becomes an
    * ordered event-type-ID sequence (ties broken by event_id, the
    * engine-wide total-order rule), the events-table analogue of l51's
    * token-ID encoding: behavioral-LM / recommendation pretraining
    * consumes exactly these (user, session, id-sequence) rows. The type
    * vocabulary arrives as a side input (tid per event_type — broadcast;
    * type cardinality is enum-like), so the stream side is ONE
    * stream-static broadcast join plus the session-window aggregate;
    * per-session state is the event list of OPEN sessions only —
    * bounded by the watermark exactly like sessionAgg. The sequence is
    * emitted as a space-joined string so the cross-engine hash is over
    * scalar cells. */
  def sessionSequences(events: DataFrame, typeIds: DataFrame,
      gap: String = "12 hours", watermark: String = "14 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(typeIds), Seq("event_type"))
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("tid")))).as("evs"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events").cast("long").as("n_events"),
        concat_ws(" ",
          transform(col("evs"), e => e.getField("tid").cast("string"))).as("seq"))

  /** Stream-stream INTERVAL join: each 'error' event joined to the same
    * user's 'click' events from the preceding `lookback` — the
    * cause-within-window correlation shape (click → error attribution).
    * Spark-first: this is the built-in watermarked stream-stream inner
    * join, NOT a stateful hand-roll — BOTH sides carry watermarks and the
    * join condition bounds event-time distance, which is exactly what
    * lets Spark expire join state (a click older than watermark +
    * lookback can never match a future error and is dropped from the
    * state store). The same body on a batch frame is a plain
    * self-equi-join with an inequality residual — one shuffle on user_id.
    * StreamingSpec proves stream ≡ batch; the declared l22 row pins the
    * semantics to the DuckDB inequality-join oracle. */
  def intervalJoin(events: DataFrame, lookback: String = "1 hour",
      watermark: String = "30 days"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermark)
    clicks.join(errors,
        col("user_id") === col("err_user") &&
          col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookback") &&
          col("click_ts") <= col("err_ts"))
      .select(col("user_id"), col("click_id"), col("err_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — the NEGATIVE space of
    * [[intervalJoin]]: every error keeps a row even when NO click
    * preceded it within `lookback` (click fields null). The semantics
    * only watermarks make possible on a stream: an unmatched error
    * cannot be emitted when first seen (a matching click may still
    * arrive), so Spark holds it in join state and emits the null-padded
    * row exactly when the watermark proves no future click can land in
    * its lookback window. Batch runs the same body and gets the nulls
    * immediately — StreamingSpec pins stream ≡ batch, and that the null
    * rows appear only after the watermark passes. The declared
    * l118 row filters to the null rows (the unattributed-error cohort)
    * against a NOT-EXISTS oracle. */
  def intervalJoinLeftOuter(events: DataFrame, lookback: String = "1 hour",
      watermark: String = "30 days"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermark)
    errors.join(clicks,
        col("user_id") === col("err_user") &&
          col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookback") &&
          col("click_ts") <= col("err_ts"),
        "left_outer")
      .select(col("err_user").as("user_id"), col("err_id"), col("click_id"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("click_ts"))
  }

  /** Stream-stream LEFT SEMI interval join — the third join mode of the
    * l22/l118 family (inner emits one row PER matching click; left outer
    * adds watermark-finalized null rows; SEMI emits each error exactly
    * once as soon as ANY prior-hour click shows up, and never a null).
    * The production shape for "attributed errors": existence is the
    * question, so materializing the click fan-out (inner) or holding
    * rows for finalization (outer) is pure waste — semi state is one
    * pending-left entry per unmatched error, dropped at the watermark,
    * and matched rows need no watermark wait at all. Same body runs on a
    * batch frame (the declared l147 oracle) and under MemoryStream
    * (StreamingSpec pins stream ≡ batch and once-per-error emission). */
  def intervalJoinLeftSemi(events: DataFrame, lookback: String = "1 hour",
      watermark: String = "30 days"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermark)
    errors.join(clicks,
        col("user_id") === col("err_user") &&
          col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookback") &&
          col("click_ts") <= col("err_ts"),
        "left_semi")
      .select(col("err_user").as("user_id"), col("err_id"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"))
  }

  /** Stream-stream FULL OUTER interval join — the fourth and last join
    * mode (l22 inner, l118 left outer, l147 semi): every error with its
    * prior-hour clicks, PLUS null rows for errors with no click AND for
    * clicks that attributed no error — the reconciliation view (which
    * side has orphans, in one stream). Both sides' null rows wait on the
    * watermark (state holds unmatched rows from BOTH inputs — the
    * symmetric cost left-outer pays on one side only); matched rows
    * stream out immediately. Same body batch + stream; StreamingSpec
    * pins stream ≡ batch after sentinel-driven finalization. */
  def intervalJoinFullOuter(events: DataFrame, lookback: String = "1 hour",
      watermark: String = "30 days"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"),
        col("event_id").as("err_id"))
      .withWatermark("err_ts", watermark)
    errors.join(clicks,
        col("click_user") === col("err_user") &&
          col("click_ts") >= col("err_ts") - expr(s"INTERVAL $lookback") &&
          col("click_ts") <= col("err_ts"),
        "full_outer")
      .select(coalesce(col("err_user"), col("click_user")).as("user_id"),
        col("err_id"), col("click_id"),
        date_format(col("err_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("click_ts"))
  }

  /** Weekly PSI drift against a FROZEN reference distribution — the
    * streaming form of the l52 monitor, how production actually deploys
    * it: edges and reference proportions are FIT OFFLINE (a batch job
    * over the reference era) and folded in as literals; each weekly
    * window of the live stream is then scored online. Spark-first: this
    * is a CHAINED pair of time-window aggregations (the multi-stateful
    * topology Spark ≥3.5 admits in append mode) — (1) count per (week
    * window, bin), watermark-bounded; (2) re-window the finalized
    * (window, bin) rows via `window_time` into the same week and fold the
    * ≤ (#edges+1)-entry bin map into the PSI scalar with a per-row
    * `aggregate` HOF. State is (#bins per open week) for agg 1 and one
    * bin map per open week for agg 2 — bounded by the watermark, never
    * keyed by values. A week emits once the watermark passes its end
    * (append close — the open week is not yet scoreable, exactly the
    * monitoring contract). The same body on a batch frame is the declared
    * l55 oracle query.
    *
    * `refProps(b)` must be the SMOOTHED reference proportion of bin b+1
    * ((cr_b + 0.5) / (n_ref + 0.5·#bins)) so the identical-distribution
    * score is ~0 and empty live bins stay finite. */
  def psiWeekly(events: DataFrame, edges: Seq[Double], refProps: Seq[Double],
      watermark: String = "14 days"): DataFrame = {
    require(refProps.length == edges.length + 1,
      s"need one reference proportion per bin: ${edges.length + 1}")
    requireUtc(events)
    val nBins = edges.length + 1
    val bin = size(filter(typedLit(edges), x => col("value") > x)) + 1
    val counts = events
      .withWatermark("ts", watermark)
      .withColumn("bin", bin)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val byWeek = counts
      .groupBy(window(window_time(col("w")), "7 days", "7 days", "4 days").as("w2"))
      .agg(map_from_entries(collect_list(struct(col("bin"), col("c")))).as("m"),
        sum("c").as("n"))
    val prLit = typedLit(refProps)
    val psi = aggregate(sequence(lit(1), lit(nBins)), lit(0.0), (acc, b) => {
      val cb = coalesce(element_at(col("m"), b), lit(0L))
      val pc = (cb + 0.5) / (col("n") + 0.5 * nBins)
      val pr = element_at(prLit, b)
      acc + (pc - pr) * log(pc / pr)
    })
    byWeek.select(
      date_format(date_add(col("w2.end").cast(DateType), -1), "yyyy-MM-dd")
        .as("week_ending"),
      col("n").cast("long").as("n"),
      round(psi, 6).as("psi"))
  }

  /** Streaming near-dup detection: every incoming doc is matched against
    * the ENTIRE history via an LSH bucket store — the one dedup shape no
    * built-in streaming operator covers (joining a stream against its own
    * past needs custom state, SURVEY §2.I). Docs shingle + MinHash
    * per-row ([[TextOps.minhashRow]] — a second stateful groupBy is the
    * multi-stateful topology Structured Streaming restricts), explode
    * into (band, key) buckets, and `flatMapGroupsWithState` keeps the doc
    * ids seen per bucket: a new arrival emits one candidate pair per
    * bucket-mate (history AND same-batch), then joins the stored set.
    * Emitted pairs are i<j-normalized CANDIDATES — exactly the batch LSH
    * candidate set over the union of all batches (StreamingSpec proves
    * set-equality) — and downstream they dedup + exact-verify precisely
    * like l5's batch candidates.
    *
    * State: one Seq[doc_id] per occupied (band, key) bucket — the
    * dedup-against-history contract means it grows with the corpus'
    * distinct buckets. Bound it with `tsCol`/`horizon` (VERDICT r10 #4):
    * when the input carries an ingest-time column, the op watermarks on it
    * and EVICTS any bucket whose newest member is older than `horizon`
    * behind the watermark (EventTimeTimeout — state the stream can no
    * longer near-dup against within the horizon is dropped; a re-arrival
    * after expiry re-emits, the price of bounded state, same contract as
    * dropDuplicatesWithinWatermark above). With `tsCol = None` the store
    * keeps full history — the whole-corpus dedup contract, bounded only
    * operationally. The same body runs on a BATCH frame (state starts
    * empty, each bucket processed once, timeouts never fire) — one body,
    * two engines, like every op in this file. */
  def lshCandidatePairs(docs: DataFrame, shingleN: Int = 3, k: Int = 64,
      b: Int = 16, r: Int = 4, tsCol: Option[String] = None,
      horizon: String = "30 days"): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    // idempotent: the per-row signature resolves graft_minhash by name,
    // and shingleSet/xxhash64Array resolve the TextExprs natives
    graft.functions.SketchExprs.register(docs.sparkSession)
    graft.functions.TextExprs.register(docs.sparkSession)
    // batch runs spread CPU-bound shingling across cores; a stream stays as-is
    val src0 = if (docs.isStreaming) docs else graft.Tables.spread(docs)
    // with eviction on (streaming only), a NULL ingest time is meaningless
    // (it can neither advance the watermark nor define the bucket's age)
    // and would poison the timeout arithmetic below — drop such rows up
    // front. Batch runs never evict, so the ts stays decorative there and
    // null-ts docs keep participating in candidate generation.
    val src1 = tsCol.filter(_ => docs.isStreaming)
      .fold(src0)(tc => src0.filter(col(tc).isNotNull))
    val src = tsCol.filter(_ => docs.isStreaming)
      .fold(src1)(tc => src1.withWatermark(tc, horizon))
    // the TIMESTAMP column itself (not a derived long) must flow into the
    // stateful op: the watermark tag lives on the attribute's metadata,
    // and EventTimeTimeout refuses to plan without it downstream
    val ts = tsCol.fold(lit(null).cast("timestamp"))(tc => col(tc))
    val sig = src.select(col("doc_id").cast("long").as("doc_id"),
        TextOps.minhashRow(
          TextOps.shingleSet(TextOps.tokens(col("text")), shingleN), k).as("sig"),
        ts.as("ets"))
      .filter(col("sig").isNotNull)
    val banded = sig
      .select(col("doc_id"), explode(TextOps.lshBands(col("sig"), b, r)).as("bd"),
        col("ets"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.key").as("key"),
        col("ets"))
      .as[(Long, Int, Long, Option[java.sql.Timestamp])]
    bucketPairs(banded, evict = tsCol.isDefined && docs.isStreaming,
      horizonMs = intervalMs(horizon))
  }

  /** Millis in an interval literal like "1 hour" / "30 days" — day-time
    * only (months would be ill-defined as a fixed duration). */
  private def intervalMs(interval: String): Long = {
    val ci = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(interval))
    require(ci.months == 0, s"horizon must be day-time, got '$interval'")
    ci.days * 86400000L + ci.microseconds / 1000L
  }

  /** The LSH bucket store shared by [[lshCandidatePairs]] and its md5
    * variant: one `Seq[doc_id]` of prior arrivals per occupied (band, key)
    * bucket; each new arrival emits a candidate pair per bucket-mate.
    * With `evict` on (streaming + ingest-time column), state also tracks
    * the bucket's newest-arrival event time and arms an EventTimeTimeout at
    * newest + horizon: once the watermark passes that point the bucket is
    * dropped. Timeouts only fire for groups with no data in the batch, so
    * an active bucket is never evicted out from under its own arrivals.
    *
    * Late rows: with EventTimeTimeout armed, Spark PRE-FILTERS input rows
    * whose event time is below the watermark — they never reach this
    * function (runtime-verified on 4.1.2; StreamingSpec's straggler case
    * pins it via `numRowsDroppedByWatermark`). The NoTimeout path does NOT
    * pre-filter, so non-evicting buckets still see every arrival — the
    * full-history contract. The armed timestamp is still clamped above the
    * current watermark as defense-in-depth: the pre-filter is engine
    * behavior, not a documented API guarantee, and if a sub-watermark
    * event time ever did reach the function, setTimeoutTimestamp on
    * (maxTs + horizon) in the past would throw and kill the query — the
    * clamp evicts such a bucket at the next opportunity instead.
    *
    * State schema: `evict = false` keeps the original `Seq[Long]` encoder,
    * so non-evicting callers (tsCol = None — the default whole-corpus
    * contract) remain CHECKPOINT-COMPATIBLE with the pre-eviction build.
    * Only evicting callers use the widened (Seq[Long], Long) encoder — a
    * checkpoint written without eviction cannot restart with eviction ON
    * (state deserialization fails); restart from a fresh checkpoint and
    * re-seed history through the batch path (StreamingSpec demonstrates
    * both the failure and the recovery). */
  private def bucketPairs(
      banded: Dataset[(Long, Int, Long, Option[java.sql.Timestamp])],
      evict: Boolean, horizonMs: Long): Dataset[(Long, Long)] = {
    import banded.sparkSession.implicits._
    // shared emit logic: candidates = each first-seen arrival × (stored
    // history + later same-batch arrivals), i<j-normalized
    def emit(old: Seq[Long], rs: Seq[(Long, Int, Long, Option[java.sql.Timestamp])])
        : (Seq[Long], Seq[(Long, Long)]) = {
      val seen = old.toSet
      val fresh = rs.map(_._1).distinct.filterNot(seen).sorted
      val pairs = for {
        (a, idx) <- fresh.zipWithIndex
        other <- old.iterator ++ fresh.iterator.drop(idx + 1)
        if a != other
      } yield if (a < other) (a, other) else (other, a)
      (fresh, pairs)
    }
    val grouped = banded.groupByKey { case (_, band, key, _) => (band, key) }
    if (evict) {
      grouped.flatMapGroupsWithState[(Seq[Long], Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (old, oldTs) = state.getOption.getOrElse((Seq.empty[Long], 0L))
            val rs = rows.toSeq
            val (fresh, pairs) = emit(old, rs)
            val maxTs = (oldTs +: rs.map(_._4.map(_.getTime).getOrElse(0L))).max
            if (fresh.nonEmpty || maxTs > oldTs) state.update((old ++ fresh, maxTs))
            // defense-in-depth clamp — see the scaladoc's late-row note
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            pairs.iterator
          }
      }
    } else {
      grouped.flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          val old = state.getOption.getOrElse(Seq.empty[Long])
          val (fresh, pairs) = emit(old, rows.toSeq)
          if (fresh.nonEmpty) state.update(old ++ fresh)
          pairs.iterator
      }
    }
  }

  /** md5 variant of [[lshCandidatePairs]] — identical topology (per-row
    * signature → band explode → bucket store), but every hash is
    * md5-derived: the two Kirsch-Mitzenmacher families come from
    * md5(shingle) / md5('g:' ++ shingle) instead of seeded xxhash64, and a
    * band's key is md5 of its r signature values joined with ','. That is
    * l8's playbook for graduating a sketch from spec-only to
    * oracle-checked: ANSI SQL can derive the identical hex digits, so the
    * DuckDB oracle of `l19_lsh_history` replays signatures → bands →
    * candidate pairs end to end (64-bit wraparound of h1 + i·h2 replayed
    * in HUGEINT arithmetic). xxhash64 stays the scale default — md5 is
    * ~5× the digest cost — which is why this is a VARIANT, not a
    * replacement; smaller default k keeps the declared row's 2·k digests
    * per shingle proportionate. Same body batch and streaming, like every
    * op in this file. */
  def lshCandidatePairsMd5(docs: DataFrame, shingleN: Int = 3, k: Int = 16,
      b: Int = 4, r: Int = 4, tsCol: Option[String] = None,
      horizon: String = "30 days"): Dataset[(Long, Long)] = {
    import docs.sparkSession.implicits._
    require(b * r <= k, s"need b*r <= k, got b=$b r=$r k=$k")
    graft.functions.SketchExprs.register(docs.sparkSession)
    graft.functions.TextExprs.register(docs.sparkSession)
    val src0 = if (docs.isStreaming) docs else graft.Tables.spread(docs)
    // null ingest times are dropped with eviction on (streaming only) —
    // see lshCandidatePairs
    val src1 = tsCol.filter(_ => docs.isStreaming)
      .fold(src0)(tc => src0.filter(col(tc).isNotNull))
    val src = tsCol.filter(_ => docs.isStreaming)
      .fold(src1)(tc => src1.withWatermark(tc, horizon))
    val ts = tsCol.fold(lit(null).cast("timestamp"))(tc => col(tc))
    val ss = TextOps.shingleSet(TextOps.tokens(col("text")), shingleN)
    val sig = src
      .select(col("doc_id").cast("long").as("doc_id"), ss.as("ss"), ts.as("ets"))
      .select(col("doc_id"), graft.functions.SketchExprs.minhash(
        transform(col("ss"), s => TextOps.md5Hash64(s)),
        transform(col("ss"), s => TextOps.md5Hash64(concat(lit("g:"), s))),
        k).as("sig"), col("ets"))
      .filter(col("sig").isNotNull)
    val bands = transform(sequence(lit(0), lit(b - 1)), bi => struct(
      bi.cast("int").as("band"),
      TextOps.md5Hash64(array_join(
        slice(col("sig"), bi * r + 1, lit(r)).cast("array<string>"), ",")).as("key")))
    val banded = sig.select(col("doc_id"), explode(bands).as("bd"), col("ets"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.key").as("key"),
        col("ets"))
      .as[(Long, Int, Long, Option[java.sql.Timestamp])]
    bucketPairs(banded, evict = tsCol.isDefined && docs.isStreaming,
      horizonMs = intervalMs(horizon))
  }

  /** Weekly NOVELTY monitor against a frozen era — l65's audit deployed
    * the way ingest monitoring runs: each arriving doc's distinct 5-grams
    * probe a STATIC frozen-gram frame (the previous corpus release), and
    * every weekly window reports how much of the week's text was genuinely
    * new. The STREAM-STATIC join topology: the static side carries no
    * watermark and no state — Spark re-plans it per micro-batch (at scale:
    * a bucketed/broadcast-able gram table, refreshed per release) — so the
    * only streaming state is the windowed count aggregate, bounded to
    * ~2 windows by the watermark. Same body batch and streaming (the
    * declared l68 row runs it on the batch frame; withWatermark is a
    * no-op in batch); gram occurrences only — a gram-less doc contributes
    * nothing to a RATE (unlike l65's per-doc rows, where short docs get
    * the fully-novel convention). */
  def weeklyNovelty(live: DataFrame, frozenGrams: DataFrame,
      watermark: String = "14 days"): DataFrame = {
    requireUtc(live)
    val grams = array_distinct(
      TextOps.shingles(TextOps.tokens(col("text")), 5))
    live.withWatermark("ts", watermark)
      .select(col("ts"), explode(grams).as("gram"))
      .join(frozenGrams.select(col("gram"), lit(1).as("seen")),
        Seq("gram"), "left")
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(
        date_format(date_add(col("w.end").cast(DateType), -1), "yyyy-MM-dd")
          .as("week_ending"),
        col("n_grams").cast("long").as("n_grams"),
        col("n_novel").cast("long").as("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty_rate"))
  }

  /** Weekly count-min sketch maintenance — the heavy-hitters companion to
    * [[weeklyApproxDistinct]]'s HLL: the stream keeps ONE mergeable
    * D×W counter grid per week (state ≤ 2048 rows per open window, never
    * the key set), emitting each closed week's sketch cells; point
    * estimation (CountMin.estimate — min over a key's D counters,
    * exact-or-over) runs OFFLINE against the emitted cells, the
    * lambda-architecture split: the stream maintains the sketch, batch
    * queries it. Same body batch and streaming (withWatermark is a no-op
    * in batch — the declared l96 row hashes the batch form against the
    * DuckDB register replay); StreamingSpec pins stream ≡ batch cell for
    * cell and the estimate round-trip. UTC session required, as every
    * weekly op here ([[requireUtc]]). */
  def weeklyCmSketch(events: DataFrame, key: Column,
      watermark: String = "14 days"): DataFrame = {
    requireUtc(events)
    events.filter(key.isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"), graft.ops.CountMin.cells(key).as("rc"))
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"),
        col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(date_add(col("w.end").cast(DateType), -1), "yyyy-MM-dd")
          .as("week_ending"),
        col("r").cast("long").as("r"), col("c").cast("long").as("c"),
        col("cnt").cast("long").as("cnt"))
  }

  /** Exactly-once-BY-IDEMPOTENCE file sink for `foreachBatch` — the
    * production shape for landing a curated stream in plain parquet
    * without a transactional table format. Structured Streaming's
    * `foreachBatch` contract is at-least-once: after a crash between
    * sink write and checkpoint commit, the SAME (batchId, data) is
    * replayed. Keying the write to a `batch_id=<id>` directory with
    * overwrite mode makes the replay a no-op-equivalent — the retry
    * rewrites the identical directory, so the landed table holds each
    * record exactly once regardless of how many times a batch ran
    * (StreamingSpec pins a simulated retry). The micro-batch's data is
    * deterministic per batchId because the checkpoint pins each batch's
    * source offsets — idempotence holds for ANY retry of a committed-
    * offset batch, which is the only replay the engine performs.
    *
    * 100 TB posture and the honest caveats, stated: (1) a reader scanning
    * DURING a retry's overwrite can glimpse a partially-rewritten batch
    * directory — plain parquet has no commit protocol; production fronts
    * this with a manifest (the l60 shard-manifest shape: readers resolve
    * the manifest, writers swap it last) or a table format that owns the
    * commit. (2) One directory per micro-batch is the natural compaction
    * unit — the c8 keep-latest compactor runs over cold batch dirs. The
    * sink itself is a plain per-partition parquet write: no shuffle, no
    * driver data. */
  def idempotentParquetSink(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Per-user arrival QUOTA — each user's first k events pass, every
    * later one is suppressed — on Spark 4's `transformWithState`
    * arbitrary-state API (SPARK-46815), the successor to
    * `flatMapGroupsWithState` the rest of this file uses: typed state
    * handles (here ONE ValueState[Long] counter per user — the state is
    * a long, never the event list), per-state TTL, and a RocksDB-only
    * contract (the API requires the multi-column-family store — the
    * provider a 100 TB deployment runs anyway; StreamingSpec sets it).
    *
    * This is a row-emission decision no built-in aggregation can make in
    * append mode: emitting "the first k per key, as they arrive, exactly
    * once" needs per-row state consultation. Batch equivalent:
    * row_number over (ts, event_id) per user ≤ k — and the stream equals
    * it WHEN arrival order follows that order (the spec feeds time-
    * ordered slices; rows are (ts, event_id)-sorted WITHIN each batch by
    * the processor, so intra-batch shuffle order cannot leak in).
    *
    * Returns (user_id, event_id) of admitted events, unordered. */
  def perUserQuota(events: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .transformWithState(
        new ArrivalQuotaProcessor(k), ss.TimeMode.None(),
        OutputMode.Append(), Encoders.product[(Long, Long)])
      .toDF("user_id", "event_id")
  }

  /** Per-user INACTIVITY detection — emit (user_id, last_ts) exactly when
    * a user has been silent for `gap` of EVENT TIME: the semantics only a
    * state TIMER can express (every aggregation/join emits on data
    * arriving; this emits on data NOT arriving). Each event re-arms the
    * user's event-time timer at ts + gap (deleting the previous one); the
    * timer fires when the WATERMARK passes its expiry — so "quiet" is
    * judged on event time, robust to late/slow feeds, and a user who
    * resumes before the watermark reaches the old deadline never fires.
    * transformWithState (timers need the arbitrary-state API; the
    * fMGWS ops' EventTimeTimeout can only time out a whole group's
    * state, not carry per-key deadlines alongside live state), RocksDB
    * contract as with [[perUserQuota]].
    *
    * Returns (user_id, last_ts: yyyy-MM-dd HH:mm:ss.SSSSSS, quiet_after)
    * rows as watermark progress proves silence. */
  def inactivityAlerts(events: DataFrame, gap: String = "3 days"): DataFrame = {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    val gapMs = intervalMs(gap)
    val s = events.sparkSession
    import s.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .transformWithState(
        new InactivityProcessor(gapMs), ss.TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[(Long, String, String)])
      .toDF("user_id", "last_ts", "quiet_after")
  }
}

/** The [[StreamingOps.perUserQuota]] processor: one ValueState[Long]
  * counter per key; a batch's rows sort by (ts, event_id) before the
  * quota cut so emission is deterministic given time-ordered feeding. */
class ArrivalQuotaProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, java.sql.Timestamp), (Long, Long)] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Long]("seen",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val have = if (seen.exists()) seen.get() else 0L
    val room = math.max(0L, k - have).toInt
    if (room == 0) Iterator.empty
    else {
      val admitted = rows.toSeq
        .sortBy(r => (r._3.getTime, r._2)).take(room)
      seen.update(have + admitted.size)
      admitted.iterator.map(r => (key, r._2))
    }
  }
}

/** The [[StreamingOps.inactivityAlerts]] processor: ValueState[Long]
  * last-event-time per key plus ONE armed event-time timer — re-armed
  * (old deadline deleted) on every event, fired by watermark passage.
  * The fire emits the stored last_ts and clears state: a user who
  * returns later starts a fresh silence window. */
class InactivityProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long, java.sql.Timestamp), (Long, String, String)] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var lastTs: ValueState[Long] = _

  private def fmt(ms: Long): String = {
    val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f.format(new java.util.Date(ms)) + "000"
  }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastTs = getHandle.getValueState[Long]("last_ts",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(Long, String, String)] = {
    val newest = rows.map(_._3.getTime).max
    val prev = if (lastTs.exists()) Some(lastTs.get()) else None
    if (prev.forall(_ < newest)) {
      prev.foreach(p => getHandle.deleteTimer(p + gapMs))
      lastTs.update(newest)
      getHandle.registerTimer(newest + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, String, String)] = {
    val last = lastTs.get()
    lastTs.clear()
    Iterator.single((key, fmt(last), fmt(expiredTimerInfo.getExpiryTimeInMs)))
  }
}
