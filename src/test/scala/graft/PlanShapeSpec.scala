package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{CoreQueries, ExtQueries, LlmQueries}

/** Physical-plan posture pins for the CORE declared queries — the scan/
  * shuffle/join properties the 100 TB story claims, asserted as plan-shape
  * regressions (ScaleOpsSpec covers a6/f4/l11; this covers the everyday
  * operators). The oracle proves the ANSWER; these prove the work happens
  * in the right PLACE: a projection that drags every column, a filter
  * evaluated post-scan, a dim join that shuffles the fact, or an
  * aggregate with no map-side combine would all still hash-match at test
  * SF and then fall over at cluster scale.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: graft.queries.Q): String = {
    // default maxMetadataStringLength=100 truncates PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", 4096)
    q.fn(spark, sf).queryExecution.executedPlan.toString
  }

  /** Plan string AFTER one execution: AQE's executedPlan is the un-run
    * AdaptiveSparkPlan shell until then, with no codegen stage markers.
    * Runs through the df's OWN queryExecution (a write would plan a fresh
    * command and leave this one untouched); sf0.001 keeps collect tiny. */
  private def finalPlan(q: graft.queries.Q): String = {
    val df = q.fn(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("B1: projection prunes the parquet scan to the selected columns") {
    val p = plan(CoreQueries.b1_projection)
    assert(p.contains("ReadSchema"), s"expected a file scan:\n$p")
    // lineitem has 16 columns; a correct scan reads exactly the 3 selected
    assert(!p.contains("l_extendedprice") && !p.contains("l_shipdate"),
      s"unselected columns must not reach the scan:\n$p")
  }

  test("B3: both predicates push down to the parquet scan") {
    val p = plan(CoreQueries.b3_filter)
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"equality predicate must reach PushedFilters:\n$p")
    assert(p.contains("GreaterThan(l_quantity,30"),
      s"range predicate must reach PushedFilters:\n$p")
  }

  test("E2: dimension joins broadcast — the fact side never shuffles") {
    val p = plan(CoreQueries.e2_broadcast_join)
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join may appear in a dim-join plan:\n$p")
  }

  test("D1: group-by mean aggregates map-side before the shuffle") {
    val p = plan(CoreQueries.d1_group_mean)
    assert(p.contains("partial_avg") || p.contains("partial_count"),
      s"aggregate must have a partial (map-side combine) phase:\n$p")
  }

  test("B2: derived-column projection runs inside whole-stage codegen") {
    val p = finalPlan(CoreQueries.b2_derived)
    assert(p.contains("*("),
      s"expected WholeStageCodegen spans in a scalar-expression plan:\n$p")
  }

  test("L15/L16: curation scans are single-pass — no aggregation shuffle") {
    for (q <- Seq(LlmQueries.l15_quality_filter, LlmQueries.l16_normalize_redact)) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"),
        s"${q.name}: a per-row metric scan must not shuffle by key " +
          s"(only the final result sort may exchange):\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"${q.name}: no join belongs in a per-row scan:\n$p")
    }
  }

  test("L17: sampling scan prunes text — only (doc_id, lang) are read") {
    val p = plan(LlmQueries.l17_stratified_sample)
    assert(p.contains("ReadSchema"), s"expected a file scan:\n$p")
    assert(!p.contains("text:string") && !p.contains("n_chars"),
      s"the sample filter needs no text column; scan must prune it:\n$p")
  }

  test("L18: the vocabulary (df) side joins as broadcast, not shuffle") {
    val p = finalPlan(LlmQueries.l18_tfidf_topterms)
    assert(p.contains("BroadcastHashJoin"),
      s"vocab ≪ corpus — AQE must broadcast the df side:\n$p")
  }

  test("L20: packing shuffles once per shard window, never globally sorts early") {
    val p = plan(LlmQueries.l20_seq_pack)
    val hashEx = p.sliding("hashpartitioning".length).count(_ == "hashpartitioning")
    assert(hashEx <= 2, // window exchange (plus AQE read reuse at most)
      s"one shard-window exchange expected, got $hashEx:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("L4/L5: near-dup candidate generation never goes cartesian") {
    for (q <- Seq(LlmQueries.l4_jaccard_neardup, LlmQueries.l5_minhash_lsh)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"${q.name}: candidate generation must stay index/bucket-joined:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"${q.name}: no all-pairs nested loop may appear:\n$p")
    }
  }

  test("D14: the count-min probe joins the sketch as broadcast, counters combine map-side") {
    val p = finalPlan(graft.queries.ExtQueries.d14_heavy_hitters)
    // the sketch is <= D*W rows by construction — probing it must never
    // plan a sort-merge join (which would shuffle on (r, c) at any scale)
    assert(p.contains("BroadcastHashJoin"),
      s"sketch probe must broadcast the counters:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs in a <=2048-row sketch probe:\n$p")
    // counter construction is a two-phase aggregate: partial counts ship,
    // never the exploded (r, c) rows
    assert(p.contains("partial_count"),
      s"counter aggregate must combine map-side:\n$p")
  }

  test("L9: winnowed fingerprints compute with zero shuffle before the result sort") {
    val p = plan(LlmQueries.l9_fingerprints)
    // exactly one exchange: the declared ORDER BY's range partitioning.
    // A hashpartitioning exchange would mean the per-row signature leaked
    // back into a grouped/window form.
    assert(!p.contains("hashpartitioning"),
      s"per-row winnowing must not shuffle by key:\n$p")
    assert(!p.contains("Window"), s"no window operator belongs in l9:\n$p")
  }

  test("C8: keep-latest is a map-side-combinable aggregate, not a window sort") {
    val p = plan(graft.queries.ExtQueries.c8_keep_latest)
    assert(p.contains("partial_max_by") || p.contains("partial_max"),
      s"compaction must combine map-side before the shuffle:\n$p")
    assert(!p.contains("Window"),
      s"no per-partition window sort belongs in the agg form:\n$p")
  }

  test("D9: rollup still aggregates partially (Expand before the shuffle)") {
    val p = plan(graft.queries.ExtQueries.d9_rollup)
    assert(p.contains("Expand"), s"grouping sets plan via Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"rollup must keep the map-side combine phase:\n$p")
  }

  test("D16: cube expands x4 in ONE pass — partial agg, no union of scans") {
    val p = plan(graft.queries.ExtQueries.d16_cube)
    assert(p.contains("Expand"), s"CUBE must plan via Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_avg"),
      s"cube must keep the map-side combine phase:\n$p")
    assert(!p.contains("Union"),
      s"one Expand pass, never four scans union'd:\n$p")
    // the 2^dims replication must come from ONE scan of the fact table
    assert(p.split("FileScan").length - 1 === 1,
      s"cube must read lineitem exactly once:\n$p")
  }

  test("F6: both ranking windows ride ONE exchange on the partition key") {
    // AQE's executed-plan string repeats the tree under "== Initial
    // Plan ==" — pin shapes on the FINAL section only
    val p = finalPlan(graft.queries.ExtQueries.f6_ranking)
      .split("== Initial Plan ==")(0)
    // two Window operators (tie-stable family + tiebroken ntile) ...
    assert(p.split("\\bWindow \\[").length - 1 === 2,
      s"expected two window operators:\n$p")
    // ... but only ONE hash exchange on priority — the second spec adds a
    // local re-sort, never a second shuffle (the final orderBy's range
    // exchange is the only other one)
    assert(p.contains("Exchange hashpartitioning(priority"),
      s"windows must partition on priority:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 === 1,
      s"both window specs must share one partition-key exchange:\n$p")
  }

  test("D17: the EWMA recursion never windows the corpus — two hash " +
      "exchanges, single-row folds") {
    val weekly = graft.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(date_add(date_trunc("week", col("ts")).cast("date"), 6),
          "yyyy-MM-dd").as("we"))
      .agg(round(avg("value"), 6).as("x"))
    val df = graft.queries.ExtQueries.ewma(weekly, alpha = 0.3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Window ["),
      s"the fold must not be a window function over the corpus:\n$p")
    assert(p.split("Exchange hashpartitioning").length - 1 <= 2,
      s"weekly agg + per-group fold = at most two exchanges:\n$p")
  }

  test("F7: the trailing average runs as a RANGE frame on one exchange") {
    val p = finalPlan(graft.queries.ExtQueries.f7_range_frame)
      .split("== Initial Plan ==")(0)
    assert(p.contains("RangeFrame"),
      s"the 28-day window must be a RANGE frame, not a row frame:\n$p")
    // daily agg keys (type, day) ≠ window key (type): two hash
    // exchanges is the honest floor, and nothing beyond it may appear
    assert(p.split("Exchange hashpartitioning").length - 1 === 2,
      s"daily agg + frame repartition = exactly two exchanges:\n$p")
  }

  test("D18: the pairwise sketch algebra never rescans the corpus") {
    // the register build runs ONCE as the bounded collect inside the
    // query builder; the declared result plan must then be pure local
    // arithmetic — ZERO file scans means no branch re-reads events
    val p = finalPlan(graft.queries.ExtQueries.d18_sketch_union)
      .split("== Initial Plan ==")(0)
    assert(p.split("FileScan").length - 1 === 0,
      s"all pairwise work must run on the local register frame:\n$p")
  }

  test("G7: the star cascade pushes the date window to the orders scan, " +
      "broadcasts the dims, and never goes cartesian") {
    val p = finalPlan(graft.queries.ExtQueries.g7_star_join)
      .split("== Initial Plan ==")(0)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the date window must reach the orders scan's PushedFilters:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim cascade must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"a star cascade must stay key-based:\n$p")
  }

  test("E8: the null-safe join is an EQUI-join plan — no nested loop") {
    val p = finalPlan(graft.queries.ExtQueries.e8_null_safe_join)
      .split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"<=> must plan as a keyed join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"EqualNullSafe must never fall back to a nested loop:\n$p")
  }

  test("E6: anti-join plans as a real join, never a per-row subquery") {
    val p = finalPlan(graft.queries.ExtQueries.e6_anti_join)
    assert(p.contains("LeftAnti"), s"expected an anti-join operator:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"anti-join must stay key-based:\n$p")
  }

  test("D13: HLL sketch aggregates map-side — registers ship, values never do") {
    val p = plan(graft.queries.ExtQueries.d13_hll_distinct)
    // both levels must carry a partial phase: per-(group, register) max
    // and the per-group register fold — that is the mergeable-sketch
    // property in the plan (each task emits ≤64 longs per group)
    assert(p.contains("partial_max"),
      s"register build must combine map-side before its exchange:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"estimator fold must combine map-side too:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"the sketch is two hash aggregates, nothing else:\n$p")
  }

  test("L29: hyperplane-LSH candidates come from the band-key bucket join") {
    val p = finalPlan(LlmQueries.l29_hyperplane_lsh)
    assert(!p.contains("CartesianProduct"),
      s"candidate generation must never go all-pairs:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the bucket self-join must be an equi-join on (band, key):\n$p")
    // the only legal nested-loop joins are the one-row sign-matrix
    // attaches (one per self-join side); AQE's string repeats the plan
    // under "== Initial Plan ==", so count the final section only
    val fin = p.split("== Initial Plan ==")(0)
    assert("BroadcastNestedLoopJoin".r.findAllIn(fin).size <= 2,
      s"only the broadcast sign-matrix attach may nest-loop:\n$p")
  }

  test("L30: gram-frequency passes combine map-side; no all-pairs step") {
    val p = finalPlan(LlmQueries.l30_repeated_span_scrub)
    assert(p.contains("partial_count"),
      s"the gram document-frequency count must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("L31: the 5-row rate table broadcasts — the corpus never shuffle-joins") {
    val p = finalPlan(LlmQueries.l31_domain_mix)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the per-domain rate attach must broadcast:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"no shuffle join may touch the corpus scan:\n$p")
  }

  test("L32: the vocab probe broadcasts; the per-doc mean combines map-side") {
    val p = finalPlan(LlmQueries.l32_unigram_nll)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"token scoring must be a broadcast probe, not a corpus shuffle:\n$p")
    assert(fin.contains("partial_avg"),
      s"the per-doc mean must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct"), p)
  }

  test("L33: shard shuffle is one hash exchange — never a global sort stage") {
    val p = finalPlan(LlmQueries.l33_shard_shuffle)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("hashpartitioning(shard"),
      s"the shard window must hash-partition on shard:\n$p")
    // the only range partitioning allowed is the final result ORDER BY;
    // a second one would mean the permutation ran through a total sort
    assert("rangepartitioning".r.findAllIn(fin).size <= 1,
      s"no global sort may feed the per-shard rank:\n$p")
  }

  test("L27: the eval gram set broadcasts; the hit count combines map-side") {
    val p = finalPlan(LlmQueries.l27_decontaminate)
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark grams ≪ training corpus — the membership probe must be " +
        s"a broadcast, never a shuffle of the training side:\n$p")
    assert(p.contains("partial_sum"),
      s"per-doc hit count must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("L37: the eval gram index broadcasts; pair counts combine map-side") {
    val p = finalPlan(LlmQueries.l37_fuzzy_decon)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the (gram → eval doc) index must broadcast, never shuffle the " +
        s"training side:\n$p")
    // aggregation MODE doesn't change under AQE, but the partial sits in a
    // materialized query stage the final-plan print elides — assert on the
    // full string (final + initial sections)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"the per-(train, eval) intersection count must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct") &&
      !fin.contains("BroadcastNestedLoopJoin"), p)
  }

  test("L35: line cleaning is a pure per-row scan — no key shuffle, no join") {
    val p = plan(LlmQueries.l35_c4_line_filter)
    assert(!p.contains("hashpartitioning"),
      s"line construction + filtering is per-row; only the result sort " +
        s"may exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in a per-row scan:\n$p")
  }

  test("L39: the tercile cut is ONE hash exchange on lang; no second sort stage") {
    val p = finalPlan(LlmQueries.l39_ccnet_buckets)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("hashpartitioning(lang"),
      s"the per-language rank window must hash-partition on lang:\n$p")
    // the unordered count-per-lang window must reuse the rank window's
    // exchange — a second lang exchange would double the corpus shuffle
    assert("hashpartitioning\\(lang".r.findAllIn(fin).size <= 1,
      s"the n-per-lang window must ride the rank window's exchange:\n$p")
    // only the final result ORDER BY may range-partition
    assert("rangepartitioning".r.findAllIn(fin).size <= 1,
      s"no global sort may feed the bucketing:\n$p")
  }

  test("L38: scoring is broadcast-only and the cut has no rank window") {
    val p = finalPlan(LlmQueries.l38_dsir_sample)
    val fin = p.split("== Initial Plan ==")(0)
    // the 1024-entry ratio map and the 1-row totals attach as broadcasts;
    // the corpus scan must never shuffle-join
    assert(!fin.contains("SortMergeJoin") && !fin.contains("ShuffledHashJoin"),
      s"no shuffle join may touch the corpus scan:\n$p")
    // global top-40% selection is a quantile THRESHOLD + map-side filter,
    // not a row_number over one partition — no window operator at all
    assert(!fin.contains("Window"),
      s"the global cut must not be a rank window (single-task sort):\n$p")
    // only the final result ORDER BY may range-partition
    assert("rangepartitioning".r.findAllIn(fin).size <= 1,
      s"no global sort may feed the scoring:\n$p")
  }

  test("L40: packing is one shard exchange feeding a secondary sort") {
    val p = finalPlan(LlmQueries.l40_bfd_pack)
    val fin = p.split("== Initial Plan ==")(0)
    // groupByKey(_._2) materializes the shard key as the synthetic
    // `value` column — exactly ONE hash exchange feeds the packing
    assert("hashpartitioning\\(".r.findAllIn(fin).size == 1,
      s"per-shard packing must be a single hash exchange:\n$p")
    // the (n DESC, doc_id) decreasing order rides that exchange as a
    // WITHIN-partition sort (global flag `false`) — Spark's spillable
    // secondary sort, never a second shuffle or a global sort
    assert("Sort \\[[^\\]]*DESC NULLS LAST[^\\]]*\\], false, 0".r
        .findAllIn(fin).nonEmpty,
      s"the decreasing sort must be within-partition:\n$p")
    // only the final result ORDER BY may range-partition
    assert("rangepartitioning".r.findAllIn(fin).size <= 1,
      s"no global sort may feed the packing:\n$p")
    assert(!fin.contains("CartesianProduct") && !fin.contains("SortMergeJoin"),
      s"only doc metadata moves, never a join:\n$p")
  }

  test("L36: the budget table broadcasts — the corpus never shuffle-joins") {
    val p = finalPlan(LlmQueries.l36_unimax_budget)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the #langs-row budget attach must broadcast:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"no shuffle join may touch the corpus scan:\n$p")
  }

  test("L43: the unigram backoff table broadcasts; the doc mean map-combines") {
    val p = finalPlan(LlmQueries.l43_bigram_lm_score)
    val fin = p.split("== Initial Plan ==")(0)
    // the vocab-sized unigram/backoff attaches must broadcast (the bigram
    // attach may be either shape — at test SF AQE broadcasts it too)
    assert(fin.contains("BroadcastHashJoin"),
      s"the backoff vocab probe must broadcast:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"no all-pairs shape belongs in LM scoring:\n$p")
    // the per-doc mean combines map-side before its exchange
    assert(p.contains("partial_count") || p.contains("partial_avg") ||
      p.contains("partial_sum"),
      s"the per-doc aggregate must combine map-side:\n$p")
  }

  test("L47: the weighted race is TakeOrdered, never a global sort") {
    val p = plan(LlmQueries.l47_weighted_sample)
    assert(p.contains("TakeOrderedAndProject"),
      s"the k-smallest-clock race must plan as per-partition bottom-k:\n$p")
  }

  test("L46: the bottom-k sample is TakeOrdered, never a global sort") {
    val p = plan(LlmQueries.l46_sample_quantiles)
    assert(p.contains("TakeOrderedAndProject"),
      s"sort+limit must plan as per-partition bottom-k + merge:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"no global sort exchange belongs in a bottom-k sample:\n$p")
  }

  test("L49: per-group bottom-k is WindowGroupLimit + ONE hash exchange") {
    val p = plan(LlmQueries.l49_group_quantiles)
    assert(p.contains("WindowGroupLimit"),
      s"the rank<=k filter must plan as a group-limit, not a full group sort:\n$p")
    // Partial mode caps each (partition, group) at k rows BEFORE the
    // exchange — the map-side half of the mergeable bottom-k
    assert(p.contains("Partial") && p.contains("Final"),
      s"group-limit must run in both Partial and Final modes:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(exchanges == 1,
      s"the sample aggregate must reuse the window's partitioning — " +
        s"expected exactly 1 hash exchange, got $exchanges:\n$p")
  }

  test("L214/L215: the funnel engine is SINGLE-PASS (VERDICT r17 #2) — " +
      "ONE events scan feeds every stage, no per-stage joins, and both " +
      "the per-user fold input and the step counts combine map-side") {
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
    val df = LlmQueries.funnelCounts(ev, Seq("view", "click", "purchase"),
      None)
    df.collect()
    // count in the FINAL plan only — the AQE string repeats the tree
    // under "== Initial Plan ==" and would double every scan
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.split("FileScan parquet").length - 1 == 1,
      s"the r17 stage-recompute shape re-scanned events ~k(k+1)/2 " +
        s"times; the fold form reads it ONCE:\n$p")
    assert(!fin.contains("Join"),
      s"no per-stage joins — the chronological fold replaces the " +
        s"shrinking-join chain:\n$p")
    assert(fin.contains("partial_collect_list"),
      s"the per-user event list must combine map-side:\n$p")
    assert(fin.contains("partial_sum"),
      s"the k step counts must combine map-side into one row:\n$p")
    assert(fin.contains("PushedFilters: [In(event_type"),
      s"the funnel-type filter must reach the parquet scan:\n$p")
  }

  test("L217: the segmented funnel keeps the single-pass shape — ONE " +
      "events scan, ZERO joins (the md5 segment is a projection of the " +
      "fold's own user_id, never a dimension attach), map-side combines " +
      "on both the per-user fold input and the per-segment counts") {
    val df = LlmQueries.l217_segmented_funnel.fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.split("FileScan parquet").length - 1 == 1,
      s"one events scan feeds every segment's every stage:\n$p")
    assert(!fin.contains("Join"),
      s"segment must project from user_id — no join anywhere:\n$p")
    assert(fin.contains("partial_collect_list"),
      s"the per-user event list must combine map-side:\n$p")
    assert(fin.contains("partial_sum"),
      s"per-segment step counts must combine map-side:\n$p")
    assert(fin.contains("PushedFilters: [In(event_type"),
      s"the funnel-type filter must reach the parquet scan:\n$p")
  }

  test("L216: the gap median routes through the histogram engine — NO " +
      "value-buffering percentile aggregate anywhere in the plan " +
      "(VERDICT r18 #3: grouped percentile() holds every group value " +
      "in one task's buffer — a one-task OOM at 10^9 converting users)") {
    val df = LlmQueries.l216_funnel_gaps.fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("percentile"),
      s"the median must come from ops/Stats' histogram refinement, " +
        s"never a value-buffering percentile aggregate:\n$p")
    // the engine's output folds back as literals — the plan's only
    // aggregates over the gap frame are count/avg (map-combinable)
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      s"the mean must combine map-side:\n$p")
  }

  test("D25: the grouped quantile sketch's rank<=256 literal cut is " +
      "WindowGroupLimit in Partial+Final — no task holds a group's full " +
      "value set") {
    val p = plan(ExtQueries.d25_group_quantile_sketch)
    assert(p.contains("WindowGroupLimit"),
      s"the rank<=k filter must plan as a group-limit:\n$p")
    assert(p.contains("Partial") && p.contains("Final"),
      s"group-limit must run map-side (Partial) before the exchange:\n$p")
  }

  test("L50: line-df map-combines; the frequent-line anti join broadcasts") {
    val p = finalPlan(LlmQueries.l50_line_dedup)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count"),
      s"the line-df aggregate must combine map-side before its exchange:\n$p")
    assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(fin).isDefined,
      s"the boilerplate-scale frequent set must broadcast into the anti join:\n$p")
    assert(!fin.contains("CartesianProduct"), s"no cartesian belongs here:\n$p")
  }

  test("L51: the vocab id attach broadcasts — no shuffle join touches the corpus side") {
    val p = finalPlan(LlmQueries.l51_token_ids)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the vocab-sized id table must broadcast into the subword stream:\n$p")
    // the final doc_id attach may plan as it likes on doc-sized frames;
    // the subword-stream join must not be a sort-merge on `sub`
    assert(!"SortMergeJoin.*\\bsub\\b".r.findFirstIn(fin).isDefined,
      s"no shuffle join may key the corpus-scale subword stream:\n$p")
    assert(fin.contains("partial_"),
      s"the vocab distinct must combine map-side:\n$p")
  }

  test("L52: the frozen edge table broadcasts; bin counts combine map-side") {
    val p = finalPlan(LlmQueries.l52_drift_psi)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the #types×9 edge table must broadcast into the event scan:\n$p")
    assert(fin.contains("partial_sum"),
      s"the (type, bin) count must combine map-side before its exchange:\n$p")
    assert(!fin.contains("CartesianProduct"), s"no cartesian belongs here:\n$p")
  }

  test("L53: the eval set broadcasts as one row — zero corpus shuffles, no window") {
    val p = finalPlan(LlmQueries.l53_embed_decon)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastNestedLoopJoin") || fin.contains("BroadcastHashJoin"),
      s"the one-row eval frame must broadcast into the corpus scan:\n$p")
    assert(!fin.contains("hashpartitioning"),
      s"decon against a small eval set needs NO corpus exchange:\n$p")
    assert(!fin.contains("Window"),
      s"the per-row array_max replaces the rank window:\n$p")
  }

  test("L54: the datasheet aggregate combines map-side on the grid key") {
    val p = finalPlan(LlmQueries.l54_corpus_datasheet)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"the (lang, source) grid aggregate must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"stage frames attach by doc_id equi-join, never a cartesian:\n$p")
  }

  test("L55: frozen edges fold in as literals — joinless live path, map-side counts") {
    val p = finalPlan(LlmQueries.l55_psi_weekly)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count"),
      s"the (week, bin) count must combine map-side:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("BroadcastHashJoin") &&
      !fin.contains("CartesianProduct"),
      s"the live scoring path probes literal edges — no join belongs here:\n$p")
  }

  test("L56: the diff is one aggregation — no join operator, map-side combine") {
    val p = finalPlan(LlmQueries.l56_snapshot_diff)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Join"),
      s"the version diff folds a union, never joins two shuffled sides:\n$p")
    assert(fin.contains("partial_max"),
      s"the per-id fold must combine map-side before its one exchange:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges == 1,
      s"one union-wide exchange is the whole shuffle budget, got $exchanges:\n$p")
  }

  test("L45: passage chunking is a pure per-row scan — no key shuffle, no join") {
    val p = plan(LlmQueries.l45_passage_chunks)
    assert(!p.contains("hashpartitioning"),
      s"chunk construction is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in a per-row scan:\n$p")
  }

  test("L48: BPE encode is a pure per-row scan — merge rules fold in as literals") {
    val p = plan(LlmQueries.l48_bpe_encode)
    assert(!p.contains("hashpartitioning"),
      s"encoding is per-row (no vocab build, no merge-table join); " +
        s"only the result sort may exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"the merge rules are literals in the fold — no join belongs here:\n$p")
  }

  test("L57: the query+probe set broadcasts; only the band survivors reach the rank window") {
    val p = finalPlan(LlmQueries.l57_hard_negatives)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastNestedLoopJoin") || fin.contains("BroadcastHashJoin"),
      s"the query set (with probe lists) must broadcast into the corpus side:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"mining must never shuffle-join or cross the corpus:\n$p")
    // band filter sits UNDER the window: the only qid exchange feeds the
    // top-k rank over band survivors, not the raw candidate set
    assert("Exchange hashpartitioning\\(qid".r.findAllMatchIn(fin).size == 1,
      s"exactly one exchange (the per-query rank window) is the shuffle budget:\n$p")
    assert(fin.indexOf("cos") < fin.length && fin.contains("Window"),
      s"the per-query top-k is a rank window:\n$p")
  }

  test("L58: markup strip is a pure per-row regex scan — no key shuffle, no join") {
    val p = plan(LlmQueries.l58_markup_strip)
    assert(!p.contains("hashpartitioning"),
      s"extraction is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"no join belongs in a per-row scan:\n$p")
  }

  test("L59: per-group bottom-k is WindowGroupLimit; pair algebra broadcasts k-row sketches") {
    val p = finalPlan(LlmQueries.l59_overlap_matrix)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("WindowGroupLimit"),
      s"the rank<=k cut must cap partitions map-side before the group exchange:\n$p")
    assert(fin.contains("BroadcastNestedLoopJoin") || fin.contains("BroadcastHashJoin"),
      s"the L-row sketch frame must broadcast into the pair join:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"nothing corpus-sized may reach the pairwise stage:\n$p")
  }

  test("L60: the manifest is one map-combinable shard aggregate — no join, no window") {
    val p = finalPlan(LlmQueries.l60_shard_manifest)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"manifest state must combine map-side before the shard exchange:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"a manifest is a single aggregation pass:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges == 1,
      s"one shard exchange is the whole shuffle budget, got $exchanges:\n$p")
  }

  test("L61: the weight table broadcasts; two metadata exchanges, never a global sort") {
    val p = finalPlan(LlmQueries.l61_mixture_interleave)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the 5-row weight table must broadcast into the scan:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"no shuffle join may touch the corpus:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges == 2,
      s"(shard,lang) rank + shard position are the whole shuffle budget, " +
        s"got $exchanges:\n$p")
    assert(!fin.contains("Exchange SinglePartition") &&
      !"Sort \\[vt".r.findFirstIn(fin).exists(_ => fin.contains("Exchange rangepartitioning(vt")),
      s"the interleave must never funnel through a single-task global sort:\n$p")
  }

  test("L62: the type count combines map-side; the top-1000 cut is TakeOrdered, no window") {
    val p = finalPlan(LlmQueries.l62_zipf_audit)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count"),
      s"the vocabulary count must combine map-side:\n$p")
    assert(fin.contains("TakeOrderedAndProject"),
      s"the top-N cut must be per-partition top-k + merge, never a global sort:\n$p")
    assert(!fin.contains("Window"),
      s"no rank window belongs in the audit — ranks come from the bounded array:\n$p")
  }

  test("L63: only length metadata shuffles — no text column past the scan, no join") {
    val p = finalPlan(LlmQueries.l63_length_batches)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Join"), s"batch assembly is windows + one aggregate:\n$p")
    val exchanges = fin.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text")),
      s"the text column must be projected away before any exchange:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_max"),
      s"the per-batch aggregate must combine map-side:\n$p")
  }

  test("L64: the audit is a joinless codegen scan + one lang aggregate") {
    val p = finalPlan(LlmQueries.l64_tokenizer_audit)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Join"),
      s"the merge table folds in as literals — no join belongs here:\n$p")
    assert(!fin.contains("Window"), s"no rank window belongs in the audit:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"the per-lang aggregate must combine map-side:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges == 1,
      s"one #langs exchange is the whole shuffle budget, got $exchanges:\n$p")
  }

  test("L65: only skinny gram rows shuffle; the per-doc count combines map-side") {
    val p = finalPlan(LlmQueries.l65_novelty_audit)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"), s"no cartesian belongs here:\n$p")
    val exchanges = fin.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text")),
      s"text must be projected away before any exchange:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"the per-doc novelty count must combine map-side:\n$p")
  }

  test("L66: the ladder is a pure per-row scan — no shuffle, no join, no fit pass") {
    val p = plan(LlmQueries.l66_scaling_ladder)
    assert(!p.contains("hashpartitioning"),
      s"rung assignment is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"one codegen'd scan materializes the whole ladder:\n$p")
  }

  test("L67: the probe pick is WindowGroupLimit behind ONE cell exchange") {
    val p = finalPlan(LlmQueries.l67_qa_probes)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("WindowGroupLimit"),
      s"rank<=k must cap partitions map-side before the exchange:\n$p")
    assert(!fin.contains("Join"), s"no join belongs in a sample pick:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges == 1, s"one cell exchange is the budget, got $exchanges:\n$p")
  }

  test("L69: the blocklist folds in as literals — pure per-row scan, no shuffle") {
    val p = plan(LlmQueries.l69_blocklist_filter)
    assert(!p.contains("hashpartitioning"),
      s"the page cut is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"),
      s"a word blocklist is a literal probe, never a join:\n$p")
  }

  test("L70: margin routing is the same per-row scan l2 pays — no shuffle, no join") {
    val p = plan(LlmQueries.l70_langid_margin)
    assert(!p.contains("hashpartitioning"),
      s"routing is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"), s"marker lists are literals, never a join:\n$p")
  }

  test("L71: two manifest aggregates + an 8-row join — no doc-level comparison") {
    val p = finalPlan(LlmQueries.l71_release_delta)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"both manifests must combine map-side:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"the delta joins 8-row manifests, never doc rows:\n$p")
  }

  test("L72: within-doc dedup is a pure per-row scan — no corpus pass at all") {
    val p = plan(LlmQueries.l72_withindoc_dedup)
    assert(!p.contains("hashpartitioning"),
      s"the echo cut needs no corpus statistics; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a per-row scan:\n$p")
  }

  test("L73: the recall monitor folds two top-5 frames — no cartesian, one final row") {
    val p = finalPlan(LlmQueries.l73_ann_recall)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"),
      s"the comparison joins per-query top-5 frames on (qid, vec_id):\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"the one-row fold must combine map-side:\n$p")
  }

  test("L74: truncation is a pure per-row slice — no shuffle, no join") {
    val p = plan(LlmQueries.l74_truncate_middle)
    assert(!p.contains("hashpartitioning"),
      s"the cut is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a per-row scan:\n$p")
  }

  test("L75: template rendering is a pure per-row scan — no shuffle, no join") {
    val p = plan(LlmQueries.l75_chat_template)
    assert(!p.contains("hashpartitioning"),
      s"rendering is per-row; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a per-row scan:\n$p")
  }

  test("L76: the router composes all three signals in ONE per-row pass — no joins") {
    val p = plan(LlmQueries.l76_quality_router)
    assert(!p.contains("hashpartitioning"),
      s"signals are row-local; only the result sort may exchange:\n$p")
    assert(!p.contains("Join"),
      s"composing by doc_id joins would shuffle the corpus three times:\n$p")
  }

  test("L77: the profile is grid-sized aggregation over the label frame — no corpus join") {
    // the label input is the session-shared CC frame (lineage already cut
    // by Graph's localCheckpoint, so it appears as a scan, not a rebuild
    // of the pair pipeline); this pin guards the aggregation shape
    val p = finalPlan(LlmQueries.l77_dup_profile)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"the size histogram must combine map-side:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"nothing corpus-scale may join here:\n$p")
    assert(!fin.contains("graft_sorted_intersect_count"),
      s"the pair verify pipeline must NOT be re-run inside the profile:\n$p")
  }

  test("L78: the split manifest is a pure per-row scan — no shuffle, no quota walk") {
    val p = plan(LlmQueries.l78_split_manifest)
    assert(!p.contains("hashpartitioning"),
      s"membership is per-row integer arithmetic; only the result sort may exchange:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"stratification needs no per-language quota pass:\n$p")
  }

  test("L79: split labels compute per-row ON the pair frame — no manifest join") {
    val p = finalPlan(LlmQueries.l79_split_leakage)
    val fin = p.split("== Initial Plan ==")(0)
    // the pair frame arrives through the session cache; its own BUILD plan
    // (rendered inside the InMemoryRelation) legitimately joins — the
    // audit QUERY above that boundary must not
    val query = fin.split("InMemoryRelation")(0)
    assert(query.contains("InMemoryTableScan"),
      s"the pair evidence must come from the session cache:\n$p")
    assert(!query.contains("Join"),
      s"split membership is a function of doc_id — joining a corpus-sized manifest would be the bug:\n$p")
    assert(query.contains("partial_min"),
      s"the evidence-partner pick must combine map-side:\n$p")
  }

  test("L41: the temperature budget table broadcasts like L36's") {
    val p = finalPlan(LlmQueries.l41_temperature_sample)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the #langs-row epochs/remainder attach must broadcast:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"no shuffle join may touch the corpus scan:\n$p")
  }

  test("L81: the Pareto keep decision is per-row over the quality cache — no shuffle, no join") {
    val p = finalPlan(LlmQueries.l81_pareto_filter)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("InMemoryTableScan"),
      s"the scores must ride the shared l15 cache:\n$p")
    assert(!fin.contains("Join"),
      s"one md5 + one pow per row — never a join:\n$p")
    assert(!fin.contains("hashpartitioning"),
      s"the keep rule is per-row; only the result sort may exchange:\n$p")
  }

  test("L82: the 9-threshold sweep is ONE map-combinable aggregate pass") {
    val p = finalPlan(LlmQueries.l82_classifier_pr)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_sum") || fin.contains("partial_count"),
      s"all 18 conditional sums must combine map-side in one pass:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"the sweep is one aggregate + 9-row assembly, never a join or rank window:\n$p")
    assert(!fin.contains("Exchange hashpartitioning"),
      s"a single-row reduce exchanges once to one partition, never by key:\n$p")
  }

  test("L83/L84: the training-pair transforms are pure per-row scans — no shuffle, no join") {
    for (q <- Seq(LlmQueries.l83_fim_transform, LlmQueries.l84_span_corruption)) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"),
        s"${q.name}: cuts/spans are per-row hash arithmetic; only the result sort may exchange:\n$p")
      assert(!p.contains("Join") && !p.contains("Window"),
        s"${q.name}: no join or window belongs in a per-row transform:\n$p")
    }
  }

  test("L85: int8 quantization is a pure per-row scan — no fit pass, no shuffle, no join") {
    val p = plan(LlmQueries.l85_int8_quant)
    assert(!p.contains("hashpartitioning"),
      s"symmetric per-vector scaling needs no calibration pass; only the result sort may exchange:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"no join or window belongs in a per-row quantizer:\n$p")
  }

  test("L86: calibration is one map-combinable grid aggregate over the quality cache") {
    val p = finalPlan(LlmQueries.l86_calibration)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_sum") || fin.contains("partial_count"),
      s"the bin sums must combine map-side:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"a reliability table is one aggregate, never a join or window:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(exchanges <= 1, s"one ≤10-key bin exchange is the budget, got $exchanges:\n$p")
  }

  test("L80: frozen-model scoring is a pure per-row scan over the quality cache") {
    val p = finalPlan(LlmQueries.l80_quality_classifier)
    val fin = p.split("== Initial Plan ==")(0)
    // the l15 metric frame arrives through the session cache (the
    // cachebuild:quality line); the scoring query above it is four
    // multiply-adds + one exp per row — no join (the model is literals,
    // not a table), no aggregation, no shuffle but the result sort
    assert(fin.contains("InMemoryTableScan"),
      s"the features must come from the shared l15 cache, not a re-scan:\n$p")
    assert(!fin.contains("Join"),
      s"a frozen linear model folds in as literals, never a join:\n$p")
    assert(!fin.contains("hashpartitioning"),
      s"scoring is per-row; only the result sort may exchange:\n$p")
  }

  test("L87: cluster-balanced sample rides the cached assignment; one bucket " +
      "exchange; the cluster-count side input broadcasts as one row") {
    val p = finalPlan(LlmQueries.l87_cluster_sample)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("InMemoryTableScan"),
      s"the argmax buckets must come from the shared assignment cache:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"the one-row count attaches as a broadcast, never a cartesian:\n$p")
    assert(fin.contains("BroadcastNestedLoopJoin") || fin.contains("BroadcastExchange"),
      s"the n_clusters side input must broadcast:\n$p")
    // count only the query's own exchanges — the printed InMemoryRelation
    // subtree repeats the (already-materialized) quantizer-fit groupBys
    val own = fin.split("InMemoryRelation")(0)
    val bucketEx = "Exchange hashpartitioning\\(bucket".r.findAllMatchIn(own).size
    assert(bucketEx <= 1,
      s"the per-cluster rank is ONE skinny metadata exchange, got $bucketEx:\n$p")
  }

  test("L88: outlier prune rides the cached assignment + broadcast fit; the " +
      "rank and count windows share one bucket exchange") {
    val p = finalPlan(LlmQueries.l88_centroid_outliers)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("InMemoryTableScan"),
      s"assignment and quantizer fit must come from the session caches:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"the one-row fit attaches as a broadcast, never a cartesian:\n$p")
    // see L87 — exclude the printed cached-subtree exchanges
    val own = fin.split("InMemoryRelation")(0)
    val bucketEx = "Exchange hashpartitioning\\(bucket".r.findAllMatchIn(own).size
    assert(bucketEx <= 1,
      s"rank and count share ONE bucket exchange, got $bucketEx:\n$p")
    assert(!own.contains("SortMergeJoin"),
      s"no corpus-side shuffle join belongs in a per-row centroid probe:\n$p")
  }

  test("L89: the quota ledger is one skinny source exchange — the ledger " +
      "aggregate rides the window's partitioning, and text never shuffles") {
    val p = finalPlan(LlmQueries.l89_source_cap)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Join"), s"a quota ledger joins nothing:\n$p")
    val srcEx = "Exchange hashpartitioning\\(source".r.findAllMatchIn(fin).size
    assert(srcEx == 1,
      s"cumsum window + ledger agg must share ONE source exchange, got $srcEx:\n$p")
    assert(!fin.contains("text#") || !fin.contains("ReadSchema: struct<text"),
      s"only (source, doc_id, n_chars) metadata may reach the exchange:\n$p")
  }

  test("L90: the LM probe broadcasts and the per-doc aggregate map-combines — " +
      "the corpus never shuffles for scoring") {
    val p = finalPlan(LlmQueries.l90_moore_lewis)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the vocab-probe scoring join must broadcast:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"token and per-doc aggregates must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"the one-row totals attach as a broadcast, never a cartesian:\n$p")
  }

  test("L91: the invisible-character scrub is a pure per-row scan — no " +
      "exchange but the result sort, no join, no window, no aggregate") {
    val p = finalPlan(LlmQueries.l91_invisible_scrub)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("hashpartitioning"),
      s"a per-row scrub must not exchange:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"no join or window belongs in a character scrub:\n$p")
  }

  test("L92: the mixed-script audit is per-row HOFs — no exchange but the " +
      "result sort, no join, no aggregate (the per-doc count needs no groupBy " +
      "because a doc's tokens live in one row)") {
    val p = finalPlan(LlmQueries.l92_mixed_script)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("hashpartitioning"),
      s"a per-row audit must not exchange:\n$p")
    assert(!fin.contains("Join") && !fin.contains("HashAggregate"),
      s"no join or aggregate belongs in a per-row token test:\n$p")
  }

  test("L93: the Heaps audit's corpus work is one type-level exchange — the " +
      "rung is computed inline (no join against the ladder frame)") {
    val p = finalPlan(LlmQueries.l93_heaps_audit)
    val fin = p.split("== Initial Plan ==")(0)
    val tokEx = "Exchange hashpartitioning\\(tok".r.findAllMatchIn(fin).size
    assert(tokEx == 1,
      s"exactly ONE type-level exchange is the corpus budget, got $tokEx:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_min"),
      s"the type aggregate must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"the 4-row grid combine must never cartesian the corpus:\n$p")
  }

  test("L94: the agreement audit is ONE map-combinable aggregate over the " +
      "cached quality frame — no join, no window, no second pass") {
    val p = finalPlan(LlmQueries.l94_filter_agreement)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("InMemoryTableScan"),
      s"the decisions must come from the shared quality cache:\n$p")
    assert(fin.contains("partial_sum") || fin.contains("partial_count"),
      s"the confusion cells must combine map-side:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"one grid aggregate, never a join or window:\n$p")
  }

  test("L95: every convergence round is a broadcast-assign scan + map-combined " +
      "refinement — never a cartesian, and only metadata joins") {
    val p = finalPlan(LlmQueries.l95_kmeans_convergence)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"),
      s"the one-row cents frames attach as broadcasts:\n$p")
    assert(fin.contains("partial_avg") || fin.contains("partial_sum"),
      s"centroid refinement must combine map-side:\n$p")
    assert(fin.contains("BroadcastNestedLoopJoin") || fin.contains("BroadcastExchange"),
      s"assignment reads the cents via broadcast:\n$p")
  }

  test("L96: the weekly CM sketch is one map-combinable grid aggregate — " +
      "cells combine before the exchange, no join, no window function") {
    val p = finalPlan(LlmQueries.l96_weekly_cm_sketch)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count"),
      s"counter cells must combine map-side (the mergeable-sketch property):\n$p")
    assert(!fin.contains("Join"), s"a sketch build joins nothing:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(ex <= 1, s"one (week, r, c) exchange is the budget, got $ex:\n$p")
  }

  test("L97: incremental dedup probes the base inverted index as an equi-join " +
      "on shingle hashes — never a cartesian, never all-pairs") {
    val p = finalPlan(LlmQueries.l97_incremental_dedup)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"),
      s"the candidate join must block on shingle hashes:\n$p")
    assert("hashpartitioning\\(sng|hashpartitioning\\(.*sng".r
        .findAllMatchIn(fin).nonEmpty || fin.contains("sng"),
      s"the inverted-index probe must key on the shingle hash:\n$p")
  }

  test("L98: session sequences broadcast the vocab — the events never " +
      "shuffle for the id join, only for the session window itself") {
    val p = finalPlan(LlmQueries.l98_session_sequences)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the enum-sized type vocabulary must broadcast:\n$p")
    assert(!fin.contains("SortMergeJoin"),
      s"no corpus-side shuffle join belongs in an id-encode:\n$p")
    assert(!fin.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("L100: BM25 never hash-shuffles the corpus — stats reduce to one " +
      "broadcast row, scoring is a codegen scan, top-20 is TakeOrdered") {
    val p = finalPlan(LlmQueries.l100_bm25_topk)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("TakeOrderedAndProject"),
      s"the top-20 must be a TakeOrdered, never a global sort:\n$p")
    assert(!fin.contains("Exchange hashpartitioning"),
      s"the only exchange is the one-row stats SinglePartition — the " +
        s"corpus must never hash-shuffle:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"the stats row attaches as a broadcast:\n$p")
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"N/avgdl/df must combine map-side:\n$p")
  }

  test("L101: the KN fit tables aggregate ONE shared (p,c) exchange and " +
      "the vocab-sized tables attach as broadcasts") {
    val p = finalPlan(LlmQueries.l101_kneser_ney)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"prefix/continuation tables must broadcast:\n$p")
    assert(!fin.contains("CartesianProduct"),
      s"the one-row N1+(..) frame attaches as a broadcast:\n$p")
    assert(fin.contains("ReusedExchange"),
      s"pref/cont/npp must reuse the b2 (p,c) exchange, not rescan the " +
        s"corpus per fit table:\n$p")
  }

  test("L102: entropy is a single-pass per-row scan — no hash exchange, " +
      "no join, no window") {
    val p = finalPlan(LlmQueries.l102_char_entropy)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Exchange hashpartitioning"),
      s"per-row entropy must not shuffle the corpus:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"no join or window belongs in a per-row audit:\n$p")
  }

  test("L103: distinct-n aggregates partially before its gram exchange — " +
      "type-level rows only, no join") {
    val p = finalPlan(LlmQueries.l103_distinct_ngrams)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count"),
      s"counts must combine map-side:\n$p")
    assert(!fin.contains("Join"), s"a diversity audit joins nothing:\n$p")
    val ex = "Exchange hashpartitioning".r.findAllMatchIn(fin).size
    assert(ex <= 2,
      s"(source,n,gram) dedup + (source,n) rollup is the exchange budget, got $ex:\n$p")
  }

  test("L104: the DoReMi corpus side is one skinny join + one map-combined " +
      "domain aggregate — the iteration never touches the corpus") {
    val df = LlmQueries.doremiLosses(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_avg") || fin.contains("partial_sum"),
      s"per-source losses must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("L105: each PageRank round is an equi-join + map-combined sum — " +
      "no cartesian, n folds in as a literal") {
    // r19: the per-round localCheckpoint (which cut the 5-round recursive
    // replan — 1116 → ~275 tasks at sf0.1) hides round internals from the
    // final executed plan, so the ROUND transformation is pinned directly.
    import spark.implicits._
    val ed = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("a", "b", "deg")
    val ranks = Seq((1L, 0.5), (2L, 0.5)).toDF("node", "pr")
    val round = LlmQueries.pagerankRound(ed, ranks, 2.0)
    round.collect()
    val p = round.queryExecution.executedPlan.toString
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"),
      s"contributions must flow through equi-joins:\n$p")
    assert(fin.contains("partial_sum"),
      s"rank contributions must combine map-side:\n$p")
    // n is a folded LITERAL in the round projection — no per-round
    // broadcast crossJoin of a one-row n frame remains
    assert(!fin.contains("BroadcastNestedLoopJoin"),
      s"no n-frame attach join may remain in the round:\n$p")
    // and the full query still runs cartesian-free end to end
    val fp = finalPlan(LlmQueries.l105_pair_pagerank)
    assert(!fp.split("== Initial Plan ==")(0).contains("CartesianProduct"),
      s"the l105 consumer must stay cartesian-free:\n$fp")
  }

  test("L106: CUSUM's only corpus exchange is the weekly aggregate; the " +
      "recursion is an array fold, never a corpus window or join") {
    val p = finalPlan(LlmQueries.l106_cusum_drift)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_avg"),
      s"weekly means must combine map-side:\n$p")
    // a ReusedExchange line quotes its target's "Exchange hashpartitioning"
    // text — count only lines that ARE an exchange, not references to one
    val ex = fin.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") &&
        !l.contains("ReusedExchange"))
    assert(ex <= 1, s"one weekly exchange is the budget, got $ex:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("Window"),
      s"the fold rides a broadcast, not a join or window:\n$p")
  }

  test("L107: the routed ADC scan rides the cached IVF assignment, the " +
      "codebook and query probe set broadcast — codes never shuffle-join") {
    val p = finalPlan(LlmQueries.l107_pq_adc)
    val fin = p.split("== Initial Plan ==")(0)
    // codes + buckets + probes all come off the cached full-ranking
    // assignment (rankedAssignedCached) — the IVF-PQ serving shape: no
    // re-fit, no corpus self-join
    assert(fin.contains("InMemoryTableScan") || fin.contains("TableCacheQueryStage"),
      s"the search must read the cached IVF assignment:\n$p")
    assert(fin.contains("BroadcastNestedLoopJoin") ||
      fin.contains("BroadcastExchange"),
      s"the query set + probes must broadcast over the codes scan (the l7 probe shape):\n$p")
    assert(!fin.contains("CartesianProduct") && !fin.contains("SortMergeJoin"),
      s"nothing may shuffle-join in an ADC scan:\n$p")
  }

  test("L108: the tokenizer round is type-level — map-combined counts, " +
      "TakeOrdered top-40, the vocab attach is the only shuffle join") {
    val p = finalPlan(LlmQueries.l108_unigram_tokenizer)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"word/piece counts must combine map-side:\n$p")
    assert(fin.contains("TakeOrderedAndProject"),
      s"the top-40 must be a TakeOrdered, never a global sort:\n$p")
    assert(!fin.contains("CartesianProduct") && !fin.contains("Window"),
      s"no cartesian, no corpus window in an EM round:\n$p")
  }

  test("L109: takedown is one grid aggregate over the cached labels — " +
      "no corpus join, no re-run of the pair pipeline") {
    val p = finalPlan(LlmQueries.l109_takedown_propagation)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_count") || fin.contains("partial_sum"),
      s"cluster shrinkage must combine map-side:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("CartesianProduct"),
      s"nothing corpus-scale may join in a label aggregate:\n$p")
    assert(!fin.contains("graft_sorted_intersect_count"),
      s"the pair verify pipeline must NOT re-run here:\n$p")
  }

  test("L110: the loop detector is a single-pass per-row scan — no hash " +
      "exchange, no join, no window") {
    val p = finalPlan(LlmQueries.l110_loop_detector)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("Exchange hashpartitioning"),
      s"per-row detection must not shuffle the corpus:\n$p")
    assert(!fin.contains("Join") && !fin.contains("Window"),
      s"no join or window belongs in a per-row detector:\n$p")
  }

  test("D15: the hopping window is one map-combined aggregate over the " +
      "2x window expansion — no self-join of weekly frames") {
    val p = finalPlan(graft.queries.ExtQueries.d15_hopping_window)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("partial_avg") || fin.contains("partial_count"),
      s"the hop must combine map-side:\n$p")
    assert(!fin.contains("Join"),
      s"window(slide<length) expands rows, it must not self-join:\n$p")
    val ex = fin.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex <= 1, s"one window exchange is the budget, got $ex:\n$p")
  }

  test("L111: the agreement rides the two cached rankings — metadata joins " +
      "only, no corpus-scale shuffle") {
    val p = finalPlan(LlmQueries.l111_ann_agreement)
    val fin = p.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"),
      s"the 5-row frames join on (qid, vec_id):\n$p")
    assert(fin.contains("partial_sum") || fin.contains("partial_count"),
      s"depth intersections must combine map-side:\n$p")
  }

  test("L112: the LCS DP runs only on the cached pair frame — two skinny " +
      "id joins, no cartesian, no re-verify of the pair pipeline") {
    val p = finalPlan(LlmQueries.l112_common_substring)
    val fin = p.split("== Initial Plan ==")(0)
    // the pair frame arrives through the session cache; its BUILD plan
    // (rendered inside the InMemoryRelation) legitimately verifies — the
    // DP query above that boundary must not (the L79 boundary idiom)
    val query = fin.split("InMemoryRelation")(0)
    assert(query.contains("InMemoryTableScan"),
      s"the pair evidence must come from the session cache:\n$p")
    assert(!query.contains("CartesianProduct"),
      s"texts attach by equi-join, never all-pairs:\n$p")
    assert(!query.contains("graft_sorted_intersect_count"),
      s"the pair verify pipeline must NOT re-run in the DP query:\n$p")
  }

  test("L113: the split attaches labels as a broadcast and aggregates " +
      "map-side — the corpus never shuffles for the assignment") {
    val p = finalPlan(LlmQueries.l113_clustered_split)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("BroadcastHashJoin"),
      s"the tiny label frame must broadcast onto the docs scan:\n$p")
    assert(fin.contains("partial_count"),
      s"split counts must combine map-side:\n$p")
    assert(!fin.contains("CartesianProduct") && !fin.contains("SortMergeJoin"),
      s"no corpus-scale shuffle join in a split assignment:\n$p")
  }

  test("L99: the sampling table is TakeOrdered top-50 over a map-combined " +
      "type aggregate — never a global sort, never a corpus window") {
    val p = finalPlan(LlmQueries.l99_negative_sampling)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("TakeOrderedAndProject"),
      s"the top-50 must be a TakeOrdered, not a full sort + limit:\n$p")
    assert(fin.contains("partial_count"),
      s"type counts must combine map-side:\n$p")
    assert(!fin.contains("Window"), s"ranks come from the sorted array, " +
      s"never a corpus window:\n$p")
  }

  test("E9: the SHUFFLE_HASH hint holds — hash join per partition, no sort " +
      "on either side, and the strategy does not fall back") {
    val p = finalPlan(graft.queries.ExtQueries.e9_shuffle_hash_join)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("ShuffledHashJoin"),
      s"the hint must force the shuffled hash join:\n$p")
    assert(!fin.contains("SortMergeJoin") && !fin.contains("BroadcastHashJoin"),
      s"no silent strategy fallback:\n$p")
    assert(fin.contains("partial_count"),
      s"the aggregate must combine map-side above the join:\n$p")
  }

  test("D21: explicit grouping sets expand ONCE and aggregate with map-side " +
      "partials — never one scan per set") {
    val p = plan(graft.queries.ExtQueries.d21_grouping_sets)
    assert(p.contains("Expand"), s"grouping sets must be one Expand pass:\n$p")
    assert(p.split("FileScan parquet").length - 1 == 1,
      s"exactly ONE lineitem scan feeds all three sets:\n$p")
    assert(p.contains("partial_count"),
      s"the grouped aggregate must combine map-side:\n$p")
  }

  test("L144: Spearman touches the corpus once (joint histogram), ranks " +
      "join back broadcast, and every Window is partitioned") {
    val p = finalPlan(graft.queries.LlmQueries.l144_spearman)
    // the joint histogram is checkpointed after its single corpus pass —
    // the statistic's own plan re-reads CELLS (ExistingRDD), never parquet
    assert(p.split("FileScan parquet").length - 1 == 0 &&
      p.contains("ExistingRDD"),
      s"everything after the one-pass histogram must run on cells:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"rank assignment must come back as a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-sized join strategy anywhere:\n$p")
    // every Window must carry a partition spec (a bare global window
    // funnels everything through one task)
    p.split("\n").filter(_.trim.startsWith("Window ")).foreach { w =>
      assert(w.contains("[lang"), s"unpartitioned window in the plan: $w")
    }
  }

  test("L145: Kendall's pair enumeration runs on histogram cells — one " +
      "corpus scan, a broadcast cell self-join, never n^2 over rows") {
    val p = finalPlan(graft.queries.LlmQueries.l145_kendall_tau)
    assert(p.split("FileScan parquet").length - 1 <= 1,
      s"the joint histogram is the only corpus pass:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the cell self-join must broadcast (value-domain-sized):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the C/D join is an equi-join on lang, never a nested loop:\n$p")
  }

  test("C12: forward fill is a running frame over one hash exchange — " +
      "never a self-join against history") {
    val p = plan(graft.queries.ExtQueries.c12_forward_fill)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected the running-window form:\n$p")
    assert(!p.contains("Join"), s"LOCF must not self-join:\n$p")
    val exchanges = p.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 1,
      s"one exchange on the group key (got $exchanges):\n$p")
  }
}
