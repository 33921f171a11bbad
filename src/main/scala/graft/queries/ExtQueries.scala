package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operators BEYOND the reference's surface (SURVEY §2 marks the
  * G category "none in the reference"): the set-operation, window-frame,
  * grouping-set and compaction shapes any engine claiming drop-in
  * completeness meets on day one of real use. Each is declared with a
  * DuckDB oracle and ends in a total order (Q conventions).
  */
/** DuckDB SQL fragments that replay [[graft.ops.Hll]]'s register decode
  * from the md5 hex string in a column named `hx` — shared by
  * d13_hll_distinct and the streaming weekly approx-distinct's declared
  * batch row (LlmQueries). Layout per Hll's scaladoc: register index from
  * the low byte (hex chars 15-16 mod 64), rank from the trailing zeros of
  * hex chars 1-13 (bits 12-63). */
private[queries] object HllOracleSql {
  // trailing zeros within one hex digit v ∈ 1..15
  private def t4(v: String) =
    s"(CASE WHEN $v % 2 = 1 THEN 0 WHEN $v % 4 = 2 THEN 1 WHEN $v % 8 = 4 THEN 2 ELSE 3 END)"
  private def dig(i: Int) = s"(strpos('0123456789abcdef', substr(hx, $i, 1)) - 1)"
  /** rho = 1 + trailing zeros of bits 12-63 = hex chars 1-13, char 13
    * least significant (md5Hash64's layout, cf. l8's bit decode). */
  val rho: String = (13 to 1 by -1).map { i =>
    s"WHEN ${dig(i)} > 0 THEN ${4 * (13 - i)} + ${t4(dig(i))}"
  }.mkString("1 + CASE ", " ", " ELSE 52 END")
  /** register index j = low 6 bits. */
  val j: String = s"((${dig(15)}) * 16 + ${dig(16)}) % 64"
  /** the raw-HLL / linear-counting estimator over (zp = Σ 2^-mj of SEEN
    * registers, seen) — the same float expression tree Hll.estimate runs. */
  def estimate(zp: String, seen: String): String =
    s"""CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0 / ($zp + (64 - $seen)) <= 160.0
       |          AND 64 - $seen > 0
       |     THEN 64.0 * ln(64.0 / (64 - $seen))
       |     ELSE (0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0 / ($zp + (64 - $seen)) END""".stripMargin
}

object ExtQueries {

  /** G2: UNION (distinct) of two overlapping slices — Spark's
    * `union + distinct` is one shuffle with map-side combine; the overlap
    * (orders priced 50k-150k appear in both branches) makes the DISTINCT
    * semantics observable, not vacuous. */
  val g2_union = Q(
    "g2_union",
    """SELECT o_orderkey FROM orders WHERE o_totalprice < 150000
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_totalprice >= 50000
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    o.filter(col("o_totalprice") < 150000).select("o_orderkey")
      .union(o.filter(col("o_totalprice") >= 50000).select("o_orderkey"))
      .distinct()
      .orderBy("o_orderkey")
  }

  /** G3: EXCEPT — multiset-free set difference. Spark plans `except` as a
    * left-anti join over distinct rows; both sides here are key sets so the
    * distinct is free. */
  val g3_except = Q(
    "g3_except",
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    o.select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** G4: INTERSECT — customers holding BOTH an open and a finished order.
    * Spark plans `intersect` as a left-semi join over distinct rows. */
  val g4_intersect = Q(
    "g4_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** G5: EXCEPT ALL — the MULTISET difference g3's distinct form erases:
    * each duplicate occurrence counts, so a customer with three open and
    * one finished order keeps two rows (bag semantics — what an audit
    * reconciling row COUNTS needs, where EXCEPT would hide a double-load
    * that EXCEPT ALL exposes). Spark plans `exceptAll` with a per-row
    * count aggregate + generate (sum of signed multiplicities), one
    * shuffle on the row value — no row-by-row anti probe. */
  val g5_except_all = Q(
    "g5_except_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .exceptAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** G6: INTERSECT ALL — the multiset intersection: a value appearing m
    * times on one side and n on the other keeps min(m, n) rows. Same
    * signed-multiplicity aggregate shape as g5. */
  val g6_intersect_all = Q(
    "g6_intersect_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    o.filter(col("o_orderstatus") === "O").select("o_custkey")
      .intersectAll(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** E6: anti-join — customers with no high-value order (the
    * blocklist/tombstone subtraction every curation pipeline runs).
    * `left_anti` shuffles on the key like any equi-join and broadcasts
    * when the right side is small — never the NOT IN scan-per-row shape.
    * The 300k price cut keeps BOTH matched and unmatched customers
    * populated at every test SF (an unrestricted right side left zero
    * unmatched rows — a vacuous gate any empty-result bug would pass;
    * review finding r07). */
  val e6_anti_join = Q(
    "e6_anti_join",
    """SELECT c_custkey FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** F5: rolling window frame — 7-row trailing mean per supplier, the
    * time-series smoothing shape (reference's resample is tumbling; this
    * is the sliding ROWS BETWEEN form it lacks). One window sort per
    * supplier partition; the frame accumulates incrementally in both
    * engines, and the ORDER BY inside the frame is made total with the
    * (shipdate, orderkey, linenumber) tiebreak so the accumulation order
    * is engine-identical. */
  val f5_rolling_mean = Q(
    "f5_rolling_mean",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       round(avg(l_extendedprice) OVER (
      |         PARTITION BY l_suppkey
      |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_avg
      |FROM lineitem ORDER BY 1, 2, 3""".stripMargin
  ) { (s, d) => rollingMeanFrame(lineitem(s, d)) }

  /** The f5 window body over any lineitem-shaped frame — package-visible
    * so the totality spec can permute the input's row order and
    * partitioning and assert identical output. Totality argument: the
    * frame ORDER BY ends in l_extendedprice (ADVICE r07 — duplicated
    * (l_orderkey, l_linenumber) pairs may differ in price, and the
    * trailing mean accumulates in frame order), so any rows STILL tied
    * agree on every frame-visible value (the partition key, all sort
    * keys, and the aggregated price itself) — permuting them changes no
    * window's value multiset and the tied rows' own output rows are
    * identical, so the result is engine-order-proof. The outer ORDER BY
    * covers every output column: the synthetic lineitem duplicates
    * (l_orderkey, l_linenumber) pairs (review finding r07 — 11,785 tie
    * groups at sf0.01, NO column subset is unique at every SF), so the
    * only total order available is the full row — rows equal on all
    * columns are interchangeable under any hash. */
  private[graft] def rollingMeanFrame(li: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
      .rowsBetween(-6, Window.currentRow)
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      round(avg(col("l_extendedprice")).over(w), 6).as("roll_avg")
    ).orderBy("l_orderkey", "l_linenumber", "roll_avg")
  }

  /** C8: keep-latest compaction — one surviving row per customer: the
    * newest order, ties to the highest key (the CDC upsert-log → current-
    * state shape). Spark side is ONE map-side-combinable `max_by`
    * aggregate — no per-partition window sort, no row_number: at 100 TB
    * the agg form combines before the shuffle while the window form ships
    * every row. The oracle states the same thing as the standard
    * row_number()=1 window. */
  val c8_keep_latest = Q(
    "c8_keep_latest",
    """SELECT o_custkey, o_orderkey,
      |       strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
      |       o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |             row_number() OVER (PARTITION BY o_custkey
      |               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(max_by(
        struct(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("last"))
      .select(
        col("o_custkey"),
        col("last.o_orderkey").as("o_orderkey"),
        date_format(col("last.o_orderdate"), "yyyy-MM-dd").as("latest_date"),
        col("last.o_totalprice").as("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** D9: ROLLUP grouping sets — per (flag, status), per flag, and grand
    * total in ONE aggregation (Spark expands the grouping sets before the
    * shuffle; still map-side combinable). GROUPING() flags disambiguate
    * the subtotal rows from genuine values, and the 'ALL' coalesce keeps
    * every output column non-null for the hash compare. */
  val d9_rollup = Q(
    "d9_rollup",
    """SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |       coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY 1, 2, 3, 4""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      // grouping() must be evaluated IN the aggregate (it reads the
      // grouping-set id the Expand emits; after the agg the context is gone)
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .select(col("g_flag"), col("g_status"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty"))
      .orderBy("g_flag", "g_status", "flag", "status")
  }

  /** D21: explicit GROUPING SETS — the third member of the grouping-set
    * trio (D9 ROLLUP = hierarchical prefixes, D16 CUBE = all 2^n subsets):
    * a HAND-PICKED set list — both one-dimensional marginals plus the
    * full cross, but NO grand total — which neither rollup nor cube
    * states without waste. This is the 100 TB dashboard shape: enumerate
    * exactly the slices the report needs and pay one Expand×3 pass, not
    * a 2^n cube (the d16 scaladoc's own advice, now exercised as a
    * first-class operator via Spark 4's `Dataset.groupingSets`). Same
    * single-Expand + partial-aggregate plan family as d9/d16. */
  val d21_grouping_sets = Q(
    "d21_grouping_sets",
    """SELECT CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |       coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), (l_linestatus))
      |ORDER BY 1, 2, 3, 4""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .select(col("g_flag"), col("g_status"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty"))
      .orderBy("g_flag", "g_status", "flag", "status")
  }

  /** C12: forward fill (pandas `ffill` / LOCF) — the time-series
    * imputation shape the constant/median/mode fills (C1–C3) cannot
    * express: each null takes the LAST OBSERVED value of its group's
    * ordered history (here per customer in order-date order; ties broken
    * by key so the order is total — the F2 discipline). The canonical
    * gap-fill for sensor/CDC streams where a missing reading means "no
    * change", stated as `last(col, ignoreNulls)` over a running frame —
    * incremental frame accumulation, one hash exchange on the group key,
    * never a self-join against history. Nulls synthesized deterministically
    * (every 5th order, the c1 NULLIF idiom) so leading-edge nulls (no
    * prior observation → stays null) are exercised at every SF. */
  val c12_forward_fill = Q(
    "c12_forward_fill",
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate,
      |        CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS v
      |      FROM orders)
      |SELECT o_orderkey, o_custkey,
      |       last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM o ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("v",
        when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_totalprice")))
      .select(col("o_orderkey"), col("o_custkey"),
        last(col("v"), ignoreNulls = true).over(w).as("filled"))
      .orderBy("o_orderkey")
  }

  /** C13: SCD Type 2 history build — the slowly-changing-dimension
    * versioning every warehouse keeps for "what did this record say at
    * time t" queries (Kimball's Type 2: never update in place, close the
    * old row and open a new one): from a change log keyed by (entity,
    * change time), emit one row per VERSION with
    * [valid_from, valid_to) half-open validity — valid_to = the next
    * version's valid_from, null (open-ended) on the current row, plus
    * the version ordinal and an is_current flag. The c8/c11 family's
    * read-side complement: c8 keeps only the latest state, THIS keeps
    * the full history queryable by as-of timestamp (an e4 as-of join
    * against valid_from does exactly that).
    *
    * Change log here = purchase events per user (value = the changing
    * attribute). All three window functions (version, lead, flag) share
    * ONE spec — one hash exchange on user_id, one sort, zero self-joins
    * (the naive SCD2 build joins the log to itself on "next change";
    * lead() is that join for free). Total order (ts, event_id) — the f2
    * tie discipline. Timestamps serialize at full microsecond fidelity
    * (the e4/l13 convention). */
  val c13_scd2_history = Q(
    "c13_scd2_history",
    """WITH c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |           FROM events WHERE event_type = 'purchase')
      |SELECT user_id,
      |       CAST(row_number() OVER w AS BIGINT) AS version,
      |       value,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |       CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
      |FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
        date_format(lead(col("ts"), 1).over(w),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
        lead(col("ts"), 1).over(w).isNull.cast("long").as("is_current"))
      .orderBy("user_id", "version")
  }

  /** C14: single-pass column profile — the data-quality summary every
    * ingest run computes before anything downstream trusts the batch
    * (the Deequ/TFDV analyzer shape): per numeric column, row count,
    * null count, exact distinct count, min/max and 6-dp mean. The whole
    * point is the PASS COUNT: a naive profiler loops `for c in cols:
    * df.agg(...)` = k full scans; this computes every analyzer for every
    * column in ONE aggregate over ONE scan, then explodes the single
    * result row into the per-column report frame (driver-side shape: the
    * explode input is 1 row × k structs, never data).
    *
    * Plan note (the d22 lesson applies): the k count(DISTINCT c) columns
    * plan as ONE Expand (k+1 replicas: one per distinct group + one for
    * the plain min/max/sum/count battery) feeding a partial aggregate —
    * still a single FileScan, and every aggregate stays map-combinable
    * declarative (no imperative buffer beside the distincts, so the
    * hash-agg path survives). At 100 TB the exact-distinct column is the
    * knob you relax first: swap countDistinct for the d13 HLL sketch
    * (±2% — the d22 audit row quantifies exactly what that trade costs)
    * and the Expand disappears with it.
    *
    * Determinism: mean = exact DECIMAL(28,10) sum cast to double, THEN
    * one IEEE division by the non-null count and one 6-dp round — no
    * float summation order anywhere. Null counting is pinned on an
    * engineered frame in QueryHardeningSpec (the committed tables carry
    * no numeric nulls — the oracle verifies the zero, the spec verifies
    * the counter). */
  private val ProfileCols =
    Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  val c14_column_profile = Q(
    "c14_column_profile",
    ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
         |  round(CAST(sum(CAST($c AS DECIMAL(28,10))) AS DOUBLE) / count($c), 6)
         |    AS mean_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  ) { (s, d) => columnProfile(lineitem(s, d), ProfileCols) }

  /** c14's engine over any frame + numeric column list — factored so the
    * hardening spec can feed an engineered frame WITH nulls.
    *
    * r19 restructure (guide §1.2/§2.6): the single k-distinct aggregate
    * planned as ONE Expand — (k+1) row replicas feeding one partial
    * aggregate, which on a one-row-group test-SF scan ran entirely in a
    * single task (measured: 8.2 s wall, 11 tasks, ~1 core busy at
    * sf0.1). Now each column profiles in its own pair of branches (plain
    * battery + exact distinct — the d22 split-pass lesson: a distinct
    * beside other aggregates drags everything through the Expand), and
    * the 2k independent single-task stages schedule CONCURRENTLY inside
    * the one job, so wall ≈ the slowest single-column pass. Bytes read
    * are unchanged on a columnar store: k single-column scans prune to
    * exactly the k columns the old single scan read (this is the same
    * I/O, not the row-store "k full scans" trap the old scaladoc warned
    * about — that warning predates column pruning reaching the scan).
    * Values are identical aggregate-by-aggregate; the mean stays
    * exact-DECIMAL-sum → one IEEE division → round 6. Measured: 8.16 →
    * ~2.5 s wall at sf0.1, Expand gone from the plan. */
  private[graft] def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val plain = df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as(s"__nn"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"),
        sum(col(c).cast("decimal(28,10)")).cast("double").as(s"__sm"))
      val dist = df.agg(countDistinct(col(c)).as("n_distinct"))
      plain.crossJoin(dist).select(
        lit(c).as("col_name"),
        col("n_rows"),
        (col("n_rows") - col("__nn")).as("n_null"),
        col("n_distinct"),
        col("min_v"),
        col("max_v"),
        round(col("__sm") / col("__nn"), 6).as("mean_v"))
    }.reduce(_ unionAll _).orderBy("col_name")

  /** D23: exact weighted median per group — the sample-weights gap in the
    * quantile family (d11/d12/d19 are unweighted): the lower weighted
    * median (smallest x with 2·F(x) ≥ W) of price weighted by quantity,
    * the estimator a reweighted corpus (l42's soft-dedup weights, l47's
    * sampling weights) needs for any "median quality under weights"
    * question.
    *
    * Scale design — the ops/Stats histogram-refinement shape, expressed
    * declaratively in ONE level: (1) per-(group, value) DECIMAL weight
    * histogram (map-combinable — the only corpus pass); (2) an 8192-
    * bucket coarse cumulative per group (metadata window) locates the
    * crossing bucket; (3) the in-bucket window runs ONLY over that
    * bucket's distinct values (domain/8192 rows). No group ever funnels
    * its full value set through one task — the thing a naive
    * `PARTITION BY group ORDER BY x` cumsum does and d12's engine
    * exists to avoid; adversarial distributions (all mass in one
    * bucket's distinct values) recurse in ops/Stats — one level
    * suffices on a bounded price lattice.
    *
    * Determinism: weights and cumulative sums are exact DECIMAL; the
    * pick compare 2·cw ≥ W is decimal-exact (never a ratio); bucket
    * routing is float but only ROUTES — the picked value is defined by
    * the exact compare, so both engines agree even if a boundary value
    * lands in a neighbor bucket (the crossing bucket is found by the
    * same exact cumulative on both sides of the bucket edge). */
  val d23_weighted_median = Q(
    "d23_weighted_median",
    """WITH h AS (SELECT l_returnflag AS flag, l_extendedprice AS x,
      |             sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
      |           FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, x,
      |        sum(w) OVER (PARTITION BY flag ORDER BY x) AS cw,
      |        sum(w) OVER (PARTITION BY flag) AS tw FROM h)
      |SELECT flag, CAST(max(tw) AS DOUBLE) AS w_total,
      |       CAST(min(CASE WHEN 2 * cw >= tw THEN x END) AS DOUBLE) AS w_median
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    weightedMedianByGroup(lineitem(s, d), col("l_returnflag"),
      col("l_extendedprice"), col("l_quantity"))
      .orderBy("flag")
  }

  /** d23's engine over any (group, x, weight) columns. Lower weighted
    * median; exact DECIMAL compares; the two windows run over metadata-
    * sized frames (8192 coarse buckets; one bucket's distinct values). */
  private[graft] def weightedMedianByGroup(df: DataFrame, g: Column,
      x: Column, w: Column): DataFrame = {
    val h = df.select(g.as("flag"), x.cast("double").as("x"),
        w.cast("decimal(18,2)").as("w"))
      .groupBy("flag", "x").agg(sum("w").as("w"))
      .localCheckpoint(false) // stats + coarse + in-bucket all read it
    val st = h.groupBy("flag").agg(min("x").as("lo"), max("x").as("hi"),
      sum("w").as("tw"))
    val nb = 8192
    def bucketOf(xc: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0)).otherwise(
        least(lit(nb - 1), floor((xc - lo) / (hi - lo) * nb)).cast("int"))
    val hb = h.join(broadcast(st), Seq("flag"))
      .select(col("flag"), col("x"), col("w"), col("tw"),
        bucketOf(col("x"), col("lo"), col("hi")).as("b"))
    val coarse = hb.groupBy("flag", "b").agg(sum("w").as("bw"))
      .select(col("flag"), col("b"), col("bw"),
        (sum("bw").over(Window.partitionBy("flag").orderBy("b"))
          - col("bw")).as("before"))
    val target = coarse.join(broadcast(st.select(col("flag"), col("tw"))), Seq("flag"))
      .filter(lit(2) * (col("before") + col("bw")) >= col("tw"))
      .groupBy("flag").agg(min("b").as("tb"))
    val inB = hb.join(broadcast(target), Seq("flag"))
      .filter(col("b") === col("tb"))
    val before = coarse.join(broadcast(target), Seq("flag"))
      .filter(col("b") === col("tb")).select(col("flag"), col("before"))
    inB.join(broadcast(before), Seq("flag"))
      .select(col("flag"), col("x"), col("tw"),
        (col("before") + sum("w").over(
          Window.partitionBy("flag").orderBy("x"))).as("cw"))
      .filter(lit(2) * col("cw") >= col("tw"))
      .groupBy("flag").agg(max(col("tw")).cast("double").as("w_total"),
        min("x").as("w_median"))
  }

  /** E9: shuffled-hash join — the third physical equi-join strategy,
    * completing the surface (E2 broadcast, A6/F4 sort-merge): both sides
    * hash-exchange on the key and the smaller side BUILDS an in-memory
    * hash map per partition — no sort on either side, which beats SMJ
    * when one side is much smaller than the other but too big to
    * broadcast (the fact ⋈ mid-size-dim shape). Forced by the
    * SHUFFLE_HASH hint (hints outrank the broadcast threshold);
    * PlanShapeSpec pins ShuffledHashJoin in the executed plan. Result ≡
    * the plain join — strategy choice must never change the answer. */
  val e9_shuffle_hash_join = Q(
    "e9_shuffle_hash_join",
    """SELECT o_orderpriority,
      |       CAST(count(*) AS BIGINT) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'P'
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select("l_orderkey", "l_extendedprice")
      .join(orders(s, d).filter(col("o_orderstatus") === "P")
          .select("o_orderkey", "o_orderpriority").hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("rev"))
      .orderBy("o_orderpriority")
  }

  /** D10: distinct aggregation — suppliers and parts per return flag.
    * Spark plans multi-distinct as an Expand (one replica per distinct
    * set) + two-phase aggregate — distributed, never a per-group set
    * collected to one task. */
  val d10_distinct_agg = Q(
    "d10_distinct_agg",
    """SELECT l_returnflag,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))
      .orderBy("l_returnflag")
  }

  /** D11: exact multi-quantile — the full quantile_cont surface (p10-p90)
    * from the SAME shared histogram-refinement jobs as the median fills
    * (ops/Stats): one stats aggregate + one histogram + one pick job for
    * ALL quantiles together, no step buffering the column on one executor
    * (Spark's exact `percentile` is a single-buffer TypedImperativeAggregate
    * — an executor OOM at 100 TB). Linear interpolation ≡ DuckDB
    * quantile_cont / pandas Series.quantile. */
  val d11_quantiles = Q(
    "d11_quantiles",
    """SELECT CAST(pct AS DOUBLE) AS pct, round(val, 6) AS val FROM (
      |  SELECT 0.1 AS pct, quantile_cont(l_extendedprice, 0.1) AS val FROM lineitem
      |  UNION ALL SELECT 0.25, quantile_cont(l_extendedprice, 0.25) FROM lineitem
      |  UNION ALL SELECT 0.5, quantile_cont(l_extendedprice, 0.5) FROM lineitem
      |  UNION ALL SELECT 0.75, quantile_cont(l_extendedprice, 0.75) FROM lineitem
      |  UNION ALL SELECT 0.9, quantile_cont(l_extendedprice, 0.9) FROM lineitem)
      |ORDER BY pct""".stripMargin
  ) { (s, d) =>
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    // Stats.exactQuantiles owns the degenerate-input contract (None on
    // empty/all-null — never throws, never a NaN sentinel); a None here
    // becomes the oracle's NULL rows
    val vals = graft.ops.Stats.exactQuantiles(
      lineitem(s, d), col("l_extendedprice"), ps)
    import s.implicits._
    // HALF_UP ≡ DuckDB round() (half away from zero; values positive);
    // the checker's 1e-9 relative tolerance absorbs any boundary wobble
    ps.zipWithIndex.map { case (p, i) =>
      (p, vals.map(v => BigDecimal(v(i)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble): Option[Double])
    }.toDF("pct", "val").orderBy("pct")
  }

  /** D12: per-group exact median — the grouped form of D11, from the SAME
    * shared histogram-refinement jobs: each group is one predicated
    * MedianSpec (`when(grp = g, c)`), so ALL groups resolve in one stats
    * aggregate + one histogram + one pick job, and no executor ever
    * buffers a group's values (Spark's grouped `percentile` holds every
    * value of every group in its aggregation buffers — the 100 TB OOM).
    * Scale contract: the group KEY set must be modest (a spec per group
    * on the driver — fine for enum-like keys; past a few thousand groups
    * switch to [[graft.ops.Stats.groupQuantileWindowed]], the executor-
    * only two-pass form StatsProps pins value-identical to this one). */
  val d12_group_median = Q(
    "d12_group_median",
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price,
      |       CAST(count(l_extendedprice) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    val c = col("l_extendedprice")
    // Stats.groupQuantiles owns the group axis: null keys match via <=>,
    // an all-null group maps to None (the oracle's NULL median) — the
    // previous inline form threw on both (review finding r07)
    val meds = graft.ops.Stats.groupQuantiles(li, col("l_returnflag"), c, Seq(0.5))
    val counts = li.groupBy("l_returnflag").agg(count(c.cast("double")).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
    import s.implicits._
    counts.map { case (key, n) =>
      (key.orNull,
        meds(key).map(v => BigDecimal(v.head).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble): Option[Double],
        n)
    }.toSeq.toDF("l_returnflag", "med_price", "n")
      .orderBy("l_returnflag")
  }

  /** E7: full outer join — the reconciliation shape (both sides keep
    * unmatched rows). Spark plans it as a shuffled sort-merge join; the
    * per-side aggregates make unmatched rows on both sides observable. */
  val e7_full_outer_join = Q(
    "e7_full_outer_join",
    """SELECT coalesce(f.k, o.k) AS k,
      |       CAST(coalesce(f.n_f, 0) AS BIGINT) AS n_f,
      |       CAST(coalesce(o.n_o, 0) AS BIGINT) AS n_o
      |FROM (SELECT o_custkey AS k, count(*) AS n_f FROM orders
      |      WHERE o_orderstatus = 'F' GROUP BY 1) f
      |FULL OUTER JOIN
      |     (SELECT o_custkey AS k, count(*) AS n_o FROM orders
      |      WHERE o_orderstatus = 'O' GROUP BY 1) o
      |ON f.k = o.k
      |ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    val f = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_f"))
    val op = o.filter(col("o_orderstatus") === "O").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_o"))
    f.join(op, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("n_f"), lit(0L)).as("n_f"),
        coalesce(col("n_o"), lit(0L)).as("n_o"))
      .orderBy("k")
  }

  /** E15: coordinated-sample join — join STATISTICS from two tables at
    * O(k) cost, the cross-table payoff of the d24/d25 digest discipline
    * (Cohen & Kaplan 2007's coordinated sampling): because the sample is
    * keyed by md5(join key), the SAME k orders are selected no matter
    * which table, shard or snapshot materializes the sample, so the
    * sampled fact rows are exactly the sampled dim keys' rows — an
    * unbiased per-key sample of the JOIN. Two INDEPENDENT p-samples
    * would overlap on ~p² of keys (at test SF: nearly nothing) and any
    * fan-out estimate from them is garbage; the coordinated form's
    * fan-out estimator is the sample mean of true per-key fan-outs —
    * zero-fanout orders stay in the denominator via the k-row sample's
    * own per-status counts (dropping them biases the mean up).
    * ScaleOpsSpec measures both claims on real data.
    *
    * Determinism: the k-set is a total order over (digest, key); counts
    * are exact integers; quantity sums are exact (integer-valued
    * doubles) under round(4).
    *
    * 100 TB posture: the k-key set is a TakeOrdered (per-partition
    * bottom-k heaps) then a BROADCAST as the BUILD side of an INNER
    * join with the fact scan (BuildLeft is only plannable for
    * inner/semi joins — a left-outer here would silently degrade to a
    * full fact shuffle at scale); one pass over each table, never the
    * full join; the same digest column serves
    * d24/d25's sketches, so value and join statistics ride ONE sampling
    * pass at deployment. */
  val e15_coordinated_join_sample = Q(
    "e15_coordinated_join_sample",
    """WITH ks AS (SELECT o_orderkey, o_orderstatus FROM (
      |         SELECT o_orderkey, o_orderstatus,
      |                row_number() OVER (ORDER BY md5(o_orderkey::VARCHAR),
      |                                   o_orderkey) AS rk
      |         FROM orders) WHERE rk <= 512),
      |ko AS (SELECT o_orderstatus, count(*) AS n_orders_sampled
      |       FROM ks GROUP BY 1),
      |m AS (SELECT k.o_orderstatus, count(*) AS n_li, sum(l.l_quantity) AS sq
      |      FROM ks k JOIN lineitem l ON l.l_orderkey = k.o_orderkey
      |      GROUP BY 1)
      |SELECT ko.o_orderstatus,
      |       CAST(ko.n_orders_sampled AS BIGINT) AS n_orders_sampled,
      |       CAST(coalesce(m.n_li, 0) AS BIGINT) AS n_lineitems_sampled,
      |       round(coalesce(m.n_li, 0) * 1.0 / ko.n_orders_sampled, 6)
      |         AS avg_fanout,
      |       round(coalesce(m.sq, 0), 4) AS sum_qty
      |FROM ko LEFT JOIN m USING (o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    // INNER join with the sampled keys on the BUILD side: Spark can only
    // BuildLeft an inner/semi join (a LEFT OUTER preserves the left side,
    // so broadcast(left) is unplannable and would silently degrade to a
    // full fact shuffle at scale — review finding r17). Zero-fanout
    // orders are recovered from the k-row sample itself, so the fan-out
    // mean keeps them in the denominator exactly as before.
    val ks = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
        md5(col("o_orderkey").cast("string").cast("binary")).as("hx"))
      .orderBy("hx", "o_orderkey").limit(512).drop("hx")
      .localCheckpoint(false) // the 512-row sample feeds both aggregates
    val ko = ks.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders_sampled"))
    val m = broadcast(ks).join(
        lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_li"), sum(col("l_quantity")).as("sq"))
    ko.join(m, Seq("o_orderstatus"), "left")
      .select(col("o_orderstatus"),
        col("n_orders_sampled").cast("long").as("n_orders_sampled"),
        coalesce(col("n_li"), lit(0L)).cast("long").as("n_lineitems_sampled"),
        round(coalesce(col("n_li"), lit(0L)) * lit(1.0) /
          col("n_orders_sampled"), 6).as("avg_fanout"),
        round(coalesce(col("sq"), lit(0.0)), 4).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  /** B14: unpivot / melt — wide measure columns to (metric, value) rows,
    * the long-format reshape (pandas `melt`). Spark's native `unpivot`
    * expands per-row with no shuffle; the oracle states the same thing as
    * the portable UNION ALL. */
  val b14_unpivot = Q(
    "b14_unpivot",
    """SELECT * FROM (
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |         'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount FROM lineitem)
      |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin
  ) { (s, d) =>
    // ORDER BY every output column — duplicated (orderkey, linenumber)
    // pairs in the synthetic lineitem make any key subset non-total
    // (see f5); full-row order leaves only interchangeable duplicates
    lineitem(s, d).unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric", "value")
  }

  /** D13: HyperLogLog approximate distinct count (ops/Hll) — suppliers per
    * return flag, next to the exact count so the estimate's error is
    * visible in the declared output. The oracle replays the ENTIRE sketch
    * — md5 → register index from the low byte, rank from the leading 13
    * hex digits' trailing zeros, max-register aggregation, the
    * alpha·m²/Σ2^-M estimator with linear-counting small-range correction
    * — digit by digit in DuckDB SQL, so a green hash means the sketch is
    * bit-reproducible cross-engine, not merely "close". Both sides write
    * the SAME float expression tree (identical IEEE operation sequence);
    * the round(…, 6) boundary is guarded by the checker's 1e-9 relative
    * tolerance (same stance as d11). */
  val d13_hll_distinct = Q(
    "d13_hll_distinct", {
      val rho = HllOracleSql.rho
      val j = HllOracleSql.j
      s"""WITH h AS (
         |  SELECT l_returnflag AS flag, md5(CAST(l_suppkey AS VARCHAR)) AS hx
         |  FROM lineitem WHERE l_suppkey IS NOT NULL),
         |r AS (SELECT flag, $j AS j, max($rho) AS mj FROM h GROUP BY 1, 2),
         |e AS (SELECT flag, count(*) AS seen, sum(power(2.0, -mj)) AS zp
         |      FROM r GROUP BY 1),
         |x AS (SELECT flag,
         |             (0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0 / (zp + (64 - seen)) AS raw,
         |             64 - seen AS v FROM e)
         |SELECT flag, CAST(n_exact AS BIGINT) AS n_exact,
         |       round(CASE WHEN raw <= 160.0 AND v > 0
         |                  THEN 64.0 * ln(64.0 / v) ELSE raw END, 6) AS hll_est
         |FROM x JOIN (SELECT l_returnflag AS flag,
         |             count(DISTINCT l_suppkey) AS n_exact
         |             FROM lineitem GROUP BY 1) USING (flag)
         |ORDER BY flag""".stripMargin
    }
  ) { (s, d) =>
    val li = lineitem(s, d)
    val est = graft.ops.Hll.approxDistinct(
        li.select(col("l_returnflag").as("flag"), col("l_suppkey")),
        Seq("flag"), col("l_suppkey"))
      .withColumn("hll_est", round(col("hll_est"), 6))
    val exact = li.groupBy(col("l_returnflag").as("flag"))
      .agg(countDistinct(col("l_suppkey")).as("n_exact"))
    // both sides are ≤ |distinct flags| rows; the join broadcasts
    est.join(exact, Seq("flag"))
      .select(col("flag"), col("n_exact"), col("hll_est"))
      .orderBy("flag")
  }

  /** D14: count-min heavy hitters (ops/CountMin) — the frequency sketch
    * next to d13's cardinality sketch: the top-10 suppliers by exact
    * lineitem count, with the sketch's estimate beside the truth so the
    * overestimate (est ≥ exact, tight at this skew) is visible in the
    * declared output. The oracle rebuilds the ENTIRE sketch — md5 hex →
    * four disjoint 8-digit spans → mod-W columns → (r, c) counter sums →
    * min-over-rows estimates — digit for digit, so a green hash certifies
    * the counters and the probe path, not just the final ranking. */
  val d14_heavy_hitters = Q(
    "d14_heavy_hitters", {
      // row r's column: hex digits (8r+1)..(8r+8) of hx as an int, mod 512
      val hex8 = (1 to 8).map { i =>
        s"(strpos('0123456789abcdef', substr(hx, 8*r + $i, 1)) - 1) * ${BigInt(16).pow(8 - i)}"
      }.mkString("(", " + ", ")")
      s"""WITH h AS (SELECT md5(CAST(l_suppkey AS VARCHAR)) AS hx
         |           FROM lineitem WHERE l_suppkey IS NOT NULL),
         |rc AS (SELECT r, ($hex8) % 512 AS c
         |       FROM h CROSS JOIN (SELECT unnest(range(4)) AS r) rows_),
         |ct AS (SELECT r, c, count(*) AS cnt FROM rc GROUP BY 1, 2),
         |tk AS (SELECT l_suppkey AS key, count(*) AS n_exact FROM lineitem
         |       WHERE l_suppkey IS NOT NULL
         |       GROUP BY 1 ORDER BY n_exact DESC, key LIMIT 10),
         |kh AS (SELECT key, n_exact, md5(CAST(key AS VARCHAR)) AS hx FROM tk),
         |kp AS (SELECT key, n_exact, r, ($hex8) % 512 AS c
         |       FROM kh CROSS JOIN (SELECT unnest(range(4)) AS r) rows_),
         |e AS (SELECT key, n_exact, min(coalesce(cnt, 0)) AS cm_est
         |      FROM kp LEFT JOIN ct USING (r, c) GROUP BY 1, 2)
         |SELECT key AS l_suppkey, CAST(n_exact AS BIGINT) AS n_exact,
         |       CAST(cm_est AS BIGINT) AS cm_est
         |FROM e ORDER BY n_exact DESC, l_suppkey""".stripMargin
    }
  ) { (s, d) =>
    val li = lineitem(s, d)
    val sk = graft.ops.CountMin.sketch(li, col("l_suppkey"))
    // top-10 by (exact count DESC, key) — the second key makes the cut
    // deterministic under count ties
    val top = li.filter(col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("l_suppkey")).limit(10)
    graft.ops.CountMin.estimate(sk, top, col("l_suppkey"))
      .withColumnRenamed("key", "l_suppkey")
      .join(broadcast(top), Seq("l_suppkey"))
      .select(col("l_suppkey"), col("n_exact"), col("cm_est").cast("long").as("cm_est"))
      .orderBy(col("n_exact").desc, col("l_suppkey"))
  }

  /** D15: HOPPING (sliding) event-time windows — 14-day windows advancing
    * 7 days, Monday-aligned (the d5 startTime-"4 days" epoch shift), so
    * every event lands in exactly TWO overlapping windows. The window
    * family d5's tumbling form cannot express: trailing two-week rolling
    * aggregates emitted weekly, the standard dashboard smoothing window
    * and the Structured Streaming hop shape (the same `window()` call is
    * streaming-legal against a watermark).
    *
    * 100 TB posture: `window(slide < length)` explodes each row into
    * length/slide = 2 window replicas BEFORE one map-combinable
    * aggregate — a constant-factor row expansion, never a self-join of
    * weekly frames (the shape that doubles exchanges). The oracle
    * replays the 2-replica expansion arithmetically. */
  val d15_hopping_window = Q(
    "d15_hopping_window",
    """WITH w AS (SELECT CAST(CAST(date_trunc('week',
      |             CAST(ts AS TIMESTAMP) - k * INTERVAL 7 DAY)
      |             + INTERVAL 13 DAY AS DATE) AS VARCHAR) AS window_ending,
      |           value
      |           FROM events, (SELECT unnest([0, 1]) AS k))
      |SELECT window_ending, round(avg(value), 4) AS avg_value,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "14 days", "7 days", "4 days").as("w"))
      .agg(round(avg("value"), 4).as("avg_value"),
        count(lit(1)).as("n"))
      .select(date_format(date_add(col("w.end").cast("date"), -1),
        "yyyy-MM-dd").as("window_ending"),
        col("avg_value"), col("n"))
      .orderBy("window_ending")
  }

  /** D19: exact DISCRETE quantiles — `quantile_disc` / PERCENTILE_DISC
    * beside d11's interpolated CONT form: the smallest element whose
    * cumulative rank reaches p, always a REAL data value (the semantics
    * a report needs when a synthetic midpoint is meaningless). Resolved
    * by [[graft.ops.Stats.exactQuantilesDisc]] through the SAME shared
    * histogram-refinement jobs (order stat k = ⌈p·n⌉−1) — never a
    * single-buffer percentile aggregate, never a global sort. Values
    * emit UNROUNDED: a discrete quantile is an exact element of the
    * data, bit-identical on both engines by construction. */
  val d19_quantile_disc = Q(
    "d19_quantile_disc",
    """SELECT CAST(pct AS DOUBLE) AS pct, val FROM (
      |  SELECT 0.1 AS pct, quantile_disc(l_extendedprice, 0.1) AS val FROM lineitem
      |  UNION ALL SELECT 0.25, quantile_disc(l_extendedprice, 0.25) FROM lineitem
      |  UNION ALL SELECT 0.5, quantile_disc(l_extendedprice, 0.5) FROM lineitem
      |  UNION ALL SELECT 0.75, quantile_disc(l_extendedprice, 0.75) FROM lineitem
      |  UNION ALL SELECT 0.9, quantile_disc(l_extendedprice, 0.9) FROM lineitem)
      |ORDER BY pct""".stripMargin
  ) { (s, d) =>
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val vals = graft.ops.Stats.exactQuantilesDisc(
      lineitem(s, d), col("l_extendedprice"), ps)
    import s.implicits._
    ps.zipWithIndex.map { case (p, i) => (p, vals.map(_(i))) }
      .toDF("pct", "val").orderBy("pct")
  }

  /** C10: robust outlier detection by modified z-score (Iglewicz &
    * Hoaglin 1993: M = 0.6745·(x−median)/MAD, flag |M| > 3.5) — the
    * robust companion to C9's winsorization: mean/σ rules break when the
    * outliers themselves inflate σ; median/MAD have a 50% breakdown
    * point. Both location and scale come from the shared exact-quantile
    * engine (median, then median of |x−median|); the audit row reports
    * the fit and the exact outlier counts. The flag compares
    * |x−med|·0.6745 > 3.5·MAD — multiplication only, the SAME float
    * expression on both engines, no division-order hazard.
    *
    * 100 TB posture: two histogram-refinement fits (driver holds
    * buckets) + one map-combinable count aggregate with the fit folded
    * as literals; no sort, no collect of values. The declared row
    * augments every 997th row ×50 (the engineered-cohort idiom): the
    * synthetic prices are uniform — a distribution with NO 3.5-MAD
    * outliers — so without the cohort the flag path would never fire at
    * any SF, and the injected count makes the detector's sensitivity
    * part of the hash. */
  val c10_mad_outliers = Q(
    "c10_mad_outliers",
    """WITH li AS (SELECT CASE WHEN l_orderkey % 997 = 0
      |                        THEN l_extendedprice * 50
      |                        ELSE l_extendedprice END AS x
      |            FROM lineitem),
      |m AS (SELECT quantile_cont(x, 0.5) AS med FROM li),
      |md AS (SELECT quantile_cont(abs(x - m.med), 0.5) AS mad
      |       FROM li, m)
      |SELECT round(m.med, 6) AS median, round(md.mad, 6) AS mad,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN (m.med - x) * 0.6745
      |                          > 3.5 * md.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_low,
      |       CAST(sum(CASE WHEN (x - m.med) * 0.6745
      |                          > 3.5 * md.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_high
      |FROM li, m, md
      |GROUP BY m.med, md.mad""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d).select(
      when(col("l_orderkey") % 997 === 0, col("l_extendedprice") * 50)
        .otherwise(col("l_extendedprice")).as("x"))
    val x = col("x")
    val med = graft.ops.Stats.exactQuantiles(li, x, Seq(0.5)).get.head
    val mad = graft.ops.Stats.exactQuantiles(
      li.select(abs(x - med).as("dv")), col("dv"), Seq(0.5)).get.head
    li.agg(
      round(lit(med), 6).as("median"), round(lit(mad), 6).as("mad"),
      count(lit(1)).as("n"),
      sum(((lit(med) - x) * 0.6745 > 3.5 * mad).cast("long")).as("n_low"),
      sum(((x - lit(med)) * 0.6745 > 3.5 * mad).cast("long")).as("n_high"))
  }

  /** D16: full CUBE grouping sets — all four (flag, status) marginal
    * combinations in ONE pass, the shape d9's ROLLUP cannot produce (a
    * rollup never emits the (ALL, status) cells). grouping_id() pins the
    * cell identity independently of the coalesce'd labels.
    *
    * 100 TB posture: CUBE is an Expand (×4 replicas of each input row,
    * a constant factor) feeding ONE partial+final aggregate — a single
    * exchange on the grouping columns, never four scans union'd (the
    * naive form that quadruples the read). The replication factor is
    * 2^dims: bounded here (4), and the idiom documents that a
    * high-dimensional cube should enumerate explicit GROUPING SETS
    * instead of exploding 2^n replicas. */
  val d16_cube = Q(
    "d16_cube",
    """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
      |         AS BIGINT) AS gid,
      |       coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       round(avg(l_extendedprice), 4) AS avg_price
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY 1, 2, 3""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      // grouping_id() must be computed IN the aggregate (it reads the
      // grouping-set id the Expand emits; after the agg the context is
      // gone) — same contract as d9's grouping()
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("avg_price"))
      .orderBy("gid", "flag", "status")
  }

  /** F6: the ranking window family — rank / dense_rank / percent_rank /
    * cume_dist over a tie-bearing order (order DATE: rankings are
    * tie-stable, so deterministic without a total order), plus ntile(4)
    * over a tiebroken total order (ntile is NOT tie-stable — quartile
    * assignment within a tie run depends on physical order, so it gets
    * its own (date, key) ordering; same WINDOW distinction in the
    * oracle). Emits the first 20 ranks per priority class, ties
    * included (a rank-≤-k cut is a deterministic SET even at a tie
    * boundary, unlike row_number ≤ k).
    *
    * 100 TB posture: ONE exchange on the partition key serves both
    * window specs (same partitioning, different orderings → two Window
    * operators over one shuffle, the second adding only a local
    * re-sort). The rank filter is a per-group limit — Spark ≥3.5 pushes
    * it into the sort where the ntile window doesn't force full-group
    * retention anyway. */
  val f6_ranking = Q(
    "f6_ranking",
    """WITH r AS (
      |  SELECT o_orderpriority AS priority, o_orderkey,
      |         rank() OVER w AS rnk,
      |         dense_rank() OVER w AS drnk,
      |         percent_rank() OVER w AS prnk,
      |         cume_dist() OVER w AS cd,
      |         ntile(4) OVER (PARTITION BY o_orderpriority
      |           ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS tile
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY CAST(o_orderdate AS DATE)))
      |SELECT priority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
      |       CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
      |       round(prnk, 6) AS prnk, round(cd, 6) AS cd,
      |       CAST(tile AS BIGINT) AS tile
      |FROM r WHERE rnk <= 20
      |ORDER BY priority, rnk, o_orderkey""".stripMargin
  ) { (s, d) =>
    val base = orders(s, d).select(
      col("o_orderpriority").as("priority"), col("o_orderkey"),
      col("o_orderdate").cast("date").as("od"))
    val w = Window.partitionBy("priority").orderBy("od")
    val wT = Window.partitionBy("priority").orderBy("od", "o_orderkey")
    base.select(col("priority"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(wT).cast("long").as("tile"))
      .filter(col("rnk") <= 20)
      .orderBy("priority", "rnk", "o_orderkey")
  }

  /** D17: per-group exponentially-weighted moving average — pandas'
    * `.ewm(alpha).mean()` with `adjust=False` (the recursive SPC/finance
    * form y_t = α·x_t + (1−α)·y_{t−1}, y_1 = x_1), the infinite-memory
    * smoother next to F5's finite rolling frame: a rolling mean forgets
    * a level shift after its window passes; EWMA discounts it
    * geometrically forever. Per event type over weekly means, α = 0.3.
    *
    * Determinism: weekly means round to 6 dp BEFORE the recursion (avg's
    * float sum order is engine-unspecified), then BOTH engines fold the
    * identical doubles in week order — Spark as a single-row array
    * fold per group, DuckDB as a recursive CTE on the week rank — so
    * the recursion is bit-deterministic; outputs round at 6 dp.
    *
    * 100 TB posture: the one map-combinable weekly aggregate is the only
    * corpus exchange (the l106 CUSUM posture, grouped); the recursion
    * runs over each type's BOUNDED week list (years × 52 entries) as an
    * aggregate() fold — per-group state is the week list, never corpus
    * rows, and no window function orders the corpus. */
  val d17_ewma = Q(
    "d17_ewma",
    """WITH RECURSIVE wk AS (
      |  SELECT event_type,
      |         CAST(date_trunc('week', CAST(ts AS TIMESTAMP))
      |              + INTERVAL 6 DAY AS DATE) AS we,
      |         round(avg(value), 6) AS x
      |  FROM events GROUP BY 1, 2),
      |o AS (SELECT event_type, CAST(we AS VARCHAR) AS we, x,
      |             row_number() OVER (PARTITION BY event_type ORDER BY we)
      |               AS rn FROM wk),
      |r(event_type, rn, we, x, y) AS (
      |  SELECT event_type, rn, we, x, x FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT o.event_type, o.rn, o.we, o.x, 0.3 * o.x + 0.7 * r.y
      |  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1)
      |SELECT event_type, we AS week_ending, x AS weekly_mean,
      |       round(y, 6) AS ewma
      |FROM r ORDER BY event_type, week_ending""".stripMargin
  ) { (s, d) =>
    val weekly = events(s, d)
      .groupBy(col("event_type"),
        date_format(date_add(date_trunc("week", col("ts")).cast("date"), 6),
          "yyyy-MM-dd").as("we"))
      .agg(round(avg("value"), 6).as("x"))
    ewma(weekly, alpha = 0.3).orderBy("event_type", "week_ending")
  }

  /** F7: time-based RANGE window frame — the frame type F5's ROWS frame
    * cannot express: a trailing 28-DAY average over a daily series WITH
    * GAPS. A rows-frame of 28 rows silently widens its time span across
    * missing days; the range frame bounds the frame by the ORDER-BY
    * VALUE (days-since-epoch), so a sparse series still averages exactly
    * the last 29 calendar days. n_days (exact integer) exposes the
    * varying frame population that proves the distinction.
    *
    * Determinism: the daily mean scales to an EXACT micro-unit integer
    * (×1e6, int64 — l86's micro-integer stance), so the frame aggregate
    * is an integer sum: order-independent, bit-equal on both engines,
    * immune to the round-at-a-boundary flake a float frame-avg carries
    * (observed live at sf0.001: spark=…934 vs duck=…935). Date ORDER-BY
    * keys are unique per type, so the frame SET is deterministic; the
    * single final division rounds at 6 dp.
    *
    * 100 TB posture: the corpus pays one map-combinable daily aggregate;
    * the window runs over the bounded daily frame (days × types), one
    * hash exchange on the partition key. */
  val f7_range_frame = Q(
    "f7_range_frame",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS d,
      |         CAST(round(avg(value) * 1000000, 0) AS BIGINT) AS xi
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(d AS VARCHAR) AS day,
      |       CAST(count(*) OVER w AS BIGINT) AS n_days,
      |       round(sum(xi) OVER w * 1.0
      |             / (count(*) OVER w * 1000000), 6) AS trail28
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY d
      |             RANGE BETWEEN INTERVAL 28 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin
  ) { (s, d) =>
    val daily = events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(round(avg("value") * 1e6, 0).cast("long").as("xi"))
      // rangeBetween needs a numeric order key: days since epoch carries
      // the calendar distance the INTERVAL frame bounds
      .withColumn("dnum", datediff(col("d"), lit("1970-01-01")))
    val w = Window.partitionBy("event_type").orderBy("dnum")
      .rangeBetween(-28, 0)
    daily.select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        count(lit(1)).over(w).as("n_days"),
        round(sum(col("xi")).over(w) * 1.0 /
          (count(lit(1)).over(w) * 1e6), 6).as("trail28"))
      .orderBy("event_type", "day")
  }

  /** The d17 engine over any (event_type, we: string, x: double) weekly
    * frame — public for the spec (constant series is a fixed point;
    * impulse decays geometrically). Output unordered:
    * (event_type, week_ending, weekly_mean, ewma). */
  def ewma(weekly: DataFrame, alpha: Double): DataFrame = {
    val zero = struct(lit(null).cast("double").as("prev"),
      array().cast("array<struct<we:string,x:double,y:double>>").as("rows"))
    weekly.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("we"), col("x")))).as("ws"))
      .select(col("event_type"), explode(aggregate(col("ws"), zero,
        (st, e) => {
          val y = when(st.getField("prev").isNull, e.getField("x"))
            .otherwise(lit(alpha) * e.getField("x") +
              lit(1.0 - alpha) * st.getField("prev"))
          struct(y.as("prev"), concat(st.getField("rows"),
            array(struct(e.getField("we").as("we"),
              e.getField("x").as("x"), y.as("y")))).as("rows"))
        }).getField("rows")).as("r"))
      .select(col("event_type"), col("r.we").as("week_ending"),
        col("r.x").as("weekly_mean"), round(col("r.y"), 6).as("ewma"))
  }

  /** B15: schema-on-read JSON extraction — `from_json` with an EXPLICIT
    * schema over the events.props payload column, then a typed aggregate
    * on the extracted field. The semi-structured pattern every event
    * pipeline hits: the payload stays an opaque string at rest and types
    * on read.
    *
    * 100 TB posture: the schema is pinned as a literal (`schema_of_json`
    * inference would sample-scan the corpus per query and is
    * type-unstable across batches — the a8 posture); parsing is a
    * per-row codegen'd expression inside the scan projection, and the
    * only exchange is the map-combinable per-type aggregate. A parse
    * failure yields null (PERMISSIVE), so the null-count column doubles
    * as the feed-health meter (a15's quarantine is the full workflow
    * when broken payloads must be kept). */
  val b15_json_extract = Q(
    "b15_json_extract",
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
      |            AS BIGINT) AS sum_k,
      |       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
      |            AS BIGINT) AS max_k,
      |       CAST(sum(CASE WHEN json_extract(props, '$.k') IS NULL
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
      .getField("k")
    events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        max("k").as("max_k"),
        sum(col("k").isNull.cast("long")).as("n_bad"))
      .orderBy("event_type")
  }

  /** E8: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — the join
    * semantics corner plain `=` gets silently wrong: under three-valued
    * logic NULL = NULL is UNKNOWN, so an unknown-bucket key drops out of
    * a plain join even when BOTH sides carry it. Both sides here bucket
    * by a nullable key (every 7th customer / 5th supplier degraded to an
    * unknown nation — the dirty-dimension shape), and the full-outer
    * null-safe join pairs the two unknown buckets in one row instead of
    * emitting two half-rows.
    *
    * 100 TB posture: EqualNullSafe is an EQUI-join predicate — Catalyst
    * plans the same hash/sort-merge strategies as `=` (coalesced key
    * internally), never a nested-loop fallback; here both sides are
    * nation-sized aggregates. eq_would_match marks the rows a plain
    * join would have kept — the one NULL row is exactly the diff. */
  val e8_null_safe_join = Q(
    "e8_null_safe_join",
    """WITH c AS (
      |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL
      |              ELSE c_nationkey END AS k,
      |         count(*) AS n_cust
      |  FROM customer GROUP BY 1),
      |s AS (
      |  SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL
      |              ELSE s_nationkey END AS k,
      |         count(*) AS n_supp
      |  FROM supplier GROUP BY 1)
      |SELECT coalesce(CAST(coalesce(c.k, s.k) AS VARCHAR), 'UNKNOWN')
      |         AS nation_key,
      |       CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
      |       CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp,
      |       CAST(c.k IS NOT NULL AND s.k IS NOT NULL AS BIGINT)
      |         AS eq_would_match
      |FROM c FULL OUTER JOIN s ON c.k IS NOT DISTINCT FROM s.k
      |ORDER BY nation_key""".stripMargin
  ) { (s, d) =>
    val c = customer(s, d)
      .select(when(col("c_custkey") % 7 === 0, lit(null))
        .otherwise(col("c_nationkey")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_cust"))
    val sp = supplier(s, d)
      .select(when(col("s_suppkey") % 5 === 0, lit(null))
        .otherwise(col("s_nationkey")).as("ks"))
      .groupBy("ks").agg(count(lit(1)).as("n_supp"))
    c.join(sp, col("k") <=> col("ks"), "full_outer")
      .select(coalesce(coalesce(col("k"), col("ks")).cast("string"),
          lit("UNKNOWN")).as("nation_key"),
        coalesce(col("n_cust"), lit(0L)).cast("long").as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).cast("long").as("n_supp"),
        (col("k").isNotNull && col("ks").isNotNull).cast("long")
          .as("eq_would_match"))
      .orderBy("nation_key")
  }

  /** C9: winsorization — clipping at the DATA's own p01/p99 exact
    * quantiles (the robust-statistics upgrade over B6's constant-bound
    * clip): the bounds come from [[graft.ops.Stats.exactQuantiles]] (the
    * shared histogram-refinement engine, never a single-buffer
    * percentile aggregate), and the audit row reports the bounds, the
    * exact clip counts, and the mean shift. One row out — the fit a
    * cleaning pipeline would fold back as literals to winsorize at
    * corpus scale.
    *
    * 100 TB posture: the quantile fit is the d11 engine (driver holds
    * histogram buckets, never rows); the audit is one map-combinable
    * aggregate with the two bounds folded in as literals — the corpus
    * never sorts. */
  val c9_winsorize = Q(
    "c9_winsorize",
    """WITH b AS (SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
      |                  quantile_cont(l_extendedprice, 0.99) AS hi
      |           FROM lineitem)
      |SELECT round(b.lo, 6) AS p01, round(b.hi, 6) AS p99,
      |       CAST(sum(CASE WHEN l_extendedprice < b.lo THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_low,
      |       CAST(sum(CASE WHEN l_extendedprice > b.hi THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_high,
      |       round(avg(l_extendedprice), 6) AS mean_raw,
      |       round(avg(greatest(least(l_extendedprice, b.hi), b.lo)), 6)
      |         AS mean_winsorized
      |FROM lineitem, b
      |GROUP BY b.lo, b.hi""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    val Seq(lo, hi) = graft.ops.Stats
      .exactQuantiles(li, col("l_extendedprice"), Seq(0.01, 0.99))
      .getOrElse(Seq(Double.NaN, Double.NaN))
    val x = col("l_extendedprice")
    li.agg(
        round(lit(lo), 6).as("p01"), round(lit(hi), 6).as("p99"),
        sum((x < lo).cast("long")).as("n_low"),
        sum((x > hi).cast("long")).as("n_high"),
        round(avg(x), 6).as("mean_raw"),
        round(avg(greatest(least(x, lit(hi)), lit(lo))), 6)
          .as("mean_winsorized"))
  }

  /** D18: HLL sketch ALGEBRA — pairwise audience overlap across event
    * types from the REGISTER frames alone: est(|A|), est(|B|), the
    * union estimate from element-wise register max (the merge that makes
    * HLL a sketch, not just an estimator), and the inclusion–exclusion
    * intersection estimate |A∩B| ≈ ê_A + ê_B − ê_{A∪B} (Flajolet et al.
    * 2007 §5's composition; the estimator production overlap dashboards
    * run). The point the declared row proves: every union estimate is
    * computed WITHOUT touching the corpus again — d13 pays the one
    * corpus pass, all 2^k slice combinations after that are arithmetic
    * on 64-long register vectors.
    *
    * 100 TB posture: the corpus work is the register build (two
    * map-combinable aggregates, Hll's posture); everything pairwise
    * runs on type-level frames (#types × 64 rows — the OR-condition
    * pair expansion is a broadcast over kilobytes, never a corpus
    * join). Inclusion–exclusion error compounds (±13% per term at
    * m=64), and small intersections can even go negative — the sketch
    * answers "roughly how much do these audiences overlap", not a
    * hash-exact count; the oracle replays every register digit-for-digit
    * so the ARITHMETIC is still bit-checked. */
  val d18_sketch_union = Q(
    "d18_sketch_union", {
      val rho = HllOracleSql.rho
      val j = HllOracleSql.j
      s"""WITH h AS (SELECT event_type AS t, md5(CAST(user_id AS VARCHAR)) AS hx
         |           FROM events WHERE user_id IS NOT NULL),
         |r AS (SELECT t, $j AS j, max($rho) AS mj FROM h GROUP BY 1, 2),
         |e AS (SELECT t, count(*) AS seen, sum(power(2.0, -mj)) AS zp
         |      FROM r GROUP BY 1),
         |s AS (SELECT t, round(${HllOracleSql.estimate("zp", "seen")}, 6)
         |               AS est FROM e),
         |tp AS (SELECT a.t AS t1, b.t AS t2
         |       FROM (SELECT DISTINCT t FROM r) a
         |       JOIN (SELECT DISTINCT t FROM r) b ON a.t < b.t),
         |ur AS (SELECT tp.t1, tp.t2, r.j, max(r.mj) AS mj
         |       FROM tp JOIN r ON r.t = tp.t1 OR r.t = tp.t2
         |       GROUP BY 1, 2, 3),
         |ue AS (SELECT t1, t2, count(*) AS seen, sum(power(2.0, -mj)) AS zp
         |       FROM ur GROUP BY 1, 2),
         |ux AS (SELECT t1, t2,
         |              round(${HllOracleSql.estimate("zp", "seen")}, 6)
         |                AS est_union FROM ue)
         |SELECT ux.t1, ux.t2, s1.est AS est_t1, s2.est AS est_t2,
         |       ux.est_union,
         |       round(s1.est + s2.est - ux.est_union, 6) AS est_intersect
         |FROM ux JOIN s s1 ON s1.t = ux.t1 JOIN s s2 ON s2.t = ux.t2
         |ORDER BY t1, t2""".stripMargin
    }
  ) { (s, d) =>
    val ev = events(s, d).filter(col("user_id").isNotNull)
      .select(col("event_type").as("t"), col("user_id"))
    // The register frame feeds THREE branches (singles, the type grid,
    // the pairwise union) — left as a plan subtree each branch would
    // re-scan the corpus. It is #types × 64 rows, so materialize it ONCE
    // through the driver (the bounded-collect contract) and fan out from
    // the local frame: exactly one corpus pass, everything downstream is
    // kilobyte arithmetic.
    import s.implicits._
    val regs = graft.ops.Hll.registers(ev, Seq("t"), col("user_id"))
      .select(col("t"), col("__j").cast("long"), col("__mj").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("t", "__j", "__mj")
    val singles = graft.ops.Hll.estimateFromRegisters(regs, Seq("t"))
      .select(col("t"), round(col("hll_est"), 6).as("est"))
    val types = regs.select("t").distinct()
    val tp = types.select(col("t").as("t1"))
      .crossJoin(types.select(col("t").as("t2")))
      .filter(col("t1") < col("t2"))
    val ur = tp.join(regs, col("t") === col("t1") || col("t") === col("t2"))
      .groupBy("t1", "t2", "__j").agg(max("__mj").as("__mj"))
    val ue = graft.ops.Hll.estimateFromRegisters(ur, Seq("t1", "t2"))
      .select(col("t1"), col("t2"), round(col("hll_est"), 6).as("est_union"))
    ue.join(singles.select(col("t").as("t1"), col("est").as("est_t1")), Seq("t1"))
      .join(singles.select(col("t").as("t2"), col("est").as("est_t2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("est_t1"), col("est_t2"),
        col("est_union"),
        round(col("est_t1") + col("est_t2") - col("est_union"), 6)
          .as("est_intersect"))
      .orderBy("t1", "t2")
  }

  /** G7: the TPC-H Q5-shaped star flagship — six tables, a region
    * filter, a date window, revenue per supplier nation: the canonical
    * "is this an analytics engine" join-cascade. Declared because the
    * engine's join surface (e1/e2/a9/a12/f4) is otherwise exercised one
    * join at a time; this one lets Catalyst order a real cascade.
    *
    * Determinism: revenue is a DECIMAL sum (price and (1−discount) cast
    * to DECIMAL(18,2) BEFORE multiplying — exact fixed-point arithmetic,
    * order-independent on both engines; the d9 idiom), converted to
    * DOUBLE only at output.
    *
    * 100 TB posture: region → nation → supplier is a broadcast cascade
    * (kilobytes); the fact-side work is lineitem ⋈ orders (the one real
    * shuffle pair) with the date filter pushed to the orders SCAN before
    * the join, and customer joining on the already-filtered orders.
    * PlanShapeSpec pins: pushed date filter, broadcast dims, no
    * cartesian. */
  /** G8: relational division — Codd's "FOR ALL" operator, the one
    * classical relational primitive the set family (G2–G6) still lacked:
    * which suppliers ship EVERY part in a probe set (universal
    * quantification over a join). SQL has no FORALL, so the standard
    * rewrite is count-matching: group the semi-joined fact by supplier
    * and compare distinct matched parts against the probe cardinality.
    * Each supplier row reports its coverage (n_matched / n_probe) plus
    * the division flag, so partial coverage reads too — and the flag is
    * a pure integer equality, never a ratio.
    *
    * 100 TB posture: the probe set broadcasts (division probes are
    * small by nature — membership lists, compliance part sets); one
    * semi-filtered scan + one map-combinable distinct-count per
    * supplier; the probe cardinality is a one-row broadcast. */
  val g8_division = Q(
    "g8_division",
    """WITH probe AS (SELECT p_partkey FROM part WHERE p_partkey < 2),
      |m AS (SELECT l_suppkey AS s, count(DISTINCT l_partkey) AS matched
      |      FROM lineitem JOIN probe ON l_partkey = p_partkey GROUP BY 1),
      |n AS (SELECT count(*) AS np FROM probe)
      |SELECT m.s AS suppkey, CAST(matched AS BIGINT) AS n_matched,
      |       CAST(np AS BIGINT) AS n_probe,
      |       CAST(matched = np AS BIGINT) AS covers_all
      |FROM m, n ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val probe = part(s, d).filter(col("p_partkey") < 2).select("p_partkey")
    val np = probe.agg(count(lit(1)).as("n_probe"))
    lineitem(s, d).select("l_suppkey", "l_partkey")
      .join(broadcast(probe), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_matched"))
      .crossJoin(broadcast(np))
      .select(col("suppkey"), col("n_matched"), col("n_probe"),
        (col("n_matched") === col("n_probe")).cast("long").as("covers_all"))
      .orderBy("suppkey")
  }

  val g7_star_join = Q(
    "g7_star_join",
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |         AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01'
      |  AND o_orderdate < DATE '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    val asiaNations = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val asiaSupp = supplier(s, d)
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"))
    lineitem(s, d)
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount")).cast("decimal(18,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** D20: quantile-SKETCH accuracy audit — the one-pass mergeable
    * `approx_percentile` (Spark's Greenwald–Khanna variant) checked
    * against the exact engine. This is the missing half of the d11 story:
    * d11/d12/d19's histogram refinement IS the exact path, but at 100 TB
    * an ad-hoc percentile runs the ONE-PASS sketch (mergeable partials,
    * no refinement rounds, no driver round-trips) and leans on its
    * published rank-error contract |rank(v̂_p) − p·N| ≤ N/accuracy. The
    * declared rows pin that contract as data: for each p, the observed
    * rank interval of the sketch's answer (count <, count ≤ — exact
    * integer counts) must bracket the target rank within εN (+1 for the
    * rank-definition boundary), emitted as rank_ok beside the exact
    * quantile. The oracle replays the exact values and states rank_ok=1 —
    * a sketch regression (or a mis-sized accuracy for this N) flips the
    * hash. StatsProps measures the actual observed rank error, including
    * on a heavy-duplicate adversarial distribution.
    *
    * Plan shape: ONE sketch aggregate pass (4 probes share one buffer),
    * one conditional-count pass over the 4 collected sketch values
    * (bounded collect: 4 doubles), plus the shared exact-quantile jobs —
    * no sort anywhere. */
  val d20_quantile_sketch_audit = Q(
    "d20_quantile_sketch_audit",
    """WITH nn AS (SELECT count(l_extendedprice) AS n FROM lineitem)
      |SELECT CAST(q.pct AS DOUBLE) AS pct,
      |       CAST(nn.n AS BIGINT) AS n_rows,
      |       round(q.val, 6) AS exact_val,
      |       CAST(1 AS BIGINT) AS rank_ok
      |FROM (SELECT 0.25 AS pct, quantile_cont(l_extendedprice, 0.25) AS val FROM lineitem
      |      UNION ALL SELECT 0.5, quantile_cont(l_extendedprice, 0.5) FROM lineitem
      |      UNION ALL SELECT 0.75, quantile_cont(l_extendedprice, 0.75) FROM lineitem
      |      UNION ALL SELECT 0.95, quantile_cont(l_extendedprice, 0.95) FROM lineitem) q
      |CROSS JOIN nn ORDER BY pct""".stripMargin
  ) { (s, d) =>
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val accuracy = 10000
    val c = col("l_extendedprice")
    val li = lineitem(s, d)
    // one sketch pass, 4 probes in one buffer; bounded collect of 4 doubles
    val approxRow = li.agg(percentile_approx(c,
      array(ps.map(lit): _*), lit(accuracy)).as("a")).collect()(0)
    val approx = approxRow.getSeq[Double](0)
    val n = li.agg(count(c)).collect()(0).getLong(0)
    val eps = math.ceil(n.toDouble / accuracy).toLong + 1
    // exact ranks of the sketch answers: one conditional-count pass
    val rankExprs =
      ps.indices.map(i => sum((c < approx(i)).cast("long")).as(s"lo$i")) ++
        ps.indices.map(i => sum((c <= approx(i)).cast("long")).as(s"hi$i"))
    val cnts = li.agg(rankExprs.head, rankExprs.tail: _*)
    val cr = cnts.collect()(0)
    val exact = graft.ops.Stats.exactQuantiles(li, c, ps).get
    import s.implicits._
    ps.zipWithIndex.map { case (p, i) =>
      val lo = cr.getLong(i); val hi = cr.getLong(ps.size + i)
      val target = p * n
      val ok = lo <= target + eps && hi >= target - eps
      (p, n, BigDecimal(exact(i)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, if (ok) 1L else 0L)
    }.toDF("pct", "n_rows", "exact_val", "rank_ok").orderBy("pct")
  }

  /** D24: MERGEABLE one-pass quantile sketch (ops/QuantileSketch) — the
    * third sketch family beside d13's HLL and d14's count-min, closing
    * the VERDICT r16 #3 gap: d11/d12's exact engine is driver-
    * coordinated multi-round refinement (right for batch exactness,
    * unusable as shard/streaming state), and d20 audits Spark's built-in
    * percentile_approx, whose GK buffer is neither md5-replayable nor
    * order-free. This sketch IS state: the k = 4096 rows with the
    * smallest md5 row digests (bottom-k coordinated sampling, Cohen &
    * Kaplan 2007) — membership is a pure function of the row, so any
    * partitioning merges to exactly the whole-data sketch
    * (QuantileSketchProps pins associativity/commutativity/unit and
    * the partition law), and the oracle replays the sketch ROW FOR
    * ROW (same digests, same bottom-k, same integer rank arithmetic).
    * The estimate is the sample order statistic at rank ⌈p·n_s⌉ (p as
    * num/den — no float rank); the exact quantile sits beside it in the
    * output so the sampling error is visible, the d13 convention. The
    * deliberate trade vs KLL/REQ (coin-flip compactors: order-dependent,
    * unreplayable cross-engine) is stated in the ops scaladoc with the
    * DKW bound (ε ≈ 2.5% rank error at k = 4096, δ = 0.01);
    * QuantileSketchSpec asserts the bound against d11's exact engine.
    *
    * 100 TB posture: per-partition bottom-k heaps (map-side combine,
    * O(k) per task) under TakeOrderedAndProject; the treeAggregate valve
    * for extreme partition counts is documented in the ops scaladoc;
    * readout ranks ≤ k rows (metadata-window exception). */
  val d24_mergeable_quantiles = Q(
    "d24_mergeable_quantiles",
    """WITH h AS (SELECT md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR
      |             || ':' || CAST(round(l_extendedprice * 100) AS BIGINT)::VARCHAR) AS hx,
      |             CAST(l_extendedprice AS DOUBLE) AS v
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |sk AS (SELECT hx, v FROM h ORDER BY hx, v LIMIT 4096),
      |rk AS (SELECT v, hx, row_number() OVER (ORDER BY v, hx) AS r,
      |              count(*) OVER () AS ns FROM sk),
      |ps(num, den) AS (VALUES (1, 10), (1, 4), (1, 2), (3, 4), (9, 10)),
      |pick AS (SELECT num, den, ns, v FROM ps JOIN rk
      |         ON rk.r = greatest(1, (num * ns + den - 1) // den)),
      |ex AS (SELECT 1 AS num, 10 AS den, quantile_cont(l_extendedprice, 0.1) AS exact FROM lineitem
      |       UNION ALL SELECT 1, 4, quantile_cont(l_extendedprice, 0.25) FROM lineitem
      |       UNION ALL SELECT 1, 2, quantile_cont(l_extendedprice, 0.5) FROM lineitem
      |       UNION ALL SELECT 3, 4, quantile_cont(l_extendedprice, 0.75) FROM lineitem
      |       UNION ALL SELECT 9, 10, quantile_cont(l_extendedprice, 0.9) FROM lineitem)
      |SELECT CAST(num AS DOUBLE) / den AS pct, CAST(ns AS BIGINT) AS n_sample,
      |       round(v, 6) AS sk_est, round(exact, 6) AS exact
      |FROM pick JOIN ex USING (num, den) ORDER BY pct""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    val key = concat_ws(":", col("l_orderkey").cast("string"),
      col("l_linenumber").cast("string"),
      round(col("l_extendedprice") * 100, 0).cast("long").cast("string"))
    val sk = graft.ops.QuantileSketch.sketch(li, key,
      col("l_extendedprice"), 4096)
    val ps = Seq((1, 10), (1, 4), (1, 2), (3, 4), (9, 10))
    val est = graft.ops.QuantileSketch.quantiles(sk, ps)
    // exact quantiles from the SAME shared engine as d11 — one stats
    // aggregate + one histogram + one pick job, bounded driver fold
    val exactVals = graft.ops.Stats.exactQuantiles(li,
      col("l_extendedprice"), ps.map { case (n, dn) => n.toDouble / dn })
    import s.implicits._
    val exDf = ps.zipWithIndex.map { case ((n, dn), i) =>
      (n.toDouble / dn,
        exactVals.map(v => BigDecimal(v(i)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble): Option[Double])
    }.toDF("pct", "exact")
    est.join(broadcast(exDf), Seq("pct")).orderBy("pct")
  }

  /** D25: the GROUPED mergeable quantile sketch — d24's bottom-k per
    * group, completing the family exactly as d12 grouped d11: per
    * l_returnflag, the k = 256 rows with the smallest md5 digests carry
    * the group's value distribution; median and p90 read off at integer
    * ranks with n_seen beside n_sample (how much each group discarded).
    * Where d12's exact engine coordinates driver rounds per group, this
    * is ONE shuffle on the group key: the rank-≤-k cut is a literal, so
    * Catalyst plans WindowGroupLimit — every task keeps a k-row heap per
    * group during the sort, never a group's full value set (the l205
    * plan discipline; PlanShapeSpec pins the operator). Merge story as
    * d24: any shard split of a group folds to the same k rows.
    *
    * 100 TB posture: one hash exchange on the group key; per-task state
    * k rows per group (WindowGroupLimit); the readout windows run over
    * ≤ k rows per group — the metadata exception class.
    */
  val d25_group_quantile_sketch = Q(
    "d25_group_quantile_sketch",
    """WITH h AS (SELECT l_returnflag AS flag,
      |             md5(l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR
      |               || ':' || CAST(round(l_extendedprice * 100) AS BIGINT)::VARCHAR) AS hx,
      |             CAST(l_extendedprice AS DOUBLE) AS v
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |sk AS (SELECT flag, hx, v FROM (
      |         SELECT *, row_number() OVER (PARTITION BY flag ORDER BY hx, v) AS rk
      |         FROM h)
      |       WHERE rk <= 256),
      |ns AS (SELECT flag, count(*) AS n_seen FROM h GROUP BY 1),
      |rk2 AS (SELECT flag, v,
      |               row_number() OVER (PARTITION BY flag ORDER BY v, hx) AS r,
      |               count(*) OVER (PARTITION BY flag) AS nsm
      |        FROM sk)
      |SELECT flag AS l_returnflag, CAST(ns.n_seen AS BIGINT) AS n_seen,
      |       CAST(max(nsm) AS BIGINT) AS n_sample,
      |       round(min(CASE WHEN r = greatest(1, (nsm + 1) // 2) THEN v END), 6) AS med_est,
      |       round(min(CASE WHEN r = greatest(1, (9 * nsm + 9) // 10) THEN v END), 6) AS p90_est
      |FROM rk2 JOIN ns USING (flag)
      |GROUP BY flag, ns.n_seen ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d).filter(col("l_extendedprice").isNotNull)
    val base = li.select(col("l_returnflag").as("flag"),
      md5(concat_ws(":", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        round(col("l_extendedprice") * 100, 0).cast("long").cast("string"))
        .cast("binary")).as("hx"),
      col("l_extendedprice").cast("double").as("v"))
    val wTop = Window.partitionBy("flag").orderBy("hx", "v")
    val sk = base.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 256).drop("rk")
    val wRead = Window.partitionBy("flag").orderBy("v", "hx")
    val rk2 = sk.select(col("flag"), col("v"),
      row_number().over(wRead).as("r"),
      count(lit(1)).over(Window.partitionBy("flag")).as("nsm"))
    val nSeen = base.groupBy("flag").agg(count(lit(1)).as("n_seen"))
    rk2.groupBy("flag", "nsm")
      .agg(round(min(when(col("r") === greatest(lit(1L),
          expr("(nsm + 1) div 2")), col("v"))), 6).as("med_est"),
        round(min(when(col("r") === greatest(lit(1L),
          expr("(9 * nsm + 9) div 10")), col("v"))), 6).as("p90_est"))
      .join(broadcast(nSeen), Seq("flag"))
      .select(col("flag").as("l_returnflag"), col("n_seen"),
        col("nsm").cast("long").as("n_sample"), col("med_est"),
        col("p90_est"))
      .orderBy("l_returnflag")
  }

  /** D26: AMS F₂ (second frequency moment) sketch — the FOURTH sketch
    * family (Alon, Matias & Szegedy 1996), estimating the self-join
    * size Σ f_k² of a key column from 16 integer counters: Z_r =
    * Σ_rows s_r(key) with s_r a ±1 four-wise-ish sign from
    * md5("f2:r:key") (the l29 Rademacher discipline — hash-derived so
    * ANSI SQL derives the identical signs), and E[Z_r²] = F₂ exactly.
    * WHY a pipeline wants it: Σ f_k² is the size of a self-join and the
    * skew denominator — the number that says whether a groupBy/join on
    * this key will hot-spot — and this sketch reads it in ONE
    * map-combinable pass over 16 counters, mergeable across shards by
    * plain addition (counter sums commute; the partition law is the
    * associativity of +). The exact Σ f_k² ships beside the estimate
    * (the d13 convention), with the relative error as data.
    *
    * Determinism — exact INTEGER end to end: each Z_r is an integer sum
    * of ±1; Z_r² and their Σ are integers; the mean over R = 16 is one
    * division under round(4); no float enters until output. Both
    * engines derive signs from the same md5 hex digit parity.
    *
    * 100 TB posture: the ×16 sign explode feeds one map-combinable
    * groupBy(r) — 16 partials per task, a 16-row final frame; the exact
    * side is the test-SF bookkeeping (at scale one runs the sketch and
    * samples the exact on a stratum — the l30/l139 pattern). */
  val d26_ams_f2 = Q(
    "d26_ams_f2",
    """WITH k AS (SELECT l_orderkey AS key FROM lineitem
      |           WHERE l_orderkey IS NOT NULL),
      |z AS (SELECT r,
      |        sum(CASE WHEN (strpos('0123456789abcdef',
      |               substr(md5('f2:' || r::VARCHAR || ':' || key::VARCHAR), 1, 1))
      |               - 1) % 2 = 0 THEN 1 ELSE -1 END) AS zr
      |      FROM k CROSS JOIN range(16) t(r) GROUP BY 1),
      |est AS (SELECT sum(zr * zr) AS sq, count(*) AS rr FROM z),
      |ex AS (SELECT sum(c) AS n_rows, count(*) AS n_keys, sum(c * c) AS f2
      |       FROM (SELECT key, count(*) AS c FROM k GROUP BY 1))
      |SELECT CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(n_keys AS BIGINT) AS n_keys,
      |       CAST(f2 AS BIGINT) AS f2_exact,
      |       round(sq * 1.0 / rr, 4) AS f2_est,
      |       round(abs(sq * 1.0 / rr - f2) / f2, 6) AS rel_err
      |FROM est, ex""".stripMargin
  ) { (s, d) =>
    val k = lineitem(s, d).filter(col("l_orderkey").isNotNull)
      .select(col("l_orderkey").as("key"))
    val est = graft.ops.AmsF2.estimate(k, col("key"), 16)
    val ex = k.groupBy("key").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
        sum(col("c") * col("c")).as("f2"))
    ex.crossJoin(broadcast(est))
      .select(col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("f2").cast("long").as("f2_exact"),
        round(col("sq") * lit(1.0) / col("rr"), 4).as("f2_est"),
        round(abs(col("sq") * lit(1.0) / col("rr") - col("f2")) / col("f2"),
          6).as("rel_err"))
  }

  /** D27: GROUPED AMS F₂ — per-join-key-bucket self-join size / skew
    * (VERDICT r17 #4), the d26 sketch applied the way d25 grouped d24:
    * the 16 integer counters per pmod(l_orderkey, 8) bucket read each
    * key RANGE's contribution to the self-join size. This is the
    * PROACTIVE skew audit beside f8's reactive AQE pin: a planner
    * reading per-bucket F₂ knows which ranges explode BEFORE shuffling
    * 100 TB; AQE only reacts after the map stage materializes.
    *
    * Algebra (AmsF2Props): a key lives in exactly one bucket and signs
    * depend only on the key, so bucket counters SUM to the global
    * counters (bucketing loses nothing) and the grouped merge is plain
    * per-bucket integer + (partial aggregation IS the merge, exactly
    * the d26 law bucketwise). AmsF2Spec pins distributed ≡ model under
    * any partitioning and that the buckets' exact F₂ sums to d26's
    * global 30016 at sf0.001. The oracle buckets via
    * ((key % 8) + 8) % 8 — DuckDB's % is sign-preserving where Spark's
    * pmod floors, so the double-mod keeps the two engines identical
    * even on signed keys (orderkeys are positive; the formula is the
    * declared reusable form).
    *
    * Determinism: exact INTEGER end to end per bucket (the d26
    * discipline); the oracle rebuilds every bucket's 16 counters from
    * the same md5 parity. 100 TB posture: one ×16 explode into ONE
    * map-combinable groupBy(b, r) — 16·8 partials per task, a 128-row
    * frame folded to 8; the exact side is test-SF bookkeeping (at scale
    * the sketch runs alone, the exact samples a stratum — l30/l139).
    * The 8-row sketch joins the 8-row exact frame broadcast. */
  val d27_group_ams_f2 = Q(
    "d27_group_ams_f2",
    """WITH k AS (SELECT l_orderkey AS key,
      |                  ((l_orderkey % 8) + 8) % 8 AS b
      |           FROM lineitem WHERE l_orderkey IS NOT NULL),
      |z AS (SELECT b, r,
      |        sum(CASE WHEN (strpos('0123456789abcdef',
      |               substr(md5('f2:' || r::VARCHAR || ':' || key::VARCHAR), 1, 1))
      |               - 1) % 2 = 0 THEN 1 ELSE -1 END) AS zr
      |      FROM k CROSS JOIN range(16) t(r) GROUP BY 1, 2),
      |est AS (SELECT b, sum(zr * zr) AS sq, count(*) AS rr FROM z GROUP BY 1),
      |ex AS (SELECT b, sum(c) AS n_rows, count(*) AS n_keys,
      |              sum(c * c) AS f2
      |       FROM (SELECT b, key, count(*) AS c FROM k GROUP BY 1, 2)
      |       GROUP BY 1)
      |SELECT CAST(ex.b AS BIGINT) AS bucket,
      |       CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(n_keys AS BIGINT) AS n_keys,
      |       CAST(f2 AS BIGINT) AS f2_exact,
      |       round(sq * 1.0 / rr, 4) AS f2_est,
      |       round(abs(sq * 1.0 / rr - f2) / f2, 6) AS rel_err
      |FROM est JOIN ex ON ex.b = est.b ORDER BY bucket""".stripMargin
  ) { (s, d) =>
    val k = lineitem(s, d).filter(col("l_orderkey").isNotNull)
      .select(col("l_orderkey").as("key"),
        pmod(col("l_orderkey"), lit(8)).as("b"))
    val est = graft.ops.AmsF2.estimateBy(k, col("key"), col("b"), 16)
    val ex = k.groupBy("b", "key").agg(count(lit(1)).as("c"))
      .groupBy("b").agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"), sum(col("c") * col("c")).as("f2"))
    ex.join(broadcast(est), Seq("b"))
      .select(col("b").cast("long").as("bucket"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("f2").cast("long").as("f2_exact"),
        round(col("sq") * lit(1.0) / col("rr"), 4).as("f2_est"),
        round(abs(col("sq") * lit(1.0) / col("rr") - col("f2")) / col("f2"),
          6).as("rel_err"))
      .orderBy("bucket")
  }

  /** D22: cardinality-SKETCH accuracy audit — the d20 contract pattern
    * applied to distinct counting: Spark's TWO native one-pass mergeable
    * estimators (`approx_count_distinct` = HyperLogLog++, Heule et al.
    * 2013; `hll_sketch_agg` = Apache DataSketches HLL with an explicit
    * union step across groups) checked against the exact distinct count,
    * their within-tolerance verdicts DECLARED as data. d13's replayable
    * sketch exists so the ORACLE can rebuild registers; these natives are
    * what a 100 TB job actually calls (mergeable partials, re-aggregable
    * stores), and this row pins their error contract per group PLUS the
    * merged-union estimate against the global exact — a regression in
    * either estimator or in sketch union flips the hash. Tolerance 5%
    * ≈ 3σ for both defaults (HLL++ rsd 0.05 default would be trivial, so
    * it runs at rsd=0.01 ≈ lgK 14; DataSketches lgK=12 → σ ≈ 1.6%).
    *
    * Plan shape: one exact distinct (two-phase), one pass per sketch
    * family (partials combine map-side like any aggregate); the union
    * row merges GROUP sketches — #groups of kilobyte state, never a
    * second corpus scan. */
  val d22_distinct_sketch_audit = Q(
    "d22_distinct_sketch_audit",
    """SELECT grp, n_exact, hllpp_ok, ds_ok FROM (
      |  SELECT l_returnflag AS grp,
      |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
      |         CAST(1 AS BIGINT) AS hllpp_ok, CAST(1 AS BIGINT) AS ds_ok
      |  FROM lineitem GROUP BY 1
      |  UNION ALL
      |  SELECT 'ALL', CAST(count(DISTINCT l_orderkey) AS BIGINT),
      |         CAST(1 AS BIGINT), CAST(1 AS BIGINT)
      |  FROM lineitem
      |) ORDER BY grp""".stripMargin
  ) { (s, d) =>
    // NOT spread (r19 measurement): round-robin-ing the one-row-group
    // test-SF scan before these aggregates was tried and REGRESSED
    // (wall 5.9 → 9.2 s, cpu 5.9 → 80 s in an A/B at sf0.1): the
    // partial dedup/sketch hash tables feed on the parquet's
    // l_orderkey-clustered order, and destroying that locality costs
    // far more CPU than the extra cores return — the opposite trade of
    // d26's spread, whose per-row md5 work has no locality to lose.
    val li = lineitem(s, d).select("l_returnflag", "l_orderkey")
    // DELIBERATELY separate passes: count(DISTINCT) beside imperative
    // sketch buffers in ONE agg drags the sketches through the
    // multi-distinct Expand (measured 42 s vs 2+2 s split at sf0.1 —
    // the Expand replicates rows and demotes the object aggregates to
    // the sort-based path). Two cheap scans beat one pathological one.
    val exact = li.groupBy(col("l_returnflag").as("grp"))
      .agg(count_distinct(col("l_orderkey")).as("n_exact"))
    val sketches = li.groupBy(col("l_returnflag").as("grp"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("hllpp"),
        hll_sketch_agg(col("l_orderkey"), lit(12)).as("sk"))
    // the union row merges the COLLECTED group sketches (kilobyte state,
    // never a second corpus scan); global exact/HLL++ each run their own
    // pass — grouped exacts cannot compose (keys overlap groups). The
    // three passes are INDEPENDENT jobs: overlap them (graft.Par, guide
    // §2.6) instead of serializing three DAGs over the same scan — each
    // collect returns exactly its sequential value (r19: 6.4 → ~3 s wall
    // at sf0.1, cpu unchanged).
    val (perGroup, globalExact, globalHllpp) = graft.Par.par3(
      exact.join(sketches, Seq("grp")) // bounded: #groups rows (+kB sketch)
        .select(col("grp"), col("n_exact"), col("hllpp"),
          hll_sketch_estimate(col("sk")).as("ds"), col("sk"))
        .collect(),
      li.agg(count_distinct(col("l_orderkey"))).collect()(0).getLong(0),
      li.agg(approx_count_distinct(col("l_orderkey"), 0.01))
        .collect()(0).getLong(0))
    import s.implicits._
    val merged = perGroup.map(r => r.getAs[Array[Byte]]("sk")).toSeq
      .toDF("sk").agg(hll_union_agg(col("sk")).as("mk"))
      .select(hll_sketch_estimate(col("mk"))).collect()(0).getLong(0)
    val ok = (est: Long, exact: Long) =>
      if (math.abs(est - exact) <= 0.05 * exact) 1L else 0L
    val groups = perGroup.map(r => (r.getString(0), r.getLong(1),
      ok(r.getLong(2), r.getLong(1)), ok(r.getLong(3), r.getLong(1))))
    (groups.toSeq :+ (("ALL", globalExact, ok(globalHllpp, globalExact),
        ok(merged, globalExact))))
      .toDF("grp", "n_exact", "hllpp_ok", "ds_ok")
      .orderBy("grp")
  }

  val all: Seq[Q] = Seq(
    d20_quantile_sketch_audit, d22_distinct_sketch_audit,
    g2_union, g3_except, g4_intersect, g5_except_all, g6_intersect_all,
    e6_anti_join, e7_full_outer_join, e15_coordinated_join_sample,
    f5_rolling_mean, c8_keep_latest, d9_rollup, d10_distinct_agg,
    d11_quantiles, d12_group_median, d13_hll_distinct, d14_heavy_hitters,
    b14_unpivot, d15_hopping_window, d16_cube, f6_ranking, d17_ewma,
    f7_range_frame, b15_json_extract, e8_null_safe_join, c9_winsorize,
    d18_sketch_union, g7_star_join, d19_quantile_disc, c10_mad_outliers,
    d21_grouping_sets, c12_forward_fill, e9_shuffle_hash_join,
    c13_scd2_history, c14_column_profile, d23_weighted_median,
    d24_mergeable_quantiles, d25_group_quantile_sketch, d26_ams_f2,
    d27_group_ams_f2, g8_division)
}
