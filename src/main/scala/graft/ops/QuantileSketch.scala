package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable one-pass quantile sketch — the third sketch family beside
  * HLL (d13, [[Hll]]) and count-min (d14, [[CountMin]]), closing the gap
  * VERDICT r16 #3 named: the exact-quantile engine ([[Stats]], d11/d12)
  * is driver-coordinated multi-round histogram refinement — right for
  * batch exactness, unusable as streaming state or for single-pass
  * shard merge. A 100 TB ingest wants per-shard quantile STATE it can
  * merge; this is that state.
  *
  * Design: a BOTTOM-K COORDINATED SAMPLE (the KMV/bottom-k sketch of
  * Cohen & Kaplan 2007 applied to rows): every row gets the md5 of its
  * identity key; the sketch is the k rows with the smallest digests.
  * Because membership is a pure function of the row (no coins, no
  * stream order), the sketch of ANY partitioning of the data merges to
  * exactly the sketch of the whole — merge = "k smallest of the union"
  * is associative and commutative with the empty sketch as unit
  * (QuantileSketchProps pins the laws plus the partition law; the
  * algebra is multiset-valued — duplicate rows are real mass — so
  * self-merge is deliberately NOT idempotent, which is safe because
  * Spark task retry replaces a partition's output), and the same rows
  * are chosen on
  * every engine, so the DuckDB oracle replays the sketch row for row.
  * The quantile estimate is the sample order statistic at rank
  * ⌈p·n_s⌉, computed with pure integer arithmetic (p as num/den).
  *
  * WHY NOT KLL/REQ (Karnin–Lang–Liberty 2016, Cormode et al. 2021),
  * stated because the trade is deliberate: their compactors flip a coin
  * per compaction and keep odd or even ranks, so the retained set
  * depends on arrival order — unreplayable in SQL, not permutation-
  * invariant, and two runs of the same data can disagree. The price of
  * determinism is the sampling error rate: a k-sample's empirical CDF
  * is within ε of the truth with probability 1−2e^(−2kε²) (DKW with
  * Massart's constant), i.e. ε ≈ 2.5% at k = 4096, δ = 0.01 vs KLL's
  * O((1/ε)·√log log) space — a constant-factor loss this engine accepts
  * for bit-reproducibility, exactly as d13 accepts HLL's fixed 64
  * registers.
  *
  * 100 TB posture: the bottom-k runs as `ORDER BY digest LIMIT k` —
  * Spark plans TakeOrderedAndProject: per-partition bottom-k heaps
  * (map-side combine, O(k) memory per task), then a driver merge of the
  * per-partition candidates. At extreme partition counts (10⁵+) the
  * k·P driver fan-in is the bottleneck; the documented valve is the
  * same algebra through `treeAggregate` (the merge the props pin is
  * associative, so a depth-2 tree reduces network to O(k·√P)) — a
  * deployment switch, not a rewrite. The readout ranks ≤ k rows in one
  * task — the documented metadata-window exception class.
  */
object QuantileSketch {

  /** Local reference model of the sketch and its merge — the algebra the
    * scalacheck laws quantify over, and the truth the distributed form
    * is spec-pinned against. Entries are (digestHex, value); ties on the
    * digest (duplicate identity keys — co-sampled by design, the
    * coordinated-sampling property) break on the value so the model is
    * total. */
  def modelSketch(entries: Seq[(String, Double)], k: Int): Seq[(String, Double)] =
    entries.sortBy(identity).take(k)

  def modelMerge(a: Seq[(String, Double)], b: Seq[(String, Double)],
      k: Int): Seq[(String, Double)] =
    modelSketch(a ++ b, k)

  /** The model's quantile readout: order statistic at rank
    * ⌈num·n_s/den⌉ (integer arithmetic), clamped to ≥ 1. */
  def modelQuantile(sk: Seq[(String, Double)], num: Long, den: Long): Double = {
    val vs = sk.map(_._2).sorted
    val r = math.max(1L, (num * vs.size + den - 1) / den)
    vs((r - 1).toInt)
  }

  /** Distributed bottom-k sketch: (hx, v) rows, the k smallest digests.
    * `key` is the row-identity expression (need not be unique — equal
    * keys co-sample, which is the coordinated-sampling property that
    * makes two tables' sketches joinable); null values are excluded
    * before hashing so the sample estimates the non-null distribution,
    * the [[Stats]] convention. */
  def sketch(df: DataFrame, key: Column, value: Column, k: Int): DataFrame =
    df.filter(value.isNotNull)
      .select(md5(key.cast("string").cast("binary")).as("hx"),
        value.cast("double").as("v"))
      .orderBy("hx", "v")
      .limit(k)

  /** The extreme-partition-count valve the scaladoc names, as code: the
    * SAME bottom-k algebra through `treeAggregate` — per-partition
    * bottom-k combine, then a depth-`depth` merge tree, so the driver
    * fan-in is O(k·P^(1/depth)) instead of O(k·P). Value-identical to
    * [[sketch]] by the partition law (QuantileSketchSpec pins it on
    * frames); the DataFrame form stays the default because its plan is
    * declarative and the readout composes — this is the deployment
    * switch for 10⁵+-partition scans. */
  def sketchTree(df: DataFrame, key: Column, value: Column, k: Int,
      depth: Int = 2): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val entries = df.filter(value.isNotNull)
      .select(md5(key.cast("string").cast("binary")).as("hx"),
        value.cast("double").as("v"))
      .as[(String, Double)]
    // seqOp appends into a MUTABLE buffer and compacts in place past 4k
    // entries (O(n) appends + amortized sorts — an immutable :+ here
    // copies the whole buffer per row, quadratic-factor work exactly at
    // the scale this valve exists for); the outer modelSketch
    // re-truncates in case a lone partition never hit a combOp — ≤ k is
    // a hard output contract
    val merged = modelSketch(
      entries.rdd.treeAggregate(
        scala.collection.mutable.ArrayBuffer.empty[(String, Double)])(
        (acc, e) => {
          acc += e
          if (acc.size > 4 * k) {
            val t = modelSketch(acc.toSeq, k)
            acc.clear(); acc ++= t
          }
          acc
        },
        (a, b) => {
          a ++= b
          val t = modelSketch(a.toSeq, k)
          a.clear(); a ++= t
          a
        },
        depth).toSeq, k)
    merged.toDF("hx", "v")
  }

  /** Quantile readout over a (hx, v) sketch frame for rationals
    * num/den — pure integer rank arithmetic, identical on both engines.
    * Output: (pct, n_sample, sk_est). */
  def quantiles(sk: DataFrame, ps: Seq[(Int, Int)]): DataFrame = {
    val w = Window.orderBy("v", "hx")
    // ≤ k rows: the global window is the documented metadata exception
    val rk = sk.select(col("v"), col("hx"),
      row_number().over(w).as("r"),
      count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("ns"))
    val psDf = sk.sparkSession.createDataFrame(
      ps.map { case (n, d) => (n.toLong, d.toLong) })
      .toDF("num", "den")
    rk.join(broadcast(psDf),
        col("r") === greatest(lit(1L),
          expr("(num * ns + den - 1) div den")))
      .select((col("num").cast("double") / col("den")).as("pct"),
        col("ns").cast("long").as("n_sample"),
        round(col("v"), 6).as("sk_est"))
      .orderBy("pct")
  }
}
