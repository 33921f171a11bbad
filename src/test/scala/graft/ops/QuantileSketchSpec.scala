package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark-side pins for the d24 mergeable quantile sketch: the distributed
  * bottom-k equals the local model (so QuantileSketchProps' algebra laws
  * carry to the cluster form), the shard-merge contract holds on real
  * frames, and the estimate meets its declared DKW-style error bound
  * against the exact-quantile engine ([[Stats]]) on real data. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("distributed bottom-k == the local model, under any partitioning") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"k$i", (i * 37 % 250).toDouble))
    val model = QuantileSketch.modelSketch(
      rows.map { case (k, v) => (md5hex(k), v) }, 64)
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("key", "v").repartition(parts)
      val got = QuantileSketch.sketch(df, col("key"), col("v"), 64)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == model, s"parts=$parts: distributed != model")
    }
  }

  test("shard-merge contract on frames: sketch(sketch(A) ++ sketch(B)) " +
      "== sketch(A ++ B) — the per-shard state a 100 TB combine ships") {
    import spark.implicits._
    val a = (1 to 400).map(i => (s"a$i", i.toDouble))
    val b = (1 to 400).map(i => (s"b$i", (1000 - i).toDouble))
    def sk(rows: Seq[(String, Double)]) = QuantileSketch.sketch(
      rows.toDF("key", "v"), col("key"), col("v"), 32)
    // merging shard sketches = re-sketching their union frame: the hx is
    // already materialized, so the merge re-ranks WITHOUT re-hashing
    val merged = sk(a).unionAll(sk(b)).orderBy("hx", "v").limit(32)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val whole = sk(a ++ b)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(merged == whole)
  }

  test("error bound: every d24 estimate's true rank sits within the " +
      "declared DKW window of its target quantile on sf0.001 lineitem") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf)
    val c = col("l_extendedprice")
    val n = li.agg(count(c)).collect()(0).getLong(0)
    val rows = graft.queries.ExtQueries.d24_mergeable_quantiles
      .fn(spark, sf).collect()
    assert(rows.length == 5)
    val k = rows.head.getLong(1)
    // DKW: sup|F_sample - F| <= eps w.p. 1-2e^(-2k eps^2); delta = 0.01.
    // The data and hash are FIXED, so this either holds or the sketch is
    // wrong — no flakiness. A failed run would mean the "uniform" md5
    // sample correlates with price, i.e. a broken digest pipeline.
    val eps = math.sqrt(math.log(2.0 / 0.01) / (2.0 * k))
    rows.foreach { r =>
      val p = r.getDouble(0)
      val est = r.getDouble(2)
      val below = li.agg(sum((c <= est).cast("long"))).collect()(0).getLong(0)
      val frac = below.toDouble / n
      assert(math.abs(frac - p) <= eps + 1.0 / k,
        s"p=$p est=$est true-rank=$frac eps=$eps")
    }
    // and the sample really is capped at k
    assert(k <= 4096L)
  }

  test("the treeAggregate valve is value-identical to the DataFrame " +
      "bottom-k — the deployment switch costs nothing in answer") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (s"k$i", (i * 53 % 997).toDouble))
    val df = rows.toDF("key", "v").repartition(16)
    val viaPlan = QuantileSketch.sketch(df, col("key"), col("v"), 128)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaTree = QuantileSketch.sketchTree(df, col("key"), col("v"), 128)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq.sorted
    assert(viaTree == viaPlan)
  }

  test("degenerate inputs: empty and all-null frames yield an empty " +
      "sketch and an empty readout — never a throw") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("key", "v")
    val sk = QuantileSketch.sketch(empty, col("key"), col("v"), 16)
    assert(sk.count() == 0L)
    assert(QuantileSketch.quantiles(sk, Seq((1, 2))).count() == 0L)
    val allNull = Seq(("a", null), ("b", null))
      .toDF("key", "v").withColumn("v", col("v").cast("double"))
    assert(QuantileSketch.sketch(allNull, col("key"), col("v"), 16)
      .count() == 0L)
  }
}
