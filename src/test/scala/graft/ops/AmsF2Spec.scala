package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the d26 AMS F₂ sketch: the distributed sign/counter pipeline
  * equals the local model, the point-mass exactness law, the
  * counters-add merge law, and the real-data error against the exact
  * Σ f_k² (deterministic — data and hash are fixed). */
class AmsF2Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  // per-counter Z_r via the model (the distributed ≡ model pin below
  // licenses using the model for the merge-law arithmetic)
  private def zrs(rows: Seq[String], r: Int): Seq[Long] =
    (0 until r).map(i => rows.map(k => AmsF2.modelSign(i, k).toLong).sum)

  test("distributed sketch == the local md5 sign model, any partitioning") {
    import spark.implicits._
    val rows = (1 to 400).map(i => s"k${i % 97}")
    val model = (0 until 16).map(r =>
      rows.map(k => AmsF2.modelSign(r, k).toLong).sum)
    val expectSq = model.map(z => z * z).sum
    for (parts <- Seq(1, 7, 32)) {
      val got = AmsF2.estimate(rows.toDF("key").repartition(parts),
        col("key"), 16).collect()(0)
      assert(got.getLong(0) === expectSq && got.getLong(1) === 16L,
        s"parts=$parts")
    }
  }

  test("point mass is EXACT: n copies of one key read F2 = n^2 with " +
      "zero error for every counter — |Z_r| = n regardless of sign") {
    import spark.implicits._
    val got = AmsF2.estimate(Seq.fill(37)("onlykey").toDF("key"),
      col("key"), 16).collect()(0)
    assert(got.getLong(0) === 16L * 37 * 37 && got.getLong(1) === 16L)
  }

  test("merge law: counters ADD — Z_r(whole) = Z_r(a) + Z_r(b) for " +
      "every r, so shard merge is elementwise integer +") {
    val a = (1 to 150).map(i => s"a${i % 31}")
    val b = (1 to 130).map(i => s"b${i % 17}")
    val za = zrs(a, 8); val zb = zrs(b, 8); val zw = zrs(a ++ b, 8)
    assert((0 until 8).forall(r => zw(r) == za(r) + zb(r)))
  }

  test("real-data error: the declared row's estimate lands within 10% " +
      "of the exact self-join size at sf0.001 (measured 0.93% — " +
      "deterministic, data and hash fixed)") {
    val row = graft.queries.ExtQueries.d26_ams_f2
      .fn(spark, "/root/testdata/sf0.001").collect()(0)
    assert(row.getLong(2) === 30016L, "exact F2 of the fixture corpus")
    assert(row.getDouble(4) < 0.10, s"rel_err ${row.getDouble(4)}")
  }
}
