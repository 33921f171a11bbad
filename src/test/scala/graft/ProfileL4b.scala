package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level breakdown of the l4 prefix-filter pipeline (throwaway). */
object ProfileL4b {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s  -> $r"); r
    }
    val docs = Tables.documents(Tables.prep(spark), d)
    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"),
      graft.ops.TextOps.shingleSet(graft.ops.TextOps.tokens(col("text")), 3).as("ss"))
    time("shingle cache build")(sh.cache().count())
    time("shingle stats")(sh.agg(sum(size(col("ss"))), avg(size(col("ss")))).head())
    val tau = 0.5
    val hashed = sh.select(col("doc_id"), size(col("ss")).as("nf"),
      array_distinct(transform(col("ss"), s => xxhash64(s))).as("hss"))
    val ex = hashed.select(col("doc_id"), col("nf"), explode(col("hss")).as("sng"))
    time("ex.count")(ex.count())
    val dfreq = ex.groupBy("sng").agg(count(lit(1)).as("df"))
    time("dfreq.count")(dfreq.count())
    time("dfreq df>1")(dfreq.filter(col("df") > 1).count())
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sng"))
    val prefix = ex.join(dfreq, "sng")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("nf") - ceil(lit(tau) * col("nf") - 1e-9) + 1)
      .select(col("doc_id"), col("nf"), col("sng"))
    time("prefix.count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sng") === col("b.sng") && col("a.doc_id") < col("b.doc_id") &&
          least(col("a.nf"), col("b.nf")).cast("double") >=
            lit(tau) * greatest(col("a.nf"), col("b.nf")) - 1e-9)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    time("cand.count")(cand.count())
    // variant A: current verify (payload shuffled through two SMJs)
    def verify(c: org.apache.spark.sql.DataFrame, broad: Boolean) = {
      val jac = graft.ops.TextOps.jaccard(col("da.ss"), col("db.ss"))
      val rhsA = if (broad) broadcast(sh.as("da")) else sh.as("da")
      val rhsB = if (broad) broadcast(sh.as("db")) else sh.as("db")
      c.join(rhsA, col("i") === col("da.doc_id"))
        .join(rhsB, col("j") === col("db.doc_id"))
        .filter(jac >= tau)
        .select(col("i"), col("j"), round(jac, 6).as("jac"))
        .orderBy("i", "j")
    }
    time("verify SMJ")(verify(cand, broad = false).write.format("noop").mode("overwrite").save())
    time("verify BHJ")(verify(cand, broad = true).write.format("noop").mode("overwrite").save())
    time("full l4 (warm)")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    time("full l4 again")(
      graft.queries.LlmQueries.l4_jaccard_neardup.fn(spark, d)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
