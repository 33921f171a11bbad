package graft

import org.apache.spark.sql.functions._

/** Scratch one-shot (not part of the suite): true-output counts on the
  * generated sf1* audit slice, backing the BENCHNOTES r15 claim that
  * where candidates grow quadratically on the saturated corpus, the TRUE
  * near-dup output grows too (candidates ∝ output is the honest
  * denominator for the filter-efficiency judgment). */
object SliceTruth {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_audit/documents.parquet"
    val docs = spark.read.parquet(p)
    def sh(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      graft.ops.TextOps.shingleSet(graft.ops.TextOps.tokens(col("text")), 3).as("ss"))
    val l26true = graft.queries.LlmQueries.editNearDupFrom(
      docs.select(col("doc_id"), lower(substring(col("text"), 1, 20)).as("s20"))).count()
    println(s"[truth] l26 true pairs (dist<=2) on sf1*: $l26true")
    val l4true = graft.queries.LlmQueries.jaccardNearDupFrom(sh(docs)).count()
    println(s"[truth] l4 true pairs (J>=0.5) on sf1*: $l4true")
  }
}
