package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-checked table write/read — the integrity half of the c11
  * commit-posture story: a path-based parquet table has no table format,
  * so nothing detects a lost task file, a half-replaced partition, or a
  * stray writer's leftover — the read just returns fewer (or different)
  * rows. This op writes a `_graft_manifest.tsv` sidecar next to the data
  * recording, PER FILE, the row count and an order-independent content
  * signature (bit-XOR of xxhash64 over every column in schema order —
  * XOR because file-internal row order is not a contract), and the
  * checked read refuses LOUDLY when the directory's actual content
  * disagrees (missing/extra/modified file) instead of silently serving a
  * corrupt table. Transactional formats (Delta/Iceberg) store exactly
  * these per-file stats in their commit log; this is the path-based
  * stand-in, and the `_`-prefixed sidecar name means every plain parquet
  * reader (Spark, Hadoop) already skips it as a metadata file.
  *
  * 100 TB posture: validation is ONE column-complete scan with a per-file
  * map-combinable aggregate (count + XOR combine associatively); the
  * driver compares #files rows — catalog-scale, like c11's touched-year
  * collect. The signature detects any content change except a vanishing
  * pair of identical rows within one file (XOR cancellation — the row
  * count catches even that unless matched by equal-sized garbage), which
  * is the standard stats-based-validation trade, stated here rather than
  * hidden.
  *
  * Second declared trade (ADVICE r15): [[checkedRead]] validates in one
  * eager job but returns a LAZY frame that re-lists and re-scans when the
  * caller finally acts — a file swapped between validation and
  * consumption is served unvalidated. That validate-then-read window is
  * inherent to any manifest check over immutable-by-convention storage
  * and is closed operationally (single-writer directories; a writer
  * replaces the whole directory + sidecar atomically via rename), not by
  * caching: pinning a 100 TB table into executor storage to freeze the
  * validated snapshot would be the wrong trade at scale.
  */
object Manifest {
  private val ManifestName = "_graft_manifest.tsv"

  private def signature(df: DataFrame) =
    xxhash64(df.columns.map(col).toIndexedSeq: _*)

  /** Write `df` as parquet at `dir` plus the per-file manifest sidecar. */
  def write(s: SparkSession, df: DataFrame, dir: String): Unit = {
    df.write.mode("overwrite").parquet(dir)
    val back = s.read.parquet(dir)
    val stats = back.withColumn("h", signature(back))
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("sig"))
      .withColumn("file", element_at(split(col("path"), "/"), -1))
      .select("file", "rows", "sig")
      .collect() // #files rows — catalog-scale
      .sortBy(_.getString(0))
    val body = stats.map(r => s"${r.getString(0)}\t${r.getLong(1)}\t${r.getLong(2)}")
      .mkString("", "\n", "\n") +
      s"TOTAL\t${stats.map(_.getLong(1)).sum}\t${stats.length}\n"
    graft.Tables.writeSidecar(s, s"$dir/$ManifestName", body)
  }

  /** Read the manifest sidecar through the session's Hadoop FS. */
  private def readManifest(s: SparkSession, dir: String): Seq[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$ManifestName")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"manifest-checked read refused: no $ManifestName under $dir — " +
        "the table was not written through Manifest.write (or the sidecar was lost)")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    text.linesIterator.filter(_.nonEmpty).toSeq.collect {
      case line if !line.startsWith("TOTAL\t") =>
        val Array(f, r, x) = line.split("\t", 3)
        (f, r.toLong, x.toLong)
    }
  }

  /** Validate `dir` against its manifest; throw loudly on ANY
    * disagreement, otherwise return the data frame. */
  def checkedRead(s: SparkSession, dir: String): DataFrame = {
    val expected = readManifest(s, dir).map(t => t._1 -> (t._2, t._3)).toMap
    val back = s.read.parquet(dir)
    val got = back.withColumn("h", signature(back))
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("sig"))
      .withColumn("file", element_at(split(col("path"), "/"), -1))
      .select("file", "rows", "sig")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val missing = expected.keySet -- got.keySet
    val extra = got.keySet -- expected.keySet
    val changed = (expected.keySet & got.keySet)
      .filter(f => expected(f) != got(f))
    require(missing.isEmpty && extra.isEmpty && changed.isEmpty,
      "manifest-checked read refused: " +
        (if (missing.nonEmpty) s"missing files ${missing.toSeq.sorted.mkString(", ")}; " else "") +
        (if (extra.nonEmpty) s"unmanifested files ${extra.toSeq.sorted.mkString(", ")}; " else "") +
        (if (changed.nonEmpty) s"content mismatch in ${changed.toSeq.sorted.mkString(", ")}; " else "") +
        "the table does not match its manifest")
    back
  }
}
