package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** a20 (manifest-checked read) pins: the whole point of the op is the
  * REFUSAL paths, which the oracle's happy-path hash cannot exercise —
  * so each tamper class gets a test that the read throws and NAMES the
  * offending file: content modification, file loss, unmanifested extra
  * file, missing manifest. Plus the happy path returning the exact rows.
  */
class ManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_manifest_spec").toString

  private def writeFixture(dir: String) = {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"name_$i", i % 7)).toDF("k", "name", "g")
      .repartition(4) // several files so per-file attribution is real
    Manifest.write(spark, df, dir)
    df
  }

  private def dataFiles(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
  }

  test("happy path: checked read returns exactly the written rows") {
    val dir = freshDir()
    val df = writeFixture(dir)
    val got = Manifest.checkedRead(spark, dir)
    assert(got.count() === 100L)
    assert(got.exceptAll(df).isEmpty && df.exceptAll(got).isEmpty)
  }

  test("content tamper: replacing one data file with another is refused by name") {
    val dir = freshDir()
    writeFixture(dir)
    val fs = dataFiles(dir)
    assert(fs.length >= 2, "fixture must produce multiple files")
    // swap file contents — row COUNTS may even collide, the signature won't
    java.nio.file.Files.copy(fs(0), fs(1),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS CRC sidecars: Hadoop's ChecksumFileSystem would
    // refuse the read at the IO layer before the manifest check runs —
    // a real object store has no such sidecar, and the op under test is
    // the MANIFEST refusal, not Hadoop's local checksum
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".crc"))
      .foreach(java.nio.file.Files.delete)
    val e = intercept[IllegalArgumentException](Manifest.checkedRead(spark, dir))
    assert(e.getMessage.contains("mismatch") &&
      e.getMessage.contains(fs(1).getFileName.toString),
      s"the refusal must name the tampered file: ${e.getMessage}")
  }

  test("file loss: a deleted data file is refused as missing") {
    val dir = freshDir()
    writeFixture(dir)
    val victim = dataFiles(dir).head
    java.nio.file.Files.delete(victim)
    val e = intercept[IllegalArgumentException](Manifest.checkedRead(spark, dir))
    assert(e.getMessage.contains("missing") &&
      e.getMessage.contains(victim.getFileName.toString))
  }

  test("stray writer: an unmanifested extra parquet file is refused") {
    val dir = freshDir()
    writeFixture(dir)
    val src = dataFiles(dir).head
    java.nio.file.Files.copy(src,
      java.nio.file.Paths.get(s"$dir/part-stray-leftover.snappy.parquet"))
    val e = intercept[IllegalArgumentException](Manifest.checkedRead(spark, dir))
    assert(e.getMessage.contains("unmanifested") &&
      e.getMessage.contains("part-stray-leftover"))
  }

  test("lost sidecar: a table without its manifest is refused, not served") {
    val dir = freshDir()
    writeFixture(dir)
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_graft_manifest.tsv"))
    val e = intercept[IllegalArgumentException](Manifest.checkedRead(spark, dir))
    assert(e.getMessage.contains("no _graft_manifest.tsv"))
  }
}
