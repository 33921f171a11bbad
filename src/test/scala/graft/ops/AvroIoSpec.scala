package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the a22 Avro source/sink (VERDICT r17 #3): the container
  * files are REAL Avro (magic-checked), the roundtrip is lossless for
  * long/double/string including NULLs and unicode across an uneven
  * multi-partition write, and the declared row equals the source table. */
class AvroIoSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("bal", DoubleType)))

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avroio").toString

  private val rows = Seq(
    Row(1L, "alpha", 1.5),
    Row(2L, null, -2.25),
    Row(3L, "ünï©ødé", 0.0),
    Row(null, "no-key", 9.75),
    Row(5L, "e", 1.0e18))

  private def asTriples(rs: Seq[Row]) =
    rs.map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet

  test("roundtrip: longs, strings (incl. unicode), doubles (incl. " +
      "negative/zero/1e18) and NULLs survive the Avro container " +
      "bit-exactly across a 7-way write with empty partitions") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = s"${tempDir()}/t"
    AvroIo.write(df.repartition(7), dir) // 5 rows over 7 parts: some empty
    val back = AvroIo.read(spark, dir, schema)
    assert(back.schema === schema)
    assert(asTriples(back.collect().toSeq) === asTriples(rows))
  }

  test("the files on disk ARE Avro object container files: the 4-byte " +
      "magic Obj\\x01 leads every part file; empty partitions write no " +
      "file; overwrite replaces the directory") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = s"${tempDir()}/t"
    AvroIo.write(df, dir)
    AvroIo.write(df, dir) // second write must not accumulate files
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    assert(files.nonEmpty && files.length <= 2,
      s"one file per NON-EMPTY partition, no accumulation: " +
        s"${files.map(_.getName).mkString(",")}")
    files.foreach { f =>
      val in = new java.io.FileInputStream(f)
      val magic = new Array[Byte](4)
      try assert(in.read(magic) == 4 &&
        magic.sameElements(Array[Byte]('O', 'b', 'j', 1)),
        s"${f.getName} must start with the Avro container magic")
      finally in.close()
    }
  }

  test("fields resolve BY NAME against the file's writer schema (r18 " +
      "ADVICE): a caller StructType ordered differently from the file " +
      "reads the right values instead of silently transposing " +
      "same-typed columns") {
    val wide = StructType(Seq(
      StructField("x", DoubleType),
      StructField("id", LongType),
      StructField("y", DoubleType),
      StructField("name", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1.5, 10L, -2.5, "a"),
        Row(3.25, 20L, 0.0, "b")), 1), wide)
    val dir = s"${tempDir()}/t"
    AvroIo.write(df, dir)
    // read with x and y SWAPPED (same type — the silent-transposition
    // hazard) and the other fields reordered too
    val reordered = StructType(Seq(
      StructField("y", DoubleType),
      StructField("name", StringType),
      StructField("x", DoubleType),
      StructField("id", LongType)))
    val back = AvroIo.read(spark, dir, reordered)
    assert(back.schema === reordered)
    val got = back.collect().map(r =>
      (r.getDouble(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === Set((-2.5, "a", 1.5, 10L), (0.0, "b", 3.25, 20L)),
      "values must follow their NAMES through the reorder, not their " +
        "positions")
  }

  test("an empty input writes an empty (schema-correct) table back") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2), schema)
    val dir = s"${tempDir()}/t"
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir, schema)
    assert(back.schema === schema && back.count() === 0L)
  }

  test("a22 declared row: the Avro roundtrip equals the source supplier " +
      "table row-for-row at sf0.001 (losslessness incl. the double path)") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.CoreQueries.a22_avro_roundtrip
      .fn(spark, sf).collect()
    val src = graft.Tables.supplier(spark, sf)
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey").collect()
    assert(got.length === src.length, "row count")
    got.zip(src).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getString(1) == b.getString(1)
        && a.getDouble(2) == b.getDouble(2), s"row $a vs $b")
    }
  }
}
