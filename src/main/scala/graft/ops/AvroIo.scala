package graft.ops

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container source/sink (a22, VERDICT r17 #3) — the
  * Kafka-ecosystem row-oriented interchange format a streaming ingest
  * edge meets first, closing the roundtrip set beside CSV (a1), parquet
  * (a3), JSON (a8), ORC (a11), raw text (a13) and XML (a18).
  *
  * The `spark-avro` datasource module is NOT on the zero-egress
  * classpath, so this is built directly on the Avro CORE Java library
  * Spark itself ships (`avro-1.12.1.jar` — a public Spark runtime
  * dependency, not a new one): the sink streams each non-empty
  * partition through a `DataFileWriter` into one snappy-compressed
  * container file (snappy is the Avro-ecosystem default and
  * `snappy-java` rides on Spark's classpath already); the source lists
  * the container files driver-side (file-listing cost only, the a19
  * posture) and `flatMap`s a `DataFileStream` per file — one file per
  * task, embarrassingly parallel, the documented last-resort
  * per-partition imperative tier reserved for formats the built-in
  * datasources genuinely cannot express.
  *
  * Schema stance (the a8/a18 discipline): the READ takes an explicit
  * StructType — never inference — and the writer derives the Avro
  * record schema mechanically from the frame's StructType
  * (long/double/string, each nullable via the `["null", T]` union, so
  * NULLs cross the format; field names are validated against Avro's
  * name grammar DRIVER-SIDE, failing fast instead of burning task
  * retries on a per-executor SchemaParseException). Strings come back
  * as Avro `Utf8` and are normalized at the boundary.
  *
  * Filesystem stance (r18 review finding): tasks resolve paths against
  * the SESSION's Hadoop configuration, shipped to executors as a plain
  * serializable property array — a bare `new Configuration()` on the
  * executor would drop every `spark.hadoop.*` session setting
  * (credentials, fs.defaultFS, endpoints) and could silently resolve a
  * DIFFERENT filesystem than the driver's listing. Reader streams close
  * via a task-completion listener, so a short-circuiting consumer
  * (`limit`, `take`) cannot leak file handles on the exhaust-to-close
  * path. */
object AvroIo {

  /** Avro record schema JSON for a flat StructType of long/double/string
    * fields, every field nullable via the ["null", T] union. Fails fast
    * driver-side on unsupported types AND on field names outside Avro's
    * [A-Za-z_][A-Za-z0-9_]* grammar (which also keeps the hand-built
    * JSON injection-safe). */
  private[graft] def avroSchemaJson(schema: StructType,
      name: String): String = {
    val fields = schema.fields.map { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"AvroIo field name '${f.name}' is not a legal Avro name " +
          s"([A-Za-z_][A-Za-z0-9_]*) — rename the column before writing")
      val t = f.dataType match {
        case LongType => "\"long\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case other => throw new IllegalArgumentException(
          s"AvroIo supports long/double/string columns, got $other " +
            s"for ${f.name}")
      }
      s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  /** The session Hadoop conf as a serializable (key, value) array — the
    * executor-side rebuild preserves every spark.hadoop.* setting. */
  private def confProps(s: SparkSession): Array[(String, String)] = {
    val conf = s.sessionState.newHadoopConf()
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  private def rebuild(props: Array[(String, String)])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Overwrite `dir` with one Avro container file per non-empty
    * partition of `df`. */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema, "graft_row")
    val width = df.schema.length
    val props = confProps(df.sparkSession)
    val target = new Path(dir)
    val fs = target.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    fs.delete(target, true)
    fs.mkdirs(target)
    df.rdd.foreachPartition { it =>
      if (it.hasNext) { // empty partitions write no file
        // Schema is parsed INSIDE the task from the JSON string — the
        // Schema object itself need not cross the closure boundary
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(
          dir, "part-%05d.avro".format(TaskContext.getPartitionId()))
        val pfs = path.getFileSystem(rebuild(props))
        val out = pfs.create(path, true)
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.snappyCodec())
        w.create(schema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < width) {
              rec.put(i, if (row.isNullAt(i)) null else row.get(i))
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes the FS stream too
      }
    }
  }

  /** Read every container file under `dir` with the EXPLICIT expected
    * schema (never inference — the a8/a18 discipline). One task per
    * file. */
  def read(s: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val files =
      if (fs.exists(p))
        fs.listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
          .map(_.getPath.toString).sorted.toSeq
      else Seq.empty[String]
    val width = schema.length
    val props = confProps(s)
    val rdd = s.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val path = new Path(f)
        val pfs = path.getFileSystem(rebuild(props))
        val reader = new DataFileStream[GenericRecord](
          pfs.open(path), new GenericDatumReader[GenericRecord]())
        // close on task end, not only on exhaustion — a limit()/take()
        // consumer stops pulling mid-file and would otherwise leak the
        // stream until executor exit
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until width).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case other => other
              }
            })
          }
        }
      }
    s.createDataFrame(rdd, schema)
  }
}
