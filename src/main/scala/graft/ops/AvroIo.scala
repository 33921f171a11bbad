package graft.ops

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

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
  * NULLs cross the format; field AND record names are validated against
  * Avro's name grammar DRIVER-SIDE, failing fast instead of burning
  * task retries on a per-executor SchemaParseException — which also
  * keeps the hand-built schema JSON injection-safe). Strings come back
  * as Avro `Utf8` and are normalized at the boundary.
  *
  * Filesystem stance (r18 review findings): tasks resolve paths against
  * the SESSION's Hadoop configuration, shipped to executors via Spark's
  * own public [[SerializableConfiguration]] — a bare `new
  * Configuration()` on the executor would drop every `spark.hadoop.*`
  * session setting (credentials, fs.defaultFS, endpoints) and could
  * silently resolve a DIFFERENT filesystem than the driver's listing.
  * Stream hygiene: reader streams close via a task-completion listener
  * (so a short-circuiting `limit`/`take` cannot leak handles) with
  * close-on-exhaustion as the fallback outside a task context, and the
  * raw input/output streams are closed on the construction-failure
  * paths (corrupt header, disk-full on create) too. */
object AvroIo {

  /** Avro record schema JSON for a flat StructType of long/double/string
    * fields, every field nullable via the ["null", T] union. Fails fast
    * driver-side on unsupported types AND on field/record names outside
    * Avro's [A-Za-z_][A-Za-z0-9_]* grammar. */
  private[graft] def avroSchemaJson(schema: StructType,
      name: String): String = {
    val legal = "[A-Za-z_][A-Za-z0-9_]*"
    require(name.matches(legal),
      s"AvroIo record name '$name' is not a legal Avro name ($legal)")
    val fields = schema.fields.map { f =>
      require(f.name.matches(legal),
        s"AvroIo field name '${f.name}' is not a legal Avro name " +
          s"($legal) — rename the column before writing")
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

  /** Overwrite `dir` with one Avro container file per non-empty
    * partition of `df`. */
  def write(df: DataFrame, dir: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema, "graft_row")
    val width = df.schema.length
    val sconf = new SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    val target = new Path(dir)
    val fs = target.getFileSystem(sconf.value)
    fs.delete(target, true)
    fs.mkdirs(target)
    df.rdd.foreachPartition { it =>
      if (it.hasNext) { // empty partitions write no file
        // Schema is parsed INSIDE the task from the JSON string — the
        // Schema object itself need not cross the closure boundary
        val schema = new Schema.Parser().parse(schemaJson)
        val path = new Path(
          dir, "part-%05d.avro".format(TaskContext.getPartitionId()))
        val out = path.getFileSystem(sconf.value).create(path, true)
        try {
          val w = new DataFileWriter(
            new GenericDatumWriter[GenericRecord](schema))
          w.setCodec(CodecFactory.snappyCodec())
          w.create(schema, out) // w owns `out` from here
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
        } catch {
          case e: Throwable =>
            // header-write failure path: `out` may still be open (a
            // second close after w.close() is a no-op on FS streams)
            try out.close() catch { case _: Throwable => () }
            throw e
        }
      }
    }
  }

  /** Read every container file under `dir` with the EXPLICIT expected
    * schema (never inference — the a8/a18 discipline). One task per
    * file. The expected schema is handed to Avro as the READER schema,
    * so fields resolve BY NAME against each file's writer schema (the
    * standard Avro resolution rules) — a file whose fields are ordered
    * differently from the StructType reads correctly instead of
    * silently transposing same-typed columns, and a missing field
    * surfaces as the declared null default (r18 ADVICE). */
  def read(s: SparkSession, dir: String, schema: StructType): DataFrame = {
    val readerSchemaJson = avroSchemaJson(schema, "graft_row")
    val p = new Path(dir)
    val sconf = new SerializableConfiguration(
      s.sessionState.newHadoopConf())
    val fs = p.getFileSystem(sconf.value)
    val files =
      if (fs.exists(p))
        fs.listStatus(p)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
          .map(_.getPath.toString).sorted.toSeq
      else Seq.empty[String]
    val width = schema.length
    val rdd = s.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val path = new Path(f)
        val in = path.getFileSystem(sconf.value).open(path)
        // reader schema parsed inside the task from JSON (the write-path
        // closure discipline); the writer schema comes from the file
        val readerSchema = new Schema.Parser().parse(readerSchemaJson)
        val reader =
          try new DataFileStream[GenericRecord](in,
            new GenericDatumReader[GenericRecord](null, readerSchema))
          catch {
            case e: Throwable =>
              // corrupt/truncated header: the ctor throws BEFORE any
              // completion listener exists — close the raw stream here
              try in.close() catch { case _: Throwable => () }
              throw e
          }
        // close on task end (covers limit()/take() short-circuits);
        // outside a task context (driver-side unit use) fall back to
        // close-on-exhaustion
        val ctx = TaskContext.get()
        if (ctx != null)
          ctx.addTaskCompletionListener[Unit](_ => reader.close())
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h && ctx == null) reader.close()
            h
          }
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
