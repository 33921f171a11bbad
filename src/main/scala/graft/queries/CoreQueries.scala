package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** SURVEY.md §2 relational operator inventory (categories A–F), each
  * re-expressed Spark-first over the driver testdata and hash-matched
  * against DuckDB. Reference behaviors cited as codes.py:NN.
  */
object CoreQueries {

  // ---------------------------------------------------------------- A. scans

  /** A1+A2 (codes.py:21, 176-177): CSV sink + CSV scan with explicit schema
    * (never inferSchema — one pass, deterministic types). Round-trips the
    * region table through CSV and returns it; oracle reads the parquet.
    * Scratch dir comes from spark.graft.scratchDir (MUST be a shared
    * filesystem on a real cluster — executors commit the CSV there) with
    * ONE deterministic path per (query, sfDir), overwritten each run —
    * repeated verify/bench runs reuse the dir instead of leaking a table
    * copy per run (VERDICT r12 hygiene); different scale factors hash to
    * different paths, and concurrent runs at the SAME sfDir must set
    * distinct scratchDirs (the driver runs queries sequentially). */
  /** A8: JSON source/sink roundtrip — the third interchange format a
    * lakehouse ingest layer meets (CSV a1, parquet a3). Write a typed
    * subset of nation as line-delimited JSON, read it back with an
    * EXPLICIT schema (schema inference over JSON is a full extra pass at
    * 100 TB and type-unstable — never ship it), and the roundtrip must
    * reproduce the parquet-derived oracle rows exactly. Columns are
    * int/string only: JSON float formatting is engine-specific and has no
    * place in an exact-hash interchange test. */
  val a8_json_roundtrip = Q(
    "a8_json_roundtrip",
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |       CAST(n_regionkey AS BIGINT) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_json_nation")
    nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    s.read.schema(schema).json(tmp).orderBy("n_nationkey")
  }

  /** A11: ORC source/sink roundtrip — the third columnar interchange
    * format (Spark bundles the ORC datasource; warehouse migrations meet
    * it constantly). Same stance as a8: explicit schema on the read —
    * never inference — and the oracle reads the ORIGINAL parquet table,
    * so a green hash proves the ORC write+read is lossless for int /
    * float / string columns, exercising the float path a8 must avoid
    * (ORC is binary — no JSON float-formatting instability). */
  val a11_orc_roundtrip = Q(
    "a11_orc_roundtrip",
    """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
      |       CAST(o_totalprice AS DOUBLE) AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_orc_orders")
    orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").orc(tmp)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    s.read.schema(schema).orc(tmp).orderBy("o_orderkey")
  }

  /** A22: Avro source/sink roundtrip (VERDICT r17 #3) — the
    * Kafka-ecosystem row-oriented interchange format, built on the Avro
    * CORE library Spark ships because the `spark-avro` datasource is
    * not on the zero-egress classpath (machinery + 100 TB posture in
    * [[graft.ops.AvroIo]]). Same stance as a11: explicit schema on the
    * read — never inference — and the oracle reads the ORIGINAL parquet
    * table, so a green hash proves the Avro write+read is lossless for
    * long / string / double columns including the float path (Avro is
    * binary — doubles cross as IEEE bits, no text formatting). */
  val a22_avro_roundtrip = Q(
    "a22_avro_roundtrip",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
      |       CAST(s_acctbal AS DOUBLE) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_avro_supplier")
    val src = supplier(s, d).select(
      col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
      col("s_acctbal").cast("double").as("s_acctbal"))
    graft.ops.AvroIo.write(src, tmp)
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_acctbal", DoubleType)))
    graft.ops.AvroIo.read(s, tmp, schema).orderBy("s_suppkey")
  }

  /** A18: XML source/sink roundtrip — Spark 4's BUILT-IN xml datasource
    * (SPARK-44265), the enterprise-feed format every ingest edge still
    * meets: one row element per record, `rowTag` addressing, explicit
    * schema (inference never ships — the a1/a8 discipline). The oracle
    * reads the ORIGINAL table, so a green hash proves values survive the
    * XML text encoding bit-exactly (doubles included — Spark writes
    * round-trippable representations). n_chars rides along so a numeric
    * column crosses the format beside the strings; doc text is NOT
    * roundtripped here (XML escaping of arbitrary corpus text is a
    * different test — a13 owns the raw-text hazards). */
  val a18_xml_roundtrip = Q(
    "a18_xml_roundtrip",
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_xml_docs")
    documents(s, d).select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").option("rowTag", "doc").format("xml").save(tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    s.read.schema(schema).option("rowTag", "doc").format("xml").load(tmp)
      .orderBy("doc_id")
  }

  /** A19: selective recursive ingest — the directory-hygiene options a
    * real data lake needs on day one: `recursiveFileLookup` walks
    * arbitrarily nested producer layouts (no hive partition scheme
    * required or inferred), and `pathGlobFilter` skips the sidecar junk
    * that accumulates next to data files (manifests, logs, half-written
    * temp files). The fixture nests the two halves of the corpus at
    * DIFFERENT depths and plants a non-parquet sidecar in the tree: if
    * the recursive walk fails a nested half vanishes (row count flips
    * the hash); if the glob filter fails the parquet reader hits the
    * sidecar and the job dies — green proves BOTH options did their job.
    * 100 TB posture: both options act at file-LISTING time on the
    * driver-side index; no data-plane cost. */
  val a19_selective_ingest = Q(
    "a19_selective_ingest",
    """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val dir = graft.Tables.scratchDir(s, d, "graft_nested_docs")
    val docs = documents(s, d).select("doc_id", "lang", "n_chars")
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(s"$dir/feed_a/2026/batch")
    docs.filter(col("doc_id") % 2 === 1)
      .write.mode("overwrite").parquet(s"$dir/feed_b/deep/nested/batch")
    // through the session's Hadoop FS, not java.nio — the sidecar must
    // land on the SAME filesystem as the data when scratchDir is a
    // non-local URI (ADVICE r14)
    graft.Tables.writeSidecar(s, s"$dir/feed_a/manifest.txt",
      "sidecar junk the glob filter must skip")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    s.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .orderBy("doc_id")
  }

  /** A20: manifest-checked read (ops/Manifest) — the integrity companion
    * to c11's commit-posture declaration: path-based parquet has no table
    * format, so a lost task file, a half-replaced partition or a stray
    * writer's leftover silently changes what a read returns. The write
    * records per-file row counts and an order-independent xxhash64-XOR
    * content signature in a `_`-prefixed sidecar (plain readers already
    * skip it, like _SUCCESS); the checked read re-derives both in ONE
    * map-combinable pass and REFUSES loudly on any disagreement —
    * ManifestSpec tampers a data file and pins the refusal naming it.
    * Transactional formats keep exactly these stats in their commit log;
    * this is the path-based stand-in. The declared output is the
    * validated table itself (the a1 roundtrip contract: green hash =
    * write → manifest → validate → read is lossless). */
  val a20_manifest_checked_read = Q(
    "a20_manifest_checked_read",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
      |       CAST(s_nationkey AS BIGINT) AS s_nationkey
      |FROM supplier ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val dir = graft.Tables.scratchDir(s, d, "graft_manifest_sup")
    graft.ops.Manifest.write(s,
      supplier(s, d).select("s_suppkey", "s_name", "s_nationkey"), dir)
    graft.ops.Manifest.checkedRead(s, dir).orderBy("s_suppkey")
  }

  /** A16: compression-codec roundtrip — zstd-compressed parquet written
    * and read back, with the chained snappy→zstd rewrite in the middle
    * (the codec-migration path a lakehouse walks when it swaps its
    * default: old files re-encoded file-by-file, no row-level work). The
    * oracle reads the ORIGINAL table, so a green hash proves the data
    * survives BOTH codecs bit-exactly — codec choice is a
    * size/CPU/split-ability tradeoff, never a fidelity one, and this row
    * is the proof the engine can state that. Codec is set per-WRITE via
    * option("compression", …), not session conf: at 100 TB different
    * tables legitimately run different codecs (hot = snappy/lz4 for
    * cheap decode, cold = zstd for the ratio), and a session-global
    * default can't express that. */
  val a16_codec_roundtrip = Q(
    "a16_codec_roundtrip",
    """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
      |       CAST(s_nationkey AS BIGINT) AS s_nationkey,
      |       CAST(s_acctbal AS DOUBLE) AS s_acctbal
      |FROM supplier ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val t1 = graft.Tables.scratchDir(s, d, "graft_codec_sn")
    val t2 = graft.Tables.scratchDir(s, d, "graft_codec_zs")
    supplier(s, d).write.mode("overwrite")
      .option("compression", "snappy").parquet(t1)
    s.read.parquet(t1).write.mode("overwrite")
      .option("compression", "zstd").parquet(t2)
    s.read.parquet(t2)
      .select(col("s_suppkey").cast("long"), col("s_name"),
        col("s_nationkey").cast("long"), col("s_acctbal").cast("double"))
      .orderBy("s_suppkey")
  }

  val a1_csv_roundtrip = Q(
    "a1_csv_roundtrip",
    "SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey"
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_csv_region")
    region(s, d).write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("r_regionkey", LongType),
      StructField("r_name", StringType)))
    s.read.schema(schema).option("header", "true").csv(tmp).orderBy("r_regionkey")
  }

  /** A13: raw text-lines source/sink — the format a web pipeline actually
    * STARTS from (WET dumps, one record per line) and the fourth
    * interchange family beside CSV (a1), JSON (a8), ORC (a11): serialize
    * documents as `doc_id<TAB>text` lines via the text sink, read them
    * back with `spark.read.text` (one `value` column — no schema
    * machinery, no quoting/escaping pass, the cheapest possible scan),
    * and re-split with a limit-2 split so tabs INSIDE text would survive
    * (the corpus has none, but the parse must not depend on that).
    * Newlines/CRs inside text CANNOT survive a line format — a record
    * would silently split into bogus lines — so the writer REFUSES them
    * (`raise_error`, ADVICE r12): corrupting silently is the one failure
    * mode a line protocol must not have; payloads that need embedded
    * newlines belong in a8/a11, not here. The roundtrip must reproduce
    * the parquet-derived oracle rows exactly. Same scratch-dir contract
    * as a1/a11 (shared filesystem on a real cluster, one deterministic
    * path per (query, sfDir), overwritten per run). */
  val a13_text_roundtrip = Q(
    "a13_text_roundtrip",
    "SELECT doc_id, text FROM documents ORDER BY doc_id"
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_text_docs")
    documents(s, d)
      .select(concat(col("doc_id").cast("string"), lit("\t"),
        when(col("text").rlike("[\\n\\r]"),
          raise_error(concat(lit("a13: embedded newline in doc_id="),
            col("doc_id").cast("string"), lit(" — line format cannot carry it"))))
          .otherwise(col("text")))
        .as("value"))
      .write.mode("overwrite").text(tmp)
    s.read.text(tmp)
      .select(split(col("value"), "\t", 2).as("p"))
      .select(element_at(col("p"), 1).cast("long").as("doc_id"),
        element_at(col("p"), 2).as("text"))
      .orderBy("doc_id")
  }

  /** A14: parquet schema-evolution merge — the lakehouse read path every
    * long-lived table hits: files written BEFORE a column existed sit next
    * to files written after, and a `mergeSchema` read must union the
    * schemas and null-fill the elder files. Staged deterministically: the
    * even-key half of orders lands as a v1 file (two columns), the odd
    * half as v2 (three), one directory; the merged read must produce the
    * full key set with o_totalprice NULL exactly on the v1 rows — which
    * the oracle expresses over the base table alone (the a1 pattern).
    * 100 TB posture, stated honestly: mergeSchema reconciles schemas by
    * reading file FOOTERS across the table — cheap per file but a full
    * footer sweep at planning time on a million-file table; a production
    * deployment pins the evolved schema in the catalog (or passes an
    * explicit schema, as every other scan here does) and pays the sweep
    * only when the schema actually moves. The demo exercises the sweep;
    * the explicit-schema posture stays the default everywhere else. */
  val a14_schema_merge = Q(
    "a14_schema_merge",
    """SELECT o_orderkey, o_orderstatus,
      |       CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_totalprice AS DOUBLE) END
      |         AS o_totalprice
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val dir = graft.Tables.scratchDir(s, d, "graft_evolve_orders")
    val ord = orders(s, d)
    // two eras, one directory: distinct subpaths so overwrite of either
    // era can't clobber the other (real tables append; the demo re-runs)
    ord.filter(col("o_orderkey") % 2 === 0)
      .select("o_orderkey", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/era=v1")
    ord.filter(col("o_orderkey") % 2 === 1)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/era=v2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** A15: malformed-record ingest (PERMISSIVE + corrupt-record column) —
    * the error-handling contract of the JSON ingest path: at 100 TB some
    * fraction of every real feed is broken (truncated uploads, mixed
    * producers, encoding damage), and the engine must land the good rows,
    * QUARANTINE the bad ones losslessly, and account for both — never
    * fail the job (FAILFAST is for dev) and never silently drop
    * (DROPMALFORMED loses data with no audit trail). Staged
    * deterministically: every 7th document serializes as a broken line
    * (with its id embedded, the way a real truncated record still carries
    * fragments), the rest as proper JSON; the PERMISSIVE read lands
    * parsed rows typed and broken rows whole in `_corrupt_record`, and
    * the declared audit proves BOTH streams are complete — counts and
    * id-checksums per outcome, the corrupt ids salvaged from the raw
    * quarantined text (the recovery workflow a quarantine table exists
    * for). The oracle expresses the expected partition over the base
    * table alone. 100 TB posture: one scan, per-row parse, the audit is
    * a 2-key map-combinable aggregate; the quarantine column rides the
    * same files — no second pass, no job restart. */
  val a15_corrupt_json = Q(
    "a15_corrupt_json",
    """SELECT outcome, n, id_sum FROM (
      |  SELECT 'corrupt' AS outcome, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(doc_id) AS BIGINT) AS id_sum
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT 'parsed', CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT)
      |  FROM documents WHERE doc_id % 7 <> 0
      |) ORDER BY outcome""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_badjson_docs")
    documents(s, d).select(
      when(col("doc_id") % 7 === 0,
        concat(lit("{CORRUPT id="), col("doc_id").cast("string"), lit(" not json")))
        .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
        .as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val salvagedId = regexp_extract(col("_corrupt_record"), "id=(\\d+)", 1).cast("long")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(tmp)
      .select(when(col("_corrupt_record").isNotNull, lit("corrupt"))
        .otherwise(lit("parsed")).as("outcome"),
        coalesce(col("doc_id"), salvagedId).as("id"))
      .groupBy("outcome")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("id")).cast("long").as("id_sum"))
      .orderBy("outcome")
  }

  /** A17: malformed-record CSV ingest — a15's contract on the OTHER
    * text-ingest path, with the CSV-specific hazards made load-bearing:
    * every 9th row serializes with an uncastable key field (CSV marks a
    * record corrupt on a failed type cast, not on token count — short
    * rows just null-fill, so the breakage must be a cast), and every
    * GOOD row carries a QUOTED field with an embedded comma between the
    * key and the numeric column — if quote handling slipped, the numeric
    * column would receive a string fragment, the cast would fail, and
    * the parsed/corrupt counts (and the n_chars checksum) would flip the
    * hash. Quarantine discipline is a15's: land good rows typed, keep
    * bad lines whole in `_corrupt_record`, salvage ids from the raw
    * text, account for both streams — never FAILFAST, never silently
    * DROPMALFORMED. 100 TB posture identical to a15: one scan, per-row
    * parse, 2-key map-combinable audit. */
  val a17_corrupt_csv = Q(
    "a17_corrupt_csv",
    """SELECT outcome, n, id_sum, ch_sum FROM (
      |  SELECT 'corrupt' AS outcome, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(doc_id) AS BIGINT) AS id_sum, CAST(0 AS BIGINT) AS ch_sum
      |  FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT 'parsed', CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT),
      |         CAST(sum(n_chars) AS BIGINT)
      |  FROM documents WHERE doc_id % 9 <> 0
      |) ORDER BY outcome""".stripMargin
  ) { (s, d) =>
    val tmp = graft.Tables.scratchDir(s, d, "graft_badcsv_docs")
    documents(s, d).select(
      when(col("doc_id") % 9 === 0,
        concat(lit("id="), col("doc_id").cast("string"), lit("x,broken,line")))
        .otherwise(concat(col("doc_id").cast("string"),
          lit(",\""), col("lang"), lit(",quoted\","),
          col("n_chars").cast("string")))
        .as("value"))
      .write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val salvagedId = regexp_extract(col("_corrupt_record"), "id=(\\d+)", 1).cast("long")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(tmp)
      .select(when(col("_corrupt_record").isNotNull, lit("corrupt"))
        .otherwise(lit("parsed")).as("outcome"),
        coalesce(col("doc_id"), salvagedId).as("id"),
        col("n_chars"))
      .groupBy("outcome")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("id")).cast("long").as("id_sum"),
        coalesce(sum(col("n_chars")), lit(0L)).cast("long").as("ch_sum"))
      .orderBy("outcome")
  }

  /** A3: parquet scan (TESTDATA.md). */
  val a3_parquet_scan = Q(
    "a3_parquet_scan",
    """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |       CAST(n_regionkey AS BIGINT) AS n_regionkey
      |FROM nation ORDER BY n_nationkey""".stripMargin
  ) { (s, d) => nation(s, d).orderBy("n_nationkey") }

  /** A4 (codes.py:28): date parse with coercion — `to_datetime(errors='coerce')`;
    * with ANSI off Spark's to_date yields null on malformed, like TRY_CAST. */
  val a4_date_parse = Q(
    "a4_date_parse",
    """SELECT o_orderkey,
      |       CAST(TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS VARCHAR) AS d,
      |       CAST((TRY_CAST('x' || strftime(o_orderdate, '%Y-%m-%d') AS DATE) IS NULL) AS BIGINT) AS bad_is_null
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val str = date_format(col("o_orderdate"), "yyyy-MM-dd")
    orders(s, d).select(
      col("o_orderkey"),
      date_format(to_date(str), "yyyy-MM-dd").as("d"),
      to_date(concat(lit("x"), str)).isNull.as("bad_is_null")
    ).orderBy("o_orderkey")
  }

  // ----------------------------------------------- B. projections / scalars

  /** B1 (codes.py:72-79): column projection/drop — pruned at the scan. */
  val b1_projection = Q(
    "b1_projection",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** B2/B8 (codes.py:29-109): derived columns / arithmetic interactions —
    * per-row IEEE ops, bit-identical across engines. */
  val b2_derived = Q(
    "b2_derived",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       l_extendedprice * (1 - l_discount) AS revenue,
      |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      |       l_quantity * l_extendedprice AS qty_x_price
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("charge"),
      (col("l_quantity") * col("l_extendedprice")).as("qty_x_price")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** B3 (codes.py:144,169): predicate filter — pushed to the parquet scan. */
  val b3_filter = Q(
    "b3_filter",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** B4/C4 (codes.py:34,40): null test → 0/1 indicator column. Testdata has
    * no nulls, so nulls are manufactured with NULLIF — same trick the oracle
    * uses, keeping both engines on identical inputs. */
  val b4_null_flag = Q(
    "b4_null_flag",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       NULLIF(l_discount, 0.0) AS disc_or_null,
      |       CAST((NULLIF(l_discount, 0.0) IS NULL) AS BIGINT) AS disc_missing
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val x = nullif(col("l_discount"), lit(0.0))
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      x.as("disc_or_null"), x.isNull.as("disc_missing")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** B5 (codes.py:46-51): log1p transform. */
  val b5_log1p = Q(
    "b5_log1p",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       round(ln(1 + l_extendedprice), 6) AS log_price,
      |       round(ln(1 + l_quantity), 6) AS log_qty
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(log1p(col("l_extendedprice")), 6).as("log_price"),
      round(log1p(col("l_quantity")), 6).as("log_qty")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** B6 (codes.py:90): clip/cap — np.clip ≡ least/greatest. */
  val b6_clip = Q(
    "b6_clip",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       least(l_quantity, 25.0) AS qty_capped,
      |       greatest(least(l_quantity, 25.0), 5.0) AS qty_clipped
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      least(col("l_quantity"), lit(25.0)).as("qty_capped"),
      greatest(least(col("l_quantity"), lit(25.0)), lit(5.0)).as("qty_clipped")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** B7 (codes.py:50, §1.4-1): threshold → binary label with pandas
    * `NaN > 0 == False` semantics: null input must yield 0, not null. */
  val b7_threshold_label = Q(
    "b7_threshold_label",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(coalesce(CAST(NULLIF(l_discount, 0.0) > 0.02 AS BIGINT), 0) AS BIGINT) AS detected
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val x = nullif(col("l_discount"), lit(0.0))
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      coalesce((x > 0.02).cast(LongType), lit(0L)).as("detected")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** B10/B11/B12 (codes.py:29-31): date parts. weekday() is Mon=0 like
    * pandas `.dt.dayofweek` (≡ DuckDB isodow-1); NOT dayofweek() (Sun=1).
    * ISO week null-coalesces to -1 (codes.py:30, §1.4-2). */
  val b10_date_parts = Q(
    "b10_date_parts",
    """SELECT o_orderkey,
      |       CAST(month(o_orderdate) AS BIGINT) AS cmonth,
      |       CAST(coalesce(weekofyear(o_orderdate), -1) AS BIGINT) AS cweek,
      |       CAST(isodow(o_orderdate) - 1 AS BIGINT) AS cdow
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    orders(s, d).select(
      col("o_orderkey"),
      month(col("o_orderdate")).as("cmonth"),
      coalesce(weekofyear(col("o_orderdate")), lit(-1)).as("cweek"),
      weekday(col("o_orderdate")).as("cdow")
    ).orderBy("o_orderkey")
  }

  // ------------------------------------------------ C. imputation / cleaning

  /** C1 (codes.py:30,58,69): fillna with a constant. */
  val c1_fill_const = Q(
    "c1_fill_const",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       coalesce(NULLIF(l_tax, 0.0), 0.5) AS tax_filled
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      coalesce(nullif(col("l_tax"), lit(0.0)), lit(0.5)).as("tax_filled")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** C2 (codes.py:35-39,85): fillna(median) — EXACT interpolated median
    * (pandas semantics), never percentile_approx (§4.3-8). The scalar is
    * computed by Stats.exactMedian (distributed sort + global-index pick —
    * no whole-column aggregation buffer, scale-safe at 100 TB) and folded
    * into the plan as a literal, exactly the reference's two-pass shape.
    * Intentionally two-pass/eager; empty input degrades to no fill. */
  val c2_fill_median = Q(
    "c2_fill_median",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       round(coalesce(NULLIF(l_discount, 0.0),
      |                      (SELECT median(NULLIF(l_discount, 0.0)) FROM lineitem)), 6) AS disc_filled
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    val x = nullif(col("l_discount"), lit(0.0))
    val filled = graft.ops.Stats.exactMedian(li, x) match {
      case Some(m) => coalesce(x, lit(m))
      case None    => x
    }
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      round(filled, 6).as("disc_filled")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** C3 (codes.py:83-87): fillna(mode) with pandas' `mode()[0]` tie-break =
    * SMALLEST value — explicit count-then-min, never Spark's unspecified
    * `mode()` tie-break (§4.3-7). */
  val c3_fill_mode = Q(
    "c3_fill_mode",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       coalesce(NULLIF(l_returnflag, 'N'),
      |                (SELECT x FROM (SELECT NULLIF(l_returnflag, 'N') AS x, count(*) AS c
      |                                FROM lineitem WHERE NULLIF(l_returnflag, 'N') IS NOT NULL
      |                                GROUP BY 1 ORDER BY c DESC, x LIMIT 1))) AS flag_filled
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    val x = nullif(col("l_returnflag"), lit("N"))
    val filled = graft.ops.Stats.exactModeString(li, x) match {
      case Some(m) => coalesce(x, lit(m))
      case None    => x
    }
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      filled.as("flag_filled")
    ).orderBy("l_orderkey", "l_linenumber")
  }

  /** C5 (codes.py:96): deduplication over a column subset — rows fully equal,
    * so "keep first" vs "keep arbitrary" is immaterial (§2.C5). */
  val c5_dedup_exact = Q(
    "c5_dedup_exact",
    """SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_suppkey, l_returnflag, l_linestatus""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).select("l_suppkey", "l_returnflag", "l_linestatus")
      .dropDuplicates()
      .orderBy("l_suppkey", "l_returnflag", "l_linestatus")
  }

  /** C6 (codes.py:61-63,99-104): pd.cut binning (right=False ⇒ left-closed)
    * + ordinal codes with out-of-range/null → -1. */
  val c6_binning = Q(
    "c6_binning",
    """SELECT c_custkey,
      |       CASE WHEN c_acctbal < 0 THEN NULL
      |            WHEN c_acctbal < 1000 THEN 'Small'
      |            WHEN c_acctbal < 5000 THEN 'Medium'
      |            ELSE 'Large' END AS bal_group,
      |       CAST(CASE WHEN c_acctbal < 0 THEN -1
      |            WHEN c_acctbal < 1000 THEN 0
      |            WHEN c_acctbal < 5000 THEN 1
      |            ELSE 2 END AS BIGINT) AS bal_code
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val b = col("c_acctbal")
    customer(s, d).select(
      col("c_custkey"),
      when(b < 0, lit(null).cast(StringType))
        .when(b < 1000, "Small").when(b < 5000, "Medium")
        .otherwise("Large").as("bal_group"),
      when(b < 0, -1L).when(b < 1000, 0L).when(b < 5000, 1L)
        .otherwise(2L).as("bal_code")
    ).orderBy("c_custkey")
  }

  /** C7 (codes.py:117,141,195): drop rows with nulls in a column subset. */
  val c7_dropna_subset = Q(
    "c7_dropna_subset",
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_tax, l_discount
      |FROM lineitem
      |WHERE NULLIF(l_tax, 0.0) IS NOT NULL AND NULLIF(l_discount, 0.0) IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    lineitem(s, d)
      .withColumn("x", nullif(col("l_tax"), lit(0.0)))
      .withColumn("y", nullif(col("l_discount"), lit(0.0)))
      .na.drop(Seq("x", "y"))
      .select("l_orderkey", "l_linenumber", "l_tax", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ------------------------------------------------------- D. aggregations

  /** D1 (codes.py:67): group-by mean — partial/final hash aggregate. */
  val d1_group_mean = Q(
    "d1_group_mean",
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |       round(avg(c_acctbal), 4) AS avg_bal, count(*) AS n
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    customer(s, d).groupBy("c_nationkey")
      .agg(round(avg("c_acctbal"), 4).as("avg_bal"), count(lit(1)).as("n"))
      .orderBy("c_nationkey")
  }

  /** D2 (codes.py:143-144): group-by count (pandas .size()). */
  val d2_group_count = Q(
    "d2_group_count",
    """SELECT CAST(month(o_orderdate) AS BIGINT) AS cmonth, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    orders(s, d).groupBy(month(col("o_orderdate")).as("cmonth"))
      .agg(count(lit(1)).as("n")).orderBy("cmonth")
  }

  /** D3 (codes.py:35,83-87): global scalar aggregates — mean / exact median /
    * min-tie-break mode / count. Double sums ride as DECIMAL so summation
    * order can't shift the hash. Median/mode via the scale-safe Stats
    * helpers (no whole-column aggregation buffer), folded in as literals —
    * the reference's two-pass shape, intentionally eager. */
  val d3_global_aggs = Q(
    "d3_global_aggs",
    """SELECT round(avg(l_quantity), 6) AS avg_qty,
      |       median(l_quantity) AS med_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       (SELECT x FROM (SELECT l_returnflag AS x, count(*) AS c FROM lineitem
      |                       GROUP BY 1 ORDER BY c DESC, x LIMIT 1)) AS mode_flag,
      |       count(*) AS n
      |FROM lineitem""".stripMargin
  ) { (s, d) =>
    val li = lineitem(s, d)
    // mode and median are independent eager passes — overlap them
    // (graft.Par, guide §2.6); values identical to the sequential calls
    val (modeOpt, medOpt) = graft.Par.par2(
      graft.ops.Stats.exactModeString(li, col("l_returnflag")),
      graft.ops.Stats.exactMedian(li, col("l_quantity")))
    val modeFlag = modeOpt.orNull
    val medQty = medOpt.map(lit(_)).getOrElse(lit(null).cast(DoubleType))
    li.agg(
      round(avg("l_quantity"), 6).as("avg_qty"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_price"),
      count(lit(1)).as("n")
    ).withColumn("med_qty", medQty)
      .withColumn("mode_flag", lit(modeFlag))
  }

  /** D4/E2/B13 (codes.py:67-69): target encoding — group mean broadcast-joined
    * back onto every row, default 0.5 for unseen keys. The 0/1 sum is exact in
    * doubles, so no rounding hazard. */
  val d4_target_encode = Q(
    "d4_target_encode",
    """SELECT c.c_custkey, round(coalesce(m.nat_mean, 0.5), 6) AS nation_enc
      |FROM customer c
      |LEFT JOIN (SELECT c_nationkey, avg(CAST(c_acctbal > 0 AS DOUBLE)) AS nat_mean
      |           FROM customer GROUP BY 1) m
      |  ON c.c_nationkey = m.c_nationkey
      |ORDER BY c.c_custkey""".stripMargin
  ) { (s, d) =>
    val c = customer(s, d)
    val means = c.groupBy("c_nationkey")
      .agg(avg((col("c_acctbal") > 0).cast(DoubleType)).as("nat_mean"))
    c.join(broadcast(means), Seq("c_nationkey"), "left")
      .select(col("c_custkey"), round(coalesce(col("nat_mean"), lit(0.5)), 6).as("nation_enc"))
      .orderBy("c_custkey")
  }

  /** D5 (codes.py:119, §4.3-5): weekly resample, pandas `resample('W')` =
    * W-SUN right-closed/right-labeled ⇒ label = Sunday ending the Mon..Sun
    * week = ISO week start + 6 days. Closed-form group key: one shuffle. */
  val d5_weekly_resample = Q(
    "d5_weekly_resample",
    """SELECT CAST(CAST(date_trunc('week', ts) + INTERVAL 6 DAY AS DATE) AS VARCHAR) AS week_ending,
      |       round(avg(value), 4) AS avg_value, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    events(s, d)
      .groupBy(date_format(date_add(date_trunc("week", col("ts")).cast(DateType), 6), "yyyy-MM-dd").as("week_ending"))
      .agg(round(avg("value"), 4).as("avg_value"), count(lit(1)).as("n"))
      .orderBy("week_ending")
  }

  /** D5 windowed variant: same Mon..Sun tumbling weeks via time window()
    * (startTime "4 days" realigns the Thursday epoch to Monday); identical
    * result to the closed form, and the spec is batch/streaming-portable. */
  val d5_weekly_window = Q(
    "d5_weekly_window",
    """SELECT CAST(CAST(date_trunc('week', ts) + INTERVAL 6 DAY AS DATE) AS VARCHAR) AS week_ending,
      |       round(avg(value), 4) AS avg_value, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "7 days", "7 days", "4 days").as("w"))
      .agg(round(avg("value"), 4).as("avg_value"), count(lit(1)).as("n"))
      .select(date_format(date_add(col("w.end").cast(DateType), -1), "yyyy-MM-dd").as("week_ending"),
        col("avg_value"), col("n"))
      .orderBy("week_ending")
  }

  /** D6 (codes.py:141-147, §4.3-3): monthly detection rate — reference does
    * two group-bys + index-aligned merge; single-pass conditional aggregate
    * is semantically identical with one shuffle. Flagship `entry` query. */
  val d6_monthly_rate = Q(
    "d6_monthly_rate",
    """SELECT CAST(month(o_orderdate) AS BIGINT) AS cmonth,
      |       count(*) AS n_orders,
      |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_detected,
      |       round(100.0 * count(*) FILTER (WHERE o_orderstatus = 'F') / count(*), 4) AS detection_rate
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val det = sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
    orders(s, d)
      .groupBy(month(col("o_orderdate")).as("cmonth"))
      .agg(count(lit(1)).as("n_orders"), det.as("n_detected"),
        round(lit(100.0) * det / count(lit(1)), 4).as("detection_rate"))
      .orderBy("cmonth")
  }

  /** D7/F3 (codes.py:168): value_counts + top-k → TakeOrderedAndProject;
    * count ties broken by key for cross-engine determinism. */
  val d7_topk_counts = Q(
    "d7_topk_counts",
    """SELECT o_custkey, count(*) AS n FROM orders
      |GROUP BY 1 ORDER BY n DESC, o_custkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("o_custkey")).limit(10)
  }

  /** D8 (codes.py:296): confusion-matrix shape — label × predicted counts as
    * conditional aggregation (deterministic column names, unlike pivot). */
  val d8_confusion_pivot = Q(
    "d8_confusion_pivot",
    """SELECT CAST(l_discount > 0.05 AS BIGINT) AS label,
      |       CAST(count(*) FILTER (WHERE NOT l_tax > 0.04) AS BIGINT) AS pred_0,
      |       CAST(count(*) FILTER (WHERE l_tax > 0.04) AS BIGINT) AS pred_1
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    val pred = col("l_tax") > 0.04
    lineitem(s, d)
      .groupBy((col("l_discount") > 0.05).cast(LongType).as("label"))
      .agg(sum(when(!pred, 1L).otherwise(0L)).as("pred_0"),
        sum(when(pred, 1L).otherwise(0L)).as("pred_1"))
      .orderBy("label")
  }

  /** F3 variant: top-k by a DECIMAL-exact revenue sum, so the ranking itself
    * cannot flip on float summation order. */
  val f3_topk_sum = Q(
    "f3_topk_sum",
    """SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_suppkey LIMIT 5""".stripMargin
  ) { (s, d) =>
    lineitem(s, d).groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
      .orderBy(desc("revenue"), asc("l_suppkey")).limit(5)
  }

  // -------------------------------------------------------------- E. joins

  /** E1 (codes.py:145): left equi-join of two aggregates (both tiny →
    * broadcast-hash under AQE). */
  val e1_left_join = Q(
    "e1_left_join",
    """SELECT t.cmonth, t.n_orders, CAST(coalesce(p.n_p, 0) AS BIGINT) AS n_p
      |FROM (SELECT CAST(month(o_orderdate) AS BIGINT) AS cmonth, count(*) AS n_orders
      |      FROM orders GROUP BY 1) t
      |LEFT JOIN (SELECT CAST(month(o_orderdate) AS BIGINT) AS cmonth, count(*) AS n_p
      |           FROM orders WHERE o_orderstatus = 'P' GROUP BY 1) p
      |  ON t.cmonth = p.cmonth
      |ORDER BY t.cmonth""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    val total = o.groupBy(month(col("o_orderdate")).as("cmonth"))
      .agg(count(lit(1)).as("n_orders"))
    val ps = o.filter(col("o_orderstatus") === "P")
      .groupBy(month(col("o_orderdate")).as("cmonth"))
      .agg(count(lit(1)).as("n_p"))
    total.join(ps, Seq("cmonth"), "left")
      .select(col("cmonth"), col("n_orders"), coalesce(col("n_p"), lit(0L)).as("n_p"))
      .orderBy("cmonth")
  }

  /** E2 (codes.py:68): broadcast dimension joins — explicit broadcast() of the
    * small sides; at 100 TB fact scale these stay map-side. */
  val e2_broadcast_join = Q(
    "e2_broadcast_join",
    """SELECT c.c_custkey, n.n_name, r.r_name
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |ORDER BY c.c_custkey""".stripMargin
  ) { (s, d) =>
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")
  }

  /** E3 (codes.py:169): dynamic isin → left-semi join against a top-k list. */
  val e3_semi_join = Q(
    "e3_semi_join",
    """SELECT o_orderkey, o_custkey FROM orders
      |WHERE o_custkey IN (SELECT o_custkey FROM
      |  (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1
      |   ORDER BY n DESC, o_custkey LIMIT 10))
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val o = orders(s, d)
    val top10 = o.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("o_custkey")).limit(10)
      .select("o_custkey")
    o.join(broadcast(top10), Seq("o_custkey"), "left_semi")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------- F. sort / window

  /** F1 (codes.py:55): multi-key sort with a unique tiebreaker. */
  val f1_multi_sort = Q(
    "f1_multi_sort",
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal
      |FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin
  ) { (s, d) =>
    customer(s, d).select("c_nationkey", "c_custkey", "c_acctbal")
      .orderBy(asc("c_nationkey"), desc("c_acctbal"), asc("c_custkey"))
  }

  /** F2 (codes.py:56-59, §4.3-1): per-group lag with default 0 — the window
    * order includes the unique o_orderkey tiebreaker so date ties cannot make
    * the result nondeterministic (pandas relied on stable row order). */
  val f2_group_lag = Q(
    "f2_group_lag",
    """SELECT o_orderkey,
      |       lag(o_totalprice, 1, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev1,
      |       lag(o_totalprice, 2, 0.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev2
      |FROM orders ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, d).select(
      col("o_orderkey"),
      lag(col("o_totalprice"), 1, 0.0).over(w).as("prev1"),
      lag(col("o_totalprice"), 2, 0.0).over(w).as("prev2")
    ).orderBy("o_orderkey")
  }

  /** A21: size-targeted small-file compaction — the operational layout
    * fix every long-lived 100 TB table needs (streaming sinks,
    * per-partition upserts and per-task writers all fragment a table
    * into thousands of KB-scale files; NameNode/manifest pressure and
    * per-file open cost then dominate scans long before data volume
    * does). The op: a deliberately fragmented 64-way write simulates
    * the problem, the directory's REAL byte size (Hadoop
    * getContentSummary, through the session's filesystem — the a19/a20
    * sidecar discipline, so a non-local scratch URI works) sizes the
    * rewrite at ⌈bytes / 32 MiB⌉ output files, and the compacted copy
    * is read back. Declared output = content checksums (count + two
    * exact integer column sums) proving compaction is LOSSLESS — the
    * only thing a compactor must never change; CompactionSpec pins the
    * mechanics (64 fragments in, the computed file count out, fewer
    * files than fragments).
    *
    * Determinism: checksums are exact integer aggregates over integer
    * columns, identical whatever the file layout — which is the point.
    *
    * 100 TB posture: compaction is one repartition(n) rewrite per
    * partition-directory, embarrassingly parallel across partitions; n
    * from the manifest's byte size, never from a row count (rows don't
    * predict encoded size). At deployment the repartition is
    * `rebalance` /AQE-coalesce so no single file exceeds the target
    * even under skew. */
  val a21_compaction = Q(
    "a21_compaction",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(l_orderkey * 10 + l_linenumber) AS BIGINT) AS key_sum,
      |       CAST(sum(l_partkey) + sum(l_suppkey) AS BIGINT) AS part_supp_sum
      |FROM lineitem""".stripMargin
  ) { (s, d) =>
    val small = graft.Tables.scratchDir(s, d, "graft_compact_small")
    val big = graft.Tables.scratchDir(s, d, "graft_compact_out")
    lineitem(s, d).repartition(64).write.mode("overwrite").parquet(small)
    val p = new org.apache.hadoop.fs.Path(small)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(p).getLength
    val target = 32L * 1024 * 1024
    val nOut = math.max(1, ((bytes + target - 1) / target).toInt)
    s.read.parquet(small).repartition(nOut)
      .write.mode("overwrite").parquet(big)
    s.read.parquet(big).agg(
      count(lit(1)).cast("long").as("n_rows"),
      sum(col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
        .as("key_sum"),
      (sum(col("l_partkey")) + sum(col("l_suppkey"))).cast("long")
        .as("part_supp_sum"))
  }

  val all: Seq[Q] = Seq(
    a1_csv_roundtrip, a3_parquet_scan, a4_date_parse, a8_json_roundtrip,
    a11_orc_roundtrip, a13_text_roundtrip, a14_schema_merge, a15_corrupt_json,
    a16_codec_roundtrip, a17_corrupt_csv, a18_xml_roundtrip,
    a19_selective_ingest, a20_manifest_checked_read, a21_compaction,
    a22_avro_roundtrip,
    b1_projection, b2_derived, b3_filter, b4_null_flag, b5_log1p, b6_clip,
    b7_threshold_label, b10_date_parts,
    c1_fill_const, c2_fill_median, c3_fill_mode, c5_dedup_exact, c6_binning,
    c7_dropna_subset,
    d1_group_mean, d2_group_count, d3_global_aggs, d4_target_encode,
    d5_weekly_resample, d5_weekly_window, d6_monthly_rate, d7_topk_counts,
    d8_confusion_pivot, f3_topk_sum,
    e1_left_join, e2_broadcast_join, e3_semi_join,
    f1_multi_sort, f2_group_lag
  )
}
