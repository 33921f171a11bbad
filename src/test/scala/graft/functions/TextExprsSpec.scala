package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The native graft_shingle_set / graft_xxhash64_array expressions must be
  * DROP-INs for the interpreted HOF forms they replaced — element-for-
  * element identical output (ORDER included: array_distinct keeps first
  * occurrence, xxhash64 chains h = hash(s, 42) then hash(K, h)) — or every
  * declared near-dup query's oracle hash would shift.
  */
class TextExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofShingleSet(toks: org.apache.spark.sql.Column, n: Int) =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))

  test("shingle set matches the HOF form on random token arrays, n=1..4") {
    TextExprs.register(spark)
    val rnd = new scala.util.Random(7)
    // tiny vocab (forces duplicate shingles), empty tokens (double spaces
    // in real text), lengths straddling every n
    val rows = (0 until 400).map { i =>
      val toks = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(8) == 0) "" else s"w${rnd.nextInt(5)}")
      (i, toks)
    }
    val df = rows.toDF("id", "toks")
    for (n <- 1 to 4) {
      val mism = df.select(
          graft.ops.TextOps.shingleSet(col("toks"), n).as("native"),
          hofShingleSet(col("toks"), n).as("hof"))
        .filter(not(col("native") <=> col("hof")))
        .count()
      assert(mism === 0L, s"shingle mismatch at n=$n")
    }
  }

  test("shingle set on the real corpus matches the HOF form") {
    TextExprs.register(spark)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = graft.ops.TextOps.tokens(col("text"))
    val mism = docs.select(
        graft.ops.TextOps.shingleSet(toks, 3).as("native"),
        hofShingleSet(toks, 3).as("hof"))
      .filter(not(col("native") <=> col("hof")))
      .count()
    assert(mism === 0L)
  }

  test("xxhash64 array matches transform(xxhash64) with and without chain seed") {
    TextExprs.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      (i, Seq.fill(rnd.nextInt(20))(s"s${rnd.nextInt(1000)} x${rnd.nextInt(10)}"))
    }
    val df = rows.toDF("id", "arr")
    val k = 0x9E3779B97F4A7C15L
    val mism = df.select(
        TextExprs.xxhash64Array(col("arr")).as("n1"),
        transform(col("arr"), s => xxhash64(s)).as("h1"),
        TextExprs.xxhash64Array(col("arr"), k).as("n2"),
        transform(col("arr"), s => xxhash64(s, lit(k))).as("h2"))
      .filter(not(col("n1") <=> col("h1")) || not(col("n2") <=> col("h2")))
      .count()
    assert(mism === 0L)
  }

  test("winnow matches the row-based window form on random corpora and real docs") {
    TextExprs.register(spark)
    val rnd = new scala.util.Random(23)
    // lengths straddle: 0 tokens, < k, k..k+w, long; tiny vocab forces
    // duplicate grams and duplicate window mins
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(6)}"))
    }
    val df = rows.toDF("doc_id", "toks")
    for ((k, w) <- Seq((3, 4), (2, 5), (1, 1))) {
      val native = df.select(col("doc_id"),
          explode(TextExprs.winnow(col("toks"), k, w)).as("fp"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val rowForm = graft.ops.TextOps.winnowFingerprints(df, "doc_id", "toks", k, w)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(native === rowForm, s"winnow mismatch at k=$k w=$w")
    }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
    val native = docs.select(col("doc_id"),
        explode(TextExprs.winnow(col("toks"), 3, 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rowForm = graft.ops.TextOps.winnowFingerprints(docs, "doc_id", "toks", 3, 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native === rowForm)
  }

  test("null elements: xxhash64 array hashes null to the seed like transform; winnow drops the row-form's lead-filtered positions") {
    TextExprs.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(0L, Seq("a", null, "b", "c")), // interior null: concat_ws-skipped
      Row(1L, Seq(null, "a", "b", null)), // null at both gram-end positions
      Row(2L, Seq("a", "b", "c", "d")))
    // RDD-backed so the projection reaches codegen
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    // xxhash64: HashExpression is never-null — a null input hashes to the
    // bare seed — so transform emits 42 (or hash(K, 42) chained), never null
    val k = 0x9E3779B97F4A7C15L
    val hm = df.select(
        TextExprs.xxhash64Array(col("toks")).as("n1"),
        transform(col("toks"), s => xxhash64(s)).as("h1"),
        TextExprs.xxhash64Array(col("toks"), k).as("n2"),
        transform(col("toks"), s => xxhash64(s, lit(k))).as("h2"))
      .collect()
    hm.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getSeq[Long](2) === r.getSeq[Long](3))
    }
    // winnow: a position whose LAST token is null produces no gram (the
    // row form's lead(__t, k-1).isNotNull filter); surviving grams form
    // the compacted sequence the windows slide over
    val tf = df.select(col("doc_id"), col("toks"))
    val native = tf.select(col("doc_id"),
        explode(TextExprs.winnow(col("toks"), 2, 2)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val rowForm = graft.ops.TextOps.winnowFingerprints(tf, "doc_id", "toks", 2, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native === rowForm)
  }

  test("simhash matches the grouped conditional-sum form (md5 hash family)") {
    TextExprs.register(spark)
    val rnd = new scala.util.Random(31)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(25))(s"w${rnd.nextInt(12)}"))
    }
    val df = rows.toDF("doc_id", "toks")
    def asMap(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = asMap(df.select(col("doc_id"),
      TextExprs.simhash64Md5(col("toks")).as("sig")).collect())
    val grouped = asMap(graft.ops.TextOps.simhashes(
      df, "doc_id", "toks", graft.ops.TextOps.md5Hash64).collect())
    assert(native === grouped)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
    val n2 = asMap(docs.select(col("doc_id"),
      TextExprs.simhash64Md5(col("toks")).as("sig")).collect())
    val g2 = asMap(graft.ops.TextOps.simhashes(
      docs, "doc_id", "toks", graft.ops.TextOps.md5Hash64).collect())
    assert(n2 === g2)
  }

  test("null stance: null toks -> empty set via TextOps, null element skipped like concat_ws") {
    TextExprs.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("toks", ArrayType(StringType, containsNull = true))))
    val rows = Seq(
      Row(null),
      Row(Seq("a", null, "b")),
      Row(Seq("a", "b", "c", "a", "b", "c")))
    // RDD-backed so the projection reaches codegen (a local Seq constant-
    // folds through ConvertToLocalRelation → interpreted eval)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(
        graft.ops.TextOps.shingleSet(col("toks"), 2).as("native"),
        hofShingleSet(col("toks"), 2).as("hof"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // and the same rows through the interpreted path (constant-folded)
    val lit0 = Seq(Seq("a", "b", "c", "a")).toDF("toks")
    val g2 = lit0.select(graft.ops.TextOps.shingleSet(col("toks"), 2)).collect()
    assert(g2.head.getSeq[String](0) === Seq("a b", "b c", "c a"))
  }

  /** Pure-Scala greedy leftmost non-overlapping BPE fold — the reference
    * semantics graft_bpe_encode and the HOF chain must both reproduce. */
  private def refBpe(words: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    words.filter(_.nonEmpty).flatMap { w =>
      val chs = w.map(_.toString).toVector
      var syms = chs.init :+ (chs.last + "</w>")
      for ((a, b) <- rules) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
          else out += s
        }
        syms = out.toVector
      }
      syms
    }

  test("bpe encode: native ≡ HOF fold chain ≡ driver reference on random words/rules") {
    TextExprs.register(spark)
    val rnd = new scala.util.Random(31)
    // tiny alphabet so random rules actually fire; é exercises multi-byte
    val alpha = Vector("x", "y", "é")
    val sylls = alpha ++ Vector("xx", "xy", "yx", "éy",
      "x</w>", "y</w>", "é</w>", "xx</w>", "xy</w>")
    var anyMerged = false
    for (_ <- 0 until 15) {
      val rules = Seq.fill(1 + rnd.nextInt(5))(
        (sylls(rnd.nextInt(sylls.size)), sylls(rnd.nextInt(sylls.size))))
      val rows = (0 until 25).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(4))(
          if (rnd.nextInt(10) == 0) ""
          else Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(alpha.size))).mkString)
        (i.toLong, words)
      }
      val df = rows.toDF("id", "words")
      val got = df.select(col("id"),
          TextExprs.bpeEncode(col("words"), rules).as("native"),
          flatten(transform(col("words"),
            w => graft.queries.LlmQueries.bpeEncodeWord(w, rules))).as("hof"))
        .as[(Long, Seq[String], Seq[String])].collect()
      val byId = rows.toMap
      got.foreach { case (id, native, hof) =>
        val ref = refBpe(byId(id), rules)
        assert(native === ref, s"native diverges for words=${byId(id)} rules=$rules")
        assert(hof === ref, s"HOF diverges for words=${byId(id)} rules=$rules")
        if (native.exists(_.stripSuffix("</w>").length > 1)) anyMerged = true
      }
    }
    assert(anyMerged, "no random case produced a merge — the property is vacuous")
  }

  /** Independent driver-side Luhn (char-based, reversed-list fold — a
    * different shape from the expression's byte walk on purpose). */
  private def refLuhn(s: String): Boolean =
    s.nonEmpty && s.forall(_.isDigit) && {
      s.reverse.zipWithIndex.map { case (ch, pos) =>
        val d = ch - '0'
        if (pos % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    }

  test("luhn check: known vectors, codegen = interpreted = driver replay, " +
      "and the check-digit property") {
    TextExprs.register(spark)
    import org.apache.spark.unsafe.types.UTF8String
    // classic vector + its nine mutated check digits: exactly one valid
    val classic = (0 to 9).map(d => s"7992739871$d")
    assert(refLuhn("79927398713"))
    val rnd = new scala.util.Random(11)
    val randoms = (0 until 300).map(_ =>
      (1 to (7 + rnd.nextInt(12))).map(_ => rnd.nextInt(10)).mkString)
    // check-digit property: body + the one completing digit is valid
    val completed = randoms.map { body =>
      (0 to 9).map(d => body + d).find(refLuhn)
        .getOrElse(fail(s"no completing check digit for $body"))
    }
    val weird = Seq("", "0", "00", "59", "4111 1111", "x79927398713",
      "٧٩٩٢", "1234567890123456789")
    val inputs = (classic ++ randoms ++ completed ++ weird).distinct
    val got = inputs.toDF("s")
      .select(col("s"), TextExprs.luhnCheck(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    inputs.foreach { s =>
      assert(got(s) === refLuhn(s), s"codegen diverges from replay on '$s'")
      assert(LuhnOps.valid(UTF8String.fromString(s)) === refLuhn(s),
        s"interpreted diverges from replay on '$s'")
    }
    assert(classic.count(got) === 1 && got("79927398713"),
      "exactly the classic vector must validate among its mutations")
    assert(completed.forall(got), "every completed random body must validate")
    assert(!got("") && !got("4111 1111") && !got("٧٩٩٢"),
      "empty / spaced / non-ASCII digits must be false")
    // null propagates (nullSafeEval)
    val nv = Seq((1, null: String)).toDF("id", "s")
      .select(TextExprs.luhnCheck(col("s"))).collect()
    assert(nv.head.isNullAt(0), "null input must stay null")
  }

  /** Independent Jaro reimplementation (textbook form EXCEPT the pinned
    * DuckDB empty-contract) — the spec-local replay the codegen and
    * interpreted paths are judged against. */
  private def refJaro(s1: String, s2: String): Double = {
    val (l1, l2) = (s1.length, s2.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m2 = Array.fill(l2)(false)
    val matches1 = (0 until l1).map { i =>
      val j = (math.max(0, i - md) to math.min(l2 - 1, i + md))
        .find(j => !m2(j) && s1(i) == s2(j))
      j.foreach(m2(_) = true)
      j.isDefined
    }
    val m = matches1.count(identity)
    if (m == 0) return 0.0
    val a = (0 until l1).filter(matches1)
    val b = (0 until l2).filter(m2)
    val t = a.zip(b).count { case (i, j) => s1(i) != s2(j) } / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  test("jaro: known vectors, codegen = interpreted = replay, DuckDB empty contract") {
    TextExprs.register(spark)
    import org.apache.spark.unsafe.types.UTF8String
    val known = Seq(
      ("martha", "marhta", 17.0 / 18), // the Winkler paper's classic
      ("dixon", "dicksonx", 0.7666666666666666),
      ("crate", "trace", 0.7333333333333334),
      ("abc", "abc", 1.0),
      ("a", "b", 0.0),
      // window ⌊2/2⌋−1 = 0: adjacent transposition at length 2 can never
      // match — 0, not the "half transposition" intuition
      ("ab", "ba", 0.0))
    known.foreach { case (a, b, exp) =>
      assert(math.abs(refJaro(a, b) - exp) < 1e-12, s"replay wrong on ($a,$b)")
    }
    val rnd = new scala.util.Random(17)
    def randStr() = (0 until rnd.nextInt(13))
      .map(_ => "abcde ".charAt(rnd.nextInt(6))).mkString
    val pairs = known.map(k => (k._1, k._2)) ++
      Seq(("", ""), ("a", ""), ("", "a")) ++
      (0 until 400).map(_ => (randStr(), randStr()))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        TextExprs.jaroSimilarity(col("a"), col("b")).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === refJaro(a, b), s"codegen diverges from replay on ($a, $b)")
      assert(JaroOps.sim(UTF8String.fromString(a), UTF8String.fromString(b))
        === refJaro(a, b), s"interpreted diverges from replay on ($a, $b)")
    }
    assert(got(("", "")) === 0.0,
      "both-empty is 0 — the DuckDB-parity contract, NOT the textbook 1")
    val nv = Seq((null: String, "x")).toDF("a", "b")
      .select(TextExprs.jaroSimilarity(col("a"), col("b"))).collect()
    assert(nv.head.isNullAt(0), "null input must stay null")
  }
}
