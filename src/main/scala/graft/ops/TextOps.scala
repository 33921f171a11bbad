package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY §7.4):
  * tokenization, n-gram shingling, MinHash signatures, LSH band keys,
  * SimHash, and winnowed document fingerprints.
  *
  * Everything is a catalyst higher-order-function EXPRESSION over the row's
  * own arrays — no UDFs, no mapPartitions — so each primitive stays inside
  * whole-stage codegen, shuffles nothing by itself, and scales per-row no
  * matter how many rows surround it. The only hash functions used are
  * `xxhash64` (engine-internal signatures; 64-bit, seedable via extra
  * columns) and `md5` (cross-engine fingerprints: DuckDB's md5() produces
  * the identical hex string, which is what makes fingerprints
  * oracle-checkable while xxhash64-based signatures are not).
  */
object TextOps {

  /** Whitespace tokenization after lowercasing (the reference corpus is
    * space-separated; see l1 for the regex variant). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** BPE-ish regex tokens: runs of letters, runs of digits, or single
    * non-space symbols — the usual pre-tokenizer shape. Restricted to ASCII
    * classes so the oracle regex engine agrees byte-for-byte. */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Ordered token n-grams joined by a single space. Empty when the doc has
    * fewer than n tokens (DuckDB `range(negative)` parity). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** The distinct shingle SET (Jaccard / MinHash operate on sets). Hot
    * (stopword) shingles are NOT capped out of the set: exact near-dup
    * candidate generation handles inverted-index skew with prefix
    * filtering instead (LlmQueries.jaccardNearDupFrom), which is lossless
    * by construction — a df-cap here silently lost pairs whose every
    * shared shingle was hot (ADVICE r04).
    *
    * Runs the native [[graft.functions.ShingleSet graft_shingle_set]]
    * loop, not `array_distinct(shingles(...))`: the HOF chain is
    * interpreted per position and dominated the shared shingle frame's
    * materialization (7.4 s of l4's BENCH_r06 cost at sf0.1). The
    * coalesce restores the HOF form's null contract (`size(null) = -1`
    * sent null toks to the empty-array branch) at array level — no
    * per-element cost. Value parity is pinned by TextExprsSpec. */
  def shingleSet(toks: Column, n: Int): Column =
    coalesce(graft.functions.TextExprs.shingleSet(toks, n),
      array().cast("array<string>"))

  /** k-permutation MinHash signatures, ROW-BASED: explode the shingle set,
    * hash each shingle ONCE into two 64-bit values, and build the k hash
    * families as Kirsch-Mitzenmacher combinations h1 + i·h2 inside one
    * map-side-combinable groupBy with k min-aggregates. Returns (idCol,
    * sig: array<bigint>). Docs with an empty shingle set produce no row —
    * they have no signature and can never be near-dup candidates.
    *
    * Deliberately NOT a nested higher-order expression
    * (`transform(seq(k), s -> array_min(transform(shingles, hash)))`):
    * Catalyst re-evaluates the inner lambda chain per outer element, going
    * O(k · |shingles| · cost(hash of full string)) with no subexpression
    * reuse — measured 70 s for 5000 short docs. The exploded form hashes
    * each shingle exactly once and stays in whole-stage codegen. */
  def minhashSignatures(docs: DataFrame, idCol: String, shingleSetCol: String,
      k: Int): DataFrame = {
    val hp = docs
      .select(col(idCol), explode(col(shingleSetCol)).as("__sh"))
      .select(col(idCol),
        xxhash64(col("__sh")).as("__h1"),
        xxhash64(col("__sh"), lit(0x9E3779B97F4A7C15L)).as("__h2"))
    val mins = (0 until k).map(i =>
      min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"__m$i"))
    hp.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Per-ROW MinHash signature — value-identical to [[minhashSignatures]]
    * (same xxhash64 h1 + i·h2 Kirsch-Mitzenmacher families, same Long
    * wraparound), but computed inside one row: each shingle is hashed
    * exactly twice, and the k-min fold runs in the NATIVE
    * [[graft.functions.MinHashSig graft_minhash]] expression (the
    * equivalent `aggregate`/`zip_with` HOF fold is interpreted —
    * measured ~10 s for 5000 docs at k=64; the codegen'd loop is
    * negligible). This is the form a STREAMING pipeline needs: the
    * exploded groupBy(id) form is a stateful aggregation, and chaining
    * it before another stateful operator (the LSH bucket store) is
    * exactly the multi-stateful topology Structured Streaming restricts.
    * Null (= no signature) on an empty shingle set, matching the grouped
    * form's absent row. Callers must have graft_minhash registered
    * (Tables.prep / GraftExtensions / SketchExprs.register). */
  def minhashRow(shingleSet: Column, k: Int): Column =
    graft.functions.SketchExprs.minhash(
      graft.functions.TextExprs.xxhash64Array(shingleSet),
      graft.functions.TextExprs.xxhash64Array(shingleSet, 0x9E3779B97F4A7C15L),
      k)

  /** LSH band keys: the signature split into b bands of r rows, each band
    * hashed to one 64-bit key. Two docs collide in band i iff their
    * signatures agree on ALL r rows of that band — P(collide) = 1-(1-J^r)^b.
    * Emits array<struct<band:int, key:bigint>> for exploding into the
    * band-bucket shuffle. */
  def lshBands(signature: Column, b: Int, r: Int): Column =
    transform(sequence(lit(0), lit(b - 1)),
      bi => struct(
        bi.cast("int").as("band"),
        xxhash64(slice(signature, bi * r + 1, lit(r))).as("key")))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact Jaccard of two SORTED shingle-set columns via the native
    * allocation-free merge ([[graft.functions.SortedIntersectCount]]) —
    * the verify-path variant of [[jaccard]] for loops that score millions
    * of candidate pairs per task. Requires both arrays sorted ascending
    * (`sort_array`), binary collation. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = graft.functions.SetExprs.sortedIntersectCount(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** The first 64 bits of md5(token) as a signed BIGINT (big-endian: hex
    * chars 1-8 are the high word, 9-16 the low word). Slower than xxhash64
    * (the scale default) but derivable in ANSI SQL from the identical hex
    * string — which is what makes a simhash built on it oracle-checkable
    * cross-engine (l8). */
  def md5Hash64(t: Column): Column = {
    val hex = md5(t.cast("binary"))
    shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))
  }

  /** 64-bit SimHashes, ROW-BASED: bit i of a doc's signature is the sign of
    * Σ_tokens (bit i of hash(token) ? +1 : -1). Each token is hashed
    * ONCE; the 64 bit-sums are plain conditional aggregates in one
    * groupBy pass; the bits assemble in a final projection. Returns
    * (idCol, sig: bigint). Same rationale as minhashSignatures: the nested
    * HOF form re-hashes every token once per bit. `tokenHash` defaults to
    * xxhash64 (fastest); pass [[md5Hash64]] for the cross-engine variant. */
  def simhashes(docs: DataFrame, idCol: String, toksCol: String,
      tokenHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val h = docs.select(col(idCol), explode(col(toksCol)).as("__t"))
      .select(col(idCol), tokenHash(col("__t")).as("__h"))
    val sums = (0 until 64).map(i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        .as(s"__b$i"))
    h.groupBy(idCol).agg(sums.head, sums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"__b$i") > 0L, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sig"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowed document fingerprints (MOSS-style), ROW-BASED: md5-hash every
    * ORDERED k-gram, slide a window of w consecutive hashes, keep each
    * window's minimum, distinct the survivors. Guarantees any match of
    * length ≥ w+k-1 tokens shares a fingerprint, at ~1/w the storage of
    * full shingling. md5 (not xxhash64) so DuckDB derives the identical
    * set. Returns distinct (idCol, fp).
    *
    * Shingles come from lead() over exploded tokens and the window minima
    * from a rowsBetween frame — one shuffle on the doc id, everything in
    * whole-stage codegen. (The nested-HOF form re-evaluated the full
    * hash-array chain per window: O(windows · shingles · tokens) string
    * work per doc — measured 300+ s for 5000 short docs.) */
  def winnowFingerprints(docs: DataFrame, idCol: String, toksCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1)
    val byPos = Window.partitionBy(idCol).orderBy("__pos")
    val toksRows = docs.select(col(idCol), posexplode(col(toksCol)).as(Seq("__pos", "__t")))
    val gram = concat_ws(" ",
      (0 until k).map(i => if (i == 0) col("__t") else lead(col("__t"), i).over(byPos)): _*)
    val shingleRows = toksRows
      .withColumn("__last", lead(col("__t"), k - 1).over(byPos))
      .withColumn("__sh", gram)
      .filter(col("__last").isNotNull) // positions with a full k-gram
      .select(col(idCol), col("__pos"), md5(col("__sh").cast("binary")).as("__h"))
    val frame = Window.partitionBy(idCol).orderBy("__pos")
      .rowsBetween(Window.currentRow, w - 1)
    val nSh = Window.partitionBy(idCol)
    shingleRows
      .withColumn("__fp", min("__h").over(frame))
      .withColumn("__rk", row_number().over(byPos))
      .withColumn("__n", count(lit(1)).over(nSh))
      // window starts: ranks 1 .. n-w+1 (a short doc keeps its single
      // clipped window at rank 1 = min over all shingles)
      .filter(col("__rk") <= greatest(col("__n") - (w - 1), lit(1)))
      .select(col(idCol), col("__fp").as("fp"))
      .distinct()
  }
}
