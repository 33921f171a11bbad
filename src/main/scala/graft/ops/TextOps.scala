package graft.ops

import org.apache.spark.sql.Column
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

  /** The distinct shingle SET (Jaccard / MinHash operate on sets). */
  def shingleSet(toks: Column, n: Int): Column = array_distinct(shingles(toks, n))

  /** k-permutation MinHash signature of a shingle set: element s of the
    * signature is min over shingles of xxhash64(shingle, s) — hashing the
    * (shingle, seed) tuple gives k independent hash families without any
    * precomputed coefficients. Null (empty set) hashes to no signature. */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingleSet, sh => xxhash64(sh, s))))

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

  /** 64-bit SimHash over a token array: bit i of the result is the sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : -1). Near-identical docs give
    * near-identical simhashes (small Hamming distance). Bit tests use a
    * literal mask array (shift amounts can't be lambda variables). */
  def simhash64(toks: Column): Column = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, masks,
        (a, m) => a + when(xxhash64(t).bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0L, m).otherwise(lit(0L))),
      lit(0L),
      (acc, m) => acc.bitwiseOR(m))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowed document fingerprints (MOSS-style): md5-hash every ORDERED
    * k-gram, slide a window of w consecutive hashes, keep each window's
    * minimum, distinct the survivors. Guarantees any match of length
    * ≥ w+k-1 tokens shares a fingerprint, at ~1/w the storage of full
    * shingling. md5 (not xxhash64) so DuckDB derives the identical set. */
  def winnowedFingerprints(toks: Column, k: Int, w: Int): Column = {
    val hashes = transform(shingles(toks, k), sh => md5(sh.cast("binary")))
    array_distinct(
      when(size(hashes) >= w,
        transform(sequence(lit(0), size(hashes) - w),
          i => array_min(slice(hashes, i + 1, lit(w)))))
        .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
          .otherwise(array().cast("array<string>"))))
  }
}
