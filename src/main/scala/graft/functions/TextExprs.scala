package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_shingle_set(toks, n): the DISTINCT ordered-token n-gram set of an
  * array<string>, as a native Catalyst expression with `doGenCode` — the
  * entry gate of the whole near-dup dedup family (SURVEY §2 L4/L5/L9 feed
  * off shingle sets).
  *
  * Why native: the HOF form
  * `array_distinct(transform(sequence(0, sz-n), i -> concat_ws(' ',
  * slice(toks, i+1, n))))` is evaluated INTERPRETED — per position it
  * allocates a slice array, runs the lambda-bound concat, and boxes the
  * sequence index; materializing the sf0.1 corpus' shingle frame measured
  * 7.4 s for 5 000 docs / 260 k shingles, which the shared-frame cache
  * then bills to the first declared consumer (l4 — 11.9 s of BENCH_r06's
  * 67 s total). This expression is one codegen'd sliding-window loop: each
  * position concatenates n UTF8String refs through a reused parts buffer
  * (`UTF8String.concatWs` — identical null-skipping join semantics) and
  * first-occurrence dedup happens in a LinkedHashSet, matching
  * `array_distinct` order exactly.
  *
  * Value parity with the HOF form is pinned by TextExprsSpec (random
  * arrays incl. empty strings / dupes / n > length) so every declared
  * query's oracle hash is unchanged. Fewer than n tokens → EMPTY array
  * (the HOF's `when` branch); null toks → null here, while `size(null)=-1`
  * sends the HOF to its empty-array branch — [[graft.ops.TextOps.shingleSet]]
  * restores that with one array-level coalesce (no per-element cost).
  */
case class ShingleSet(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(StringType, _) => true // UTF8_BINARY singleton only
      case _ => false
    }
    if (!arrOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable ||
      right.eval() == null || right.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName n must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSet =
    copy(left = newLeft, right = newRight)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val set = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var p = 0
    while (p + n <= sz) {
      var q = 0
      while (q < n) {
        parts(q) = if (toks.isNullAt(p + q)) null else toks.getUTF8String(p + q)
        q += 1
      }
      set.add(UTF8String.concatWs(space, parts: _*))
      p += 1
    }
    new GenericArrayData(set.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val spaceRef = ctx.addReferenceObj("shingleSep", space, classOf[UTF8String].getName)
      val sz = ctx.freshName("shSz"); val set = ctx.freshName("shSet")
      val parts = ctx.freshName("shParts"); val p = ctx.freshName("shP")
      val q = ctx.freshName("shQ")
      val u = classOf[UTF8String].getName
      s"""
         |final int $sz = $a.numElements();
         |final java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
         |final $u[] $parts = new $u[$n];
         |for (int $p = 0; $p + $n <= $sz; $p++) {
         |  for (int $q = 0; $q < $n; $q++) {
         |    $parts[$q] = $a.isNullAt($p + $q) ? null : $a.getUTF8String($p + $q);
         |  }
         |  $set.add($u.concatWs($spaceRef, $parts));
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
       """.stripMargin
    })
}

/** graft_xxhash64_array(arr[, seed]): elementwise `xxhash64` over an
  * array<string>, as one codegen'd loop returning array<bigint>.
  *
  * Bit-identical to `transform(arr, s -> xxhash64(s))` (no seed) and
  * `transform(arr, s -> xxhash64(s, lit(K)))` (seed K): Spark's multi-arg
  * xxhash64 CHAINS — h = hash(s, seed=42) then h = hash(K, h) — and this
  * loop replays exactly that via the same XXH64 primitives, INCLUDING
  * null elements: `HashExpression` is never-null — a null input hashes to
  * the bare seed (42), it does not propagate — so the output is always
  * containsNull=false and the loop fills an unboxed long[] (the dedup
  * family evaluates this over every shingle of every doc; a boxed
  * Object[] here was review finding r07). Why native at all: the
  * transform lambda is interpreted per element. The chain seed is a
  * CONSTRUCTOR parameter, not a child: a child literal would have to be
  * nullable-null for the unseeded form, and every default eval/codegen
  * path null-short-circuits on any null child. The SQL builder folds a
  * literal second argument into the parameter at build time. Parity
  * (null elements included) is pinned by TextExprsSpec.
  */
case class XxHash64Array(child: Expression, chainSeed: Option[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_xxhash64_array"

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val out = new Array[Long](sz)
    var i = 0
    while (i < sz) {
      var h =
        if (toks.isNullAt(i)) 42L
        else {
          val s = toks.getUTF8String(i)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      chainSeed.foreach(k =>
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(k, h))
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
    val u = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val sz = ctx.freshName("xaSz"); val i = ctx.freshName("xaI")
      val out = ctx.freshName("xaOut"); val s = ctx.freshName("xaS")
      val h = ctx.freshName("xaH")
      val chainStep =
        chainSeed.map(k => s"$h = $xxh.hashLong(${k}L, $h);").getOrElse("")
      s"""
         |final int $sz = $a.numElements();
         |final long[] $out = new long[$sz];
         |for (int $i = 0; $i < $sz; $i++) {
         |  long $h;
         |  if ($a.isNullAt($i)) {
         |    $h = 42L;
         |  } else {
         |    final $u $s = $a.getUTF8String($i);
         |    $h = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  $chainStep
         |  $out[$i] = $h;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }
}

/** graft_winnow(toks, k, w): winnowed document fingerprints (MOSS;
  * Schleimer, Wilkerson & Aiken, SIGMOD 2003) as ONE per-row codegen'd
  * expression — md5-hex each k-gram, take the minimum hex string of every
  * w-window of consecutive gram positions, return the distinct mins.
  *
  * Why native: the previous row-based form (TextOps.winnowFingerprints)
  * posexplodes every token and runs four window functions over the
  * doc-partitioned token rows — correct and 130× faster than the nested
  * HOF it replaced, but it still ships EVERY TOKEN of the corpus through
  * an exchange. Fingerprinting is per-document arithmetic; this loop
  * computes it with zero shuffle, which at 100 TB is a full corpus pass
  * saved (and measured 6.8 s → sub-second for l9 at sf0.1).
  *
  * Parity contract (pinned by TextExprsSpec against the row form,
  * null-element cases included): k-grams join with the null-skipping
  * single-space concat (UTF8String.concatWs ≡ concat_ws); a position
  * whose LAST token is null produces no gram — the row form's
  * `lead(__t, k-1).isNotNull` filter, replayed here so the two forms
  * never diverge (review finding r07; split() never yields nulls, so
  * real corpora don't exercise it, which is exactly why it must be
  * pinned); md5 is the commons-codec lowercase hex Spark's own `md5()`
  * wraps, so DuckDB derives identical strings; mins compare as UTF8 byte
  * order ≡ both engines' ASCII-hex string compare; fewer than w grams
  * (but ≥ 1) yield the single clipped-window min; no grams yield an
  * empty array; distinct keeps first-occurrence order. k and w must be
  * positive int literals. Null toks → null (callers coalesce if the
  * HOF's empty-on-null stance is needed).
  */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  private lazy val k: Int = second.eval().asInstanceOf[Int]
  private lazy val w: Int = third.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    def posLit(e: Expression) = e.dataType == IntegerType && e.foldable &&
      e.eval() != null && e.eval().asInstanceOf[Int] > 0
    if (!arrOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${first.dataType.simpleString}")
    else if (!posLit(second) || !posLit(third))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k and w must be positive int literals")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFingerprints =
    copy(first = newFirst, second = newSecond, third = newThird)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val n = sz - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[UTF8String](n)
    val parts = new Array[UTF8String](k)
    var m = 0 // surviving gram count — the compacted sequence windows slide over
    var p = 0
    while (p < n) {
      if (!toks.isNullAt(p + k - 1)) { // row-form lead(__t,k-1) filter
        var q = 0
        while (q < k) {
          parts(q) = if (toks.isNullAt(p + q)) null else toks.getUTF8String(p + q)
          q += 1
        }
        hs(m) = UTF8String.fromString(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(
            UTF8String.concatWs(space, parts: _*).getBytes))
        m += 1
      }
      p += 1
    }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.LinkedHashSet[UTF8String]()
    val nWin = math.max(m - w + 1, 1)
    var i = 0
    while (i < nWin) {
      var mn = hs(i)
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) { if (hs(j).compareTo(mn) < 0) mn = hs(j); j += 1 }
      set.add(mn)
      i += 1
    }
    new GenericArrayData(set.toArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val spaceRef = ctx.addReferenceObj("winnowSep", space, classOf[UTF8String].getName)
      val u = classOf[UTF8String].getName
      val sz = ctx.freshName("wnSz"); val n = ctx.freshName("wnN")
      val hs = ctx.freshName("wnHs"); val parts = ctx.freshName("wnParts")
      val p = ctx.freshName("wnP"); val q = ctx.freshName("wnQ")
      val set = ctx.freshName("wnSet"); val nWin = ctx.freshName("wnNWin")
      val i = ctx.freshName("wnI"); val j = ctx.freshName("wnJ")
      val m = ctx.freshName("wnM"); val end = ctx.freshName("wnEnd")
      val mm = ctx.freshName("wnM2")
      s"""
         |final int $sz = $a.numElements();
         |final int $n = $sz - $k + 1;
         |if ($n <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  final $u[] $hs = new $u[$n];
         |  final $u[] $parts = new $u[$k];
         |  int $mm = 0; // surviving grams — the compacted window sequence
         |  for (int $p = 0; $p < $n; $p++) {
         |    if ($a.isNullAt($p + $k - 1)) continue; // row-form lead filter
         |    for (int $q = 0; $q < $k; $q++) {
         |      $parts[$q] = $a.isNullAt($p + $q) ? null : $a.getUTF8String($p + $q);
         |    }
         |    $hs[$mm++] = $u.fromString(
         |      org.apache.commons.codec.digest.DigestUtils.md5Hex(
         |        $u.concatWs($spaceRef, $parts).getBytes()));
         |  }
         |  if ($mm == 0) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |  } else {
         |    final java.util.LinkedHashSet $set = new java.util.LinkedHashSet();
         |    final int $nWin = java.lang.Math.max($mm - $w + 1, 1);
         |    for (int $i = 0; $i < $nWin; $i++) {
         |      $u $m = $hs[$i];
         |      final int $end = java.lang.Math.min($i + $w, $mm);
         |      for (int $j = $i + 1; $j < $end; $j++) {
         |        if ($hs[$j].compareTo($m) < 0) $m = $hs[$j];
         |      }
         |      $set.add($m);
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
         |  }
         |}
       """.stripMargin
    })
}

/** graft_simhash64_md5(toks): the 64-bit SimHash of a token array from
  * md5-derived token hashes, as ONE per-row codegen'd expression — bit i
  * of the signature is the sign of Σ_tokens (bit i of hash(token) ? +1 :
  * −1), hash = the first 8 digest bytes as a big-endian long, exactly
  * [[graft.ops.TextOps.md5Hash64]]'s `conv(hex-slice)` arithmetic (which
  * is what keeps the l8 oracle able to replay signatures from DuckDB's
  * identical md5 hex).
  *
  * Why native: the grouped form explodes every token occurrence through a
  * doc-partitioned exchange and runs 64 conditional-sum aggregates; the
  * signature is per-document arithmetic, and this loop computes it with
  * zero shuffle and one digest per token. Value parity with the grouped
  * form is pinned by TextExprsSpec. Null array → null; EMPTY array →
  * null (the grouped form's absent row — explode emits nothing); null
  * ELEMENT → hashed as the empty string (concat_ws-style skip has no
  * meaning for single tokens, and split() never yields nulls).
  */
case class SimHash64Md5(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash64_md5"

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    if (sz == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < sz) {
      val bytes =
        if (toks.isNullAt(i)) Array.emptyByteArray else toks.getUTF8String(i).getBytes
      val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
      val h = java.nio.ByteBuffer.wrap(d).getLong
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sz = ctx.freshName("shSz"); val counts = ctx.freshName("shCounts")
      val i = ctx.freshName("shI"); val b = ctx.freshName("shB")
      val h = ctx.freshName("shH"); val sig = ctx.freshName("shSig")
      val bytes = ctx.freshName("shBytes")
      s"""
         |final int $sz = $a.numElements();
         |if ($sz == 0) { ${ev.isNull} = true; } else {
         |  final int[] $counts = new int[64];
         |  for (int $i = 0; $i < $sz; $i++) {
         |    final byte[] $bytes = $a.isNullAt($i)
         |      ? new byte[0] : $a.getUTF8String($i).getBytes();
         |    final long $h = java.nio.ByteBuffer.wrap(
         |      org.apache.commons.codec.digest.DigestUtils.md5($bytes)).getLong();
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($counts[$b] > 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
}

/** The imperative core of [[BpeEncodeWords]], shared verbatim by the
  * interpreted and codegen paths (the generated code calls the static
  * forwarder). One O(k·len) pass per word — symbols live in a reused
  * scratch buffer and each rule is a single read/write-pointer sweep, vs
  * the HOF fold chain's per-symbol accumulator copy (O(len²) PER RULE)
  * and 20-deep nested lambda evaluation. */
object BpeOps {
  private val EndMarker = UTF8String.fromString("</w>")

  /** words: array<string> tokens; rules: flat [a1,b1,a2,b2,…] in rank
    * order. Returns the flattened per-doc subword ArrayData. Null/empty
    * words contribute nothing (the HOF form's filter semantics). */
  def encode(words: ArrayData, rules: Array[UTF8String]): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 4)
    var buf = new Array[UTF8String](32)
    var wi = 0
    while (wi < n) {
      if (!words.isNullAt(wi)) {
        val w = words.getUTF8String(wi)
        val len = w.numChars()
        if (len > 0) {
          if (buf.length < len) buf = new Array[UTF8String](len)
          var i = 0
          while (i < len) { buf(i) = w.substring(i, i + 1); i += 1 }
          buf(len - 1) = UTF8String.concat(buf(len - 1), EndMarker)
          var symsLen = len
          var r = 0
          while (r < rules.length) {
            val a = rules(r); val b = rules(r + 1)
            // greedy leftmost non-overlap: a just-merged symbol (a+b) can
            // never equal `a` (b is non-empty), so the sweep needs no
            // re-merge guard — identical semantics to the fold rewrite
            var merged: UTF8String = null
            var wr = 0; var rd = 0
            while (rd < symsLen) {
              if (wr > 0 && buf(wr - 1).equals(a) && buf(rd).equals(b)) {
                if (merged == null) merged = UTF8String.concat(a, b)
                buf(wr - 1) = merged
              } else { buf(wr) = buf(rd); wr += 1 }
              rd += 1
            }
            symsLen = wr
            r += 2
          }
          var o = 0
          while (o < symsLen) { out += buf(o); o += 1 }
        }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** graft_bpe_encode(words, merges): whole-document BPE encoding as ONE
  * native expression — chars + `</w>` per word, then the k learned merge
  * rules applied in rank order, greedy-leftmost-non-overlapping, flattened
  * across words (SURVEY §2 L48; Sennrich et al. ACL 2016 §3).
  *
  * Why native: the HOF form (k chained `aggregate` folds, one per rule,
  * inside transform+flatten) rebuilds the accumulator array on EVERY
  * symbol step — O(len²) copying per rule per word, 20-deep nested
  * interpreted lambdas — and was the most expensive line in BENCH r12's
  * preview (10.2 s, above even the pair-cache build). This expression is
  * the same greedy fold run imperatively in [[BpeOps.encode]]: O(k·len)
  * with a reused scratch buffer. Value parity with the fold chain is
  * pinned by LlmOpsSpec (fixture corpus + adversarial repeat/overlap
  * words) and the l48 oracle hash is unchanged — the DuckDB CTE state
  * machine replays these exact semantics.
  *
  * merges must be a FOLDABLE array<string> literal of even length
  * [a1,b1,a2,b2,…] with non-null, non-empty elements — the frozen
  * trainer output, folded into the plan like the HOF form's literals
  * (nothing to broadcast, zero shuffles). Null words array → null. */
case class BpeEncodeWords(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Flat [a1,b1,…] rule table, parsed once from the foldable literal. */
  private lazy val rules: Array[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i))
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStrArr(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!isStrArr(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> words, got ${left.dataType.simpleString}")
    else if (!isStrArr(right.dataType) || !right.foldable || right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName merges must be a non-null array<string> literal")
    else {
      val arr = right.eval().asInstanceOf[ArrayData]
      val n = arr.numElements()
      val flatOk = n % 2 == 0 &&
        (0 until n).forall(i => !arr.isNullAt(i) && arr.getUTF8String(i).numChars() > 0)
      if (flatOk) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName merges must be flat non-empty [a1,b1,a2,b2,…] pairs")
    }
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeWords =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    BpeOps.encode(a.asInstanceOf[ArrayData], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val rulesRef = ctx.addReferenceObj("bpeRules", rules,
        "org.apache.spark.unsafe.types.UTF8String[]")
      s"${ev.value} = graft.functions.BpeOps.encode($a, $rulesRef);"
    })
}

/** graft_luhn_check(s): Luhn mod-10 checksum validation (ISO/IEC 7812 —
  * the check digit scheme of payment-card / IMEI / account numbers), the
  * precision half of a PII detector: a digit-run regex alone over-fires
  * on timestamps, ids and phone numbers, and the checksum is what
  * separates "13–19 digits" from "a number that could actually be a
  * card" (~90% of random digit strings fail it).
  *
  * Contract (replayed verbatim by the DuckDB oracle in l143): null → null;
  * empty or any non-digit character → false; otherwise, summing from the
  * RIGHTMOST digit with every second digit doubled (>9 → −9), valid iff
  * the total ≡ 0 (mod 10). Digits are validated at the BYTE level —
  * any multi-byte (non-ASCII) character falls outside '0'..'9' and
  * yields false, so no decode happens at all.
  *
  * Why native: the detector runs inside a corpus scan (the l16/l91
  * redaction family); this is one branch-free-ish byte loop inside
  * whole-stage codegen — no string decode, no per-char boxing, no
  * interpreted HOF lambda. Interpreted eval shares the same byte walk
  * (TextExprsSpec pins codegen ≡ interpreted ≡ a driver-side replay on
  * known vectors). */
/** Jaro similarity of two strings (Jaro 1989: the record-linkage
  * statistic — matches within a ⌊max(|a|,|b|)/2⌋−1 window, transposition
  * count halved, (m/|a| + m/|b| + (m−t)/m)/3). Contract pinned to
  * DuckDB's `jaro_similarity` so the oracle replays it: 0.0 when EITHER
  * side is empty — including both-empty, where the textbook form says 1
  * (TextExprsSpec pins this divergence explicitly). Operates on UTF-16
  * chars of the decoded string — identical to codepoints on the ASCII
  * corpus. Codegen emits one static call into [[JaroOps.sim]] (the
  * two-array matching loop is stateful; a call keeps the expression
  * inside whole-stage codegen without a 60-line inline splice). */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroOps.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroOps.sim($a, $b);")
}

/** The shared Jaro matching loop — called by both the interpreted and
  * codegen paths of [[JaroSimilarity]] (and by the spec's replay). */
object JaroOps {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB parity, incl. both-empty
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + md)
      var j = math.max(0, i - md)
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3.0
  }
}

case class LuhnCheck(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn_check"

  override protected def withNewChildInternal(newChild: Expression): LuhnCheck =
    copy(child = newChild)

  override def nullSafeEval(a: Any): Any =
    LuhnOps.valid(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("luhnN"); val sum = ctx.freshName("luhnSum")
      val ok = ctx.freshName("luhnOk"); val i = ctx.freshName("luhnI")
      val d = ctx.freshName("luhnD"); val pos = ctx.freshName("luhnPos")
      s"""
         |final int $n = $a.numBytes();
         |int $sum = 0; boolean $ok = $n > 0;
         |for (int $i = $n - 1, $pos = 0; $ok && $i >= 0; $i--, $pos++) {
         |  final int $d = (int) $a.getByte($i) - (int) '0';
         |  if ($d < 0 || $d > 9) { $ok = false; break; }
         |  $sum += ($pos % 2 == 1) ? ($d > 4 ? $d * 2 - 9 : $d * 2) : $d;
         |}
         |${ev.value} = $ok && $sum % 10 == 0;
       """.stripMargin
    })
}

/** The interpreted twin of [[LuhnCheck]]'s codegen loop — same byte walk,
  * shared with the spec's driver-side replay. */
object LuhnOps {
  def valid(s: UTF8String): Boolean = {
    val n = s.numBytes()
    if (n == 0) return false
    var sum = 0; var i = n - 1; var pos = 0
    while (i >= 0) {
      val d = s.getByte(i).toInt - '0'.toInt
      if (d < 0 || d > 9) return false
      sum += (if (pos % 2 == 1) { if (d > 4) d * 2 - 9 else d * 2 } else d)
      i -= 1; pos += 1
    }
    sum % 10 == 0
  }
}

object TextExprs {

  val shingleSetInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingle_set"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"graft_shingle_set takes 2 arguments, got ${exprs.length}")
      ShingleSet(exprs.head, exprs(1))
    })

  val xxhash64ArrayInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_xxhash64_array"),
    new ExpressionInfo(classOf[XxHash64Array].getName, "graft_xxhash64_array"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1 || exprs.length == 2,
        s"graft_xxhash64_array takes 1 or 2 arguments, got ${exprs.length}")
      val seed = exprs.lift(1).map { e =>
        require(e.foldable && e.dataType == LongType && e.eval() != null,
          "graft_xxhash64_array chain seed must be a non-null bigint literal")
        e.eval().asInstanceOf[Long]
      }
      XxHash64Array(exprs.head, seed)
    })

  val winnowInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 3, s"graft_winnow takes 3 arguments, got ${exprs.length}")
      WinnowFingerprints(exprs(0), exprs(1), exprs(2))
    })

  val simhashInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64_md5"),
    new ExpressionInfo(classOf[SimHash64Md5].getName, "graft_simhash64_md5"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, s"graft_simhash64_md5 takes 1 argument, got ${exprs.length}")
      SimHash64Md5(exprs.head)
    })

  val bpeEncodeInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_encode"),
    new ExpressionInfo(classOf[BpeEncodeWords].getName, "graft_bpe_encode"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"graft_bpe_encode takes 2 arguments, got ${exprs.length}")
      BpeEncodeWords(exprs.head, exprs(1))
    })

  val luhnInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_luhn_check"),
    new ExpressionInfo(classOf[LuhnCheck].getName, "graft_luhn_check"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 1, s"graft_luhn_check takes 1 argument, got ${exprs.length}")
      LuhnCheck(exprs.head)
    })

  val jaroInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaro"),
    new ExpressionInfo(classOf[JaroSimilarity].getName, "graft_jaro"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"graft_jaro takes 2 arguments, got ${exprs.length}")
      JaroSimilarity(exprs.head, exprs(1))
    })

  /** Idempotent per-session registration, mirroring [[VectorExprs.register]]. */
  def register(spark: SparkSession): Unit = {
    Seq(shingleSetInfo, xxhash64ArrayInfo, winnowInfo, simhashInfo,
      bpeEncodeInfo, luhnInfo, jaroInfo).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }

  /** 64-bit md5-based SimHash of a token array; null on empty/null input. */
  def simhash64Md5(toks: Column): Column =
    call_function("graft_simhash64_md5", toks)

  /** Distinct winnowed md5-hex fingerprints (array<string>), k-grams /
    * w-windows, first-occurrence order. */
  def winnow(toks: Column, k: Int, w: Int): Column =
    call_function("graft_winnow", toks, lit(k), lit(w))

  /** Distinct n-gram shingle set (array<string>), first-occurrence order. */
  def shingleSet(toks: Column, n: Int): Column =
    call_function("graft_shingle_set", toks, lit(n))

  /** Elementwise xxhash64 (array<bigint>); ≡ transform(arr, s -> xxhash64(s)). */
  def xxhash64Array(arr: Column): Column =
    call_function("graft_xxhash64_array", arr)

  /** Elementwise chained xxhash64 ≡ transform(arr, s -> xxhash64(s, lit(k))). */
  def xxhash64Array(arr: Column, chainSeed: Long): Column =
    call_function("graft_xxhash64_array", arr, lit(chainSeed))

  /** Luhn mod-10 checksum validity of a digit string (boolean; false on
    * empty/non-digit, null on null). */
  def luhnCheck(s: Column): Column =
    call_function("graft_luhn_check", s)

  /** Jaro similarity (double; 0.0 when either side is empty — DuckDB
    * `jaro_similarity` parity; null on null). */
  def jaroSimilarity(a: Column, b: Column): Column =
    call_function("graft_jaro", a, b)

  /** Flattened per-doc BPE subwords of a word array under the given merge
    * rules (rank order), as the native one-pass encode. */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", words,
      org.apache.spark.sql.functions.typedLit(
        merges.flatMap { case (a, b) => Seq(a, b) }))
}
