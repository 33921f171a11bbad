package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** graft_minhash(h1s, h2s, k): the k-permutation MinHash signature from two
  * parallel arrays of per-shingle 64-bit hashes, as a native Catalyst
  * expression — family i's value is min over shingles of h1 + i·h2
  * (Kirsch-Mitzenmacher), identical Long wraparound to the engine's other
  * two MinHash forms (TextOps.minhashSignatures / minhashRow's HOF fold).
  *
  * Why native: the per-ROW signature is what a streaming dedup pipeline
  * must use (a grouped signature is a second stateful operator), but the
  * `aggregate`/`zip_with` HOF fold is interpreted — k·|shingles| lambda
  * dispatches per document (measured ~10 s for 5000 docs at k=64). This
  * compiles to the two-level primitive loop (running v += h2 instead of a
  * multiply per family) over the ArrayData buffers: no lambda, no
  * per-element allocation.
  *
  * Null stance matches [[DotProduct]]: null array → null; null ELEMENT →
  * null (branch emitted only when the static type admits it). EMPTY input
  * → null — "no shingles, no signature", the grouped form's absent row.
  * Lengths should be equal (parallel arrays); the loop takes min(len)
  * defensively. k must be a foldable positive integer literal.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private lazy val elementsNullable: Boolean = Seq(first, second).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  // empty input yields null even when children never do
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (!arraysOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> hash arrays, got " +
          Seq(first, second).map(_.dataType.simpleString).mkString(", "))
    else if (third.dataType != IntegerType || !third.foldable ||
      third.eval() == null || third.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) return null
    val acc = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      val h2 = y.getLong(i)
      var v = x.getLong(i)
      var j = 0
      while (j < k) { if (v < acc(j)) acc(j) = v; v += h2; j += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _) => {
      val n = ctx.freshName("mhN"); val i = ctx.freshName("mhI")
      val j = ctx.freshName("mhJ"); val acc = ctx.freshName("mhAcc")
      val h2 = ctx.freshName("mhH2"); val v = ctx.freshName("mhV")
      val nullCheck =
        if (elementsNullable)
          s"  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }\n"
        else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  final long[] $acc = new long[$k];
         |  java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |$nullCheck    final long $h2 = $b.getLong($i);
         |    long $v = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($v < $acc[$j]) $acc[$j] = $v;
         |      $v += $h2;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |  }
         |}
       """.stripMargin
    })
}

object SketchExprs {

  val minhashInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 3, s"graft_minhash takes 3 arguments, got ${exprs.length}")
      MinHashSig(exprs(0), exprs(1), exprs(2))
    })

  /** Idempotent per-session registration, mirroring [[VectorExprs.register]]. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = minhashInfo
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** MinHash signature (array<bigint>, length k) from parallel h1/h2 arrays. */
  def minhash(h1s: Column, h2s: Column, k: Int): Column =
    call_function("graft_minhash", h1s, h2s, org.apache.spark.sql.functions.lit(k))
}
