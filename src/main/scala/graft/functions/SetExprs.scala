package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** graft_sorted_intersect_count(a, b): |a ∩ b| of two SORTED (ascending,
  * binary collation) array<string> columns as a native Catalyst expression
  * with `doGenCode` — the verify-path primitive of the near-dup dedup
  * family (SURVEY §2 L4/L5).
  *
  * Why not `size(array_intersect(a, b))` (the engine's previous verify)?
  * `ArrayIntersect` builds a hash set over one side and MATERIALIZES the
  * intersection array per row, only for `size` to throw it away — per
  * candidate pair that's two O(n) allocations plus hashing of every
  * ~30-char shingle string. Candidate verification evaluates this millions
  * of times per task at corpus scale (it is the hot loop of l4/l5: 310k
  * candidate pairs at sf0.1 for 25 survivors). This expression is a single
  * allocation-free merge walk over the two pre-sorted arrays: one
  * UTF8String binary compare per step, no set, no output array.
  *
  * Contract: inputs must be sorted ascending in UTF8 BINARY order —
  * exactly what `sort_array` produces for default-collation strings; the
  * type check rejects non-binary collations, where `sort_array`'s order
  * would disagree with the merge compare. Duplicate elements count
  * min(multiplicity) times (sets — the intended input — are unaffected).
  * Null array → null; null ELEMENT → null, branch emitted only when the
  * static input type admits null elements (same stance as [[DotProduct]]:
  * the function is SQL-exposed, and reading a null slot through ArrayData
  * would silently return garbage).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  /** True when either input's STATIC type admits null elements. Lazy val:
    * the interpreted path reads it per row. */
  private lazy val elementsNullable: Boolean = children.exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(StringType, _) => true // the UTF8_BINARY singleton only
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> (binary collation) arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(j))) return null
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp < 0) i += 1
      else if (cmp > 0) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("sicNx"); val ny = ctx.freshName("sicNy")
      val i = ctx.freshName("sicI"); val j = ctx.freshName("sicJ")
      val c = ctx.freshName("sicC"); val cmp = ctx.freshName("sicCmp")
      // `nullable` includes elementsNullable, so ev.isNull is a real
      // variable (not FalseLiteral) whenever the null branch is emitted
      val nullCheck =
        if (elementsNullable)
          s"  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }\n"
        else ""
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |$nullCheck  final int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp < 0) { $i++; }
         |  else if ($cmp > 0) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
}

object SetExprs {

  val sortedIntersectCountInfo
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName,
      "graft_sorted_intersect_count"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2,
        s"graft_sorted_intersect_count takes 2 arguments, got ${exprs.length}")
      SortedIntersectCount(exprs.head, exprs(1))
    })

  /** Idempotently register in the session's function registry — the
    * per-session route mirroring [[VectorExprs.register]];
    * [[graft.plans.GraftExtensions]] is the spark.sql.extensions route. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = sortedIntersectCountInfo
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** |a ∩ b| of two SORTED array<string> columns via the native merge. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)
}
