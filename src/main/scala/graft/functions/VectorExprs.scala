package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** graft_dot(a, b): the dot product of two array<double> columns as a
  * NATIVE Catalyst expression with `doGenCode` — the hot-path primitive of
  * the similarity-search / embedding-dedup family (SURVEY §2 L6/L7/L11).
  *
  * Why not the higher-order-function form `aggregate(zip_with(a, b, *), +)`
  * (the engine's previous implementation)? Spark's higher-order functions
  * are `CodegenFallback`: every evaluation walks an interpreted lambda tree
  * and allocates an intermediate array for `zip_with`, and sitting in the
  * middle of an otherwise codegen'd projection they also break the
  * surrounding WholeStageCodegen span. This expression compiles to a tight
  * primitive loop over the two `ArrayData` buffers — no allocation, no
  * virtual dispatch per element — exactly what a scan scoring millions of
  * candidate pairs per task needs at 100 TB.
  *
  * Semantics are pinned to the HOF form it replaces so every declared
  * query's oracle hash is unchanged: left-to-right summation (bit-identical
  * doubles), null array → null, any null ELEMENT → null (ADVICE r05: the
  * function is SQL-exposed via GraftExtensions, so a caller can hand it
  * `array<double>` with containsNull=true — reading those slots through
  * ArrayData.getDouble would return garbage silently). The null check is
  * emitted ONLY when the static input type says containsNull; the engine's
  * own embedding columns are containsNull=false and keep the branch-free
  * loop. Lengths should be equal — the loop takes min(len) defensively.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  /** True when either input's STATIC type admits null elements. Lazy val,
    * not def: the interpreted path reads it per ROW (nullSafeEval) and the
    * planner per nullable query; a `copy` with new children recomputes it
    * (ADVICE r06). */
  private lazy val elementsNullable: Boolean = children.exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullable: Boolean = super.nullable || elementsNullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i); i += 1
      }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      val s = ctx.freshName("dotS")
      // `nullable` includes elementsNullable, so ev.isNull is a real
      // variable (not FalseLiteral) whenever the null branch is emitted
      val body =
        if (elementsNullable)
          s"""|  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
              |  $s += $a.getDouble($i) * $b.getDouble($i);""".stripMargin
        else
          s"  $s += $a.getDouble($i) * $b.getDouble($i);"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |$body
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

object VectorExprs {

  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
      DotProduct(exprs.head, exprs(1))
    })

  /** Idempotently register graft_dot in the session's function registry —
    * works on a session built by ANY driver (no extensions conf needed);
    * [[graft.plans.GraftExtensions]] is the spark.sql.extensions route for
    * deployments that own the session builder. */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = dotInfo
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }

  /** Dot product of two array<double> columns via the native expression. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
