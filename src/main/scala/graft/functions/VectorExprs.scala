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

/** graft_l2sq(a, aOff, b, bOff, len): squared L2 distance between the
  * `len`-element windows of two array<double> columns starting at 0-based
  * offsets `aOff` / `bOff` — a NATIVE codegen expression replacing the
  * interpreted form
  * `aggregate(sequence(1, len), 0.0, (acc, i) => acc + (aᵢ−bᵢ)·(aᵢ−bᵢ))`
  * over `slice()`d subvectors. That HOF shape was the PQ family's hot-path
  * cost (l140/l190 truth scans, pqFit, ADC encode/score): `ArrayAggregate`
  * is interpreted, and a `slice(v, …)` captured in the lambda BODY (not a
  * lambda variable) is re-evaluated — with a fresh array allocation — on
  * EVERY element access, so one 16-dim subspace distance paid 64 slice
  * materializations plus ~10 interpreted node walks per element (measured:
  * 122 s CPU for l140's 40k-row truth join at sf0.1; ~3 ms/row). This
  * expression is one primitive loop over the two backing ArrayData buffers.
  *
  * Bit-identical to the HOF form: d = a[aOff+i] − b[bOff+i]; s += d·d,
  * folded left-to-right from 0.0 — the same IEEE operation sequence (the
  * HOF evaluates the subtraction twice; both evaluations produce the same
  * double, so squaring via one temp is exact). Null semantics mirror the
  * element_at/non-ANSI path it replaces: any null input → null, any null
  * ELEMENT in a window → null, any out-of-bounds window (offset < 0 or
  * offset+len past the array end) → null — exactly what the old form
  * produced when element_at returned null and poisoned the fold. */
case class L2SqOffset(children: Seq[Expression])
    extends Expression {

  private def a = children(0)
  private def aOff = children(1)
  private def b = children(2)
  private def bOff = children(3)
  private def len = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    val arraysOk = Seq(a, b).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    val intsOk = Seq(aOff, bOff, len)
      .forall(_.dataType == org.apache.spark.sql.types.IntegerType)
    if (arraysOk && intsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, int, array<double>, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  /** True when either array's STATIC type admits null elements (same
    * stance as [[DotProduct]]): only then is the per-element null check
    * emitted; the engine's own embedding columns keep the branch-free
    * loop. */
  private lazy val elementsNullable: Boolean = Seq(a, b).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  // out-of-bounds windows return null regardless of child nullability
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): L2SqOffset = copy(children = newChildren)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val av = a.eval(input); val aoV = aOff.eval(input)
    val bv = b.eval(input); val boV = bOff.eval(input)
    val lv = len.eval(input)
    if (av == null || aoV == null || bv == null || boV == null || lv == null) return null
    val x = av.asInstanceOf[ArrayData]; val y = bv.asInstanceOf[ArrayData]
    val ao = aoV.asInstanceOf[Int]; val bo = boV.asInstanceOf[Int]
    val n = lv.asInstanceOf[Int]
    if (ao < 0 || bo < 0 || n < 0 ||
      ao + n > x.numElements() || bo + n > y.numElements()) return null
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (x.isNullAt(ao + i) || y.isNullAt(bo + i)) return null
        val d = x.getDouble(ao + i) - y.getDouble(bo + i)
        s += d * d; i += 1
      }
    } else {
      while (i < n) {
        val d = x.getDouble(ao + i) - y.getDouble(bo + i)
        s += d * d; i += 1
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cs = children.map(_.genCode(ctx))
    val Seq(ac, aoc, bc, boc, lc) = cs
    val s = ctx.freshName("l2s")
    val i = ctx.freshName("l2i")
    val d = ctx.freshName("l2d")
    val nullCheck =
      if (elementsNullable)
        s"""if (${ac.value}.isNullAt(${aoc.value} + $i) ||
           |    ${bc.value}.isNullAt(${boc.value} + $i)) { ${ev.isNull} = true; break; }
           |""".stripMargin
      else ""
    val childCode = cs.map(_.code.toString).mkString("\n")
    val body =
      s"""$childCode
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!(${cs.map(_.isNull).mkString(" || ")})) {
         |  if (!(${aoc.value} < 0 || ${boc.value} < 0 || ${lc.value} < 0 ||
         |        ${aoc.value} + ${lc.value} > ${ac.value}.numElements() ||
         |        ${boc.value} + ${lc.value} > ${bc.value}.numElements())) {
         |    ${ev.isNull} = false;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < ${lc.value}; $i++) {
         |      $nullCheck
         |      final double $d = ${ac.value}.getDouble(${aoc.value} + $i)
         |        - ${bc.value}.getDouble(${boc.value} + $i);
         |      $s += $d * $d;
         |    }
         |    ${ev.value} = $s;
         |  }
         |}""".stripMargin
    ev.copy(code = code"$body")
  }
}

object VectorExprs {

  val dotInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
      DotProduct(exprs.head, exprs(1))
    })

  val l2sqInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_l2sq"),
    new ExpressionInfo(classOf[L2SqOffset].getName, "graft_l2sq"),
    { exprs: Seq[Expression] =>
      require(exprs.length == 5, s"graft_l2sq takes 5 arguments, got ${exprs.length}")
      L2SqOffset(exprs)
    })

  /** Idempotently register graft_dot / graft_l2sq in the session's function
    * registry — works on a session built by ANY driver (no extensions conf
    * needed); [[graft.plans.GraftExtensions]] is the spark.sql.extensions
    * route for deployments that own the session builder. */
  def register(spark: SparkSession): Unit = {
    Seq(dotInfo, l2sqInfo).foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
  }

  /** Dot product of two array<double> columns via the native expression. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Squared L2 over `len`-element windows at 0-based offsets — see
    * [[L2SqOffset]]. */
  def l2sqOff(a: Column, aOff: Column, b: Column, bOff: Column,
      len: Column): Column = call_function("graft_l2sq", a, aOff, b, bOff, len)
}
