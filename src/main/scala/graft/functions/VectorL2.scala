package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen'd squared-L2 distance over two array<float|double>
  * columns — the PQ encode/LUT hot loop (r15).
  *
  * The composable spelling — `aggregate(zip_with(a, b, (x,y) ->
  * (x-y)*(x-y)), 0D, (acc,x) -> acc+x)` — runs its lambdas interpreted
  * AND excludes the enclosing Project from whole-stage codegen
  * (higher-order functions are CodegenFallback). pqEncode evaluates it
  * N·m·k times (per vector, per subspace, per codeword — 40M evals at
  * 20k vectors, m=8, k=256), which made the encode THE dominant cost of
  * the v09/v10/v11 entries. This expression is the same left-to-right
  * double fold in a tight generated loop, so results are bit-identical
  * to the HOF (and to the oracle's LIST_SUM spelling).
  *
  * Null handling: null array -> null; null elements undefined (vectors
  * are dense by contract). Mismatched dimensions raise — same policy as
  * [[VectorDot]].
  */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_l2sq requires array<float|double> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"vector_l2sq: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("d")
      def get(arr: String, side: Expression): String =
        if (elemType(side).contains(FloatType)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_l2sq: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dd = ${get(a, left)} - ${get(b, right)};
         |  $s += $dd * $dd;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd dot product over two array<int> columns — the
  * quantized-cosine pair loops (v06/v07) spelled
  * `CAST(aggregate(zip_with(qa, qb, (x,y) -> x*y), 0, (acc,x) ->
  * acc+x) AS DOUBLE)` before r15: interpreted per pair AND a codegen
  * break. Accumulates in 32-bit int exactly like the HOF fold (the
  * int8-quantized values bound |q| <= 127, so a 64-dim dot peaks at
  * ~1M — far from overflow; wraparound semantics would match anyway).
  * Callers keep their CAST(... AS DOUBLE) on top, so values are
  * bit-identical. Null array -> null; dimension mismatch raises.
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_vec_dot requires array<int> args, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "int_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"int_vec_dot: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var s = 0
    var i = 0
    while (i < n) { s += x.getInt(i) * y.getInt(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "int_vec_dot: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getInt($i) * $b.getInt($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}
