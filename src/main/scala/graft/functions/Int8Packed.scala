package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** `pack_int8(array<int>) -> binary`: one signed byte per element.
  *
  * The int8 quantization codes (VectorOps.withInt8Codes) live as
  * `array<int>` inside a plan — 4 bytes per element plus array header.
  * Packed as raw bytes they are 4x smaller, which is the whole point of
  * quantized PRE-SCORING: the candidate-verify join of the banded-LSH
  * ANN path ships one 64-byte code blob per side instead of a 256-byte
  * float vector, and the certified cosine bound then rejects ~99% of
  * candidates before any float attach (VERDICT r6 #1).
  *
  * Out-of-range elements throw: the quantization rule emits [-127, 127]
  * by construction, so a wider value means the caller packed something
  * that is not an int8 code and the dots downstream would be silently
  * wrong. Null elements throw for the same reason (codes are dense).
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_int8 requires array<int>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "pack_int8"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v < -128 || v > 127) throw new IllegalArgumentException(
        s"pack_int8: element $v out of int8 range at index $i")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $v = $a.getInt($i);
         |  if ($v < -128 || $v > 127) {
         |    throw new IllegalArgumentException(
         |      "pack_int8: element " + $v + " out of int8 range at index " + $i);
         |  }
         |  $out[$i] = (byte) $v;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

/** `int8_dot(binary, binary) -> bigint`: exact integer dot product of
  * two packed int8 code vectors. 64 dims x 127^2 is far inside long
  * range — no overflow, no float accumulation, bit-identical on any
  * reduction order. Dimension mismatch throws (a truncated dot would
  * silently skew the certified cosine bound).
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_dot requires (binary, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) throw new IllegalArgumentException(
      s"int8_dot: dimension mismatch (${x.length} vs ${y.length})")
    var s = 0L
    var i = 0
    while (i < x.length) {
      s += x(i).toLong * y(i).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "int8_dot: dimension mismatch (" + $a.length + " vs " + $b.length + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $s += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}
