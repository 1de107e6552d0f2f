package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `hyperplane_bands(vec, planes, bandBits) -> array<bigint>`: all LSH
  * band values of a vector against a hyperplane matrix, in ONE fused
  * codegen loop.
  *
  * The per-plane spelling — one `vector_dot(vec, <const array>)` CASE
  * per plane, concatenated into a bit string — stops compiling as one
  * whole-stage-codegen method at production geometries: 230 plane
  * expressions × 64-element loops exceed the JVM method budget, Spark
  * falls back to interpreted eval, and the signature pass becomes the
  * dominant stage (measured 15-17 s of a 33 s sf1 candidate run vs
  * ~1 s fused). This expression is the whole signature computation as
  * one tight double loop: for each plane, a sequential left-to-right
  * dot (identical accumulation order to [[VectorDot]], so sign bits
  * are bit-identical to the per-plane spelling), sign packed MSB-first
  * into `bandBits`-wide values — exactly `conv(substring(sig, j*bits+1,
  * bits), 2, 10)` of the bit-string contract.
  *
  * `planes` must be a foldable array<array<double>> literal (the
  * constant hyperplane matrix); `bandBits` a foldable int. Null vector
  * -> null. nPlanes % bandBits != 0 or a dimension mismatch throws.
  */
case class HyperplaneBands(vec: Expression, planes: Expression, bandBits: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = planes
  override def third: Expression = bandBits

  private def vecElemFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val planesOk = planes.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => planes.foldable
      case _ => false
    }
    if (vecOk && planesOk && bandBits.dataType == IntegerType && bandBits.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "hyperplane_bands requires (array<float|double>, foldable array<array<double>>, " +
        s"foldable int), got (${vec.dataType.simpleString}, ${planes.dataType.simpleString}, " +
        s"${bandBits.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_bands"

  // the matrix is foldable by contract: materialize once per operator
  @transient private lazy val matrix: Array[Array[Double]] = {
    val arr = planes.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(p => arr.getArray(p).toDoubleArray())
  }
  @transient private lazy val bits: Int =
    bandBits.eval(null).asInstanceOf[Int]

  override def nullSafeEval(v: Any, p: Any, b: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val nPlanes = matrix.length
    if (nPlanes % bits != 0) throw new IllegalArgumentException(
      s"hyperplane_bands: nPlanes ($nPlanes) must be a multiple of bandBits ($bits)")
    val out = new Array[Long](nPlanes / bits)
    val lf = vecElemFloat
    var pl = 0
    while (pl < nPlanes) {
      val row = matrix(pl)
      if (x.numElements() != row.length) throw new IllegalArgumentException(
        s"hyperplane_bands: dimension mismatch (${x.numElements()} vs ${row.length})")
      var s = 0.0
      var i = 0
      while (i < row.length) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        s += xv * row(i)
        i += 1
      }
      if (s >= 0) out(pl / bits) |= 1L << (bits - 1 - pl % bits)
      pl += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the folded matrix as a flat double[] reference (one object,
    // no per-row allocation); the generated loop is plane-major over it
    val nPlanes = matrix.length
    val dims = if (nPlanes == 0) 0 else matrix(0).length
    val flat = ctx.addReferenceObj("planesFlat", matrix.flatten, "double[]")
    val bitsRef = ctx.addReferenceObj("bandBits", Integer.valueOf(bits), "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val get = if (vecElemFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_bands: dimension mismatch (" + $v.numElements() + " vs " + $dims + ")");
         |}
         |if ($nPlanes % $bitsRef != 0) {
         |  throw new IllegalArgumentException("hyperplane_bands: nPlanes % bandBits != 0");
         |}
         |long[] $out = new long[$nPlanes / $bitsRef];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $s += ($get) * $flat[$p * $dims + $i];
         |  }
         |  if ($s >= 0) $out[$p / $bitsRef] |= 1L << ($bitsRef - 1 - $p % $bitsRef);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HyperplaneBands =
    copy(vec = newFirst, planes = newSecond, bandBits = newThird)
}
