package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_gram_md5s(words, n) -> array<string>` — md5 hex of every
  * space-joined word n-gram, one entry per window in order (NOT
  * deduplicated; positions come free from `posexplode`). Fused r14
  * kernel (guide §1.2 step 2) for the boilerplate (t23/t29) and
  * exact-substring (t32/t33) gram hashing.
  *
  * Contract-identical to
  *   `transform(sequence(0, size(ws) - n),
  *      i -> md5(concat_ws(' ', ws[i], ..., ws[i+n-1])))`
  * (equivalently `md5(array_join(slice(ws, i+1, n), ' '))`) for
  * size >= n; EMPTY for shorter arrays — exactly the
  * `CASE WHEN size(ws) >= n THEN ... ELSE array() END` guard every
  * call site applied (under ANSI the unguarded HOF throws on short
  * arrays). NULL input -> empty.
  *
  * Why: the HOF spelling paid interpreted lambda dispatch, n
  * GetArrayItem evals, an interpreted concat_ws STRING BUILD, and an
  * interpreted Md5 expression per window. This kernel feeds each
  * window's word bytes (plus single-space separators) straight into
  * one reused MessageDigest — the joined gram string is never
  * materialized at all.
  */
case class WordGramMd5s(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        right.eval() match {
          case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"word_gram_md5s n must be a positive INT constant, got $other")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_gram_md5s requires (array<string>, foldable int), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_gram_md5s"

  /** Statically non-null (see [[ShingleSig.nullable]]). */
  override def nullable: Boolean = false

  @transient private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  private val hexDigits = "0123456789abcdef".toCharArray
  private val spaceByte = ' '.toByte

  def computeNullable(ws: ArrayData): ArrayData =
    if (ws == null) new GenericArrayData(Array.empty[Any]) else compute(ws)

  def compute(ws: ArrayData): ArrayData = {
    val size = ws.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    val words = new Array[Array[Byte]](size)
    var i = 0
    while (i < size) {
      val u = ws.getUTF8String(i)
      words(i) = if (u == null) null else u.getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val sep = Array(spaceByte)
    val out = new Array[Any](size - n + 1)
    var w = 0
    while (w <= size - n) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val b = words(w + j)
        // concat_ws skips NULL elements entirely (no separator either)
        if (b != null) {
          if (!first) md.update(sep)
          md.update(b)
          first = false
        }
        j += 1
      }
      md.digest(dig, 0, 16)
      val hex = new Array[Byte](32)
      var h = 0
      while (h < 16) {
        hex(h * 2) = hexDigits((dig(h) >> 4) & 0xf).toByte
        hex(h * 2 + 1) = hexDigits(dig(h) & 0xf).toByte
        h += 1
      }
      out(w) = UTF8String.fromBytes(hex)
      w += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    computeNullable(left.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("wordGramMd5sExpr", this, classOf[WordGramMd5s].getName)
    val c = left.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      ArrayData ${ev.value} = $ref.computeNullable(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGramMd5s =
    copy(left = newLeft, right = newRight)
}
