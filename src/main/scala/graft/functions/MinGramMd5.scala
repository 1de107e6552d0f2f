package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `min_gram_md5(text, n) -> lexicographic min of md5 hex over all
  * character n-grams` — the winnowing-style rolling fingerprint of t05,
  * fused into one codegen'd pass.
  *
  * Contract-identical to the HOF spelling
  * `array_min(transform(sequence(1, greatest(length(s) - n + 1, 1)),
  *    i -> md5(substring(s, i, n))))`:
  * same substring semantics (code-point based, `UTF8String.substringSQL`
  * — the kernel Spark's own `substring` calls), same md5-of-UTF8-bytes,
  * and the min is taken over the raw 16-byte digests by unsigned
  * lexicographic compare — hex encoding is order-preserving byte-wise,
  * so the minimum digest IS the minimum hex string. Strings shorter
  * than n collapse to the single i=1 window exactly like the
  * `greatest(..., 1)` guard (an empty string fingerprints md5('')).
  *
  * Why: `transform` lambdas evaluate interpreted (HOFs are codegen
  * fallbacks), so the relational spelling pays interpreted expression
  * dispatch + a per-window hex-string allocation for every one of the
  * L-n+1 windows — the honest-bench r8 fix surfaced t05 at ~400us/doc
  * for ~343 windows. This expression runs the whole window loop in one
  * generated-code call with a single reused MessageDigest and no
  * intermediate strings.
  */
case class MinGramMd5(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // any FOLDABLE int spelling works — CAST(8 AS INT), named
      // constants, constant-folded arithmetic — not just a bare
      // literal (ADVICE r8); eval here is safe because foldable
      // expressions are deterministic functions of no input
      case (StringType, IntegerType) if right.foldable =>
        // eval() of a foldable expression can itself throw (ANSI CAST
        // of a bad constant, overflowing arithmetic) — keep the error
        // attributed to this function's contract, not a bare runtime
        // exception escaping from analysis (r9 review)
        (try Right(right.eval()) catch { case e: Exception => Left(e) }) match {
          case Right(n: Int) if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case Right(other) => TypeCheckResult.TypeCheckFailure(
            s"min_gram_md5 gram length must be a positive INT constant, got $other")
          case Left(e) => TypeCheckResult.TypeCheckFailure(
            s"min_gram_md5 gram length constant failed to evaluate: ${e.getMessage}")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "min_gram_md5 requires (string, constant positive int) arguments")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "min_gram_md5"

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Per-row kernel, also called from generated code.
    *
    * r14 optimization (guide §1.2 step 2 — per-task work): the previous
    * spelling allocated three objects per window (`substringSQL` copy,
    * `getBytes` copy, fresh 16-byte digest array) — ~3·(L-n+1)
    * allocations per document. Windows are contiguous code-point ranges
    * of the SAME byte buffer, so one offsets pass (identity-skipped for
    * pure-ASCII rows) lets every window hash via
    * `MessageDigest.update(bytes, start, len)` with zero copies; the
    * digest reuses two 16-byte scratch buffers for the whole row.
    * Byte-identical output: `substringSQL(i, n).getBytes` IS the byte
    * range [off(i-1), off(i-1+n)) for valid UTF-8, and the min over
    * unsigned digest compare is unchanged (FunctionsSpec parity pins
    * the HOF spelling).
    */
  def compute(text: UTF8String, n: Int): UTF8String = {
    val bytes = text.getBytes // no copy when the UTF8String spans its buffer
    val nBytes = bytes.length
    val len = text.numChars()
    val windows = math.max(len - n + 1, 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    // code-point byte offsets; pure-ASCII (the common case) is identity
    val ascii = nBytes == len
    val offs: Array[Int] =
      if (ascii) null
      else {
        val o = new Array[Int](len + 1)
        var b = 0; var c = 0
        while (b < nBytes) {
          o(c) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          c += 1
        }
        o(len) = nBytes
        o
      }
    @inline def off(cp: Int): Int =
      if (ascii) math.min(cp, nBytes) else offs(math.min(cp, len))
    val best = new Array[Byte](16)
    val cur = new Array[Byte](16)
    var haveBest = false
    var i = 0
    while (i < windows) {
      val s = off(i)
      val e = off(i + n)
      md.reset()
      md.update(bytes, s, e - s)
      md.digest(cur, 0, 16)
      if (!haveBest || unsignedLess(cur, best)) {
        System.arraycopy(cur, 0, best, 0, 16)
        haveBest = true
      }
      i += 1
    }
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(b * 2) = hexDigits((best(b) >> 4) & 0xf)
      hex(b * 2 + 1) = hexDigits(best(b) & 0xf)
      b += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(t: Any, n: Any): Any =
    compute(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minGramMd5Expr", this, classOf[MinGramMd5].getName)
    nullSafeCodeGen(ctx, ev, (t, n) => s"${ev.value} = $ref.compute($t, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinGramMd5 =
    copy(left = newLeft, right = newRight)
}
