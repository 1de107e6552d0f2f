package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `simhash64(text) -> 64-char bit string`: the whole per-document
  * SimHash in ONE pass over the text.
  *
  * Contract-identical to the relational spelling (split on ' ',
  * lowercase, drop empties, md5 per word, nibble-decoded bit votes
  * summed per position, bit = vote > 0) — votes are order-independent
  * integer sums, so fusing the computation cannot change a single bit,
  * and the DuckDB oracle twin is untouched.
  *
  * Why: the relational spelling explodes every word x64 positions
  * through two shuffles — at 20k docs that is ~200M aggregated rows
  * for 1.3M real votes, and the explosion grows linearly with corpus
  * bytes x64. This expression computes the same 64 counters in a
  * per-row loop: one md5 per word, zero shuffles, zero explosion.
  * The signature stage of t03/t21 becomes a narrow projection.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "simhash64"

  /** Per-row kernel, also called from generated code. */
  def compute(text: UTF8String): UTF8String = {
    // identical tokenization to split(lower(text), ' '): Java regex
    // split with limit -1, lowercase first (UTF8String.toLowerCase =
    // Spark's lower())
    val words = text.toLowerCase.toString.split(" ", -1)
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        md.reset()
        val dig = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // 16 bytes = 32 nibbles; positions 0..63 read nibble pos/4,
        // bit (3 - pos%4) — exactly the hex-string decode of the
        // relational spelling
        var pos = 0
        while (pos < 64) {
          val nibble =
            if ((pos / 4) % 2 == 0) (dig(pos / 8) >> 4) & 0xf
            else dig(pos / 8) & 0xf
          val bit = (nibble >> (3 - pos % 4)) & 1
          votes(pos) += bit * 2 - 1
          pos += 1
        }
      }
      wi += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 64) { sb.append(if (votes(i) > 0) '1' else '0'); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(t: Any): Any = compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[Simhash64].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}
