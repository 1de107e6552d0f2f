package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(words, n) -> array<string>` — distinct space-joined
  * word n-grams in first-occurrence order, fused into one codegen'd
  * pass (r14 optimization, guide §1.2 step 2).
  *
  * Contract-identical to THE word-n-gram spelling shared by the
  * decontamination family and its streaming twin:
  *   `array_distinct(transform(sequence(0, size(ws) - n),
  *      i -> concat_ws(' ', ws[i], ws[i+1], ..., ws[i+n-1])))`
  * including its short-array edges, which fall out of sequence()'s
  * descending default step and concat_ws's null-skip:
  *  - size >= n: the usual size-n+1 windows, deduped keeping the
  *    FIRST occurrence (array_distinct's order);
  *  - 0 < size < n: every i in sequence(0, size-n) joins to the same
  *    all-words string -> a single gram;
  *  - size == 0: one empty-string gram (concat_ws over no survivors).
  * Word arrays here come from split(), which never yields NULL
  * elements; a NULL element would have been skipped by concat_ws, and
  * this kernel replicates that too.
  *
  * Why: transform() lambdas evaluate interpreted (HOFs are codegen
  * fallbacks) — per gram that paid lambda dispatch, a boxed index, 5
  * GetArrayItem evals and an interpreted concat_ws, and then
  * array_distinct re-walked the result. One generated-code call now
  * does the window walk, the joins, and the first-occurrence dedupe in
  * a single pass.
  */
case class WordGrams(left: Expression, right: Expression,
    dedup: Boolean = true)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        right.eval() match {
          case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"word_grams n must be a positive INT constant, got $other")
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_grams requires (array<string>, foldable int), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_grams"

  /** Statically non-null (see [[ShingleSig.nullable]]); null array ->
    * empty output (transform over a null array is null, and the
    * explode() call sites emit nothing for both). */
  override def nullable: Boolean = false

  @transient private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  private val space = UTF8String.fromString(" ")

  def computeNullable(ws: ArrayData): ArrayData =
    if (ws == null) new GenericArrayData(Array.empty[Any]) else compute(ws)

  def compute(ws: ArrayData): ArrayData = {
    val size = ws.numElements()
    val words = new Array[UTF8String](size)
    var i = 0
    while (i < size) { words(i) = ws.getUTF8String(i); i += 1 }
    if (!dedup) {
      // 3-arg form word_grams(ws, n, false): EVERY window in order
      // (the t11 repetition metric needs occurrence counts) —
      // contract-identical to the bare transform() spelling ON THE
      // GUARDED DOMAIN (size >= n). Below it the kernel stays total
      // and returns ONE all-words gram, where the non-ANSI HOF would
      // yield n-size+1 identical copies (and ANSI throws) — every
      // caller counting occurrences must keep the size >= n guard
      // (t11 does; pinned in FunctionsSpec).
      if (size < n)
        return new GenericArrayData(
          Array[Any](UTF8String.concatWs(space, words: _*)))
      val parts = new Array[UTF8String](n)
      val out = new Array[Any](size - n + 1)
      var w = 0
      while (w <= size - n) {
        var j = 0
        while (j < n) { parts(j) = words(w + j); j += 1 }
        out(w) = UTF8String.concatWs(space, parts: _*)
        w += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (size >= n) {
      val parts = new Array[UTF8String](n)
      var w = 0
      while (w <= size - n) {
        var j = 0
        while (j < n) { parts(j) = words(w + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        w += 1
      }
    } else {
      // the relational spelling's short-array edge: every generated
      // window joins the same all-words string (nulls skipped)
      seen.add(UTF8String.concatWs(space, words: _*))
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    computeNullable(left.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("wordGramsExpr", this, classOf[WordGrams].getName)
    val c = left.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      ArrayData ${ev.value} = $ref.computeNullable(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordGrams =
    copy(left = newLeft, right = newRight)

}
