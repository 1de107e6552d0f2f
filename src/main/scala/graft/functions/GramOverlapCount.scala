package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `GramOverlapCount(grams)` — how many elements of a string array are
  * members of a FIXED reference set, as one codegen'd pass with the
  * set materialized ONCE per task.
  *
  * Built for ingest-time decontamination
  * ([[graft.streaming.EventStream.decontaminateDocs]]): the per-doc
  * overlap against a held-out eval-gram set must be an O(|doc grams|)
  * hash probe. The HOF spelling
  * `aggregate(grams, 0, (a, g) -> a + IF(might_contain(bf, g), 1, 0))`
  * is catastrophically slower — higher-order lambdas evaluate
  * interpreted, and the bound lambda body is re-instantiated per
  * ELEMENT, re-deserializing the bloom literal each time (measured
  * ~5 ms/doc — worse than no filter at all); `array_intersect` against
  * a carried set column rebuilds a hash set of the EVAL side per row.
  * This expression rides the plan as a reference object (standard
  * `addReferenceObj` kernel, like [[MinGramMd5]]), so the set is
  * deserialized once per task and probed per element.
  *
  * The reference set must be executor-memory-sized by CONTRACT (an
  * eval suite, not a corpus) — the operator that builds this guards
  * the count loudly. Membership is exact byte equality on UTF8
  * strings, the same equality the batch join regimes use.
  */
case class GramOverlapCount(child: Expression, refGrams: Array[Array[Byte]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_overlap_count requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "gram_overlap_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(16, refGrams.length * 2))
    var i = 0
    while (i < refGrams.length) { s.add(UTF8String.fromBytes(refGrams(i))); i += 1 }
    s
  }

  /** Per-row kernel, also called from generated code. */
  def compute(arr: ArrayData): Int = {
    val members = set
    var n = 0
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && members.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramOverlap", this, classOf[GramOverlapCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramOverlapCount =
    copy(child = newChild)
}
