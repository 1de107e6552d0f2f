package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-generating n-gram expansion: `ngrams(words, n)` emits one row
  * `(pos, ngram)` per contiguous n-gram of the input token array —
  * the UDTF/`Generator` extension point of SURVEY §2.6 (Trino's
  * engine-side table functions; walden exposes them through plain SQL,
  * so ours is SQL-visible via LATERAL VIEW / SELECT-list generator).
  *
  * Semantics: positions are 0-based; tokens are joined with a single
  * space; a NULL array, a NULL n, or n > cardinality(words) produces no
  * rows; n < 1 is a query-authoring error and fails analysis when
  * foldable (runtime otherwise). An n-gram window containing a NULL
  * token is skipped entirely — a joined string cannot represent NULL
  * faithfully, and emitting a NULL output column would violate the
  * non-nullable element schema.
  *
  * Scale shape: `Generate` is a narrow, streaming row-expansion — no
  * shuffle, no buffering beyond one input row's grams. This generator is
  * eval-based (CodegenFallback): generation feeds a downstream
  * aggregation whose shuffle dominates; the codegen'd shingle pipelines
  * in TextOps remain the hot path for similarity joins.
  */
case class NgramsGenerator(words: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(words, n)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (n.foldable) {
          val v = n.eval(null)
          if (v != null && v.asInstanceOf[Int] < 1)
            TypeCheckResult.TypeCheckFailure(s"ngrams n must be >= 1, got $v")
          else TypeCheckResult.TypeCheckSuccess
        } else TypeCheckResult.TypeCheckSuccess
      case (w, k) => TypeCheckResult.TypeCheckFailure(
        s"ngrams requires (array<string>, int), got (${w.simpleString(100)}, ${k.simpleString(100)})")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = words.eval(input).asInstanceOf[ArrayData]
    val kv = n.eval(input)
    if (arr == null || kv == null) return Iterator.empty
    val k = kv.asInstanceOf[Int]
    if (k < 1) throw new IllegalArgumentException(s"ngrams n must be >= 1, got $k")
    val len = arr.numElements()
    if (len < k) return Iterator.empty
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    (0 to len - k).iterator.flatMap { p =>
      var hasNull = false
      var j = p
      while (j < p + k && !hasNull) { if (toks(j) == null) hasNull = true; j += 1 }
      if (hasNull) Iterator.empty
      else {
        val parts = new Array[UTF8String](2 * k - 1)
        var m = 0
        while (m < k) {
          parts(2 * m) = toks(p + m)
          if (m < k - 1) parts(2 * m + 1) = sep
          m += 1
        }
        Iterator.single(InternalRow(p, UTF8String.concat(parts: _*)))
      }
    }
  }

  override def prettyName: String = "ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(words = newChildren(0), n = newChildren(1))
}
