package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  LongType, StructField, StructType}

/** `CosineHits(embedding)` — one pass over a FIXED reference set of
  * eval-suite embeddings, reporting how many lie within cosine
  * `threshold` of the input vector, the smallest hitting eval id, and
  * the strongest cosine: `struct(n_hits BIGINT, first_hit BIGINT,
  * max_cos DOUBLE)` (the latter two null when nothing hits, or when
  * the input has zero norm and so can contaminate nothing).
  *
  * Built for ingest-time SEMANTIC decontamination
  * ([[graft.streaming.EventStream.decontaminateEmbeddings]]): the
  * per-row sweep against a held-out eval suite must be stateless and
  * map-side — no join, no streaming aggregation — so the whole
  * (n_hits, first_hit, max_cos) aggregate folds inside ONE expression
  * and rows ride an append-mode stream untouched. The suite rides the
  * plan as a reference object (standard `addReferenceObj` kernel, like
  * [[GramOverlapCount]]), deserialized once per task; a HOF spelling
  * would re-instantiate the suite literal per ELEMENT (measured >100x
  * slower on the gram kernel, same mechanism).
  *
  * Arithmetic parity with the batch regime
  * ([[graft.operators.VectorOps.semanticDecontaminate]]) is exact by
  * construction: dots accumulate left-to-right in double with
  * float->double element casts (the [[VectorDot]] order), the input
  * norm is the same self-dot, eval norms are precomputed with the same
  * loop, and cos = dot / (sqrt(n2_in) * sqrt(n2_eval)) — bit-identical
  * doubles, so the parity spec compares with == after the shared
  * round(_, 6).
  *
  * The suite must be executor-memory-sized by CONTRACT (an eval
  * suite, not a corpus — the operator guards the count loudly) and
  * arrives SORTED by id so "first hit" is simply the first hit of the
  * scan. Per-row cost is |suite| * dim multiply-adds.
  */
case class CosineHits(child: Expression, evalIds: Array[Long],
                      evalVecs: Array[Array[Double]], threshold: Double)
    extends UnaryExpression {

  require(evalIds.length == evalVecs.length,
    s"cosine_hits: ${evalIds.length} ids vs ${evalVecs.length} vectors")

  private def floatIn: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_hits requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("first_hit", LongType),
    StructField("max_cos", DoubleType)))
  override def prettyName: String = "cosine_hits"

  // eval norms: sqrt of the same left-to-right self-dot the batch
  // regime's vector_dot(e, e) computes — one-time, per task
  @transient private lazy val evalNorms: Array[Double] = {
    val out = new Array[Double](evalVecs.length)
    var i = 0
    while (i < evalVecs.length) {
      val v = evalVecs(i)
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      out(i) = math.sqrt(s)
      i += 1
    }
    out
  }

  /** Per-row kernel, also called from generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val fl = floatIn
    val d = arr.numElements()
    val x = new Array[Double](d)
    var j = 0
    while (j < d) {
      x(j) = if (fl) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var n2 = 0.0
    j = 0
    while (j < d) { n2 += x(j) * x(j); j += 1 }
    val out = new GenericInternalRow(3)
    out.setLong(0, 0L); out.setNullAt(1); out.setNullAt(2)
    if (n2 > 0.0) {
      val nx = math.sqrt(n2)
      var hits = 0L
      var firstHit = 0L
      var maxCos = Double.NegativeInfinity
      var i = 0
      while (i < evalVecs.length) {
        val e = evalVecs(i)
        if (e.length != d) throw new IllegalArgumentException(
          s"cosine_hits: dimension mismatch ($d vs eval id ${evalIds(i)}'s ${e.length})")
        var s = 0.0; var k = 0
        while (k < d) { s += x(k) * e(k); k += 1 }
        val cos = s / (nx * evalNorms(i))
        if (cos >= threshold) {
          if (hits == 0L) firstHit = evalIds(i) // ids pre-sorted: first = min
          if (cos > maxCos) maxCos = cos
          hits += 1L
        }
        i += 1
      }
      if (hits > 0L) {
        out.setLong(0, hits); out.setLong(1, firstHit); out.setDouble(2, maxCos)
      }
    }
    out
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineHits", this, classOf[CosineHits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineHits =
    copy(child = newChild)
}
