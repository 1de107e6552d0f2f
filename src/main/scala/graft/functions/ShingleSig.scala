package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_sig(items, dedupItems, dedupHashes)
  *    -> struct<n: int, sl: array<string>, hs: array<bigint>>`:
  * the whole MinHash signature of a shingle/gram array in ONE pass.
  *
  * Contract-identical to the relational family it replaces (t02/t04):
  *  - `sl`: 16 minhash lanes — min over items of the rotated 8-hex-char
  *    slices of md5(item) (4 disjoint 32-bit lanes x 4 cyclic
  *    rotations; fixed-width lowercase hex so lexicographic MIN ==
  *    numeric MIN). Mins are order-independent, so fusing cannot
  *    change a lane.
  *  - `hs`: sorted xxhash64(item) fingerprints (seed 42 — Spark's own
  *    XxHash64Function), deduped when `dedupHashes` (t02's
  *    `array_distinct` spelling); signed-long sort order, as
  *    sort_array.
  *  - `n`: distinct item count when `dedupItems` (t04's
  *    `size(array_distinct(...))`), raw length otherwise (t02's
  *    `size(...)`).
  *
  * Why: the relational spelling ran ~19 interpreted HOF passes per
  * document (one md5 transform, 16 array_min lane folds, one xxhash
  * transform + sort) — measured as the dominant cost of t04 at sf10
  * (2.9B interpreted lane evaluations for 200k docs). This kernel is
  * one loop: one md5 + one xxhash per distinct item, running lane
  * minima in place.
  *
  * Empty input mirrors the relational edge exactly: `sl` = 16 NULLs
  * (array_min of empty), `hs` = empty, `n` = 0.
  */
case class ShingleSig(items: Expression, dedupItems: Expression, dedupHashes: Expression)
    extends TernaryExpression {

  override def first: Expression = items
  override def second: Expression = dedupItems
  override def third: Expression = dedupHashes

  override def checkInputDataTypes(): TypeCheckResult =
    (items.dataType, dedupItems.dataType, dedupHashes.dataType) match {
      case (ArrayType(StringType, _), BooleanType, BooleanType)
        if dedupItems.foldable && dedupHashes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_sig requires (array<string>, foldable bool, foldable bool), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("sl", ArrayType(StringType, containsNull = true), nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "shingle_sig"

  /** Statically NON-NULL (null input -> the empty signature): a
    * nullable output would let InferFiltersFromConstraints derive
    * isnotnull() over this kernel from downstream predicates, push the
    * whole signature pipeline into per-branch scan filters, and split
    * the materialization exchange (the documented t02 pathology —
    * measured here as 4 scans + 8 kernel sites instead of 1 + reuse). */
  override def nullable: Boolean = false

  @transient private lazy val dedupI: Boolean =
    dedupItems.eval(null).asInstanceOf[Boolean]
  @transient private lazy val dedupH: Boolean =
    dedupHashes.eval(null).asInstanceOf[Boolean]

  def computeNullable(itemsData: ArrayData): InternalRow =
    compute(if (itemsData == null) new GenericArrayData(Array.empty[Any]) else itemsData)

  private val hexChars = "0123456789abcdef".toCharArray

  def compute(itemsData: ArrayData): InternalRow = {
    val total = itemsData.numElements()
    val seen = if (dedupI) new java.util.HashSet[UTF8String]() else null
    val md = java.security.MessageDigest.getInstance("MD5")
    val laneMin = new Array[String](16)
    val hashes = new java.util.ArrayList[java.lang.Long](math.max(total, 4))
    val hex = new Array[Char](32)
    var n = 0
    var i = 0
    while (i < total) {
      val item = itemsData.getUTF8String(i)
      if (item != null && (seen == null || seen.add(item))) {
        n += 1
        val bytes = item.getBytes
        md.reset()
        val dig = md.digest(bytes)
        var b = 0
        while (b < 16) {
          hex(b * 2) = hexChars((dig(b) >> 4) & 0xf)
          hex(b * 2 + 1) = hexChars(dig(b) & 0xf)
          b += 1
        }
        val hexStr = new String(hex)
        var j = 0
        while (j < 16) {
          val base0 = (j % 4) * 8
          val rot = (j / 4) * 2
          // rotated slice: chars [base0+rot, base0+8) ++ [base0, base0+rot)
          val lane = hexStr.substring(base0 + rot, base0 + 8) +
            hexStr.substring(base0, base0 + rot)
          if (laneMin(j) == null || lane.compareTo(laneMin(j)) < 0) laneMin(j) = lane
          j += 1
        }
        hashes.add(XxHash64Function.hash(item, StringType, 42L))
      } else if (item != null) {
        // duplicate item under dedupItems: contributes to neither n,
        // lanes (min unaffected), nor hashes (t04 hashes DISTINCT grams)
      }
      i += 1
    }
    val hsRaw = new Array[Long](hashes.size())
    var k = 0
    while (k < hsRaw.length) { hsRaw(k) = hashes.get(k); k += 1 }
    java.util.Arrays.sort(hsRaw)
    val hs =
      if (!dedupH || hsRaw.length == 0) hsRaw
      else {
        val out = new Array[Long](hsRaw.length)
        var w = 0
        var r = 0
        while (r < hsRaw.length) {
          if (w == 0 || out(w - 1) != hsRaw(r)) { out(w) = hsRaw(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(out, w)
      }
    val nOut = if (dedupI) n else total
    val lanes: Array[Any] =
      laneMin.map(l => if (l == null) null else UTF8String.fromString(l))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nOut, new GenericArrayData(lanes), new GenericArrayData(hs)))
  }

  override def eval(input: InternalRow): Any =
    computeNullable(items.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("shingleSigExpr", this, classOf[ShingleSig].getName)
    val c = items.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = $ref.computeNullable(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ShingleSig =
    copy(items = newFirst, dedupItems = newSecond, dedupHashes = newThird)
}

/** `char_grams(text, n) -> array<string>`: every contiguous n-char
  * gram, in order, duplicates kept — identical to
  * `transform(sequence(1, greatest(length(text) - n + 1, 1)),
  *            i -> substring(text, i, n))`
  * including the short-text edge (text shorter than n emits the whole
  * text as its single gram). Character semantics via UTF8String (code
  * points, not UTF-16 units), exactly like Spark's substring. One
  * generated loop instead of one interpreted lambda per gram.
  */
case class CharGrams(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_grams requires (string, foldable int), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_grams"

  /** Statically non-null (see [[ShingleSig.nullable]]); null text ->
    * empty array. */
  override def nullable: Boolean = false

  @transient private lazy val gramLen: Int = right.eval(null).asInstanceOf[Int]

  def computeNullable(text: UTF8String): ArrayData =
    if (text == null) new GenericArrayData(Array.empty[Any]) else compute(text)

  def compute(text: UTF8String): ArrayData = {
    val chars = text.numChars()
    val count = math.max(chars - gramLen + 1, 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      // substringSQL(pos, len) is Spark's substring(): 1-based, char
      // (code point) indexed, clamped at the end — the short-text edge
      // falls out identically
      out(i) = text.substringSQL(i + 1, gramLen)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    computeNullable(left.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("charGramsExpr", this, classOf[CharGrams].getName)
    val c = left.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      ArrayData ${ev.value} = $ref.computeNullable(${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGrams =
    copy(left = newLeft, right = newRight)
}
