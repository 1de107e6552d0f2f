package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** Trino's `setdigest` type (part of the pinned Trino 468 surface —
  * walden `docker/devserver/Dockerfile:14`): a MinHash-with-
  * multiplicities sketch for set-overlap questions where the KMV family
  * ([[Kmv]]) answers distinct-cardinality ones. The public contract we
  * reproduce (Trino docs, "Set Digest functions"):
  *
  *  - `make_set_digest(x)` — aggregate rows into a digest
  *  - `merge_set_digest(d)` — aggregate union of digest ROWS
  *  - `intersection_cardinality(a, b)` — estimated |A ∩ B| (bigint)
  *  - `jaccard_index(a, b)` — estimated |A∩B| / |A∪B| (double)
  *  - `hash_counts(d)` — map hash → multiplicity, counts SATURATING at
  *    Short.MaxValue = 32767 (Trino's documented cap)
  *  - Trino's `cardinality(setdigest)` is registered here as
  *    `set_digest_cardinality` — our `cardinality` alias must keep
  *    Spark's array/map Size semantics (GraftFunctions), and Catalyst
  *    temp functions cannot overload one name by argument TYPE.
  *
  * Internally the digest is the bottom-k DISTINCT 64-bit xxhash values
  * (the same stable kernel the KMV sketches hash with) each carrying a
  * saturating multiplicity count; k is an optional second argument to
  * `make_set_digest` (default 2048, extension precedent: the 3-arg
  * min_by). Cardinality and the overlap estimators are the Beyer et al.
  * SIGMOD 2007 bottom-k forms shared with [[Kmv]] — counts ride along
  * for `hash_counts` but never bias the set estimates.
  *
  * Exactness contract (the same device that makes f20/f22 DuckDB-
  * oracle-checkable): a digest holding fewer than k hashes has seen
  * every distinct value, so cardinality / intersection / jaccard on
  * unsaturated digests (union included — saturation of the UNION
  * spoils intersect exactness even when both sides are exact, the f20
  * lesson) are exact integers/ratios, and count sums are exact row
  * counts while no multiplicity hits the cap. The sf0.01 gate runs in
  * that regime; the saturated regime is envelope-spec'd in
  * SetDigestSpec (classic 1/√k Jaccard error band).
  *
  * Wire format: [magic "SDG1"][int k][int m][m × (long flippedHash,
  * long count)], flipped (h ^ Long.MinValue) so signed order == unsigned
  * hash order, ascending — canonical, so equal digests are equal bytes
  * and merge-vs-rescan bit-identity is assertable.
  */
object SetDigest {
  val Magic = 0x53444731 // "SDG1"
  val CountCap = 32767L  // Trino hash_counts: saturating short

  /** Bottom-k distinct flipped hashes with saturating multiplicities. */
  final class Buf(var k: Int, val m: mutable.TreeMap[Long, Long]) {
    def add(flipped: Long, c: Long): Unit = {
      val cur = m.getOrElse(flipped, -1L)
      if (cur >= 0) m.update(flipped, math.min(cur + c, CountCap))
      else if (m.size < k) m.update(flipped, math.min(c, CountCap))
      else if (flipped < m.lastKey) {
        m.remove(m.lastKey)
        m.update(flipped, math.min(c, CountCap))
      }
    }
    def mergeIn(ok: Int, om: Iterator[(Long, Long)]): Unit = {
      k = math.min(k, ok)
      om.foreach { case (h, c) => add(h, c) }
      while (m.size > k) m.remove(m.lastKey) // k may have shrunk
    }
    def keys: Array[Long] = m.keysIterator.toArray // ascending (TreeMap)
  }

  def emptyBuf(k: Int): Buf = new Buf(k, mutable.TreeMap.empty)

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(12 + b.m.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(b.k); out.writeInt(b.m.size)
    b.m.foreach { case (h, c) => out.writeLong(h); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(bytes.length >= 12 && in.readInt() == Magic,
      "not a setdigest (wrong magic): set-digest functions take binaries " +
        "produced by make_set_digest/merge_set_digest")
    val k = in.readInt(); val n = in.readInt()
    require(n >= 0 && bytes.length == 12 + n.toLong * 16,
      s"not a setdigest (length ${bytes.length} != 12 + $n*16): corrupt or truncated binary")
    val m = mutable.TreeMap.empty[Long, Long]
    var i = 0
    while (i < n) { m.update(in.readLong(), in.readLong()); i += 1 }
    new Buf(k, m)
  }
}

/** `make_set_digest(x[, k])` — build the digest (k default 2048). */
final case class MakeSetDigest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigest.Buf] {

  require(k >= 16 && k <= (1 << 20),
    s"make_set_digest k must be in [16, 1048576], got $k")

  @transient private lazy val hasher = new XxHash64(Seq(child))

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SetDigest.Buf = SetDigest.emptyBuf(k)

  override def update(b: SetDigest.Buf, input: InternalRow): SetDigest.Buf = {
    if (child.eval(input) != null) // NULLs don't contribute, like COUNT DISTINCT
      b.add(hasher.eval(input).asInstanceOf[Long] ^ Long.MinValue, 1L)
    b
  }

  override def merge(b: SetDigest.Buf, o: SetDigest.Buf): SetDigest.Buf = {
    b.mergeIn(o.k, o.m.iterator)
    b
  }

  override def eval(b: SetDigest.Buf): Any = SetDigest.serialize(b)
  override def serialize(b: SetDigest.Buf): Array[Byte] = SetDigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): SetDigest.Buf = SetDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MakeSetDigest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MakeSetDigest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "make_set_digest"
}

/** `merge_set_digest(d)` — aggregate union of stored digest rows (the
  * rollup path: per-shard digests unioned at query time, no rescan). */
final case class MergeSetDigest(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigest.Buf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // sentinel k ABOVE the legal make_set_digest range [16, 1<<20]: a
  // never-touched buffer is distinguishable from a legitimately empty
  // k=1<<20 digest (r12 review — the old 1<<20 sentinel rewrote such a
  // digest to k=16, and a later merge clamped real digests down to 16)
  override def createAggregationBuffer(): SetDigest.Buf =
    SetDigest.emptyBuf(Int.MaxValue)

  override def update(b: SetDigest.Buf, input: InternalRow): SetDigest.Buf =
    child.eval(input) match {
      case null => b
      case bytes: Array[Byte] =>
        val o = SetDigest.deserialize(bytes)
        b.mergeIn(o.k, o.m.iterator)
        b
      case other => throw new IllegalArgumentException(
        s"merge_set_digest expects setdigest binaries, got ${other.getClass.getSimpleName}")
    }

  override def merge(b: SetDigest.Buf, o: SetDigest.Buf): SetDigest.Buf = {
    b.mergeIn(o.k, o.m.iterator)
    b
  }

  override def eval(b: SetDigest.Buf): Any =
    SetDigest.serialize(if (b.k == Int.MaxValue) SetDigest.emptyBuf(16) else b)
  override def serialize(b: SetDigest.Buf): Array[Byte] = SetDigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): SetDigest.Buf = SetDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MergeSetDigest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MergeSetDigest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "merge_set_digest"
}

/** Scalar finalizers — once per group result, off the hot path. */
final case class SetDigestCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val b = SetDigest.deserialize(v.asInstanceOf[Array[Byte]])
    math.round(Kmv.distinctEst(b.k, b.keys))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "set_digest_cardinality"
}

final case class IntersectionCardinality(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = SetDigest.deserialize(l.asInstanceOf[Array[Byte]])
    val b = SetDigest.deserialize(r.asInstanceOf[Array[Byte]])
    math.round(Kmv.intersectEst(a.k, a.keys, b.k, b.keys))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "intersection_cardinality"
}

final case class JaccardIndex(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = SetDigest.deserialize(l.asInstanceOf[Array[Byte]])
    val b = SetDigest.deserialize(r.asInstanceOf[Array[Byte]])
    Kmv.jaccardEst(a.k, a.keys, b.k, b.keys)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_index"
}

/** `hash_counts(d)` — map of raw xxhash64 value → saturating
  * multiplicity (Trino returns the same shape; the hashes themselves
  * are engine-defined in both systems). */
final case class HashCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val b = SetDigest.deserialize(v.asInstanceOf[Array[Byte]])
    val ks = new Array[Any](b.m.size)
    val vs = new Array[Any](b.m.size)
    var i = 0
    b.m.foreach { case (h, c) => ks(i) = h ^ Long.MinValue; vs(i) = c; i += 1 }
    ArrayBasedMapData(ks, vs)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hash_counts"
}
