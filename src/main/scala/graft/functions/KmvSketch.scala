package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KMV ("k minimum values" / bottom-k theta) distinct sketch — the
  * no-join way to ask corpus-overlap questions at 100 TB: one scan per
  * corpus builds a k·8-byte sketch (mergeable partials, map-side
  * combine), and |A|, |B|, |A ∩ B|, |A ∪ B|, Jaccard all read off the
  * two sketches in O(k) on the driver. Estimator per Beyer, Haas,
  * Reinwald, Sismanis, Gemulla, "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations" (SIGMOD 2007): keep the k
  * smallest DISTINCT 64-bit hashes; with U(k) the k-th smallest as a
  * fraction of hash space, D ≈ (k−1)/U(k); set operations combine the
  * bottom-k unions with the membership indicator ratio.
  *
  * Exactness contract (what makes f20 DuckDB-oracle-checkable, unlike
  * the HLL rows f11/f19): a sketch holding FEWER than k hashes has
  * seen every distinct value, so estimates on unsaturated sketches are
  * returned as exact integer counts — the sf0.01 gate runs in that
  * regime, the saturated regime is envelope-spec'd (KmvSpec, the
  * classic 1/√k error band).
  *
  * Functions (registered in [[GraftFunctions]]):
  *  - `kmv_sketch(value, k)` — aggregate → binary sketch
  *  - `kmv_union_agg(sketch)` — aggregate union of sketch ROWS (the
  *    rollup path: store one sketch per shard/day, union at query time
  *    without rescanning — the 100 TB reporting pattern)
  *  - `kmv_distinct_est(sketch)`, `kmv_union(a, b)`,
  *    `kmv_intersect_est(a, b)`, `kmv_jaccard_est(a, b)` — scalars;
  *    they run once per GROUP (post-aggregation, off the per-row hot
  *    path), so interpreted eval (CodegenFallback) is the right cost
  *    class, same as the reference engine's sketch finalizers.
  *
  * Wire format: [int k][int n][n longs], hashes stored SIGN-FLIPPED
  * (h ^ Long.MinValue) so natural signed order == unsigned hash order,
  * ascending. Hash = Spark's xxhash64 (seed 42), the same stable
  * kernel `approx_distinct`/bloom pushdown use.
  */
object Kmv {
  /** Serialize a sorted flipped-hash set. */
  def serialize(k: Int, hashes: Iterable[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + hashes.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(hashes.size)
    hashes.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val k = in.readInt(); val n = in.readInt()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = in.readLong(); i += 1 }
    (k, arr)
  }

  /** Fraction of hash space at or below flipped hash `f`, in (0, 1]. */
  private def frac(f: Long): Double =
    (f.toDouble - Long.MinValue.toDouble + 1.0) / 1.8446744073709552e19

  /** Distinct estimate. Unsaturated sketch → exact count. */
  def distinctEst(k: Int, sorted: Array[Long]): Double =
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / frac(sorted(k - 1))

  /** Bottom-min(ka,kb) union of two sorted flipped-hash arrays — the
    * same sketch a single scan of A ∪ B would build (bit-identical,
    * asserted in KmvSpec), so unions never lose the exactness flag
    * spuriously: the result is unsaturated iff |hashes(A) ∪ hashes(B)|
    * fits the smaller k. */
  def union(ka: Int, a: Array[Long], kb: Int, b: Array[Long]): (Int, Array[Long]) = {
    val k = math.min(ka, kb)
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v } // shared hash: once
      out(n) = take; n += 1
    }
    (k, if (n == out.length) out else java.util.Arrays.copyOf(out, n))
  }

  /** |A ∩ B| estimate (SIGMOD 2007 §4): over the union's bottom-k',
    * the fraction present in BOTH sketches scales the union's distinct
    * estimate. Exact (integer) when the union is unsaturated. */
  def intersectEst(ka: Int, a: Array[Long], kb: Int, b: Array[Long]): Double = {
    val (k, u) = union(ka, a, kb, b)
    if (u.isEmpty) return 0.0
    var both = 0
    var i = 0
    while (i < u.length) {
      if (java.util.Arrays.binarySearch(a, u(i)) >= 0 &&
          java.util.Arrays.binarySearch(b, u(i)) >= 0) both += 1
      i += 1
    }
    if (u.length < k) both.toDouble // union saw everything: exact
    else both.toDouble / u.length * distinctEst(k, u)
  }

  /** Jaccard |A∩B|/|A∪B|: the membership ratio itself. */
  def jaccardEst(ka: Int, a: Array[Long], kb: Int, b: Array[Long]): Double = {
    val (_, u) = union(ka, a, kb, b)
    if (u.isEmpty) return 0.0
    var both = 0
    var i = 0
    while (i < u.length) {
      if (java.util.Arrays.binarySearch(a, u(i)) >= 0 &&
          java.util.Arrays.binarySearch(b, u(i)) >= 0) both += 1
      i += 1
    }
    both.toDouble / u.length
  }
}

/** Bounded buffer: k smallest distinct flipped hashes. TreeSet keeps
  * add/evict O(log k); k ≤ 1M guards the executor (k·8 bytes state). */
final case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 16 && k <= (1 << 20), s"kmv_sketch k must be in [16, 1048576], got $k")

  @transient private lazy val hasher = new XxHash64(Seq(child))

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  private def add(b: mutable.TreeSet[Long], flipped: Long): Unit =
    if (b.size < k) b += flipped
    else if (flipped < b.lastKey && !b.contains(flipped)) { b += flipped; b -= b.lastKey }

  override def update(b: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    if (child.eval(input) != null) // xxhash64 of NULL folds to seed; skip like COUNT DISTINCT
      add(b, hasher.eval(input).asInstanceOf[Long] ^ Long.MinValue)
    b
  }

  override def merge(b: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(b, _))
    b
  }

  override def eval(b: mutable.TreeSet[Long]): Any = Kmv.serialize(k, b)

  override def serialize(b: mutable.TreeSet[Long]): Array[Byte] = Kmv.serialize(k, b)
  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val (_, arr) = Kmv.deserialize(bytes)
    mutable.TreeSet.empty[Long] ++ arr
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

/** Aggregate union of sketch rows — rollup stored per-shard sketches
  * without rescanning the shards. Result k = the smallest input k. */
final case class KmvUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[(Int, Array[Long])] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): (Int, Array[Long]) = (Int.MaxValue, Array.empty)

  override def update(b: (Int, Array[Long]), input: InternalRow): (Int, Array[Long]) =
    child.eval(input) match {
      case null => b
      case bytes: Array[Byte] =>
        val (k, arr) = Kmv.deserialize(bytes)
        Kmv.union(b._1, b._2, k, arr)
      case other => throw new IllegalArgumentException(
        s"kmv_union_agg expects kmv_sketch binaries, got ${other.getClass.getSimpleName}")
    }

  override def merge(b: (Int, Array[Long]), o: (Int, Array[Long])): (Int, Array[Long]) =
    Kmv.union(b._1, b._2, o._1, o._2)

  override def eval(b: (Int, Array[Long])): Any =
    Kmv.serialize(if (b._1 == Int.MaxValue) 16 else b._1, b._2)

  override def serialize(b: (Int, Array[Long])): Array[Byte] = Kmv.serialize(b._1, b._2)
  override def deserialize(bytes: Array[Byte]): (Int, Array[Long]) = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_union_agg"
}

/** Scalar finalizers — once per group result, off the hot path. */
final case class KmvDistinctEst(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any = {
    val (k, arr) = Kmv.deserialize(v.asInstanceOf[Array[Byte]])
    Kmv.distinctEst(k, arr)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "kmv_distinct_est"
}

final case class KmvUnion(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (ka, a) = Kmv.deserialize(l.asInstanceOf[Array[Byte]])
    val (kb, b) = Kmv.deserialize(r.asInstanceOf[Array[Byte]])
    val (k, u) = Kmv.union(ka, a, kb, b)
    Kmv.serialize(k, u)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_union"
}

final case class KmvIntersectEst(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (ka, a) = Kmv.deserialize(l.asInstanceOf[Array[Byte]])
    val (kb, b) = Kmv.deserialize(r.asInstanceOf[Array[Byte]])
    Kmv.intersectEst(ka, a, kb, b)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_intersect_est"
}

final case class KmvJaccardEst(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (ka, a) = Kmv.deserialize(l.asInstanceOf[Array[Byte]])
    val (kb, b) = Kmv.deserialize(r.asInstanceOf[Array[Byte]])
    Kmv.jaccardEst(ka, a, kb, b)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_jaccard_est"
}
