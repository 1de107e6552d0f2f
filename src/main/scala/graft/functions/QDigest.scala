package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** q-digest — the MERGEABLE percentile sketch (Shrivastava, Buragohain,
  * Agrawal, Suri, "Medians and Beyond: New Aggregation Techniques for
  * Sensor Networks", SenSys 2004; the same structure behind Trino's
  * `qdigest` type [pinned docker/devserver/Dockerfile:14]). This is the
  * percentile counterpart of [[KmvSketch]]: store ONE small sketch per
  * shard/day/corpus, roll them up at query time with `qdigest_merge_agg`
  * — percentiles over 100 TB without rescanning or re-sorting anything,
  * which `percentile_approx`/f10 cannot do (they need the raw rows).
  *
  * Structure: a sparse binary tree over the integer universe
  * [0, 2^32) — node at depth d (root d=0, leaves d=32) covering prefix
  * p has id `(1L << d) | p`, so parent(id) = id >>> 1 and sibling(id) =
  * id ^ 1, and every id fits a Long. Counts live on nodes; compression
  * folds any (node, sibling, parent) triple whose combined count is
  * ≤ ⌊n/k⌋ into the parent. Surviving size is O(k), rank error is
  * ≤ depth·⌊n/k⌋ ≤ 32·n/k (each ancestor of the true leaf can hide at
  * most ⌊n/k⌋ counts) — asserted empirically in QdigestSpec.
  *
  * Exactness contract (same device that makes f20 oracle-checkable):
  * while n < k the fold threshold ⌊n/k⌋ is 0, nothing ever compresses,
  * every count sits on its exact leaf — quantiles and ranks are EXACT
  * discrete statistics (value at sorted position ⌈q·n⌉), so the f22
  * entry runs against a full DuckDB oracle at sf0.01 and the merge of
  * shard digests is bit-identical to the digest of the union (asserted
  * in QdigestSpec). Memory in the exact regime is O(distinct values)
  * — bounded by k·16 bytes, since the regime by definition has n < k.
  *
  * Value contract: non-negative longs < 2^32 (doc lengths, token
  * counts, prices in cents, quality-score millis all fit); out-of-range
  * input fails loudly rather than silently clamping.
  *
  * Functions (registered in [[GraftFunctions]]):
  *  - `qdigest_agg(x, k)` — aggregate → binary sketch
  *  - `qdigest_merge_agg(sketch)` — aggregate union of sketch ROWS
  *  - `qdigest_merge(a, b)` — scalar pairwise merge
  *  - `qdigest_quantile(sketch, q)` — value at quantile q ∈ (0, 1]
  *  - `qdigest_rank_of(sketch, x)` — estimated fraction of values ≤ x
  *  - `qdigest_count(sketch)` — total row count n (exact always)
  * Scalars run once per GROUP (post-aggregation, off the per-row hot
  * path), so interpreted eval (CodegenFallback) is the right cost class.
  *
  * Wire format: [int k][long n][int m][m × (long id, long count)],
  * ids ascending — a canonical serialization, so equal digests are
  * equal bytes.
  */
object Qdigest {
  val MaxValue: Long = (1L << 32) - 1
  private val LeafDepth = 32

  /** Node helpers: id at depth d for prefix p is (1 << d) | p. */
  @inline private def depth(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)
  @inline private def nodeMin(id: Long): Long = {
    val d = depth(id)
    (id ^ (1L << d)) << (LeafDepth - d)
  }
  @inline private def nodeWidth(id: Long): Long = 1L << (LeafDepth - depth(id))
  @inline def leafId(v: Long): Long = (1L << LeafDepth) | v

  final class Buf(var k: Int, var n: Long, val counts: mutable.LongMap[Long]) {
    /** Re-compress at 2× the post-compress size (amortized O(1) per
      * row); never below 4k so small digests don't thrash, and never
      * while n < k (threshold 0 — a compress pass would be a no-op). */
    var nextCompress: Int = 0

    def add(v: Long, c: Long): Unit = {
      require(v >= 0 && v <= MaxValue,
        s"qdigest value out of range [0, 2^32): $v")
      val id = leafId(v)
      counts.update(id, counts.getOrElse(id, 0L) + c)
      n += c
      maybeCompress()
    }

    def maybeCompress(): Unit = {
      if (nextCompress == 0) nextCompress = math.max(64, 4 * k)
      if (counts.size >= nextCompress && n >= k) {
        compress()
        nextCompress = math.max(math.max(64, 4 * k), counts.size * 2)
      }
    }

    /** Bottom-up fold: any (node, sibling, parent) triple with combined
      * count ≤ ⌊n/k⌋ folds into the parent. ONE map snapshot bucketed
      * by depth (the previous spelling re-scanned the whole map once
      * per depth — 33 full scans per compress, the dominant cost of the
      * saturated-regime merge stage); a fold that CREATES a parent
      * appends it to the d-1 bucket, which is exactly the set the
      * per-depth rescan used to discover. */
    def compress(): Unit = {
      val t = n / k
      if (t <= 0) return
      val byDepth = Array.fill(LeafDepth + 1)(new mutable.ArrayBuffer[Long])
      counts.keysIterator.foreach { id => byDepth(depth(id)) += id }
      var d = LeafDepth
      while (d >= 1) {
        val ids = byDepth(d).toArray
        java.util.Arrays.sort(ids)
        var i = 0
        while (i < ids.length) {
          val id = ids(i)
          val c = counts.getOrElse(id, -1L)
          if (c >= 0) { // not already folded as someone's sibling
            val sib = id ^ 1L
            val parent = id >>> 1
            val pc = counts.getOrElse(parent, -1L)
            val s = c + counts.getOrElse(sib, 0L) + math.max(pc, 0L)
            if (s <= t) {
              if (pc < 0) byDepth(d - 1) += parent
              counts.update(parent, s)
              counts.subtractOne(id)
              counts.subtractOne(sib)
            }
          }
          i += 1
        }
        d -= 1
      }
    }

    def mergeIn(ok: Int, on: Long, om: Iterator[(Long, Long)]): Unit = {
      k = math.min(k, ok)
      n += on
      om.foreach { case (id, c) =>
        counts.update(id, counts.getOrElse(id, 0L) + c)
      }
      maybeCompress()
    }
  }

  def emptyBuf(k: Int): Buf = new Buf(k, 0L, mutable.LongMap.empty)

  /** Wire magic ("QDG1"): qdigest scalars reject foreign binaries
    * (a KMV/HLL sketch column, arbitrary bytes) LOUDLY instead of
    * misparsing them into plausible garbage statistics. */
  val Magic = 0x51444731

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(20 + b.counts.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(b.k); out.writeLong(b.n); out.writeInt(b.counts.size)
    val ids = b.counts.keys.toArray
    java.util.Arrays.sort(ids)
    ids.foreach { id => out.writeLong(id); out.writeLong(b.counts(id)) }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(bytes.length >= 20 && in.readInt() == Magic,
      "not a qdigest sketch (wrong magic): qdigest_* functions take " +
        "binaries produced by qdigest_agg/qdigest_merge_agg/qdigest_merge")
    val k = in.readInt(); val n = in.readLong(); val m = in.readInt()
    require(m >= 0 && bytes.length == 20 + m.toLong * 16,
      s"not a qdigest (length ${bytes.length} != 20 + $m*16): corrupt or truncated binary")
    val map = new mutable.LongMap[Long](math.max(8, m * 2))
    var i = 0
    while (i < m) { map.update(in.readLong(), in.readLong()); i += 1 }
    val b = new Buf(k, n, map)
    b
  }

  /** Nodes in "postorder" value space: ascending max value, descendants
    * (larger min) before ancestors on ties — the SenSys 2004 query
    * order. Returns (min, max, count) triples. */
  private def ordered(b: Buf): Array[(Long, Long, Long)] = {
    val arr = b.counts.iterator.map { case (id, c) =>
      val mn = nodeMin(id)
      (mn, mn + nodeWidth(id) - 1, c)
    }.toArray
    scala.util.Sorting.stableSort(arr,
      (x: (Long, Long, Long), y: (Long, Long, Long)) =>
        x._2 < y._2 || (x._2 == y._2 && x._1 > y._1))
    arr
  }

  /** Value at quantile q ∈ (0, 1]: the max value of the first postorder
    * node whose cumulative count reaches rank ⌈q·n⌉ (exact discrete
    * quantile — value at sorted position ⌈q·n⌉ — in the uncompressed
    * regime). Null (None) on an empty digest. */
  def valueAtQuantile(b: Buf, q: Double): Option[Long] = {
    require(q > 0.0 && q <= 1.0, s"quantile must be in (0, 1], got $q")
    if (b.n == 0) return None
    val rank = math.max(1L, math.ceil(q * b.n).toLong)
    var cum = 0L
    val nodes = ordered(b)
    var i = 0
    while (i < nodes.length) {
      cum += nodes(i)._3
      if (cum >= rank) return Some(nodes(i)._2)
      i += 1
    }
    Some(nodes.last._2)
  }

  /** Estimated fraction of values ≤ x: full counts of nodes entirely
    * ≤ x, proportional credit for the straddling node (exact in the
    * uncompressed regime, where every node is a leaf). */
  /** Numeric operand coercion: SQL decimal literals (e.g. `0.5`) eval
    * to Spark's Decimal, which is not a java.lang.Number. */
  def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  def toLong(v: Any): Long = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toLong
    case n: Number => n.longValue()
  }

  def rankOf(b: Buf, x: Long): Option[Double] = {
    if (b.n == 0) return None
    var below = 0.0
    b.counts.foreach { case (id, c) =>
      val mn = nodeMin(id)
      val mx = mn + nodeWidth(id) - 1
      if (mx <= x) below += c
      else if (mn <= x) below += c * ((x - mn + 1).toDouble / nodeWidth(id))
    }
    Some(below / b.n)
  }
}

/** `qdigest_agg(x, k)` — build a mergeable percentile sketch. */
final case class QdigestAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Qdigest.Buf] {

  require(k >= 16 && k <= (1 << 20), s"qdigest_agg k must be in [16, 1048576], got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Qdigest.Buf = Qdigest.emptyBuf(k)

  override def update(b: Qdigest.Buf, input: InternalRow): Qdigest.Buf = {
    val v = child.eval(input)
    if (v != null) b.add(Qdigest.toLong(v), 1L)
    b
  }

  override def merge(b: Qdigest.Buf, o: Qdigest.Buf): Qdigest.Buf = {
    b.mergeIn(o.k, o.n, o.counts.iterator)
    b
  }

  override def eval(b: Qdigest.Buf): Any = { b.compress(); Qdigest.serialize(b) }

  override def serialize(b: Qdigest.Buf): Array[Byte] = Qdigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): Qdigest.Buf = Qdigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "qdigest_agg"
}

/** `qdigest_merge_agg(sketch)` — roll up stored per-shard digests
  * without rescanning the shards (the 100 TB reporting pattern). */
final case class QdigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Qdigest.Buf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Qdigest.Buf = Qdigest.emptyBuf(1 << 20)

  override def update(b: Qdigest.Buf, input: InternalRow): Qdigest.Buf =
    child.eval(input) match {
      case null => b
      case bytes: Array[Byte] =>
        val o = Qdigest.deserialize(bytes)
        b.mergeIn(o.k, o.n, o.counts.iterator)
        b
      case other => throw new IllegalArgumentException(
        s"qdigest_merge_agg expects qdigest binaries, got ${other.getClass.getSimpleName}")
    }

  override def merge(b: Qdigest.Buf, o: Qdigest.Buf): Qdigest.Buf = {
    b.mergeIn(o.k, o.n, o.counts.iterator)
    b
  }

  override def eval(b: Qdigest.Buf): Any = { b.compress(); Qdigest.serialize(b) }

  override def serialize(b: Qdigest.Buf): Array[Byte] = Qdigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): Qdigest.Buf = Qdigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QdigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QdigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "qdigest_merge_agg"
}

/** Scalar finalizers — once per group result, off the hot path. */
final case class QdigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sk: Any, q: Any): Any =
    Qdigest.valueAtQuantile(
      Qdigest.deserialize(sk.asInstanceOf[Array[Byte]]),
      Qdigest.toDouble(q)).orNull
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "qdigest_quantile"
}

final case class QdigestRankOf(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sk: Any, x: Any): Any =
    Qdigest.rankOf(
      Qdigest.deserialize(sk.asInstanceOf[Array[Byte]]),
      Qdigest.toLong(x)).orNull
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "qdigest_rank_of"
}

final case class QdigestMerge(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = Qdigest.deserialize(l.asInstanceOf[Array[Byte]])
    val b = Qdigest.deserialize(r.asInstanceOf[Array[Byte]])
    a.mergeIn(b.k, b.n, b.counts.iterator)
    a.compress()
    Qdigest.serialize(a)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "qdigest_merge"
}

final case class QdigestCount(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Qdigest.deserialize(v.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "qdigest_count"
}
