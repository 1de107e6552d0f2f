package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Trino's `tdigest` type — the DOUBLE-valued percentile sketch
  * (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
  * t-Digests", 2019; merging-digest variant), completing the sketch
  * family: qdigest covers the integer universe, tdigest covers
  * arbitrary doubles. Trino 468 surface reproduced [pinned walden
  * docker/devserver/Dockerfile:14]:
  *
  *  - `tdigest_agg(x[, w[, compression]])` — aggregate (weight ≥ 1,
  *    compression default 100 like Trino)
  *  - `merge(t)` — aggregate union; OUR registration is polymorphic
  *    over the sketch families exactly like Trino's (dispatches on the
  *    wire magic: tdigest / qdigest / setdigest)
  *  - `value_at_quantile(t, q)` / `values_at_quantiles(t, qs)`
  *  - `trimmed_mean(t, qlow, qhigh)`
  *
  * Structure: sorted (mean, weight) centroids. Incoming points buffer
  * and FLUSH by merge-sorting with the existing centroids, then:
  * (1) adjacent EQUAL means always coalesce (exact — a centroid of
  * identical values answers rank queries exactly, and repeated values
  * stop costing capacity); (2) capacity clustering under the k1 scale
  * function runs ONLY when more than `compression` centroids remain.
  *
  * Exactness contract (the f20/f22/f23/f25 device): while the DISTINCT
  * values in a digest number ≤ compression, every centroid is pure (one
  * value, exact multiplicity) — quantiles are the exact discrete
  * statistics and trimmed means are exact rank-window means, so the f27
  * entry runs against a plain-SQL DuckDB oracle at every SF (l_discount
  * has 11 distinct values). Above it, the k1 bound applies
  * (envelope-spec'd in TDigestSpec).
  *
  * Estimator choice (documented contract): `value_at_quantile` returns
  * the MEAN of the centroid containing rank ⌈q·W⌉ (nearest-rank over
  * cumulative weights, no cross-centroid interpolation) — exact in the
  * pure regime, within the t-digest cluster-size bound in the
  * saturated one, and deterministic everywhere.
  *
  * Wire format: [magic "TDG1"][int compression][int n][n × (double
  * mean, double weight)], means ascending — canonical after flush, so
  * merge-vs-rescan equality is assertable in the pure regime.
  */
object TDigest {
  val Magic = 0x54444731 // "TDG1"

  final class Buf(val compression: Int) {
    var n = 0
    var means = new Array[Double](32)
    var weights = new Array[Double](32)
    private var pn = 0
    private var pMeans = new Array[Double](64)
    private var pWeights = new Array[Double](64)

    def add(x: Double, w: Double): Unit = {
      if (pn == pMeans.length) {
        if (pn >= 4 * compression) flush()
        else {
          pMeans = java.util.Arrays.copyOf(pMeans, pn * 2)
          pWeights = java.util.Arrays.copyOf(pWeights, pn * 2)
        }
      }
      pMeans(pn) = x; pWeights(pn) = w; pn += 1
    }

    /** Merge-sort pending into centroids; coalesce equal means; capacity-
      * cluster under k1 only when > compression centroids remain. */
    def flush(): Unit = {
      if (pn == 0) return
      // sort pending by mean (paired insertion into one array of indices
      // is overkill at 4c elements: box-free dual-pivot via tuples array)
      val idx = Array.range(0, pn).sortBy(pMeans(_))
      val m2 = new Array[Double](n + pn)
      val w2 = new Array[Double](n + pn)
      var i = 0; var j = 0; var k = 0
      while (i < n || j < pn) {
        val takeOld = j >= pn || (i < n && means(i) <= pMeans(idx(j)))
        if (takeOld) { m2(k) = means(i); w2(k) = weights(i); i += 1 }
        else { m2(k) = pMeans(idx(j)); w2(k) = pWeights(idx(j)); j += 1 }
        k += 1
      }
      // coalesce equal means in place (always exact)
      var out = 0
      var r = 0
      while (r < k) {
        if (out > 0 && m2(out - 1) == m2(r)) w2(out - 1) += w2(r)
        else { m2(out) = m2(r); w2(out) = w2(r); out += 1 }
        r += 1
      }
      means = m2; weights = w2; n = out; pn = 0
      if (n > compression) cluster()
    }

    /** Greedy k1-scale clustering (Dunning & Ertl merging algorithm). */
    private def cluster(): Unit = {
      var total = 0.0
      var i = 0
      while (i < n) { total += weights(i); i += 1 }
      val m2 = new Array[Double](n)
      val w2 = new Array[Double](n)
      var out = 0
      var q0 = 0.0
      var curW = 0.0
      var curSum = 0.0
      def k1(q: Double): Double =
        compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)
      i = 0
      while (i < n) {
        val q1 = (curW + weights(i) + q0 * total) / total
        if (curW > 0 && k1(q1) - k1(q0) > 1.0) {
          m2(out) = curSum / curW; w2(out) = curW; out += 1
          q0 += curW / total
          curW = 0.0; curSum = 0.0
        }
        curW += weights(i); curSum += means(i) * weights(i)
        i += 1
      }
      if (curW > 0) { m2(out) = curSum / curW; w2(out) = curW; out += 1 }
      means = m2; weights = w2; n = out
    }

    def totalWeight: Double = {
      flush()
      var s = 0.0; var i = 0
      while (i < n) { s += weights(i); i += 1 }
      s
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    b.flush()
    val bos = new ByteArrayOutputStream(12 + b.n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(b.compression); out.writeInt(b.n)
    var i = 0
    while (i < b.n) { out.writeDouble(b.means(i)); out.writeDouble(b.weights(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(bytes.length >= 12 && in.readInt() == Magic,
      "not a tdigest (wrong magic): tdigest functions take binaries " +
        "produced by tdigest_agg/merge")
    val c = in.readInt(); val n = in.readInt()
    // canonical format is exact-length: a truncated/corrupt binary with
    // an intact header fails HERE with the contract error, not with a
    // bare EOFException mid-read (r12 review)
    require(n >= 0 && bytes.length == 12 + n.toLong * 16,
      s"not a tdigest (length ${bytes.length} != 12 + $n*16): corrupt or truncated binary")
    val b = new Buf(c)
    var i = 0
    while (i < n) { b.add(in.readDouble(), in.readDouble()); i += 1 }
    b
  }

  /** Nearest-rank over cumulative weights (see estimator note above). */
  def valueAtQuantile(b: Buf, q: Double): Option[Double] = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    b.flush()
    if (b.n == 0) return None
    var total = 0.0
    var i = 0
    while (i < b.n) { total += b.weights(i); i += 1 }
    val rank = math.max(1.0, math.ceil(q * total))
    var cum = 0.0
    i = 0
    while (i < b.n) {
      cum += b.weights(i)
      if (cum >= rank) return Some(b.means(i))
      i += 1
    }
    Some(b.means(b.n - 1))
  }

  /** Mean of ranks r with qlow·W < r ≤ qhigh·W (integer ranks; exact in
    * the pure regime — the same window a ROW_NUMBER oracle spells). */
  def trimmedMean(b: Buf, ql: Double, qh: Double): Option[Double] = {
    require(ql >= 0.0 && qh <= 1.0 && ql < qh,
      s"trimmed_mean bounds must satisfy 0 <= low < high <= 1, got ($ql, $qh)")
    b.flush()
    if (b.n == 0) return None
    var total = 0.0
    var i = 0
    while (i < b.n) { total += b.weights(i); i += 1 }
    val lo = ql * total
    val hi = qh * total
    var sum = 0.0
    var cnt = 0.0
    var cumBefore = 0.0
    i = 0
    while (i < b.n) {
      val a = cumBefore + 1.0          // first rank in this centroid
      val z = cumBefore + b.weights(i) // last rank in this centroid
      val from = math.max(a, math.floor(lo) + 1.0)
      val to = math.min(z, math.floor(hi))
      if (to >= from) {
        val c = to - from + 1.0
        sum += b.means(i) * c
        cnt += c
      }
      cumBefore = z
      i += 1
    }
    if (cnt == 0) None else Some(sum / cnt)
  }
}

/** `tdigest_agg(x[, w[, compression]])`. */
final case class TDigestAgg(
    child: Expression,
    weight: Expression,
    compression: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.Buf] {

  require(compression >= 10 && compression <= 10000,
    s"tdigest_agg compression must be in [10, 10000], got $compression")

  override def children: Seq[Expression] = child :: weight :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): TDigest.Buf = new TDigest.Buf(compression)

  override def update(b: TDigest.Buf, input: InternalRow): TDigest.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) {
        val wd = Qdigest.toDouble(w)
        require(wd >= 1.0, s"tdigest_agg weight must be >= 1, got $wd")
        b.add(Qdigest.toDouble(v), wd)
      }
    }
    b
  }

  override def merge(b: TDigest.Buf, o: TDigest.Buf): TDigest.Buf = {
    o.flush()
    var i = 0
    while (i < o.n) { b.add(o.means(i), o.weights(i)); i += 1 }
    b
  }

  override def eval(b: TDigest.Buf): Any = TDigest.serialize(b)
  override def serialize(b: TDigest.Buf): Array[Byte] = TDigest.serialize(b)
  override def deserialize(bytes: Array[Byte]): TDigest.Buf = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "tdigest_agg"
}

/** Trino's polymorphic `merge(sketch)` aggregate: unions rows of ONE
  * sketch family, dispatching on the wire magic — tdigest, qdigest,
  * setdigest, or a DataSketches HLL binary (the `approx_set` /
  * `hll_sketch_agg` column type; Trino's merge() is likewise generic
  * over hyperloglog/qdigest/tdigest/setdigest). Mixing families in
  * one group is a loud error. */
final case class SketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchMergeAgg.State] {
  import SketchMergeAgg._

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): State = Empty

  /** Parse incoming bytes into live state ONCE — every row is validated
    * here (a one-row group cannot smuggle garbage through), and the
    * accumulated sketch is never re-serialized between rows. */
  private def parse(bytes: Array[Byte]): State = magicOf(bytes) match {
    case TDigest.Magic => Td(TDigest.deserialize(bytes))
    case Qdigest.Magic => Qd(Qdigest.deserialize(bytes))
    case SetDigest.Magic => Sd(SetDigest.deserialize(bytes))
    case other =>
      // not one of ours: a DataSketches HLL (approx_set/hll_sketch_agg
      // columns) parses through the library; anything else is loud
      try {
        val sk = org.apache.datasketches.hll.HllSketch.heapify(bytes)
        val u = new org.apache.datasketches.hll.Union(sk.getLgConfigK)
        u.update(sk)
        Hll(u)
      } catch {
        case _: Exception => throw new IllegalArgumentException(
          s"merge() expects tdigest/qdigest/setdigest/HLL binaries " +
            s"(unknown magic 0x${other.toHexString})")
      }
  }

  private def unite(a: State, b: State): State = (a, b) match {
    case (Empty, s) => s
    case (s, Empty) => s
    case (Td(x), Td(y)) =>
      y.flush()
      var i = 0
      while (i < y.n) { x.add(y.means(i), y.weights(i)); i += 1 }
      Td(x)
    case (Qd(x), Qd(y)) =>
      x.mergeIn(y.k, y.n, y.counts)
      Qd(x)
    case (Sd(x), Sd(y)) =>
      x.mergeIn(y.k, y.m.iterator)
      Sd(x)
    case (Hll(x), Hll(y)) =>
      x.update(y.getResult)
      Hll(x)
    case (x, y) => throw new IllegalArgumentException(
      s"merge() cannot mix sketch families (${x.familyName} vs ${y.familyName})")
  }

  override def update(b: State, input: InternalRow): State =
    child.eval(input) match {
      case null => b
      case bytes: Array[Byte] => unite(b, parse(bytes))
      case other => throw new IllegalArgumentException(
        s"merge() expects sketch binaries, got ${other.getClass.getSimpleName}")
    }

  override def merge(b: State, o: State): State = unite(b, o)

  override def eval(b: State): Any = b match {
    case Empty => null
    case Td(x) => TDigest.serialize(x)
    case Qd(x) => { x.compress(); Qdigest.serialize(x) }
    case Sd(x) => SetDigest.serialize(x)
    case Hll(x) => x.getResult.toUpdatableByteArray
  }

  override def serialize(b: State): Array[Byte] = b match {
    case Empty => Array.empty
    case other => eval(other).asInstanceOf[Array[Byte]]
  }
  override def deserialize(bytes: Array[Byte]): State =
    if (bytes.isEmpty) Empty else parse(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "merge"
}

object SketchMergeAgg {
  /** Live merge state: parsed once per input row, serialized only at
    * partial-aggregate boundaries (the TypedImperativeAggregate
    * contract every other aggregate in this file follows). */
  sealed trait State { def familyName: String }
  case object Empty extends State { val familyName = "empty" }
  final case class Td(b: TDigest.Buf) extends State { val familyName = "tdigest" }
  final case class Qd(b: Qdigest.Buf) extends State { val familyName = "qdigest" }
  final case class Sd(b: SetDigest.Buf) extends State { val familyName = "setdigest" }
  final case class Hll(u: org.apache.datasketches.hll.Union) extends State {
    val familyName = "hll"
  }

  private def magicOf(bytes: Array[Byte]): Int =
    if (bytes.length < 4) 0
    else java.nio.ByteBuffer.wrap(bytes).getInt
}

/** Scalar finalizers — once per group, off the hot path. */
final case class ValueAtQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sk: Any, q: Any): Any =
    TDigest.valueAtQuantile(
      TDigest.deserialize(sk.asInstanceOf[Array[Byte]]),
      Qdigest.toDouble(q)).orNull
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "value_at_quantile"
}

final case class ValuesAtQuantiles(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override protected def nullSafeEval(sk: Any, qs: Any): Any = {
    val b = TDigest.deserialize(sk.asInstanceOf[Array[Byte]])
    val arr = qs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < out.length) {
      out(i) =
        if (arr.isNullAt(i)) null
        else TDigest.valueAtQuantile(b, Qdigest.toDouble(arr.get(i, DoubleType))).orNull
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "values_at_quantiles"
}

final case class TrimmedMean(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sk: Any, ql: Any, qh: Any): Any =
    TDigest.trimmedMean(
      TDigest.deserialize(sk.asInstanceOf[Array[Byte]]),
      Qdigest.toDouble(ql), Qdigest.toDouble(qh)).orNull
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "trimmed_mean"
}
