package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** Trino's `numeric_histogram(buckets, value)` — the Ben-Haim/Tom-Tov
  * streaming histogram (Ben-Haim & Tom-Tov, "A Streaming Parallel
  * Decision Tree Algorithm", JMLR 2010; the algorithm Trino's
  * implementation cites): keep at most B (centroid, count) pairs; when
  * a new value makes B+1, merge the two CLOSEST centroids into their
  * weighted mean. Mergeable by construction (concatenate then re-merge
  * closest pairs), so partials combine map-side like every other
  * sketch here. Returns map<double, double> (centroid → count), same
  * shape as Trino.
  *
  * Exactness contract (the f20/f22/f23 device): while the number of
  * DISTINCT values seen is ≤ B no merge ever fires, every centroid is
  * an exact (value, multiplicity) pair — the map is the exact value
  * histogram, so the f25 entry checks against a plain-SQL DuckDB
  * oracle at sf0.01 and the merged rollup is bit-identical to the
  * single-scan histogram. Above B, the invariants are the paper's:
  * total count is exact, the weighted sum is preserved to float
  * rounding, centroids are strictly increasing — envelope-spec'd in
  * NumericHistogramSpec.
  *
  * Buffer: two parallel arrays sorted by centroid, binary-search
  * insert, O(B) merge step — the same cost class as Trino's
  * implementation; B ≤ 10000 guards executor state (16 bytes per
  * bucket).
  *
  * Wire format: [int b][int n][n × (double centroid, double count)]
  * ascending — canonical, so equal histograms are equal bytes.
  */
object NumericHistogram {
  final class Buf(val b: Int) {
    var n = 0
    var cs = new Array[Double](math.min(b + 1, 64)) // centroids, ascending
    var ws = new Array[Double](cs.length)           // counts

    private def grow(): Unit = if (n == cs.length) {
      val cap = math.min(b + 1, cs.length * 2)
      cs = java.util.Arrays.copyOf(cs, cap)
      ws = java.util.Arrays.copyOf(ws, cap)
    }

    def add(x: Double, w: Double): Unit = {
      var i = java.util.Arrays.binarySearch(cs, 0, n, x)
      if (i >= 0) { ws(i) += w; return } // exact centroid hit: no merge needed
      i = -(i + 1)
      grow()
      System.arraycopy(cs, i, cs, i + 1, n - i)
      System.arraycopy(ws, i, ws, i + 1, n - i)
      cs(i) = x; ws(i) = w; n += 1
      if (n > b) mergeClosest()
    }

    /** Fold the two closest adjacent centroids into their weighted mean
      * (ties: the leftmost pair, the paper's deterministic choice). */
    private def mergeClosest(): Unit = {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < n - 1) {
        val gap = cs(i + 1) - cs(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val w = ws(best) + ws(best + 1)
      cs(best) = (cs(best) * ws(best) + cs(best + 1) * ws(best + 1)) / w
      ws(best) = w
      System.arraycopy(cs, best + 2, cs, best + 1, n - best - 2)
      System.arraycopy(ws, best + 2, ws, best + 1, n - best - 2)
      n -= 1
    }

    def mergeIn(o: Buf): Unit = {
      var i = 0
      while (i < o.n) { add(o.cs(i), o.ws(i)); i += 1 }
    }
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.b); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.cs(i)); out.writeDouble(buf.ws(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = in.readInt(); val n = in.readInt()
    val buf = new Buf(b)
    var i = 0
    // entries arrive ascending; append without re-searching
    while (i < n) { buf.add(in.readDouble(), in.readDouble()); i += 1 }
    buf
  }
}

final case class NumericHistogramAgg(
    child: Expression,
    b: Int,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NumericHistogram.Buf] {

  require(b >= 2 && b <= 10000,
    s"numeric_histogram buckets must be in [2, 10000], got $b")

  override def children: Seq[Expression] = child :: weight :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(DoubleType, DoubleType, valueContainsNull = false)

  override def createAggregationBuffer(): NumericHistogram.Buf =
    new NumericHistogram.Buf(b)

  override def update(buf: NumericHistogram.Buf, input: InternalRow): NumericHistogram.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) buf.add(Qdigest.toDouble(v), Qdigest.toDouble(w))
    }
    buf
  }

  override def merge(buf: NumericHistogram.Buf, o: NumericHistogram.Buf): NumericHistogram.Buf = {
    buf.mergeIn(o)
    buf
  }

  override def eval(buf: NumericHistogram.Buf): Any = {
    val ks = new Array[Any](buf.n)
    val vs = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { ks(i) = buf.cs(i); vs(i) = buf.ws(i); i += 1 }
    ArrayBasedMapData(ks, vs)
  }

  override def serialize(buf: NumericHistogram.Buf): Array[Byte] =
    NumericHistogram.serialize(buf)
  override def deserialize(bytes: Array[Byte]): NumericHistogram.Buf =
    NumericHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1))
  override def prettyName: String = "numeric_histogram"
}
