package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trino `min_by(x, y, n)` / `max_by(x, y, n)` (Trino 468 fn library
  * [pinned, SURVEY.md §2.4]): the n values of `x` associated with the
  * n smallest (largest) values of `y`, in `y` order.
  *
  * This is THE no-sort per-group sampler at 100 TB: "k examples per
  * source, deterministically" spelled as
  * `min_by(doc, md5(id || seed), k)` keeps O(k) state per group with
  * map-side partial merge — where the ROW_NUMBER window spelling
  * (t15) sorts every group's full contents before discarding all but
  * k rows. Entry t28 pins both spellings to the same rows.
  *
  * Determinism: ties on `y` break by the PAYLOAD's ordering (all
  * supported types are orderable), identical (y, x) pairs keep their
  * multiplicity, so the result is a pure function of the group's
  * CONTENTS — independent of partial-merge order, where Trino leaves
  * ties unspecified. NULL ordering keys are skipped (Trino
  * semantics); NULL payloads are kept (ordered first among ties).
  *
  * Types: y and x each in {int, bigint, float, double, string,
  * binary, date, timestamp} — the tagged wire format below. A wider
  * payload should be packed with named_struct -> to_json upstream.
  */
final case class MinKBy(
    valueExpr: Expression,
    orderingExpr: Expression,
    k: Int,
    reverse: Boolean, // false = min_by, true = max_by
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBy.Buf] {

  require(k >= 1 && k <= 1000000, s"min_by/max_by n must be in [1, 1000000], got $k")

  override def children: Seq[Expression] = valueExpr :: orderingExpr :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(valueExpr.dataType,
    containsNull = valueExpr.nullable)

  private def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | FloatType | DoubleType | StringType |
         BinaryType | DateType | TimestampType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!supported(orderingExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"min_by/max_by(x, y, n): unsupported ordering type ${orderingExpr.dataType.sql}")
    else if (!supported(valueExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"min_by/max_by(x, y, n): unsupported value type ${valueExpr.dataType.sql} " +
          "(pack wide payloads with named_struct -> to_json upstream)")
    else TypeCheckResult.TypeCheckSuccess

  /** One comparator for both (ord, payload) slots: Catalyst atomic
    * values are all Comparable except Array[Byte]. */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1 // payload NULLs first; ordering NULLs never enter
    case (_, null) => 1
    case (x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y)
    case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
  }

  private object PairOrdering extends java.util.Comparator[(Any, Any)] {
    def compare(p: (Any, Any), q: (Any, Any)): Int = {
      val c = cmpAny(p._1, q._1)
      val c2 = if (c != 0) c else cmpAny(p._2, q._2)
      if (reverse) -c2 else c2
    }
  }

  override def createAggregationBuffer(): MinKBy.Buf =
    new MinKBy.Buf(new java.util.TreeMap[(Any, Any), Long](PairOrdering), 0L)

  private def add(b: MinKBy.Buf, pair: (Any, Any), times: Long): Unit = {
    if (b.total < k) {
      val room = k - b.total
      val n = math.min(times, room)
      b.m.merge(pair, n, (x, y) => x + y)
      b.total += n
      if (n < times) add(b, pair, times - n) // fall through to evict path
    } else {
      val last = b.m.lastKey()
      val c = PairOrdering.compare(pair, last)
      if (c < 0) {
        // admit up to `times`, evicting from the tail
        var toAdd = times
        var added = 0L
        while (toAdd > 0 && {
          val lk = b.m.lastKey(); PairOrdering.compare(pair, lk) < 0
        }) {
          val lk = b.m.lastKey()
          val lc = b.m.get(lk)
          val evict = math.min(lc, toAdd)
          if (evict == lc) b.m.remove(lk) else b.m.put(lk, lc - evict)
          added += evict; toAdd -= evict
        }
        if (added > 0) b.m.merge(pair, added, (x, y) => x + y)
      }
    }
  }

  override def update(b: MinKBy.Buf, input: InternalRow): MinKBy.Buf = {
    val ord = orderingExpr.eval(input)
    if (ord != null) add(b, (copyOf(ord), copyOf(valueExpr.eval(input))), 1L)
    b
  }

  /** UTF8String/Array inputs are reused buffers during eval — copy. */
  private def copyOf(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case a: Array[Byte] => a.clone()
    case other => other
  }

  override def merge(b: MinKBy.Buf, o: MinKBy.Buf): MinKBy.Buf = {
    o.m.forEach((pair, c) => add(b, pair, c))
    b
  }

  override def eval(b: MinKBy.Buf): Any = {
    val out = new Array[Any](b.total.toInt)
    var i = 0
    val it = b.m.entrySet().iterator()
    while (it.hasNext && i < out.length) {
      val e = it.next()
      var c = e.getValue
      while (c > 0 && i < out.length) { out(i) = e.getKey._2; i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  private def writeVal(out: DataOutputStream, dt: DataType, v: Any): Unit = {
    if (v == null) { out.writeByte(0); return }
    out.writeByte(1)
    dt match {
      case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
      case LongType | TimestampType => out.writeLong(v.asInstanceOf[Long])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case StringType =>
        val bs = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(bs.length); out.write(bs)
      case BinaryType =>
        val bs = v.asInstanceOf[Array[Byte]]
        out.writeInt(bs.length); out.write(bs)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  private def readVal(in: DataInputStream, dt: DataType): Any = {
    if (in.readByte() == 0) return null
    dt match {
      case IntegerType | DateType => in.readInt()
      case LongType | TimestampType => in.readLong()
      case FloatType => in.readFloat()
      case DoubleType => in.readDouble()
      case StringType =>
        val bs = new Array[Byte](in.readInt()); in.readFully(bs)
        UTF8String.fromBytes(bs)
      case BinaryType =>
        val bs = new Array[Byte](in.readInt()); in.readFully(bs)
        bs
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override def serialize(b: MinKBy.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.m.size())
    b.m.forEach { (pair, c) =>
      out.writeLong(c)
      writeVal(out, orderingExpr.dataType, pair._1)
      writeVal(out, valueExpr.dataType, pair._2)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBy.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val c = in.readLong()
      val ord = readVal(in, orderingExpr.dataType)
      val v = readVal(in, valueExpr.dataType)
      b.m.put((ord, v), c)
      b.total += c
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderingExpr = newChildren(1))
  override def prettyName: String = if (reverse) "max_by" else "min_by"
}

object MinKBy {
  /** (ord, payload) -> multiplicity, plus the total retained count.
    * Multiplicities make identical pairs survive (a set would collapse
    * them and under-fill n). */
  final class Buf(val m: java.util.TreeMap[(Any, Any), Long], var total: Long)
}
