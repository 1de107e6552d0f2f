package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trino `approx_most_frequent(buckets, value, capacity)` parity
  * (Trino 468 fn library [pinned, SURVEY.md §2.4]): top-`k` most
  * frequent values with a bounded-memory Space-Saving summary
  * (Metwally et al., "Efficient Computation of Frequent and Top-k
  * Elements in Data Streams", ICDT 2005 — the same sketch family
  * Trino's implementation documents).
  *
  * Distributed shape: per-partition summaries of `capacity` counters
  * merge associatively on the reduce side — O(capacity) state per
  * group regardless of input size, so a 100 TB column costs each
  * executor a fixed few KB per group. Counts are exact whenever a
  * group's distinct-value count fits `capacity` (how the oracle checks
  * us); otherwise they are upper bounds with the classic n/capacity
  * error budget.
  */
final case class ApproxMostFrequent(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0 && capacity >= k, s"need capacity >= k > 0, got k=$k capacity=$capacity")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(b: mutable.HashMap[String, Long], key: String, inc: Long): Unit =
    b.get(key) match {
      case Some(c) => b(key) = c + inc
      case None if b.size < capacity => b(key) = inc
      case None =>
        // evict the minimum counter (ties: lexicographically greatest
        // value goes, keeping eval deterministic), inherit its count.
        val (mk, mv) = b.minBy { case (v, c) => (c, v) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        b.remove(mk)
        b(key) = mv + inc
    }

  override def update(b: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.toString, 1L)
    b
  }

  override def merge(b: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) => add(b, key, c) }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any = {
    val top = b.toSeq
      .sortBy { case (v, c) => (-c, v) }
      .take(k)
      .map { case (v, c) => InternalRow(UTF8String.fromString(v), c) }
    new GenericArrayData(top)
  }

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (v, c) =>
      // length-prefixed raw UTF-8 (writeUTF caps at 64 KB — a long
      // document as the grouped value would crash the aggregation)
      val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(vb.length); out.write(vb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val vb = new Array[Byte](len); in.readFully(vb)
      b(new String(vb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxMostFrequent =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxMostFrequent =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "approx_most_frequent"
}
