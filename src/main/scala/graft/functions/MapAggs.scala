package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Trino's map-building aggregates (part of the pinned Trino 468
  * aggregate surface; Spark has no built-in equivalents):
  *
  *  - `histogram(x)` → map<x, bigint> — exact per-group value counts
  *  - `map_union(m)` → map — union of map rows (Trino: on duplicate
  *    keys the value comes from an arbitrary input map; here:
  *    first-seen wins within each partial, merge order decides across
  *    partials — callers needing determinism on duplicates should
  *    make values agree, which is also the only deterministic contract
  *    Trino offers)
  *  - `multimap_agg(k, v)` → map<k, array<v>> — all values per key
  *    (value order = encounter order, arbitrary across partitions,
  *    same caveat as Trino)
  *
  * All three keep per-group state proportional to the DISTINCT keys in
  * that group — the same cost class as Trino's implementations; they
  * are for genuinely bounded key domains (categories, languages,
  * source tags). For unbounded domains use the sketch families
  * (approx_most_frequent / kmv / setdigest), which is also the advice
  * the reference's engine documentation gives.
  *
  * Buffers hold Catalyst-internal values (UTF8String, Long, ...);
  * shuffle serialization projects (key [, value]) pairs through an
  * UnsafeProjection of the child types — the standard varlen-safe
  * encoding (each entry length-prefixed), so any atomic key type and
  * any value type round-trip exactly.
  */
private[functions] object MapAggs {
  /** Length-prefixed UnsafeRow stream writer/reader. */
  def writeRows(out: DataOutputStream, proj: UnsafeProjection,
      rows: Iterator[InternalRow]): Unit =
    rows.foreach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }

  def readRows(bytes: Array[Byte], nFields: Int): Iterator[UnsafeRow] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    Iterator.tabulate(n) { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(nFields)
      row.pointTo(buf, len)
      row
    }
  }

  def requireAtomicKey(dt: DataType, fn: String): Unit = dt match {
    // nested types don't implement value equals/hashCode as map keys
    case _: ArrayType | _: MapType | _: StructType =>
      throw new IllegalArgumentException(
        s"$fn keys must be an atomic type (string/numeric/date/...), got ${dt.sql}")
    case _ => ()
  }

  /** VARBINARY keys (Trino supports them here) need VALUE equality in
    * the hash buffers — Array[Byte] hashes/compares by reference, so
    * unwrapped binary keys would treat every row as distinct and emit
    * duplicate-key maps (r12 advice). Wrap at buffer insert, unwrap at
    * eval/serialize; every other atomic Catalyst value (UTF8String,
    * Long, ...) already carries value equality. */
  final class BinKey(val bytes: Array[Byte]) {
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
    override def equals(o: Any): Boolean = o match {
      case b: BinKey => java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
  }
  def wrapKey(v: Any): Any = v match {
    case b: Array[Byte] => new BinKey(b)
    case x => x
  }
  def unwrapKey(v: Any): Any = v match {
    case b: BinKey => b.bytes
    case x => x
  }
}

/** `checksum(x)` — order-insensitive multiset digest: the WRAPPING sum
  * of xxhash64(x) · PRIME per row (Trino's checksum is the same
  * sum-with-overflow fold). A wrapping SUM — unlike an XOR fold — does
  * not cancel values that appear an even number of times (r12 review:
  * xor(h,h) = 0 made checksum({x,x,y}) == checksum({y}), defeating the
  * function's data-validation purpose). NULL rows contribute the bare
  * PRIME so they count with multiplicity too. */
final case class ChecksumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Prime = -7046029254386353131L // xxhash64 PRIME64_1

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true // empty input -> NULL, like Trino
  override def dataType: DataType = BinaryType

  // buffer = (wrapping sum, row count): the count distinguishes an
  // EMPTY aggregate (NULL result, Trino semantics) from a multiset
  // whose contributions happen to wrap to zero (r12 review)
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    // ONE child evaluation per row: hash the evaluated value directly
    // (XxHash64Function is the kernel behind the xxhash64 expression)
    val v = child.eval(input)
    val h =
      if (v == null) 1L
      else org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(v, child.dataType, 42L)
    b(0) += h * Prime // Long arithmetic wraps — the point
    b(1) += 1L
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    b(0) += o(0)
    b(1) += o(1)
    b
  }

  override def eval(b: Array[Long]): Any =
    if (b(1) == 0L) null
    else {
      val out = new Array[Byte](8)
      java.nio.ByteBuffer.wrap(out).putLong(b(0))
      out
    }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](16)
    val buf = java.nio.ByteBuffer.wrap(out)
    buf.putLong(b(0)); buf.putLong(b(1))
    out
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array(buf.getLong, buf.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ChecksumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ChecksumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "checksum"
}

/** `histogram(x)` — exact value counts as map<x, bigint>. */
final case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Long]] {

  MapAggs.requireAtomicKey(child.dataType, "histogram")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType, LongType))

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Long] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, Long], input: InternalRow): mutable.LinkedHashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) { // Trino histogram ignores NULLs
      val key = MapAggs.wrapKey(InternalRow.copyValue(v))
      b.update(key, b.getOrElse(key, 0L) + 1L)
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, Long], o: mutable.LinkedHashMap[Any, Long]): mutable.LinkedHashMap[Any, Long] = {
    o.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, Long]): Any =
    ArrayBasedMapData(b.keys.map(MapAggs.unwrapKey).toArray[Any],
      b.values.map(v => v: Any).toArray)

  override def serialize(b: mutable.LinkedHashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    MapAggs.writeRows(out, proj,
      b.iterator.map { case (k, c) => InternalRow(MapAggs.unwrapKey(k), c) })
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Long] = {
    val b = mutable.LinkedHashMap.empty[Any, Long]
    MapAggs.readRows(bytes, 2).foreach { row =>
      b.update(MapAggs.wrapKey(InternalRow.copyValue(row.get(0, child.dataType))),
        row.getLong(1))
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "histogram"
}

/** `map_union(m)` — union of map rows; first-seen value wins on
  * duplicate keys (Trino: arbitrary). */
final case class MapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]] {

  private val mapType: MapType = child.dataType match {
    case m: MapType => m
    case other => throw new IllegalArgumentException(
      s"map_union takes a map column, got ${other.sql}")
  }
  MapAggs.requireAtomicKey(mapType.keyType, "map_union")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = mapType

  @transient private lazy val proj =
    UnsafeProjection.create(Array(mapType.keyType, mapType.valueType))

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    child.eval(input) match {
      case null => ()
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = MapAggs.wrapKey(InternalRow.copyValue(ks.get(i, mapType.keyType)))
          if (!b.contains(k))
            b.update(k, InternalRow.copyValue(vs.get(i, mapType.valueType)))
          i += 1
        }
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, Any], o: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    o.foreach { case (k, v) => if (!b.contains(k)) b.update(k, v) }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, Any]): Any =
    ArrayBasedMapData(b.keys.map(MapAggs.unwrapKey).toArray[Any], b.values.toArray[Any])

  override def serialize(b: mutable.LinkedHashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    MapAggs.writeRows(out, proj,
      b.iterator.map { case (k, v) => InternalRow(MapAggs.unwrapKey(k), v) })
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val b = mutable.LinkedHashMap.empty[Any, Any]
    MapAggs.readRows(bytes, 2).foreach { row =>
      b.update(MapAggs.wrapKey(InternalRow.copyValue(row.get(0, mapType.keyType))),
        InternalRow.copyValue(row.get(1, mapType.valueType)))
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "map_union"
}

/** `multimap_agg(k, v)` — map<k, array<v>>, all values per key. */
final case class MultimapAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]] {

  MapAggs.requireAtomicKey(key.dataType, "multimap_agg")

  override def children: Seq[Expression] = key :: value :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(key.dataType,
    ArrayType(value.dataType, containsNull = true), valueContainsNull = false)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(key.dataType, value.dataType, BooleanType))

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]], input: InternalRow): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val k = key.eval(input)
    if (k != null) { // Trino multimap_agg skips NULL keys; NULL values kept
      val kk = MapAggs.wrapKey(InternalRow.copyValue(k))
      val v = value.eval(input)
      b.getOrElseUpdate(kk, mutable.ArrayBuffer.empty) +=
        (if (v == null) null else InternalRow.copyValue(v))
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]], o: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    o.foreach { case (k, vs) =>
      b.getOrElseUpdate(k, mutable.ArrayBuffer.empty) ++= vs
    }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Any =
    ArrayBasedMapData(b.keys.map(MapAggs.unwrapKey).toArray[Any],
      b.values.map(vs => new GenericArrayData(vs.toArray): Any).toArray)

  override def serialize(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.valuesIterator.map(_.size).sum)
    // flat (key, value, isNullValue) triples; keys repeat per value
    MapAggs.writeRows(out, proj, b.iterator.flatMap { case (k, vs) =>
      vs.iterator.map(v => InternalRow(MapAggs.unwrapKey(k), v, v == null))
    })
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val b = mutable.LinkedHashMap.empty[Any, mutable.ArrayBuffer[Any]]
    MapAggs.readRows(bytes, 3).foreach { row =>
      val k = MapAggs.wrapKey(InternalRow.copyValue(row.get(0, key.dataType)))
      val v = if (row.getBoolean(2)) null
        else InternalRow.copyValue(row.get(1, value.dataType))
      b.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultimapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultimapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
  override def prettyName: String = "multimap_agg"
}
