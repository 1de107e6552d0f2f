package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-row argmax with an arbitrary orderable ordering key and an
  * arbitrary payload — `arg_max_by(value, ordering)` returns the
  * `value` of the row with the LARGEST `ordering` in the group.
  *
  * Why this exists when Spark has `max_by`: Spark's declarative
  * `max_by(x, y)` leaves ties NON-deterministic, and giving it a
  * struct tie-breaker key (`max_by(x, struct(y, -id))`) forces a
  * struct-typed aggregation buffer, which HashAggregate cannot hold —
  * the plan silently degrades to SortAggregate and the input gets
  * SORTED by the group key (measured in PlanSpec: `Sort [id_v]` under
  * two SortAggregates). As a TypedImperativeAggregate this runs under
  * ObjectHashAggregate: O(1) state per group, map-side partial merge,
  * NO sort anywhere — the cell-assignment argmax over N·k scored rows
  * collapses to N rows before the exchange (the IVF assignment path,
  * r12 verdict #3; MinKBy is the k>1 sibling).
  *
  * Determinism contract: ties on `ordering` keep the first seen, so
  * callers must make the ordering key UNIQUE per group (embed the
  * tie-breaker in the struct, e.g. `struct(ccos, -cent_id)`) — every
  * in-repo call site does. Rows with a NULL ordering key are skipped
  * (Trino max_by semantics); an all-NULL group returns NULL.
  *
  * Types: ordering is anything `RowOrdering.isOrderable` accepts
  * (atomics, structs, arrays — NOT maps); payload is ANY type
  * including struct (serialized through an UnsafeProjection, so wide
  * payloads like embedding vectors ride the buffer without packing). */
final case class ArgMaxBy(
    valueExpr: Expression,
    orderingExpr: Expression,
    reverse: Boolean = false, // false = arg_max_by, true = arg_min_by
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBy.Buf] {

  override def children: Seq[Expression] = valueExpr :: orderingExpr :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(orderingExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"arg_max_by(x, y): unorderable ordering type ${orderingExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val ord = {
    val base = TypeUtils.getInterpretedOrdering(orderingExpr.dataType)
    if (reverse) base.reverse else base
  }

  override def createAggregationBuffer(): ArgMaxBy.Buf = new ArgMaxBy.Buf(null, null)

  /** Catalyst eval results over Unsafe rows are REUSED buffers — copy
    * anything mutable before retaining it across input rows. */
  private def copyOf(v: Any): Any = v match {
    case null => null
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case s: UTF8String => s.clone()
    case b: Array[Byte] => b.clone()
    case other => other
  }

  override def update(b: ArgMaxBy.Buf, input: InternalRow): ArgMaxBy.Buf = {
    val o = orderingExpr.eval(input)
    if (o != null && (b.ordVal == null || ord.compare(o, b.ordVal) > 0)) {
      b.ordVal = copyOf(o)
      b.value = copyOf(valueExpr.eval(input))
    }
    b
  }

  override def merge(b: ArgMaxBy.Buf, o: ArgMaxBy.Buf): ArgMaxBy.Buf = {
    if (o.ordVal != null && (b.ordVal == null || ord.compare(o.ordVal, b.ordVal) > 0)) {
      b.ordVal = o.ordVal
      b.value = o.value
    }
    b
  }

  override def eval(b: ArgMaxBy.Buf): Any = b.value

  /** Wire format: both slots packed into one two-field UnsafeRow (the
    * projection handles every Catalyst type, structs included); an
    * empty buffer is the empty byte array. The projection is cached —
    * UnsafeProjection.create codegen-compiles, and serialize runs once
    * per GROUP at every partial/final boundary. */
  @transient private lazy val pairProj = UnsafeProjection.create(StructType(Seq(
    StructField("o", orderingExpr.dataType, nullable = true),
    StructField("v", valueExpr.dataType, nullable = true))))

  override def serialize(b: ArgMaxBy.Buf): Array[Byte] = {
    if (b.ordVal == null) return Array.emptyByteArray
    pairProj(InternalRow(b.ordVal, b.value)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxBy.Buf = {
    if (bytes.isEmpty) return createAggregationBuffer()
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    new ArgMaxBy.Buf(
      copyOf(row.get(0, orderingExpr.dataType)),
      copyOf(row.get(1, valueExpr.dataType)))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), orderingExpr = newChildren(1))
  override def prettyName: String = if (reverse) "arg_min_by" else "arg_max_by"
}

object ArgMaxBy {
  /** ordVal == null means "no qualifying row seen yet". */
  final class Buf(var ordVal: Any, var value: Any)
}
