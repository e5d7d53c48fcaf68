package graft.functions

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.column
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Set-union aggregate over dictionary-encoded node ids, backed by a
  * `java.util.BitSet` — the dense-frontier engine behind
  * [[graft.graphs.Frontier]].
  *
  * Multi-hop graph expansion (the reference's pokec bench class,
  * pokec.rs:430-560) spends its time in per-hop DISTINCT: the
  * (frontier ⋈ edges) join emits one row per PATH — combinatorial in
  * dense regions (measured at sf1: the hop-2→3 join emits ~1.1 G rows
  * that the distinct crushes to 22.5 M) — and every one of those rows
  * pays a hash-aggregate probe. When node ids fit a small dictionary,
  * the same set semantics cost one BIT per element: the frontier joins
  * the (node → successor-array) adjacency ONCE per frontier MEMBER
  * (not per path), and this aggregate ORs the successor arrays into a
  * per-seed bitmap. Word-parallel unions replace per-row hash probes,
  * and partial aggregation ships ONE compact bitmap per (seed, mapper)
  * instead of the surviving pair rows.
  *
  * `child` may be `array<int>` (a joined adjacency list; every element
  * is set) or a bare `int` (a single member). NULL inputs contribute
  * nothing. `eval` returns the cardinality (`countOnly = true`,
  * `long`) or the sorted member array (`array<int>`), which is exactly
  * the DISTINCT frontier — Frontier explodes it to rows for the next
  * hop.
  *
  * Scale bound: the buffer is `numBits / 8` bytes per open group, so
  * callers gate on dictionary size ([[graft.graphs.Frontier.maxNodes]])
  * and the row-distinct shape remains the open-world fallback. Sort-
  * based aggregation fallback (ObjectHashAggregate spilling) stays
  * correct: buffers serialize via `BitSet.toByteArray`.
  */
case class BitsetUnion(
    child: Expression,
    numBits: Int,
    countOnly: Boolean,
    asBytes: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JBitSet] with UnaryLike[Expression] {

  private lazy val fromArray = child.dataType.isInstanceOf[ArrayType]

  override def createAggregationBuffer(): JBitSet = new JBitSet(numBits)

  override def update(buffer: JBitSet, input: InternalRow): JBitSet = {
    val v = child.eval(input)
    if (v != null) {
      if (fromArray) {
        val arr = v.asInstanceOf[ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) { buffer.set(arr.getInt(i)); i += 1 }
      } else buffer.set(v.asInstanceOf[Int])
    }
    buffer
  }

  override def merge(buffer: JBitSet, other: JBitSet): JBitSet = {
    buffer.or(other); buffer
  }

  override def eval(buffer: JBitSet): Any =
    if (asBytes) buffer.toByteArray // raw bitmap out — the driver-loop state shape
    else if (countOnly) buffer.cardinality().toLong
    else {
      val out = new Array[Int](buffer.cardinality())
      var bit = buffer.nextSetBit(0)
      var j = 0
      while (bit >= 0) { out(j) = bit; j += 1; bit = buffer.nextSetBit(bit + 1) }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

  override def serialize(buffer: JBitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): JBitSet = JBitSet.valueOf(bytes)

  override def dataType: DataType =
    if (asBytes) BinaryType
    else if (countOnly) LongType
    else ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (asBytes) "bitset_union_bytes"
    else if (countOnly) "bitset_union_count" else "bitset_union"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetUnion =
    copy(child = newChild)
}

object BitsetAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.expression

  /** Distinct-member count of the union of `members` (int or array<int>). */
  def unionCount(members: Column, numBits: Int): Column =
    column(BitsetUnion(expression(members), numBits, countOnly = true)
      .toAggregateExpression())

  /** Sorted distinct members of the union, as `array<int>`. */
  def unionMembers(members: Column, numBits: Int): Column =
    column(BitsetUnion(expression(members), numBits, countOnly = false)
      .toAggregateExpression())

  /** Raw union bitmap as `binary` (`BitSet.toByteArray`) — the per-seed
    * STATE shape for driver-loop BFS: visited/frontier live as one
    * fixed-width value per seed instead of a growing row set. */
  def unionBytes(members: Column, numBits: Int): Column =
    column(BitsetUnion(expression(members), numBits, countOnly = false, asBytes = true)
      .toAggregateExpression())
}
