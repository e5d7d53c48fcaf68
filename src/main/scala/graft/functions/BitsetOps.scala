package graft.functions

import java.util.{BitSet => JBitSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge.column
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Word-parallel set algebra over the `binary` bitmaps that
  * [[BitsetAgg.unionBytes]] emits — the per-seed STATE operations of the
  * driver-loop BFS in [[graft.graphs.Graphs]]. A level update touches one
  * row per seed (never per node or per path), so these run as interpreted
  * expressions (CodegenFallback) without ever sitting on a hot path; the
  * hot per-level work stays in the partial-aggregating [[BitsetUnion]].
  * NULL inputs mean the empty set (a seed whose frontier found no
  * successors comes out of the level's left join as NULL).
  */
object BitsetOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge.expression

  private[functions] def bits(v: Any): JBitSet =
    if (v == null) new JBitSet(0) else JBitSet.valueOf(v.asInstanceOf[Array[Byte]])

  private[functions] def membersOf(bs: JBitSet): UnsafeArrayData = {
    val out = new Array[Int](bs.cardinality())
    var bit = bs.nextSetBit(0)
    var j = 0
    while (bit >= 0) { out(j) = bit; j += 1; bit = bs.nextSetBit(bit + 1) }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** `left OR right` as a binary bitmap. */
  def orBytes(l: Column, r: Column): Column =
    column(BitsetOrBytes(expression(l), expression(r)))

  /** Sorted members of `left AND NOT right`, as `array<int>`. */
  def andNotMembers(l: Column, r: Column): Column =
    column(BitsetAndNotMembers(expression(l), expression(r)))
}

case class BitsetOrBytes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) { if (r == null) Array.emptyByteArray else r }
    else if (r == null) l
    else {
      val bs = BitsetOps.bits(l)
      bs.or(BitsetOps.bits(r))
      bs.toByteArray
    }
  }
  override def prettyName: String = "bitset_or"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetOrBytes =
    copy(left = newLeft, right = newRight)
}

case class BitsetAndNotMembers(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val bs = BitsetOps.bits(left.eval(input))
    bs.andNot(BitsetOps.bits(right.eval(input)))
    BitsetOps.membersOf(bs)
  }
  override def prettyName: String = "bitset_andnot_members"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetAndNotMembers =
    copy(left = newLeft, right = newRight)
}
