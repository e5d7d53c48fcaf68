package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.column
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise sum of `array<float>` vectors in double precision — the
  * centroid-update aggregate for the k-means loops (ivfCentroids,
  * pqCodebooks). The relational shape it replaces is posexplode →
  * groupBy(group, dim).avg → groupBy(group).collect_list+sort: TWO full
  * exchanges (and a dim-times row blowup) per Lloyd round where one
  * suffices. The buffer is one double[dim] per open group — fixed-width,
  * partial-aggregating, so a 100 TB corpus ships one vector per
  * (group, map task) instead of corpus·dim exploded rows. Arithmetic is
  * identical to the avg-per-dimension shape (double accumulation, order
  * shuffle-dependent in both). Ragged inputs grow the buffer to the
  * longest seen vector; missing trailing elements contribute 0 — caller
  * corpora are fixed-dim. NULL inputs contribute nothing.
  */
case class VecSum(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def grow(buf: Array[Double], n: Int): Array[Double] =
    if (buf.length >= n) buf
    else { val nb = new Array[Double](n); System.arraycopy(buf, 0, nb, 0, buf.length); nb }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = grow(buffer, n)
      var i = 0
      while (i < n) { out(i) += arr.getFloat(i).toDouble; i += 1 }
      out
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    val out = grow(buffer, other.length)
    var i = 0
    while (i < other.length) { out(i) += other(i); i += 1 }
    out
  }

  override def eval(buffer: Array[Double]): Any =
    UnsafeArrayData.fromPrimitiveArray(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_sum expects array<float>, got $t")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}

object VecSumAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.expression

  /** Element-wise double sum of array<float> vectors. */
  def vecSum(vecs: Column): Column =
    column(VecSum(expression(vecs)).toAggregateExpression())
}
