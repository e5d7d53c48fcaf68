package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |{x ∈ a ∩ b : x > minExclusive}| for two SORTED `array<long>`
  * columns — the per-edge primitive of intersection-based triangle /
  * cycle counting ([[graft.graphs.Graphs.clusteringCoefficients]]).
  *
  * Built-in `size(array_intersect(a, b))` computes the same number but
  * materializes the intersection array through a boxing hash set per
  * ROW (measured 31 CPU core-s at sf0.1 where the merge walk needs
  * well under one) — all that's needed is a count, and adjacency lists
  * sort once at build (`sort_array` over `collect_list`). The walk is
  * two pointers over primitive arrays: no allocation, no hashing,
  * ~one comparison per element. `minExclusive` (usually
  * `Long.MinValue` = none) restricts to elements strictly above a
  * bound — the rotation-canonical cycle count's `c > a` filter — via
  * binary-searched start offsets instead of a post-hoc array filter.
  *
  * Inputs must be sorted ascending and duplicate-free (adjacency sets
  * are); NULL in any input yields NULL (TernaryExpression default).
  */
case class SortedIntersectCount(first: Expression, second: Expression,
                                third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any, minEx: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val min = minEx.asInstanceOf[Long]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = lowerBound(xs, nx, min)
    var j = lowerBound(ys, ny, min)
    var c = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** First index with value strictly greater than `min`. */
  private def lowerBound(arr: ArrayData, n: Int, min: Long): Int =
    if (min == Long.MinValue) 0
    else {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr.getLong(mid) <= min) lo = mid + 1 else hi = mid
      }
      lo
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(first.dataType) && isLongArray(second.dataType) &&
        third.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<long>, array<long>, long), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  override def prettyName: String = "sorted_intersect_count"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SortedIntersectCount =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersect {
  /** Count of common elements of two sorted long arrays. */
  def count(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b),
      org.apache.spark.sql.catalyst.expressions.Literal(Long.MinValue)))

  /** Count of common elements strictly greater than `minExclusive`. */
  def countAbove(a: Column, b: Column, minExclusive: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b), expression(minExclusive)))
}
