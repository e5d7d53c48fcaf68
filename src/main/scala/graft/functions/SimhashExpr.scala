package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array in ONE pass — the per-doc projection
  * replacement for the explode → xxhash64 → groupBy(id) + 64 vote-sum
  * aggregates pipeline (which paid a full shuffle of every token hash
  * and a 64-slot aggregation buffer per doc).
  *
  * Exact-integer equivalence with that pipeline, term by term:
  * per token the hash is literally [[XxHash64Function.hash]] with the
  * default seed 42 — the same code the xxhash64() expression runs, not
  * a mirror — and per bit the vote is +1/−1 by that hash's bit, summed
  * in ints. Bit b of the result is set iff votes(b) > 0, as the old
  * `when(sum > 0, 1<<b)` chose.
  *
  * Row semantics mirrored: NULL or EMPTY token arrays yield NULL (the
  * explode produced no row for those docs — callers filter nulls to
  * reproduce the dropped-row behavior); NULL elements contribute to no
  * bit (their per-term vote was NULL, which sum() skipped) but still
  * make the doc non-empty, so an all-null array yields fp = 0 exactly
  * like the old sum-over-nulls → when(null > 0) → 0 path.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64_onepass"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got $t")
    }

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** Shared by interpreted eval and the generated code (same pattern as
    * [[WordShingleWindows]]), so the projection stays inside
    * WholeStageCodegen. Returns java.lang.Long or null. */
  def compute(v: Any): Any = {
    if (v == null) return null
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b) & 1L) * 2L - 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("simhasher", this, classOf[Simhash64].getName)
      s"""
        Object __r = $ref.compute($c);
        if (__r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((java.lang.Long) __r).longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}
