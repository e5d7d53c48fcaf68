package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined n-token windows of a token array, built in ONE
  * pass over the tokens.
  *
  * The Catalyst composition it replaces —
  * `array_distinct(transform(sequence(0, size(toks)-n),
  * i => concat_ws(" ", slice(toks, i+1, n))))` — re-evaluates the whole
  * `toks` expression (a regex split of the document) INSIDE the lambda,
  * i.e. once per WINDOW: higher-order functions bind only their array
  * argument, every other expression the lambda captures is re-computed
  * per element. Measured on dedup_jaccard's shingle stage at sf0.1:
  * 164 task-seconds (~33 ms per document — tokenization × window count)
  * collapsing to the cost of one tokenize + window join per document.
  *
  * Semantics are identical: first-occurrence order (array_distinct's),
  * `" "` separator (UTF8String.concatWs — the same bytes concat_ws
  * produces, so every downstream xxhash64 sees identical input), fewer
  * than n tokens → empty array, NULL tokens input → empty array (the
  * old `when(size(toks) >= n, ...)` guard read size(NULL) = -1 and fell
  * to the empty-array branch).
  */
case class WordShingleWindows(child: Expression, n: Int)
  extends UnaryExpression {
  require(n >= 2, "n=1 degrades to array_distinct(tokens) — use that directly")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingle_windows"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got $t")
    }

  private val sep = UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: InternalRow): Any = compute(child.eval(input))

  /** The one-pass kernel, shared by interpreted eval and the generated
    * code — `doGenCode` emits a single call to it, so the expression no
    * longer breaks WholeStageCodegen (r12 verdict #8: as a
    * CodegenFallback the ENTIRE subtree, the regex tokenizer included,
    * was evaluated interpreted and the projection stage de-fused). */
  def compute(v: Any): ArrayData = {
    if (v == null) return empty
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return empty
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) { words(i) = toks.getUTF8String(i); i += 1 }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val window = new Array[UTF8String](n)
    i = 0
    while (i + n <= m) {
      System.arraycopy(words, i, window, 0, n)
      seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingleWindows].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleWindows =
    copy(child = newChild)
}
