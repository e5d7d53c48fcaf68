package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector distance/similarity kernels as native Catalyst expressions.
  *
  * The reference exposes `l2_dist` / `ip_dist` / `cos_dist`
  * (cozo-core/src/data/functions.rs:2184/2207/2230) over fixed-dim
  * `<F32; n>` vectors; its HNSW engine calls the same kernels per
  * candidate (runtime/hnsw.rs). On Spark the hot path is a scan
  * computing millions of distances per second, so these are
  * implemented as tight primitive loops over Parquet `ArrayType(Float)`
  * columns with Janino codegen (`doGenCode`) — no Row boxing, no Scala
  * UDF serialization — keeping the surrounding plan inside
  * whole-stage codegen.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> columns, got ${left.dataType} / ${right.dataType}")
    }
  }
}

/** cosine similarity = dot(a,b) / (|a| |b|); NaN-free for zero vectors (returns 0.0). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi"); val dn = ctx.freshName("dn")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        double $dn = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        ${ev.value} = ($dn == 0.0) ? 0.0 : $dot / $dn;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Squared-accumulating L2 distance (ref functions.rs:2184 returns squared L2). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_dist"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1 }
    s
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Inner-product distance (ref functions.rs:2207): 1 - dot(a,b). */
case class InnerProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "inner_product"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $s;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Argmin/argmax over a candidate LIST in one codegen'd scan —
  * `nearestIndex(vec, cands)` returns the position (0-based) of the
  * nearest candidate vector, ties broken by the FIRST (lowest) index.
  *
  * The relational shape for "assign each vector to its nearest of K
  * centroids" is a K-way broadcast-join explosion followed by a
  * min_by(struct(dist, code)) aggregation — measured at 2 M joined rows
  * for a 32 K-row training set (K = 64), with the hash aggregate's
  * var-length struct/array buffers costing ~5 µs per joined row (the
  * UnsafeRow buffer is rebuilt on every improving update). This
  * expression does the same argmin inside the row's own projection:
  * K·d flops per INPUT row, no join blowup, no aggregation, fully
  * inside whole-stage codegen. With `useCosine` the scan keeps the
  * strictly-GREATEST cosine (ties → first index), mirroring
  * `TopK.perGroup(sim desc, cell asc, 1)`; otherwise the strictly-least
  * squared L2 (ties → first index), mirroring
  * `min_by(code, struct(d2, code))` over code-ascending candidates.
  * Cosine handles zero denominators exactly like [[CosineSimilarity]]
  * (similarity 0). Empty candidate lists yield -1.
  */
case class NearestVecIndex(left: Expression, right: Expression, useCosine: Boolean)
  extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = if (useCosine) "nearest_cosine_index" else "nearest_l2_index"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<array<float>>), got ${left.dataType} / ${right.dataType}")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val k = cs.numElements()
    var best = -1
    var bestScore = if (useCosine) Double.NegativeInfinity else Double.PositiveInfinity
    var j = 0
    while (j < k) {
      // a NULL candidate scores NULL in the join shape and never wins —
      // skip it (it can't beat a real score, and -1 stays for all-null)
      val c = if (cs.isNullAt(j)) null else cs.getArray(j)
      if (c == null) { j += 1 }
      else {
      val n = math.min(x.numElements(), c.numElements())
      var i = 0
      var score = 0.0
      if (useCosine) {
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        while (i < n) {
          val xi = x.getFloat(i).toDouble; val yi = c.getFloat(i).toDouble
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        val dn = math.sqrt(nx) * math.sqrt(ny)
        score = if (dn == 0.0) 0.0 else dot / dn
        if (score > bestScore) { bestScore = score; best = j }
      } else {
        while (i < n) {
          val d = x.getFloat(i).toDouble - c.getFloat(i).toDouble
          score += d * d; i += 1
        }
        if (score < bestScore) { bestScore = score; best = j }
      }
      j += 1
      }
    }
    best
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.freshName("k"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val score = ctx.freshName("score")
      val body =
        if (useCosine) {
          val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
          val ny = ctx.freshName("ny"); val dn = ctx.freshName("dn")
          val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
          s"""
            double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $xi = (double) $a.getFloat($i);
              double $yi = (double) $c.getFloat($i);
              $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
            }
            double $dn = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
            double $score = ($dn == 0.0) ? 0.0 : $dot / $dn;
            if ($score > $bestScore) { $bestScore = $score; $best = $j; }
          """
        } else {
          val d = ctx.freshName("d")
          s"""
            double $score = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $d = (double) $a.getFloat($i) - (double) $c.getFloat($i);
              $score += $d * $d;
            }
            if ($score < $bestScore) { $bestScore = $score; $best = $j; }
          """
        }
      s"""
        int $k = $b.numElements();
        int $best = -1;
        double $bestScore = ${if (useCosine) "Double.NEGATIVE_INFINITY" else "Double.POSITIVE_INFINITY"};
        for (int $j = 0; $j < $k; $j++) {
          if ($b.isNullAt($j)) continue;
          org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
          int $n = java.lang.Math.min($a.numElements(), $c.numElements());
          $body
        }
        ${ev.value} = $best;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** cos similarity in [-1,1]; `cos_dist` of the reference = 1 - this. */
  def cosineSimilarity(a: Column, b: Column): Column = column(CosineSimilarity(expression(a), expression(b)))
  def cosineDistance(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(1.0) - cosineSimilarity(a, b)
  }
  def l2Dist(a: Column, b: Column): Column = column(L2Distance(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column = column(InnerProduct(expression(a), expression(b)))
  /** 0-based position of the L2-nearest candidate (ties → first). */
  def nearestL2Index(vec: Column, cands: Column): Column =
    column(NearestVecIndex(expression(vec), expression(cands), useCosine = false))
  /** 0-based position of the cosine-nearest candidate (ties → first). */
  def nearestCosineIndex(vec: Column, cands: Column): Column =
    column(NearestVecIndex(expression(vec), expression(cands), useCosine = true))
  def ipDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lit(1.0) - dot(a, b)
  }
}
