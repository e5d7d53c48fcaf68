package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-mixture balancing for training corpora (beyond the
  * reference): downsample each source so the kept counts follow the
  * requested weight ratios exactly, anchored at the most constrained
  * source (which keeps 100% of its rows; everything else downsamples —
  * no source is ever oversampled).
  *
  * Semantics (deterministic, integer-exact, engine-reproducible):
  *   - N_s = |rows of source s|, w_s = requested weight (default 1);
  *   - the anchor s* minimizes N_s / w_s (ties → smallest source name);
  *   - target_s = floor(w_s · N_s* / w_s*)  (so target_s* = N_s*);
  *   - each source keeps the target_s rows with the SMALLEST
  *     [[Sampling.knuthBucket]] hash (ties → smallest id) — a stable
  *     pseudo-random subset, reproducible bit-for-bit in any engine.
  *
  * 100 TB shape: per-source counts are one tiny aggregate; selection is
  * a hash PREFILTER (keep hash < threshold, a codegen'd scan filter
  * sized to overshoot target_s slightly) followed by an exact
  * rank-within-survivors — so the per-source sort ranks only
  * ~1.05·target_s survivors, never the full source. The prefilter
  * margin (5% + 1000) makes an under-full prefilter astronomically
  * unlikely for real corpus sizes; the margin is part of the operator's
  * definition (the oracle states the same two stages), so correctness
  * is exact regardless.
  */
object Balance {

  private val D: Long = 1L << 30 // knuthBucket hash space

  /** Per-source plan facts, exposed for tests/oracles. */
  final case class SourcePlan(source: String, n: Long, weight: Long,
                              target: Long, threshold: Long)

  def plans(counts: Map[String, Long], weights: Map[String, Long]): Seq[SourcePlan] = {
    require(counts.nonEmpty, "no sources to balance")
    val ws = counts.keys.map(s => s -> weights.getOrElse(s, 1L)).toMap
    // anchor = min N/w as a double ratio, ties by name (the oracle
    // states the identical ORDER BY, so both engines agree)
    val anchor = counts.keys.toSeq.sortBy(s => (counts(s).toDouble / ws(s), s)).head
    counts.toSeq.sortBy(_._1).map { case (s, n) =>
      val target = ws(s) * counts(anchor) / ws(anchor)
      val thr = ((BigInt(target + 1000) * 21 / 20 * D / n) + 1).min(BigInt(D)).toLong
      SourcePlan(s, n, ws(s), target, thr)
    }
  }

  /** Balance `df` so each `srcCol` group's kept count follows
    * `weights` (missing sources weigh 1). Returns the kept rows with
    * their original columns. */
  def balanceSources(df: DataFrame, srcCol: String, idCol: String,
                     weights: Map[String, Long] = Map.empty): DataFrame = {
    val counts = df.groupBy(srcCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ps = plans(counts, weights)
    val thrExpr = ps.foldLeft(lit(null).cast("long")) { (acc, p) =>
      when(col(srcCol) === p.source, lit(p.threshold)).otherwise(acc)
    }
    val tgtExpr = ps.foldLeft(lit(null).cast("long")) { (acc, p) =>
      when(col(srcCol) === p.source, lit(p.target)).otherwise(acc)
    }
    val h = Sampling.knuthBucket(col(idCol), (1L << 30).toInt)
    val w = Window.partitionBy(col(srcCol)).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .filter(col("__h") < thrExpr) // codegen'd scan prefilter
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= tgtExpr)
      .drop("__h", "__rank")
  }
}
