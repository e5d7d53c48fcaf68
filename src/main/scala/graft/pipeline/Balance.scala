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

  /** Temperature-flattened mixture weights (the multilingual-training
    * recipe: sampling mass ∝ N_s^τ, τ<1 upweights small sources
    * RELATIVELY): integerized as round(N_s^τ·10⁶) so the exact integer
    * plan arithmetic of [[plans]] applies unchanged and any engine
    * reproduces the targets bit-for-bit (same doubles, same rounding). */
  def temperatureWeights(counts: Map[String, Long], tau: Double): Map[String, Long] = {
    require(tau >= 0.0 && tau <= 1.0, s"tau $tau not in [0,1]")
    counts.map { case (s, n) =>
      s -> math.max(1L, math.round(math.pow(n.toDouble, tau) * 1e6))
    }
  }

  /** [[balanceSources]] with temperature-derived weights: each source's
    * kept count follows N_s^τ ratios, anchored so no source
    * oversamples. One extra per-source count aggregate (tiny). */
  def balanceSourcesTemperature(df: DataFrame, srcCol: String, idCol: String,
                                tau: Double, exact: Boolean = true): DataFrame = {
    val counts = df.groupBy(srcCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    balanceSources(df, srcCol, idCol, temperatureWeights(counts, tau), exact)
  }

  /** Balance `df` so each `srcCol` group's kept count follows
    * `weights` (missing sources weigh 1). Returns the kept rows with
    * their original columns.
    *
    * `exact = true` (default) keeps precisely target_s rows per source
    * via rank-within-survivors; the rank is a per-source window, so the
    * largest single source's ~1.05·target survivors must sort in one
    * task — fine up to hundreds of millions of rows per source. For
    * larger targets set `exact = false`: a pure hash-rate filter
    * (threshold = target/N of the hash space) with NO window — fully
    * distributed and codegen'd, kept counts match targets to sampling
    * noise (±√target). */
  def balanceSources(df: DataFrame, srcCol: String, idCol: String,
                     weights: Map[String, Long] = Map.empty,
                     exact: Boolean = true): DataFrame = {
    val counts = df.groupBy(srcCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ps = plans(counts, weights)
    def perSource(f: SourcePlan => Long) =
      ps.foldLeft(lit(null).cast("long")) { (acc, p) =>
        when(col(srcCol) === p.source, lit(f(p))).otherwise(acc)
      }
    val h = Sampling.knuthBucket(col(idCol), (1L << 30).toInt)
    if (!exact) {
      // rate-only scale path: threshold sized to hit the target in
      // expectation, no per-source sort anywhere
      val rateThr = perSource(p => (BigInt(p.target) * D / p.n).toLong)
      df.withColumn("__h", h).filter(col("__h") < rateThr).drop("__h")
    } else {
      val w = Window.partitionBy(col(srcCol)).orderBy(col("__h"), col(idCol))
      df.withColumn("__h", h)
        .filter(col("__h") < perSource(_.threshold)) // codegen'd scan prefilter
        .withColumn("__rank", row_number().over(w))
        .filter(col("__rank") <= perSource(_.target))
        .drop("__h", "__rank")
    }
  }
}
